package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Sequence packing (concat-and-chunk) and benchmark decontamination. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("pack: chunk/offset/spans follow the concatenated stream in mix order") {
    // one shard → a single stream whose order is the Knuth-mix order
    val docs = Seq((0L, 10L), (1L, 500L), (2L, 20L), (3L, 600L), (4L, 5L))
      .toDF("doc_id", "n")
    val out = Packing.pack(docs, "doc_id", col("n"), budget = 512L, shards = 1)
      .select($"doc_id", $"n_tokens", $"shard", $"chunk", $"offset", $"spans_boundary")
      .as[(Long, Long, Int, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // independent reference: sort by mix, accumulate
    def mix(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val order = Seq(0L, 1L, 2L, 3L, 4L).sortBy(id => (mix(id), id))
    val sizes = Map(0L -> 10L, 1L -> 500L, 2L -> 20L, 3L -> 600L, 4L -> 5L)
    var pre = 0L
    order.foreach { id =>
      val (_, n, shard, chunk, off, spans) = out(id)
      assert(n == sizes(id) && shard == 0)
      assert(chunk == pre / 512, s"doc $id chunk")
      assert(off == pre % 512, s"doc $id offset")
      assert(spans == (pre % 512 + n > 512), s"doc $id spans")
      pre += n
    }
    // a 600-token doc must span a boundary wherever it starts mid-chunk;
    // sanity: at least one doc spans in this fixture
    assert(out.values.exists(_._6))
  }

  test("pack: shards are independent streams, each starting at chunk 0 offset 0") {
    val docs = (0L until 40L).map(i => (i, 100L)).toDF("doc_id", "n")
    val out = Packing.pack(docs, "doc_id", col("n"), budget = 256L, shards = 4)
    val firsts = out.groupBy($"shard")
      .agg(min(struct($"chunk", $"offset")).as("first"))
      .select($"first.chunk", $"first.offset").as[(Long, Long)].collect()
    assert(firsts.length == 4 && firsts.forall(_ == (0L, 0L)))
    // per-shard token totals agree with chunkStats
    val stats = Packing.chunkStats(out)
    val byShard = stats.groupBy($"shard").agg(sum($"n_tokens")).as[(Int, Long)].collect().toMap
    val direct = out.groupBy($"shard").agg(sum($"n_tokens")).as[(Int, Long)].collect().toMap
    assert(byShard == direct)
  }

  test("chunkBoundaries: segments tile chunks exactly, per-doc lens sum to n_tokens") {
    val docs = Seq((0L, 10L), (1L, 500L), (2L, 20L), (3L, 600L), (4L, 5L))
      .toDF("doc_id", "n")
    val packed = Packing.pack(docs, "doc_id", col("n"), budget = 512L, shards = 1)
    val segs = Packing.chunkBoundaries(packed, "doc_id", budget = 512L)
      .select($"chunk_idx", $"doc_id", $"start", $"len")
      .as[(Long, Long, Long, Long)].collect()
    // per-doc coverage: the segment lengths of each doc sum to its tokens
    val byDoc = segs.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(byDoc == Map(0L -> 10L, 1L -> 500L, 2L -> 20L, 3L -> 600L, 4L -> 5L))
    // chunk tiling: within each chunk, segments are disjoint, ordered and
    // gap-free from 0 (full chunks end exactly at the budget)
    segs.groupBy(_._1).foreach { case (ci, ss) =>
      val sorted = ss.sortBy(_._3)
      var cursor = 0L
      sorted.foreach { case (_, _, start, len) =>
        assert(start == cursor, s"chunk $ci gap at $start (cursor $cursor)")
        cursor = start + len
      }
      assert(cursor <= 512L)
    }
    // a spanning doc's continuation rows start at 0
    val doc3 = segs.filter(_._2 == 3L).sortBy(_._1)
    assert(doc3.length >= 2 && doc3.tail.forall(_._3 == 0L))
    // total mass: all chunks but the last are exactly full
    val chunkTotals = segs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastChunk = chunkTotals.keys.max
    chunkTotals.foreach { case (ci, tot) =>
      if (ci < lastChunk) assert(tot == 512L, s"chunk $ci holds $tot") }
  }

  test("fimTransform: PSM segments partition the original text, splits hash-derived") {
    def pfp(s: String): Long = s.foldLeft(0L)((x, c) => (x * 131 + c) % 1000000007L)
    val docs = (1L to 40L).map(i => (i, s"doc $i body content with some words here")).toDF("doc_id", "text")
    val got = Packing.fimTransform(docs, fimPermille = 500L)
      .as[(Long, Boolean, Option[Long], Option[Long], String)].collect()
    assert(got.exists(_._2) && got.exists(!_._2), "mixture must contain both kinds")
    got.foreach { case (id, fim, aOpt, bOpt, out) =>
      val text = s"doc $id body content with some words here"
      val selExpected = pfp(s"$id:fim") % 1000 < 500
      assert(fim == selExpected, s"doc $id coin")
      if (!fim) {
        assert(out == text && aOpt.isEmpty && bOpt.isEmpty)
      } else {
        val (a, b) = (aOpt.get, bOpt.get)
        val n = text.length.toLong
        assert(a == math.min(pfp(s"$id:a") % (n + 1), pfp(s"$id:b") % (n + 1)))
        assert(b == math.max(pfp(s"$id:a") % (n + 1), pfp(s"$id:b") % (n + 1)))
        val expected = "<PRE>" + text.substring(0, a.toInt) +
          "<SUF>" + text.substring(b.toInt) +
          "<MID>" + text.substring(a.toInt, b.toInt)
        assert(out == expected, s"doc $id PSM layout")
      }
    }
  }

  test("fimTransform: degenerate splits (a=b, a=0, b=len) stay well-formed") {
    // permille 1000 → every doc transforms; empty segments must render as
    // empty strings, never nulls or index errors.
    val docs = Seq((1L, "x"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    val got = Packing.fimTransform(docs, fimPermille = 1000L)
      .as[(Long, Boolean, Option[Long], Option[Long], String)].collect()
    got.foreach { case (id, fim, a, b, out) =>
      assert(fim && a.nonEmpty && b.nonEmpty)
      val text = if (id == 1L) "x" else if (id == 2L) "" else "ab"
      val stripped = out.replace("<PRE>", "").replace("<SUF>", "").replace("<MID>", "")
      // PSM reorders but preserves multiset of characters exactly
      assert(stripped.sorted == text.sorted, s"doc $id chars")
    }
  }

  test("decontamination: shared 8-gram marks a doc; short and clean docs survive") {
    val gram = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val corpus = Seq(
      (1L, s"prefix words here $gram suffix tail words"), // shares the gram
      (2L, "completely unrelated content with many different words in this document body"),
      (3L, "too short to gram"), // < 8 tokens → no grams → never contaminated
      (9L, s"the benchmark sentence contains $gram and more")
    ).toDF("doc_id", "text")
    val benchmark = corpus.filter($"doc_id" === 9L)
    val bad = Decontamination.contaminatedIds(corpus, benchmark)
      .as[Long].collect().toSet
    assert(bad == Set(1L, 9L), s"got $bad")
    val kept = Decontamination.decontaminate(corpus, benchmark)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("fuzzy decontamination: reworded near-dup drops where exact misses; clean/short docs survive") {
    // 48-token benchmark doc; the reworded copy swaps one token every 8
    // positions, so NO 8-gram survives (exact decontamination is blind to
    // it) while the 2-shingle set stays majority-shared (true Jaccard
    // ≈ 0.6) — the case fuzzy decontamination exists for. The fuzzy gate
    // runs at 32 bands × 2 rows: at J ≈ 0.6 the per-band collision
    // probability is J² ≈ 0.35, so P(no collision in 32 bands) < 1e-5 —
    // the fixture is deterministic in practice, not threshold-marginal.
    val base = (1 to 48).map(i => s"tok$i")
    val reworded = base.zipWithIndex
      .map { case (t, i) => if (i % 8 == 3) s"swp$i" else t }
    val corpus = Seq(
      (1L, reworded.mkString(" ")),            // fuzzy ≥ 0.4, no shared 8-gram
      (2L, base.mkString(" ")),                // identical → est 1 at any threshold
      (3L, "entirely different words about another topic with zero shingles in common here"),
      (4L, "two tokens")                       // < 3 tokens → no signature → clean
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, base.mkString(" "))).toDF("doc_id", "text")
    // Exact gate misses the reworded copy entirely…
    val exactBad = Decontamination.contaminatedIds(corpus, benchmark)
      .as[Long].collect().toSet
    assert(exactBad == Set(2L), s"got $exactBad")
    // …the fuzzy gate catches it (murmur scale path and oracle poly path
    // agree on the drop set for this fixture).
    val fuzzyBad = Decontamination.fuzzyContaminatedIds(corpus, benchmark, 0.4,
        bands = 32, shingleSize = 2)
      .as[Long].collect().toSet
    assert(fuzzyBad == Set(1L, 2L), s"got $fuzzyBad")
    val fuzzyBadPoly = Decontamination
      .fuzzyContaminatedIds(corpus, benchmark, 0.4, bands = 32,
        shingleSize = 2, poly = true)
      .as[Long].collect().toSet
    assert(fuzzyBadPoly == Set(1L, 2L), s"got $fuzzyBadPoly")
    val kept = Decontamination.fuzzyDecontaminate(corpus, benchmark, 0.4,
        bands = 32, shingleSize = 2)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // Tight threshold: only the verbatim copy trips it.
    val strict = Decontamination.fuzzyContaminatedIds(corpus, benchmark, 0.95,
        bands = 32, shingleSize = 2)
      .as[Long].collect().toSet
    assert(strict == Set(2L), s"got $strict")
  }

  test("semantic decontamination: identical embeddings drop, near-misses survive") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),  // identical to the benchmark vector
      (2L, Array(0.9f, 0.5f, 0.0f)),  // cos ≈ 0.874 < 0.99 → survives
      (3L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal → survives
      (4L, Array(2.0f, 0.0f, 0.0f))   // scaled copy: cosine 1 → drops
    ).toDF("vec_id", "embedding")
    val benchmark = Seq((100L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val bad = Decontamination.semanticContaminatedIds(corpus, benchmark, 0.99)
      .as[Long].collect().toSet
    assert(bad === Set(1L, 4L))
    val kept = Decontamination.semanticDecontaminate(corpus, benchmark, 0.99)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("decontamination: an engineered fingerprint collision does not drop a clean doc") {
    // Two DIFFERENT same-length tokens with equal mod-1e9+7 polynomial hash
    // (birthday search, deterministic seed). The progressive hash is
    // prefix-linear — H(prefix+t) = A·131^|t| + P(t) — so swapping t1 for
    // t2 in an 8-gram yields a different gram with the SAME fingerprint:
    // exactly the spurious match a fingerprint-only join would act on.
    val p = 1000000007L
    def poly(s: String): Long =
      s.foldLeft(0L)((a, c) => java.lang.Math.floorMod(a * 131L + c.toLong, p))
    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var pair: Option[(String, String)] = None
    while (pair.isEmpty) {
      val t = Array.fill(7)(('a' + rnd.nextInt(26)).toChar).mkString
      seen.get(poly(t)) match {
        case Some(u) if u != t => pair = Some((u, t))
        case _                 => seen(poly(t)) = t
      }
    }
    val (t1, t2) = pair.get
    val prefix = "one two three four five six seven"
    val gram1 = s"$prefix $t1" // corpus doc's only 8-gram
    val gram2 = s"$prefix $t2" // benchmark's only 8-gram — different text
    assert(gram1 != gram2 && poly(gram1) == poly(gram2), "engineered collision")
    // the ENGINE's fingerprint kernel must see the collision too, or this
    // test proves nothing about the prefilter
    val fps = Seq(gram1, gram2).toDF("g")
      .select(TextAnalysis.fingerprint($"g")).as[Long].collect()
    assert(fps(0) == fps(1), "kernel fingerprints collide")
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, gram1),              // fp-collides with the benchmark, shares NO gram
      (2L, s"intro $shared outro") // genuinely shares a gram
    ).toDF("doc_id", "text")
    val benchmark = Seq((9L, s"$gram2 then $shared")).toDF("doc_id", "text")
    val bad = Decontamination.contaminatedIds(corpus, benchmark)
      .as[Long].collect().toSet
    assert(bad == Set(2L), s"collision must not contaminate doc 1; got $bad")
    val kept = Decontamination.decontaminate(corpus, benchmark)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // span-level: the collision must not MASK anything in doc 1 either
    val masked = Decontamination.maskContamination(corpus, benchmark)
      .as[(Long, String)].collect().toMap
    assert(masked(1L) == gram1, "collision must not mask a clean span")
    assert(masked(2L) == "intro outro", "the genuinely shared gram masks")
  }

  test("span decontamination masks the planted span and keeps the document") {
    val bench = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12" // 12 exotic tokens
    val corpus = Seq(
      (1L, s"own words before $bench own words after body tokens continue here"),
      (2L, "a fully clean document with enough tokens to carry several grams along"),
      (3L, bench), // fully covered → empty string
      (4L, s"$bench leading contamination then clean tail content")
    ).toDF("doc_id", "text")
    val benchmark = Seq((9L, bench)).toDF("doc_id", "text")
    val spans = Decontamination.contaminatedSpans(corpus, benchmark)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1: bench occupies tokens [3, 14]; doc 3: [0, 11]; doc 4: [0, 11]
    assert(spans == Seq((1L, 3L, 14L), (3L, 0L, 11L), (4L, 0L, 11L)))
    val masked = Decontamination.maskContamination(corpus, benchmark)
      .as[(Long, String)].collect().toMap
    assert(masked(1L) == "own words before own words after body tokens continue here")
    assert(masked(2L) == "a fully clean document with enough tokens to carry several grams along")
    assert(masked(3L) == "")
    assert(masked(4L) == "leading contamination then clean tail content")
  }

  test("lengthBuckets: power-of-two slot widths, boundary lengths exact") {
    // budget 64: len 64 → bucket 0 (padded 64); 33..64 → 0? No: q=64//64=1
    // → k=0; len 33 → q=1 → k=0; len 32 → q=2 → k=1 (padded 32);
    // len 17 → q=3 → k=1; len 16 → q=4 → k=2 (padded 16); len 1 → q=64 →
    // k=6 (padded 1). Exact boundaries are where a float log2 would
    // wobble — pinned here.
    val rows = Seq((1L, 64L), (2L, 33L), (3L, 32L), (4L, 17L), (5L, 16L),
      (6L, 1L), (7L, 65L), (8L, 0L)).toDF("id", "n")
    val got = Packing.lengthBuckets(rows, "id", $"n", budget = 64L, shards = 1)
      .select($"id", $"bucket", $"padded_len", $"oversize")
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) === (0L, 64L, false))
    assert(got(2L) === (0L, 64L, false))
    assert(got(3L) === (1L, 32L, false))
    assert(got(4L) === (1L, 32L, false))
    assert(got(5L) === (2L, 16L, false))
    assert(got(6L) === (6L, 1L, false))
    assert(got(7L) === (-1L, -1L, true))  // longer than budget
    assert(got(8L) === (-1L, -1L, true))  // empty
  }

  test("lengthBuckets: capacity packing fills 2^k slots then opens a new sequence") {
    val rows = (0L until 10L).map(i => (i, 16L)).toDF("id", "n") // bucket 2, cap 4
    val got = Packing.lengthBuckets(rows, "id", $"n", budget = 64L, shards = 1)
      .select($"id", $"seq_idx", $"slot")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // shard constant (1 shard) → ids in order: 4 per sequence
    (0L until 10L).foreach { i =>
      assert(got(i) === (i / 4, i % 4), s"id=$i")
    }
  }

  test("lengthBuckets: assignment is layout-independent and never overfills") {
    val rnd = new scala.util.Random(3L)
    val rows = (0L until 300L).map(i => (i, (1 + rnd.nextInt(80)).toLong))
    val a = Packing.lengthBuckets(rows.toDF("id", "n"), "id", $"n", 64L, 4)
    val b = Packing.lengthBuckets(rows.toDF("id", "n").repartition(7), "id", $"n", 64L, 4)
    val sa = a.collect().map(_.toSeq).toSet
    assert(sa === b.collect().map(_.toSeq).toSet)
    // no sequence carries more than budget once padded: Σ padded ≤ budget
    val over = a.filter(!$"oversize")
      .groupBy($"bucket", $"shard", $"seq_idx")
      .agg(sum($"padded_len").as("s")).filter($"s" > 64L).count()
    assert(over === 0L)
  }

  test("lengthBucketStats: occupancy beats pad-to-budget on mixed lengths") {
    val rnd = new scala.util.Random(9L)
    val rows = (0L until 400L).map(i => (i, (1 + rnd.nextInt(64)).toLong)).toDF("id", "n")
    val bucketed = Packing.lengthBuckets(rows, "id", $"n", 64L, 2)
    val stats = Packing.lengthBucketStats(bucketed, 64L).collect()
    val nSeqs = stats.map(_.getAs[Long]("n_seqs")).sum
    val sumTok = stats.map(_.getAs[Long]("sum_tokens")).sum
    // pad-to-budget batches one doc per sequence: 400 sequences at
    // occupancy mean(n)/64. Bucketing must build FAR fewer sequences,
    // and its overall occupancy (Σ tokens / (Σ seqs · 64)) must beat the
    // naive batcher's even though partial final sequences drag on it.
    assert(nSeqs < 400L, s"n_seqs=$nSeqs")
    val bucketedOcc = sumTok.toDouble / (nSeqs * 64L)
    val naiveOcc = sumTok.toDouble / (400L * 64L)
    assert(bucketedOcc > naiveOcc * 1.5, s"bucketed=$bucketedOcc naive=$naiveOcc")
  }

  test("packNoSplit: matches a reference fold, never splits, oversize isolated, layout-independent") {
    def mix(id: Long) = java.lang.Math.floorMod(id * 2654435761L, 4294967296L)
    val sizes = (0L until 60L).map(i => i -> (5L + (i * 7) % 40)).toMap ++
      Map(7L -> 100L, 23L -> 90L) // two over-budget docs
    val docs = sizes.toSeq.map { case (i, n) => (i, n) }.toDF("doc_id", "n")
    val budget = 64L
    val got = Packing.packNoSplit(docs, "doc_id", col("n"), budget, shards = 2)
      .select($"doc_id", $"n_tokens", $"shard", $"seq", $"offset", $"oversize")
      .as[(Long, Long, Int, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // independent reference fold per shard
    val byShard = (0L until 60L).groupBy(i => (mix(i) % 2).toInt)
    byShard.foreach { case (sh, ids) =>
      var seq = 0L; var cum = 0L
      ids.sortBy(i => (mix(i), i)).foreach { id =>
        val n = sizes(id)
        if (cum > 0 && cum + n > budget) { seq += 1; cum = 0L }
        val r = got(id)
        assert(r._3 == sh && r._4 == seq && r._5 == cum,
          s"doc $id: got (${r._3},${r._4},${r._5}) want ($sh,$seq,$cum)")
        assert(r._6 == (n > budget))
        cum += n
      }
    }
    // no sequence exceeds budget unless it holds a single oversize doc
    val bySeq = got.values.groupBy(r => (r._3, r._4))
    bySeq.foreach { case (k, rows) =>
      val tot = rows.map(_._2).sum
      assert(tot <= budget || (rows.size == 1 && rows.head._6),
        s"seq $k holds $tot tokens across ${rows.size} docs")
    }
    // input layout must not matter
    val re = Packing.packNoSplit(docs.repartition(7), "doc_id", col("n"),
        budget, shards = 2)
      .select($"doc_id", $"seq", $"offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(re == got.values.map(r => (r._1, r._4, r._5)).toSet)
  }

  test("pack seed: epoch reshuffle is a fresh bijective order over the same corpus") {
    val docs = (0L until 40L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n")
    val e0 = Packing.pack(docs, "doc_id", col("n"), budget = 64L, shards = 2)
    val e0b = Packing.pack(docs, "doc_id", col("n"), budget = 64L, shards = 2, seed = 0L)
    assert(e0.collect().toSet == e0b.collect().toSet,
      "seed 0 must be bit-equal to the historical id*C formula")
    val e1 = Packing.pack(docs, "doc_id", col("n"), budget = 64L, shards = 2, seed = 1L)
    val ids0 = e0.select($"doc_id").as[Long].collect().toSet
    val ids1 = e1.select($"doc_id").as[Long].collect().toSet
    assert(ids0 == (0L until 40L).toSet && ids1 == ids0,
      "every doc packs exactly once per epoch")
    val p0 = e0.select($"doc_id", $"shard", $"chunk", $"offset").collect().toSet
    val p1 = e1.select($"doc_id", $"shard", $"chunk", $"offset").collect().toSet
    assert(p0 != p1, "a new seed must actually reshuffle placements")
    intercept[IllegalArgumentException] {
      Packing.pack(docs, "doc_id", col("n"), budget = 64L, shards = 2, seed = -1L)
    }
  }

  test("spanCorruption: sentinel reconstruction recovers the text; budget and span count exact") {
    val mk = (id: Long, n: Int) => (id, (0 until n).map(i => s"w$i").mkString(" "))
    val docs = Seq(mk(7L, 40), mk(8L, 10), mk(9L, 100), mk(11L, 9), mk(13L, 200))
      .toDF("doc_id", "text")
    val out = Packing.spanCorruption(docs)
      .select($"doc_id", $"n_tokens", $"n_spans", $"inputs", $"targets")
      .as[(Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap

    // short doc passes through unmasked
    assert(out(11L)._3 == 0L && out(11L)._5 == "")
    assert(out(11L)._4 == (0 until 9).map(i => s"w$i").mkString(" "))

    val sentinel = "<extra_id_(\\d+)>".r
    for ((id, n) <- Seq((7L, 40), (8L, 10), (9L, 100), (13L, 200))) {
      val (_, nTok, nSpans, inputs, targets) = out(id)
      val c = n * 150 / 1000
      val m = math.max(1, c / 3)
      assert(nTok == n && nSpans == m, s"doc $id: n_spans=$nSpans want $m")
      // targets: '<extra_id_k> span-tokens ...' closed by the final sentinel
      val marks = sentinel.findAllMatchIn(targets).map(_.group(1).toInt).toSeq
      assert(marks == (0 to m), s"doc $id target sentinels: $marks")
      val spanToks = targets.split("<extra_id_\\d+>", -1).map(_.trim.split("\\s+").toSeq
        .filter(_.nonEmpty)).toSeq.drop(1) // leading empty before <extra_id_0>
      assert(spanToks.length == m + 1 && spanToks.last.isEmpty)
      val spans = spanToks.dropRight(1)
      assert(spans.map(_.length).sum == c, s"doc $id masks ${spans.map(_.length).sum} of $c")
      // splice span k back over its sentinel — must recover the original
      val rebuilt = inputs.split(" ").toSeq.flatMap {
        case s if s.startsWith("<extra_id_") =>
          spans(sentinel.findFirstMatchIn(s).get.group(1).toInt)
        case t => Seq(t)
      }
      assert(rebuilt == (0 until n).map(i => s"w$i"),
        s"doc $id reconstruction mismatch")
      // spans are non-overlapping and ordered: the sentinels appear in
      // k order inside inputs (segment confinement)
      val inOrder = sentinel.findAllMatchIn(inputs).map(_.group(1).toInt).toSeq
      assert(inOrder == (0 until m), s"doc $id input sentinels: $inOrder")
    }
    intercept[IllegalArgumentException] {
      Packing.spanCorruption(docs, ratePermille = 600L)
    }
    intercept[IllegalArgumentException] {
      Packing.spanCorruption(docs, minTokens = 2L)
    }
  }
}
