package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Dedup family: exact, MinHash-LSH, SimHash banding (incl. the round-2
  * recall-bug regression), n-gram Jaccard.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away home")   // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups by content hash and keeps the lowest id") {
    val g = Dedup.exactGroups(docs).as[(String, Long, Long)].collect()
    assert(g.length == 3)
    assert(g.find(_._3 == 2).exists(_._2 == 1L)) // the duplicated text keeps id 1
    val kept = Dedup.exactDedup(docs).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("minhash signature HOF form and aggregated form agree") {
    val hof = docs.select($"doc_id", Dedup.minhashSignature($"text").as("sig"))
      .as[(Long, Seq[Int])].collect().toMap
    val agg = Dedup.minhashSignatures(docs).as[(Long, Seq[Int])].collect().toMap
    assert(hof == agg)
  }

  test("minhash-LSH finds the near-dup pair and not the unrelated doc") {
    val cand = Dedup.minhashCandidates(docs)
      .as[(Long, Long, Double)].collect()
    val pairs = cand.map(c => (c._1, c._2)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    val est = cand.find(c => (c._1, c._2) == (1L, 4L)).get._3
    assert(est == 1.0) // identical docs: all 64 slots agree
  }

  test("simhash signature HOF form and aggregated form agree") {
    val hof = docs.select($"doc_id", Dedup.simhash64($"text").as("sim"))
      .as[(Long, Long)].collect().toMap
    val agg = Dedup.simhashSignatures(docs).as[(Long, Long)].collect().toMap
    assert(hof == agg)
  }

  test("simhash banding finds pairs whose differing bits span bands (round-2 recall bug)") {
    // One-word difference → small hamming distance, bits can fall anywhere in
    // the 64; 4x16 banding must still emit the candidate (pigeonhole for h<=3,
    // high probability for h<=8; the planted pair is checked explicitly).
    val sims = Dedup.simhashSignatures(docs).as[(Long, Long)].collect().toMap
    val h12 = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    val cand = Dedup.simhashCandidates(docs, maxHamming = math.max(8, h12))
      .as[(Long, Long, Int)].collect()
    val pairs = cand.map(c => (c._1, c._2)).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: hamming 0
    assert(pairs.contains((1L, 2L)), s"hamming-$h12 near-dup pair must be a candidate")
    assert(cand.find(c => (c._1, c._2) == (1L, 4L)).get._3 == 0)
  }

  test("n-gram Jaccard with blocking emits only above-threshold pairs") {
    val out = Dedup.ngramJaccardPairs(docs, substring($"text", 1, 10), n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val m = out.map(c => ((c._1, c._2), c._3)).toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m.contains((1L, 2L)) && m((1L, 2L)) > 0.5 && m((1L, 2L)) < 1.0)
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("requireBoundedDocs: threads the frame through under the cap, refuses loudly past it") {
    // Under the cap: identical pairs as the unguarded call.
    val out = Dedup.ngramJaccardFromGrams(
      Dedup.preparedNgrams(
        Dedup.requireBoundedDocs(docs, maxDocs = 10L, scalePath = "MinHash/LSH"),
        substring($"text", 1, 10), n = 3),
      threshold = 0.5).as[(Long, Long, Double)].collect()
    assert(out.map(c => (c._1, c._2)).toSet == Set((1L, 4L), (1L, 2L), (2L, 4L)))
    // Past the cap: the quadratic baseline must refuse, not plan
    // (VERDICT r13 item 1 — the scale path is MinHash/LSH).
    val ex = intercept[IllegalArgumentException] {
      Dedup.requireBoundedDocs(docs, maxDocs = 3L, scalePath = "MinHash/LSH")
    }
    assert(ex.getMessage.contains("refused"))
    assert(ex.getMessage.contains("MinHash/LSH"))
  }

  test("connected components: chains collapse to min id, isolated docs survive keep-rows") {
    // Chain 1-2, 2-5 plus pair 7-9: components {1,2,5}->1 and {7,9}->7.
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.nearDupComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L))

    // Keep-rows: representatives (1, 7) and the pairless doc 3 survive.
    val corpus = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val kept = Dedup.nearDupKeepRows(corpus, pairs).as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 7L))
  }

  test("connected components: long chain converges within iteration bound") {
    // Path 10-11-12-...-20 (diameter 10): all labels must reach 10.
    val pairs = (10L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.nearDupComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(10L))
    assert(comps.keySet == (10L to 20L).toSet)
  }

  test("salted banding: identical candidates on an adversarial hot bucket, bounded task skew") {
    // Adversarial corpus (VERDICT r6 item 5): 60 of 75 docs share ONE
    // signature, so every band bucket holds >50% of the corpus — the
    // degenerate-gram case that funnels K^2 pairs through one task in the
    // plain band self-join.
    val hot = (0 until 64).map(_ * 7)
    val sigs = ((0L until 60L).map(i => (i, hot)) ++
      (60L until 75L).map(i => (i, (0 until 64).map(j => (i * 997 + j * 31).toInt))))
      .toDF("id", "sig")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().toSet
    val base = canon(Dedup.minhashCandidatesFromSigs(sigs))
    val salted = canon(Dedup.minhashCandidatesFromSigsSalted(sigs, chunks = 4))
    assert(salted == base, "salted banding must produce the identical candidate set")
    assert(base.count { case (a, b, est) => a < 60 && b < 60 && est == 1.0 } == 60 * 59 / 2)
    // Bounded skew: the hot bucket's 60 rows split across 4 hash chunks;
    // each join group pairs one chunk against one chunk, so the largest
    // group is maxChunk^2 pairs versus the unsalted 60^2 — assert the
    // chunk assignment the operator uses actually bounds it.
    val chunkSizes = sigs.filter($"id" < 60)
      .select(pmod(hash($"id"), lit(4)).as("c"))
      .groupBy($"c").count().as[(Int, Long)].collect().map(_._2)
    assert(chunkSizes.length == 4, "hot docs must spread over all 4 chunks")
    val maxChunk = chunkSizes.max
    assert(maxChunk * maxChunk <= 30L * 60L,
      s"largest salted join group ($maxChunk^2) must be well under the unsalted 60^2")
  }

  test("incremental exact dedup: catalog hits and within-batch copies drop, new content survives") {
    val prior = Seq(
      (1L, "already ingested page one"),
      (2L, "already ingested page two")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a genuinely new page"),
      (11L, "already ingested page two"), // catalog hit → drop
      (12L, "another new page"),
      (13L, "another new page"),          // within-batch dup → drop
      (14L, "a genuinely new page")       // within-batch dup of 10 → drop
    ).toDF("doc_id", "text")
    val kept = Dedup.exactDedupIncremental(batch, Dedup.hashCatalog(prior))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L))
  }

  test("incremental exact dedup: an empty catalog reduces to plain exact dedup") {
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val empty = Dedup.hashCatalog(batch.filter(col("doc_id") < 0))
    val kept = Dedup.exactDedupIncremental(batch, empty)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("incremental minhash dedup: near-dups of catalog docs drop, distinct content survives") {
    val prior = docs.filter(col("doc_id") === 1 || col("doc_id") === 3)
      .select(col("doc_id"), col("text"))
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs far away house"), // near-dup of 1
      (11L, "entirely unrelated text on gzip member chains and warc parsing today")
    ).toDF("doc_id", "text")
    val batchSigs = Dedup.minhashSignatures(batch)
    val catSigs = Dedup.minhashSignatures(prior)
    val kept = Dedup.minhashDedupIncremental(batch, batchSigs, catSigs, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    val cands = Dedup.minhashIncrementalCandidates(batchSigs, catSigs)
      .filter(col("est_jaccard") >= 0.5)
      .select("id_batch", "id_catalog").as[(Long, Long)].collect().toSet
    assert(cands === Set((10L, 1L)))
  }

  test("overlap matrix counts shared contents per source pair, omits empty pairs") {
    val df = Seq(
      ("web", "alpha"), ("web", "beta"), ("web", "gamma"),
      ("books", "alpha"), ("books", "delta"),
      ("eval", "alpha"), ("eval", "beta"),
      ("clean", "epsilon"),
      ("web", "alpha") // duplicate within a source counts once
    ).toDF("source", "text")
    val m = Dedup.overlapMatrix(df)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m === Map(
      ("books", "web") -> 1L,   // alpha
      ("books", "eval") -> 1L,  // alpha
      ("eval", "web") -> 2L))   // alpha, beta — and no row for 'clean'
  }

  test("nearDupKeepBest: score argmax wins per cluster, min-id breaks ties") {
    val docs5 = Seq(
      (1L, 10L), (2L, 90L), (3L, 90L),  // cluster {1,2,3}: best = 2 (score tie → lower id)
      (4L, 5L), (5L, 99L))              // singletons survive
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.nearDupKeepBest(docs5, pairs, "quality")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L))
  }

  test("homoglyph skeleton folds confusables; dedup collapses mutants") {
    val skel = Seq(
      "paypal",
      "pаypаl",          // Cyrillic а
      "PayPal",
      "pa​ypal",              // zero-width space
      "αpple",                // Greek α
      "genuinely different",
      "PАYPАL",          // UPPERCASE Cyrillic А — must lowercase BEFORE
      "ΑΟΝΕΙΚΡΤΥΧ")      // the translate fold, or the table misses these
      .toDF("t").select(Dedup.homoglyphSkeleton($"t")).as[String].collect()
    assert(skel.take(4).toSet == Set("paypal"))
    assert(skel(4) == "apple")
    assert(skel(5) == "genuinely different")
    assert(skel(6) == "paypal", s"uppercase Cyrillic mutant: ${skel(6)}")
    assert(skel(7) == "aoveikptyx", s"uppercase Greek row: ${skel(7)}")

    val docs2 = Seq(
      (1L, "buy cheap watches today"),
      (2L, "buy cheаp wаtches todаy"), // homoglyph clone of 1
      (3L, "completely original text"))
      .toDF("doc_id", "text")
    val kept = Dedup.homoglyphDedup(docs2)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("star components == label propagation on random graphs and a 64-chain") {
    // Deterministic pseudo-random graphs: edges (x % n, (x*x + 7) % n).
    def randomPairs(n: Int, nEdges: Int, seed: Long): Seq[(Long, Long)] =
      (1 to nEdges).flatMap { k =>
        val x = (seed * 6364136223846793005L + k * 1442695040888963407L) >>> 17
        val a = (x % n).toLong; val b = ((x / n) % n).toLong
        if (a == b) None else Some((a, b))
      }
    val cases = Seq(
      randomPairs(30, 25, 1L), randomPairs(50, 20, 2L), randomPairs(40, 60, 3L),
      (0L until 63L).map(i => (i, i + 1))) // 64-chain: diameter 63
    cases.zipWithIndex.foreach { case (ps, ci) =>
      val pairs = ps.toDF("id_a", "id_b")
      val viaProp = Dedup.nearDupComponents(pairs, maxIter = 100)
        .as[(Long, Long)].collect().toMap
      val viaStar = Dedup.nearDupComponentsStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(viaStar == viaProp, s"case $ci")
    }
  }

  test("softDedupWeights: cluster mass sums to ~one doc, singletons keep 1e6") {
    val docs5 = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.softDedupWeights(docs5, pairs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id) == ((id, 1L, 3L, 333333L)), s"doc $id")
    }
    Seq(4L, 5L).foreach { id =>
      assert(got(id) == ((id, id, 1L, 1000000L)), s"doc $id")
    }
  }

  test("leakproofSplit: every cluster member shares its representative's coin") {
    def pfp(s: String): Long = s.foldLeft(0L)((x, c) => (x * 131 + c) % 1000000007L)
    val docs6 = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.leakproofSplit(docs6, pairs, holdoutPermille = 500L)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def expSplit(comp: Long) =
      if (pfp(s"$comp:split") % 1000 < 500) "holdout" else "train"
    Seq(1L, 2L, 3L).foreach(id => assert(got(id) == ((id, 1L, expSplit(1L)))))
    Seq(10L, 11L).foreach(id => assert(got(id) == ((id, 10L, expSplit(10L)))))
    assert(got(20L) == ((20L, 20L, expSplit(20L))))
    // the leakage property itself: no component spans splits
    val byComp = got.values.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    byComp.foreach { case (c, splits) => assert(splits.size == 1, s"comp $c leaks") }
  }

  test("winnowFingerprints: matches a sequential reference, incl. rightmost ties") {
    def pfp(s: String): Long = s.foldLeft(0L)((a, c) => (a * 131 + c) % 1000000007L)
    def ref(text: String, n: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.trim.split("\\s+").toSeq
      if (toks.length < n) return Set.empty
      val fps = toks.sliding(n).map(g => pfp(g.mkString(" "))).toArray
      if (fps.length < w) Set.empty
      else (0 to fps.length - w).map { j =>
        val win = j until j + w
        val minv = win.map(fps).min
        val p = win.filter(i => fps(i) == minv).max
        (p.toLong, fps(p))
      }.toSet
    }
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "spam spam spam spam spam spam spam spam"), // all-tie stream
      (3L, "a b c d e f g h i j"),
      (4L, "x y"),            // fewer grams than the window
      (5L, "one two three"))  // exactly one gram at n=3 → none at w=4
    val got = Dedup.winnowFingerprints(texts.toDF("doc_id", "text"), n = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(r => (r._2, r._3)).toSet }
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == ref(t, 3, 4), s"doc $id")
    }
  }

  test("winnowIncrementalCandidates: batch joins the stored catalog only") {
    val catalog = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "completely unrelated catalog content with distinct words"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "re crawl alpha beta gamma delta epsilon zeta eta theta iota kappa tail"),
      (11L, "wholly novel batch document sharing no grams at all"))
      .toDF("doc_id", "text")
    val catFps = Dedup.winnowFingerprints(catalog, n = 3, w = 4)
    val batFps = Dedup.winnowFingerprints(batch, n = 3, w = 4)
    val pairs = Dedup.winnowIncrementalCandidates(batFps, catFps, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((10L, 1L)))
  }

  test("winnowCandidates maxDf: hot fingerprints leave the posting list, rare pairs survive") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val hot = "common boiler plate phrase every document carries along here"
    // docs 1,2 share the RARE run; all four share the HOT run.
    val docs = Seq(
      (1L, s"intro words $shared first tail $hot"),
      (2L, s"other opening $shared second tail $hot"),
      (3L, s"unrelated body one with nothing shared rarely $hot"),
      (4L, s"unrelated body two quite different content too $hot"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, n = 3, w = 4)
    // cap df at 2: the hot-phrase fingerprints (df=4) drop, so 3-4 stop
    // being candidates; 1-2 survive on their rare shared run.
    val capped = Dedup.winnowCandidates(fps, minShared = 1L, maxDf = Some(2L))
      .as[(Long, Long, Long)].collect().toSeq
    assert(capped.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // uncapped, the hot run makes every pair a candidate
    val uncapped = Dedup.winnowCandidates(fps, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(uncapped.map(p => (p._1, p._2)).toSet ==
      (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet)
  }

  test("winnowCandidates: shared long run guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"intro words here $shared closing remark"),
      (2L, s"different opening $shared and another tail entirely"),
      (3L, "completely unrelated content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, n = 3, w = 4)
    val pairs = Dedup.winnowCandidates(fps, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(pairs.head._3 >= 1L)
  }

  test("rouge2Gate: near-copies rejected, partial rewrites and novel admitted") {
    val pool = Seq(
      (1L, "write a poem about the sea"),   // 5 distinct bigrams
      (2L, "sort a list in python"))        // 4 distinct bigrams
      .toDF("doc_id", "text")
    val cands = Seq(
      (10L, "write a poem about the sea please"), // 6 bigrams, ∩ pool1 = 5
      (11L, "explain quantum physics"),           // shares nothing
      (12L, "sort a list"))                       // 2 bigrams, ∩ pool2 = 2
      .toDF("doc_id", "text")
    val got = Dedup.rouge2Gate(pool, cands, thrMicro = 700000L)
      .as[(Long, java.lang.Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // f1(10,1) = 2·5·10⁶ div 11 = 909090 ≥ thr → rejected
    assert(got(10L) == ((10L, java.lang.Long.valueOf(1L), 909090L, false)))
    // no shared gram → f1 0, null best, admitted
    assert(got(11L) == ((11L, null, 0L, true)))
    // f1(12,2) = 2·2·10⁶ div 6 = 666666 < thr → admitted
    assert(got(12L) == ((12L, java.lang.Long.valueOf(2L), 666666L, true)))
  }

  test("rouge2Gate: argmax match ties break to the lowest pool id") {
    val pool = Seq((7L, "a b c"), (3L, "a b c")).toDF("doc_id", "text")
    val cands = Seq((10L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.rouge2Gate(pool, cands, thrMicro = 500000L)
      .as[(Long, java.lang.Long, Long, Boolean)].collect().head
    assert(got == ((10L, java.lang.Long.valueOf(3L), 1000000L, false)))
  }

  test("rouge2Gate rejects a non-numeric id column loudly") {
    // The lowest-pool-id tie-break negates the id inside a max-struct —
    // a string id would silently null the argmax instead of failing.
    val pool = Seq(("a", "x y z")).toDF("doc_id", "text")
    val cands = Seq(("b", "x y z")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.rouge2Gate(pool, cands)
    }
    assert(ex.getMessage.contains("numeric"))
  }

  test("source-priority dedup: rank wins, then source, then id; guards fire") {
    val multi = Seq(
      (1L, "web", "shared text one"),
      (2L, "wiki", "shared text one"),    // wiki listed first => beats web
      (3L, "web", "shared text two"),
      (4L, "forum", "shared text two"),   // neither listed: 'forum' < 'web' tie-break
      (5L, "wiki", "unique text"),
      (6L, "wiki", "shared text three"),
      (7L, "wiki", "shared text three")   // same source: lower id wins
    ).toDF("doc_id", "source", "text")
    val w = Dedup.sourcePriorityWinners(multi, Seq("wiki", "books"))
      .select($"keep_id", $"keep_source", $"copies")
      .as[(Long, String, Long)].collect().toSet
    assert(w == Set((2L, "wiki", 2L), (4L, "forum", 2L), (5L, "wiki", 1L),
      (6L, "wiki", 2L)))
    val kept = Dedup.dedupBySourcePriority(multi, Seq("wiki", "books"))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L, 6L))
    // keep-rows form preserves every column of the winner row
    val row = Dedup.dedupBySourcePriority(multi, Seq("wiki", "books"))
      .filter($"doc_id" === 2L).select($"source", $"text")
      .as[(String, String)].head()
    assert(row == (("wiki", "shared text one")))
    intercept[IllegalArgumentException] {
      Dedup.sourcePriorityWinners(multi, Seq.empty)
    }
    val dup = intercept[IllegalArgumentException] {
      Dedup.sourcePriorityWinners(multi, Seq("wiki", "wiki"))
    }
    assert(dup.getMessage.contains("duplicate source"))
  }

  test("poly minhash signatures match an independent Scala computation") {
    val p = 1000000007L
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % p)
    def expectedSig(text: String): Seq[Long] = {
      val toks = text.trim.split("\\s+").toSeq
      val grams = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      (0 until 64).map(i => grams.map(g => ((2L * i + 1) * fp(g) + (31L * i + 7)) % p).min)
    }
    val got = Dedup.minhashSignaturesPoly(docs).as[(Long, Seq[Long])].collect().toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      val text = docs.filter($"doc_id" === id).select($"text").as[String].head()
      assert(got(id) == expectedSig(text), s"doc $id poly signature mismatch")
    }
  }
}
