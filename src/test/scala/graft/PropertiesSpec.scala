package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.CalibrationScan
import graft.ops.CalibrationScan.Flags
import graft.functions.ArrayOps

/** Property-based checks (SURVEY §5.2.3): invariants that must hold for
  * ALL inputs, not just the crafted fixtures.
  */
class PropertiesSpec extends SparkTestBase {

  /** Deterministic sampling loop (scalatestplus isn't in the offline cache;
    * raw ScalaCheck generators driven by a fixed seed are equivalent here).
    */
  private def forAllSampled[A](g: Gen[A], n: Int = 30)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }
  import spark.implicits._

  private val flagsGen: Gen[IndexedSeq[Flags]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      cal <- Gen.oneOf(0, 1)
      swp <- Gen.oneOf(0, 1)
      mode <- Gen.oneOf("onoff:on", "onoff:off", "track")
    } yield Flags(cal, swp, mode))
  } yield rows.toIndexedSeq

  test("ST1 scan: total on arbitrary flag sequences, indices in range, ordered") {
    forAllSampled(Gen.zip(flagsGen, Gen.choose(1L, 8L))) { case (rows, cc) =>
      val idx = CalibrationScan.scan(rows, cc, "onoff")
      assert(idx.postCalStart >= 0 && idx.postCalStart < rows.length)
      idx.dataStart.foreach { d =>
        assert(d >= 0 && d < rows.length)
        assert(d <= idx.postCalStart, "data must start at or before post-cal")
      }
      idx.offStart.foreach { o =>
        assert(rows(o).obsmode.contains("onoff:off"))
        assert(!rows.take(o).exists(_.obsmode.contains("onoff:off")))
      }
    }
  }

  test("A2 vector sum == column-wise transpose sum for ragged random rows") {
    val rowsGen = Gen.listOfN(6,
      Gen.choose(0, 5).flatMap(len => Gen.listOfN(len, Gen.choose(-100, 100).map(_.toDouble))))
    forAllSampled(rowsGen, n = 8) { rows =>
      if (rows.nonEmpty) {
        val got = graft.ops.Integration.spectrum(rows.map(_.toSeq).toDF("DATA"))
          .as[Seq[Double]].head()
        val width = rows.map(_.length).max
        val expected = (0 until width).map(i => rows.flatMap(_.lift(i)).sum)
        assert(got == expected)
      }
    }
  }

  test("F6 time predicate == per-row manual evaluation") {
    val rangesGen = Gen.listOfN(2, Gen.choose(-50.0, 50.0).flatMap(a =>
      Gen.choose(0.0, 40.0).map(w => (a, a + w))))
    forAllSampled(Gen.zip(Gen.listOfN(20, Gen.choose(-60.0, 60.0)), rangesGen, rangesGen), n = 8) { case (ts, inc, exc) =>
      val got = ts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "t")
        .filter(graft.ops.RangeFilters.timeRangePredicate(
          org.apache.spark.sql.functions.col("t"), inc, exc))
        .select($"i").as[Int].collect().toSet
      val expected = ts.zipWithIndex.collect { case (t, i)
        if (inc.isEmpty || inc.exists(r => t > r._1 && t < r._2)) &&
           !exc.exists(r => t > r._1 && t < r._2) => i }.toSet
      assert(got == expected)
    }
  }

  test("F7 keepIndices == manual mask for arbitrary ranges (reversed pairs included)") {
    val pairGen = Gen.zip(Gen.choose(-10.0, 10.0), Gen.choose(-10.0, 10.0))
    forAllSampled(Gen.zip(Gen.listOfN(12, Gen.choose(-10.0, 10.0)),
        Gen.listOfN(2, pairGen), Gen.listOfN(2, pairGen))) { case (freqs, inc, exc) =>
      val f = freqs.toArray
      val got = ArrayOps.keepIndices(f, inc, exc).toSet
      def in(v: Double, r: (Double, Double)) = {
        val lo = math.min(r._1, r._2); val hi = math.max(r._1, r._2)
        v > lo && v < hi
      }
      val expected = f.indices.filter { i =>
        (inc.isEmpty || inc.exists(in(f(i), _))) && !exc.exists(in(f(i), _))
      }.toSet
      assert(got == expected)
    }
  }

  test("fingerprint == local rolling-hash reimplementation for random ASCII text") {
    forAllSampled(Gen.listOfN(40, Gen.choose(32.toChar, 126.toChar)).map(_.mkString), n = 10) { text =>
      val got = Seq(text).toDF("text")
        .select(graft.llm.TextAnalysis.fingerprint($"text")).as[Long].head()
      val expected = text.foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
      assert(got == expected)
    }
  }

  test("packing invariants for random corpora: offsets bounded, streams contiguous") {
    import org.apache.spark.sql.functions.col
    val corpusGen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, Gen.choose(1L, 700L))
    } yield rows.zipWithIndex.map { case (tok, i) => (i.toLong, tok) }
    forAllSampled(Gen.zip(corpusGen, Gen.choose(1, 4)), n = 8) { case (rows, shards) =>
      val df = rows.toDF("doc_id", "n")
      val out = graft.llm.Packing.pack(df, "doc_id", col("n"), budget = 512L, shards = shards)
        .as[(Long, Long, Int, Long, Long, Boolean)].collect()
      assert(out.length == rows.length)
      out.foreach { case (_, n, shard, chunk, off, spans) =>
        assert(shard >= 0 && shard < shards)
        assert(off >= 0 && off < 512, "a doc starts strictly inside its chunk")
        assert(chunk >= 0)
        assert(spans == (off + n > 512))
      }
      // per shard: placements are exactly the running concatenation — the
      // sorted (chunk*512+offset) positions advance by each doc's tokens
      out.groupBy(_._3).foreach { case (_, docs) =>
        val byPos = docs.sortBy(d => d._4 * 512 + d._5)
        var pre = 0L
        byPos.foreach { case (_, n, _, chunk, off, _) =>
          assert(chunk * 512 + off == pre, "stream must be gap-free")
          pre += n
        }
      }
    }
  }

  test("wav codec: random PCM16 parameters round-trip through synth→decode") {
    import graft.llm.Multimodal
    forAllSampled(Gen.zip(Gen.choose(0L, 1L << 40), Gen.choose(1, 300),
        Gen.oneOf(8000, 16000, 44100), Gen.choose(1, 4)), n = 12) {
      case (id, frames, rate, ch) =>
        val wav = Multimodal.syntheticWav(id, frames, rate, ch)
        val f = Multimodal.decodeWav(wav).get
        assert(f.channels == ch && f.sample_rate == rate && f.n_frames == frames.toLong)
        assert(f.duration_micros == frames.toLong * 1000000L / rate)
        val samples = for (i <- 0 until frames; c <- 0 until ch)
          yield math.abs(((id * 31 + i.toLong * 7 + c * 13) % 2003 - 1001).toInt)
        assert(f.abs_sum == samples.map(_.toLong).sum && f.peak == samples.max)
        // the JDK's own WAV reader agrees on the container fields
        val jdk = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(wav))
        assert(jdk.getFrameLength == frames && jdk.getFormat.getChannels == ch)
    }
  }

  test("decontamination == exact shared-8-gram semantics for random corpora") {
    import graft.llm.Decontamination
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta") // tiny vocab → real collisions of grams
    val docGen = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAllSampled(Gen.listOfN(8, docGen), n = 6) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val corpus = rows.toDF("doc_id", "text")
      val benchmark = corpus.filter($"doc_id" % 3 === 0)
      def grams(t: String): Set[String] = {
        val w = t.trim.split("\\s+")
        if (w.length < 8) Set.empty
        else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
      }
      val benchGrams = rows.filter(_._1 % 3 == 0).flatMap(r => grams(r._2)).toSet
      val expectBad = rows.filter(r => grams(r._2).exists(benchGrams)).map(_._1).toSet
      val gotBad = Decontamination.contaminatedIds(corpus, benchmark)
        .as[Long].collect().toSet
      assert(gotBad == expectBad, s"texts=$texts")
      val kept = Decontamination.decontaminate(corpus, benchmark)
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == rows.map(_._1).toSet -- expectBad)
    }
  }

  test("weighted token-budget sampling == local gate reimplementation") {
    import org.apache.spark.sql.functions.col
    import graft.ops.Sampling
    val rowGen = Gen.zip(Gen.choose(0L, 100000L), Gen.oneOf("a", "b"), Gen.choose(1L, 500L))
    forAllSampled(Gen.zip(Gen.listOfN(30, rowGen), Gen.choose(0L, 20000L)), n = 6) {
      case (rowsDup, budgetA) =>
        val rows = rowsDup.distinctBy(_._1)
        val df = rows.toDF("id", "src", "nt")
        val budgets = Map("a" -> budgetA, "b" -> 1000000L) // b under budget → all kept
        val kept = Sampling.weightedByTokenBudget(df, "src", col("id"), col("nt"), budgets)
          .select($"id").as[Long].collect().toSet
        val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        def mix(k: Long) = java.lang.Math.floorMod(k * 2654435761L, 4294967296L)
        val expect = rows.filter { case (id, s, _) =>
          BigInt(mix(id)) * totals(s) < BigInt(budgets(s)) * 4294967296L
        }.map(_._1).toSet
        assert(kept == expect)
        assert(rows.filter(_._2 == "b").map(_._1).toSet.subsetOf(kept),
          "under-budget source passes whole")
    }
  }

  test("sdfits codec: random tables round-trip bit-exactly through write→open→decode") {
    import graft.sources.sdfits.SdfitsFormat
    import graft.sources.sdfits.SdfitsFormat.ColSpec
    val rowGen = for {
      d <- Gen.choose(-1e12, 1e12)
      l <- Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)
      i <- Gen.choose(Int.MinValue / 2, Int.MaxValue / 2)
      s <- Gen.listOfN(6, Gen.choose(33.toChar, 126.toChar)).map(_.mkString) // no spaces: trailing blanks are insignificant in FITS
      v <- Gen.listOfN(3, Gen.choose(-1e6, 1e6))
    } yield Seq[Any](d, l, i, s, v.toArray)
    val cols = Seq(ColSpec("D1", 1, 'D'), ColSpec("K1", 1, 'K'),
      ColSpec("J1", 1, 'J'), ColSpec("S1", 8, 'A'), ColSpec("V1", 3, 'D'))
    forAllSampled(Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, rowGen)), n = 8) { rows =>
      val bos = new java.io.ByteArrayOutputStream()
      SdfitsFormat.write(bos, Seq("OBSFREQ" -> "1.0"),
        Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "x"),
        Nil, cols, rows.iterator, rows.length)
      val bytes = bos.toByteArray
      assert(bytes.length % SdfitsFormat.BLOCK == 0)
      val (_, table) = SdfitsFormat.open(bytes)
      assert(table.nRows == rows.length)
      val offs = table.cols.scanLeft(0)(_ + _.bytes)
      rows.zipWithIndex.foreach { case (expected, r) =>
        table.cols.zipWithIndex.foreach { case (c, ci) =>
          val got = SdfitsFormat.decodeCell(bytes, table, r, c, offs(ci))
          (got, expected(ci)) match {
            case (g: Array[Double], e: Array[Double]) => assert(g.sameElements(e))
            case (g, e) => assert(g == e, s"row $r col ${c.name}")
          }
        }
      }
    }
  }

  // ---- unigram-LM tokenizer invariants (random piece tables + words) ----

  private val unigramGen: Gen[(Seq[(String, Double)], String)] = for {
    // random multi-char pieces over a 4-letter alphabet + all singles
    nMulti <- Gen.choose(0, 8)
    multis <- Gen.listOfN(nMulti, for {
      len <- Gen.choose(2, 4)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString)
    lps <- Gen.listOfN(nMulti + 4, Gen.choose(-8.0, -0.5))
    wordLen <- Gen.choose(0, 12)
    // the word may contain 'e' — OOV relative to the table
    word <- Gen.listOfN(wordLen, Gen.oneOf('a', 'b', 'c', 'd', 'e'))
  } yield {
    val pieces = (Seq("a", "b", "c", "d") ++ multis.distinct)
      .zip(lps).map { case (p, lp) => p -> lp }
    (pieces, word.mkString)
  }

  test("unigram viterbi/sampling: segmentations always reconstruct the word; sampling is seed-stable") {
    import graft.functions.UnigramImpl
    forAllSampled(unigramGen, n = 60) { case (pieces, word) =>
      val t = UnigramImpl.tableOf(pieces)
      val vit = UnigramImpl.viterbi(word, t)
      assert(vit.mkString == word, s"viterbi on '$word': ${vit.toSeq}")
      // every emitted multi-char piece is in-vocabulary (OOV only singles)
      vit.filter(_.length > 1).foreach(p =>
        assert(pieces.exists(_._1 == p), s"viterbi OOV multi '$p'"))
      Seq(0.0, 0.7, 5.0).foreach { alpha =>
        val s1 = UnigramImpl.sampleSeg(word, t, alpha, 7L)
        val s2 = UnigramImpl.sampleSeg(word, t, alpha, 7L)
        assert(s1.toSeq == s2.toSeq, "seed determinism")
        assert(s1.mkString == word, s"sample on '$word': ${s1.toSeq}")
        s1.filter(_.length > 1).foreach(p =>
          assert(pieces.exists(_._1 == p), s"sample OOV multi '$p'"))
      }
      // expected counts: the per-word gamma mass equals the expected
      // segment count, which is bounded by [1, |word|] for non-empty words
      if (word.nonEmpty && word.forall(ch => ch != 'e')) {
        val g = UnigramImpl.expectedCounts(word, t)
        val mass = g.map(_._2).sum
        assert(mass >= 1.0 - 1e-9 && mass <= word.length + 1e-9,
          s"gamma mass $mass for '$word'")
      }
    }
  }

  /** Random corpora: skewed domain draws (one domain soaks up most rows
    * — the exact shape budgetSelectDist exists for), zero-token docs,
    * heavy priority ties (broken by unique id), random allocations
    * including 0 and over-inventory. The dist form must equal the
    * windowed form ROW FOR ROW (ids AND cum_tokens) at every partition
    * count — the selection is a pure function of the total order.
    */
  private val mixCorpusGen: Gen[(Seq[(String, Long, Long, Long)], Seq[(String, Long)])] =
    for {
      n <- Gen.choose(30, 250)
      nDoms <- Gen.choose(1, 4)
      rows <- Gen.listOfN(n, for {
        dpick <- Gen.frequency((6, 0), (2, 1), (1, 2), (1, 3))
        prio <- Gen.choose(0L, 5L) // heavy ties
        toks <- Gen.frequency((1, Gen.const(0L)), (5, Gen.choose(1L, 40L)))
      } yield (s"d${dpick % nDoms}", prio, toks))
      allocs <- Gen.listOfN(nDoms, Gen.choose(0L, 900L))
    } yield (
      rows.zipWithIndex.map { case ((d, p, t), i) => (d, i.toLong, p, t) },
      allocs.zipWithIndex.map { case (a, i) => (s"d$i", a) })

  test("budgetSelectDist == windowed budgetSelect on random skewed corpora") {
    import graft.llm.MixPlanner
    forAllSampled(mixCorpusGen, n = 12) { case (rows, allocs) =>
      val docs = rows.toDF("domain", "id", "priority", "tokens")
      val alloc = allocs.toDF("domain", "alloc_tokens")
      val expect = MixPlanner.budgetSelect(docs, "domain", "id", "tokens",
          "priority", alloc)
        .select("domain", "id", "cum_tokens")
        .as[(String, Long, Long)].collect().toSet
      for (p <- Seq(2, 5, 17)) {
        val got = MixPlanner.budgetSelectDist(docs, "domain", "id", "tokens",
            "priority", alloc, partitions = p)
          .select("domain", "id", "cum_tokens")
          .as[(String, Long, Long)].collect().toSet
        assert(got == expect,
          s"p=$p diff: missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
      }
    }
  }
}
