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
}
