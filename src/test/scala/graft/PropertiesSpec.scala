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
}
