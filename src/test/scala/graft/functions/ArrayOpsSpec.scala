package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** F5/F7/F8/A1/C3/C8 array kernels (ref utils.py:105-124, 273-309;
  * validate.py:25-37, 72-102).
  */
class ArrayOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("maskNaN: NaN -> NULL, length preserved (F5)") {
    val out = Seq(Seq(1.0, Double.NaN, 3.0)).toDF("DATA")
      .select(ArrayOps.maskNaN($"DATA")).as[Seq[Option[Double]]].head()
    assert(out == Seq(Some(1.0), None, Some(3.0)))
  }

  test("arraySum skips NULLs like numpy masked sums (A1)") {
    val s = Seq(Seq(1.0, Double.NaN, 3.0)).toDF("DATA")
      .select(ArrayOps.arraySum(ArrayOps.maskNaN($"DATA"))).as[Double].head()
    assert(s == 4.0)
  }

  test("arrayMean averages over non-null elements only") {
    val m = Seq(Seq(2.0, Double.NaN, 4.0)).toDF("DATA")
      .select(ArrayOps.arrayMean(ArrayOps.maskNaN($"DATA"))).as[Double].head()
    assert(m == 3.0)
  }

  test("cropChannels is inclusive and 0-based (F8, ref validate.py:102)") {
    val out = Seq(Seq(10.0, 11.0, 12.0, 13.0, 14.0)).toDF("DATA")
      .select(ArrayOps.cropChannels($"DATA", 1, 3)).as[Seq[Double]].head()
    assert(out == Seq(11.0, 12.0, 13.0))
  }

  test("freqAxis is descending: channel 0 = highest frequency (C3)") {
    val ax = ArrayOps.freqAxis(1435.0, 1355.0, 5)
    assert(ax.toSeq == Seq(1435.0, 1415.0, 1395.0, 1375.0, 1355.0))
    assert(ArrayOps.freqAxis(9.0, 1.0, 1).toSeq == Seq(9.0))
  }

  test("keepIndices: exclusive bounds on both ends (F7, ref utils.py:255,291)") {
    val freqs = Array(5.0, 4.0, 3.0, 2.0, 1.0)
    // include (2,4) exclusive keeps only the value 3.0 (index 2)
    assert(ArrayOps.keepIndices(freqs, Seq((2.0, 4.0)), Nil).toSeq == Seq(2))
  }

  test("keepIndices: reversed (fmin,fmax) pairs are normalized (ref utils.py:290)") {
    val freqs = Array(5.0, 4.0, 3.0, 2.0, 1.0)
    assert(ArrayOps.keepIndices(freqs, Seq((4.0, 2.0)), Nil).toSeq == Seq(2))
    assert(ArrayOps.keepIndices(freqs, Nil, Seq((4.0, 2.0))).toSeq == Seq(0, 1, 3, 4))
  }

  test("keepIndices: include ranges OR, exclude ranges subtract") {
    val freqs = Array(5.0, 4.0, 3.0, 2.0, 1.0)
    val kept = ArrayOps.keepIndices(freqs, Seq((0.5, 2.5), (3.5, 5.5)), Seq((4.5, 5.5)))
    assert(kept.toSeq == Seq(1, 3, 4)) // 4.0, 2.0, 1.0; 5.0 excluded, 3.0 in no include range
  }

  test("pickChannels projects kept channels per row (F7)") {
    val out = Seq(Seq(9.0, 8.0, 7.0, 6.0)).toDF("DATA")
      .select(ArrayOps.pickChannels($"DATA", Array(0, 2))).as[Seq[Double]].head()
    assert(out == Seq(9.0, 7.0))
  }

  test("vecDiff / vecDivide are element-wise (A10/C8)") {
    val (d, q) = Seq((Seq(4.0, 9.0), Seq(1.0, 3.0))).toDF("a", "b")
      .select(ArrayOps.vecDiff($"a", $"b"), ArrayOps.vecDivide($"a", $"b"))
      .as[(Seq[Double], Seq[Double])].head()
    assert(d == Seq(3.0, 6.0) && q == Seq(4.0, 3.0))
  }

  test("dot / cosine on known vectors") {
    val (dt, cs) = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
      .select(ArrayOps.dot($"a", $"b"), ArrayOps.cosine($"a", $"b"))
      .as[(Double, Double)].head()
    assert(dt == 2.0)
    assert(math.abs(cs - 2.0 / (3.0 * 2.0)) < 1e-12)
  }
}
