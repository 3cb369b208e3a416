package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.GainCal._

/** F3/A8/A9 (ref continuum.py:46-61, 111-138, 174-187) — including the
  * Python-truthiness and no-op drift-branch quirks of SURVEY §7.5.2.
  */
class GainCalSpec extends SparkTestBase {
  import spark.implicits._

  private def window(onY: Double, offY: Double, nEach: Int = 5) = {
    val rows = (0 until nEach).flatMap(i =>
      Seq((i.toDouble * 2, onY, 1, 0), (i.toDouble * 2 + 1, offY, 0, 0)))
    rows.toDF("t", "intensity", "CALSTATE", "SWPVALID")
  }

  test("calibrationHeight: flat levels give exact delta and zero sd (A8)") {
    val h = calibrationHeight(window(onY = 5.0, offY = 2.0))
    assert(h.contains(Height(3.0, 0.0)))
  }

  test("calibrationHeight: fewer than 4 points in either half -> None (ref continuum.py:137-138)") {
    assert(calibrationHeight(window(5.0, 2.0, nEach = 3)).isEmpty)
    // 5 on-points but only 3 off-points
    val lopsided = ((0 until 5).map(i => (i.toDouble, 5.0, 1, 0)) ++
      (0 until 3).map(i => (10.0 + i, 2.0, 0, 0))).toDF("t", "intensity", "CALSTATE", "SWPVALID")
    assert(calibrationHeight(lopsided).isEmpty)
  }

  test("diode split predicates (F3, ref continuum.py:46-61)") {
    val df = Seq((1, 0), (0, 0), (1, 1), (0, 1)).toDF("CALSTATE", "SWPVALID")
    assert(df.filter(diodeOn).count() == 1)
    assert(df.filter(diodeOff).count() == 1)
  }

  private val cont = Seq((0.0, 12.0), (10.0, 24.0)).toDF("t", "intensity")

  test("applyGain: z < 1.96 divides by the mean height (ref continuum.py:183)") {
    val out = applyGain(cont, Some(Height(2.0, 10.0)), Some(Height(4.0, 10.0)))
      .orderBy($"t").as[(Double, Double)].collect()
    assert(out.toSeq == Seq((0.0, 4.0), (10.0, 8.0))) // /3.0
  }

  test("applyGain: z >= 1.96 divides by the time-interpolated height (intended semantics)") {
    val out = applyGain(cont, Some(Height(2.0, 0.01)), Some(Height(4.0, 0.01)))
      .orderBy($"t").as[(Double, Double)].collect()
    // h(0)=2, h(10)=4
    assert(out.toSeq == Seq((0.0, 6.0), (10.0, 6.0)))
  }

  test("applyGain strictCompat reproduces the reference's no-op drift branch (ref continuum.py:178-181)") {
    val out = applyGain(cont, Some(Height(2.0, 0.01)), Some(Height(4.0, 0.01)), strictCompat = true)
      .orderBy($"t").as[(Double, Double)].collect()
    assert(out.toSeq == Seq((0.0, 12.0), (10.0, 24.0)))
  }

  test("applyGain: only one height present divides by it (ref continuum.py:184-187)") {
    val pre = applyGain(cont, Some(Height(2.0, 0.1)), None)
      .orderBy($"t").as[(Double, Double)].collect()
    assert(pre.toSeq == Seq((0.0, 6.0), (10.0, 12.0)))
    val post = applyGain(cont, None, Some(Height(4.0, 0.1)))
      .orderBy($"t").as[(Double, Double)].collect()
    assert(post.toSeq == Seq((0.0, 3.0), (10.0, 6.0)))
  }

  test("applyGain: height 0.0 is Python-falsy and counts as absent (ref continuum.py:174)") {
    val out = applyGain(cont, Some(Height(0.0, 0.1)), Some(Height(4.0, 0.1)))
      .orderBy($"t").as[(Double, Double)].collect()
    assert(out.toSeq == Seq((0.0, 3.0), (10.0, 6.0))) // falls to post-only branch
    val none = applyGain(cont, Some(Height(0.0, 0.1)), Some(Height(0.0, 0.1)))
      .orderBy($"t").as[(Double, Double)].collect()
    assert(none.toSeq == Seq((0.0, 12.0), (10.0, 24.0))) // untouched
  }
}
