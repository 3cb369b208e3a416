package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.ArrayOps

/** F6/F7 (ref utils.py:239-309) — exclusive bounds, combined include+exclude
  * predicate (the reference's length-mismatch bug fixed per SURVEY §7.5.4),
  * include-then-exclude ordering for the frequency filter.
  */
class RangeFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private def frame = Seq(0, 5, 10, 15, 20, 25).map(i => (s"2024-01-01 00:00:$i%02d", i))
    .map { case (s, i) => (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(i)}"), i) }
    .toDF("DATE_OBS", "i")

  private val t0 = to_timestamp(lit("2024-01-01 00:00:00"))

  test("relSeconds keeps microsecond precision") {
    val t = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:01.5"))
      .toDF("DATE_OBS")
      .select(RangeFilters.relSeconds($"DATE_OBS", t0)).as[Double].head()
    assert(t == 1.5)
  }

  test("F6 include bounds are exclusive (ref utils.py:255)") {
    val kept = RangeFilters.filterTimeRanges(frame, t0, Seq((5.0, 20.0)), Nil)
      .select($"i").as[Int].collect().toSet
    assert(kept == Set(10, 15)) // 5 and 20 excluded: strict inequalities
  }

  test("F6 exclude bounds are exclusive too (ref utils.py:269)") {
    val kept = RangeFilters.filterTimeRanges(frame, t0, Nil, Seq((5.0, 20.0)))
      .select($"i").as[Int].collect().toSet
    assert(kept == Set(0, 5, 20, 25))
  }

  test("F6 include + exclude compose as ONE predicate (SURVEY §7.5.4 divergence)") {
    // The reference crashes on this combination (length mismatch);
    // the intended semantics: in an include window AND not excluded.
    val kept = RangeFilters.filterTimeRanges(frame, t0,
        Seq((0.0, 25.0)), Seq((9.0, 16.0)))
      .select($"i").as[Int].collect().toSet
    assert(kept == Set(5, 20))
  }

  test("F6 no ranges = no filter") {
    assert(RangeFilters.filterTimeRanges(frame, t0, Nil, Nil).count() == 6)
  }

  test("F7 applies include FIRST then exclude against the filtered axis (ref utils.py:285-307)") {
    val freqs = Array(50.0, 40.0, 30.0, 20.0, 10.0)
    val df = Seq(Seq(5.0, 4.0, 3.0, 2.0, 1.0)).toDF("DATA")
    val (axis, out) = RangeFilters.filterFrequencyRanges(df, freqs,
      include = Seq((15.0, 45.0)), exclude = Seq((25.0, 35.0)))
    assert(axis.toSeq == Seq(40.0, 20.0))
    assert(out.as[Seq[Double]].head() == Seq(4.0, 2.0))
  }

  test("F7 with no ranges returns the frame and axis unchanged") {
    val freqs = Array(3.0, 2.0, 1.0)
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("DATA")
    val (axis, out) = RangeFilters.filterFrequencyRanges(df, freqs, Nil, Nil)
    assert(axis.toSeq == freqs.toSeq && out.eq(df))
  }
}
