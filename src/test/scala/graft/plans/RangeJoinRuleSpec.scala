package graft.plans

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase

class RangeJoinRuleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points =
    ((0 to 300).map(i => (i.toLong, Some(i * 1.0))) :+ ((999L, Option.empty[Double])))
      .toDF("pid", "x")
  private lazy val intervals = Seq(
    (1L, Some(5.0), Some(12.0)),
    (2L, Some(10.0), Some(10.0)),              // zero-width
    (3L, Some(250.5), Some(260.25)),
    (4L, Some(50.0), Some(40.0)),              // degenerate: hi < lo
    (5L, Option.empty[Double], Some(20.0))     // null bound
  ).toDF("iid", "lo", "hi")

  private def betweenJoin(): DataFrame =
    points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid")

  private def withRule[T](widthConf: String)(f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", widthConf)
    try f finally {
      spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rewrites the naive BETWEEN join and preserves its rows exactly") {
    val naive = betweenJoin().as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty && naive.exists(_._2 == 2L) && !naive.exists(_._2 == 4L))
    withRule("7.0") {
      val got = betweenJoin()
      assert(got.queryExecution.optimizedPlan.toString.contains("__graft_pbkt"),
        "rule did not fire")
      assert(!got.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        "rewritten join still plans as a nested loop")
      assert(got.as[(Long, Long)].collect().toSet == naive)
    }
  }

  test("mirrored orientation (intervals on the left) also rewrites") {
    val naive = intervals.join(points, $"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    withRule("7.0") {
      val got = intervals.join(points, $"x" >= $"lo" && $"x" <= $"hi")
        .select($"pid", $"iid")
      assert(got.queryExecution.optimizedPlan.toString.contains("__graft_pbkt"))
      assert(got.as[(Long, Long)].collect().toSet == naive)
    }
  }

  test("hugely inverted intervals are dropped, not exploded onto a descending sequence") {
    // Sequence(start, stop) defaults to step -1 when start > stop: without
    // the hi >= lo guard this interval would generate ~1e9 buckets (or
    // throw) where the naive join cheaply returns nothing.
    val pts = Seq((1L, 5.0)).toDF("pid", "x")
    val ivs = Seq((1L, 1.0e9, 0.0), (2L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    withRule("1.0") {
      val got = pts.join(ivs, $"x" >= $"lo" && $"x" <= $"hi").select($"pid", $"iid")
      assert(got.queryExecution.optimizedPlan.toString.contains("__graft_pbkt"))
      assert(got.as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    }
  }

  test("malformed width conf disables the rule instead of failing the optimizer") {
    withRule("not-a-number") {
      val got = betweenJoin()
      assert(!got.queryExecution.optimizedPlan.toString.contains("__graft_pbkt"))
      assert(got.count() > 0) // query still runs (naive plan)
    }
  }

  test("inert without the width conf; untouched with extra conjuncts") {
    // no conf → no rewrite
    spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
    try {
      assert(!betweenJoin().queryExecution.optimizedPlan.toString.contains("__graft_pbkt"))
    } finally spark.experimental.extraOptimizations = Nil
    // extra conjunct → pattern doesn't match, plan untouched
    withRule("7.0") {
      val extra = points.join(intervals,
        $"x" >= $"lo" && $"x" <= $"hi" && $"iid" =!= $"pid")
      assert(!extra.queryExecution.optimizedPlan.toString.contains("__graft_pbkt"))
    }
  }
}
