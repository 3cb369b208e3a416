package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.{CmsImpl, CmsSketch}

/** Count-Min sketch: over-count-only estimates, layout-independent build,
  * and the heavy-hitters certificate (sketch prefilter + exact confirm ==
  * the exact path) — including a deliberately tiny grid where collisions
  * are guaranteed and only the confirm stage keeps the answer exact.
  */
class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private val words =
    (1 to 300).map(_ => "hot") ++ (1 to 40).map(_ => "warm") ++
      (1 to 2000).map(i => s"rare$i")

  test("estimates are exact-or-over, never under; build is layout-independent") {
    val df = words.toDF("t")
    val d = 4; val w = 64 // tiny: rare terms MUST collide
    val g1 = df.agg(CmsSketch.build(d, w)($"t")).head().getSeq[Long](0).toArray
    val g2 = df.repartition(7).agg(CmsSketch.build(d, w)($"t"))
      .head().getSeq[Long](0).toArray
    assert(g1.toSeq == g2.toSeq, "merge order must not change the grid")
    assert(g1.sum == words.size.toLong * d)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct()
      .select($"t", CmsSketch.estimate($"t", g1, d, w).as("e"))
      .as[(String, Long)].collect()
    est.foreach { case (t, e) =>
      assert(e >= exact(t), s"$t under-counted: $e < ${exact(t)}")
    }
    // at 2340 tokens over 256 counters, SOME estimate must over-count
    assert(est.exists { case (t, e) => e > exact(t) })
  }

  test("cmsHeavyHitters equals the exact path even with a collision-heavy grid") {
    val df = words.toDF("t")
    val expected = Profiling.heavyHitters(df, "t", minShare = 0.01)
      .as[(String, Long)].collect().toSeq
    val got = Profiling.cmsHeavyHitters(df, "t", minShare = 0.01, d = 4, w = 64)
      .as[(String, Long)].collect().toSeq
    assert(got == expected && got.map(_._1) == Seq("hot", "warm"))
  }

  test("hash family spreads rows independently") {
    val idx = (0 until 4).map(r => CmsImpl.index("token", r, 4096))
    assert(idx.distinct.size >= 3, s"rows should disagree: $idx")
  }
}
