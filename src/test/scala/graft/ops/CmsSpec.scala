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

  test("streaming build: per-micro-batch grids merge to the one-shot batch grid") {
    // The sketch's whole reason to exist at ingest time: grids add
    // element-wise, so a stream of daily batches maintains the SAME
    // artifact a full recompute would build — certified by driving real
    // micro-batches through foreachBatch and summing grids.
    implicit val sqlCtx = spark.sqlContext
    val d = 4; val w = 64
    val batchGrid = words.toDF("t").agg(CmsSketch.build(d, w)($"t"))
      .head().getSeq[Long](0).toArray
    val acc = new Array[Long](d * w)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = input.toDS().toDF("t").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val g = batch.agg(CmsSketch.build(d, w)(col("t")))
          .head().getSeq[Long](0).toArray
        var i = 0
        while (i < acc.length) { acc(i) += g(i); i += 1 }
        ()
      }
      .start()
    try {
      val (a, b) = words.splitAt(words.length / 3)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      assert(acc.toSeq == batchGrid.toSeq,
        "streamed grid must equal the one-shot batch grid")
    } finally q.stop()
  }

  test("hash family spreads rows independently") {
    val idx = (0 until 4).map(r => CmsImpl.index("token", r, 4096))
    assert(idx.distinct.size >= 3, s"rows should disagree: $idx")
  }
}
