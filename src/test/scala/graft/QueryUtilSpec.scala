package graft

import org.apache.spark.sql.functions._

import graft.queries.QueryUtil

/** `stagedOnce` build-once semantics (VERDICT r15 item 2's shared staged
  * kNN graph rides on this): the first caller builds and stages parquet,
  * later callers read the SAME content without re-running the builder,
  * distinct keys never collide, and the artifact survives the bench
  * harness's inter-query unpersist sweep (it is a file, not a cached
  * block).
  */
class QueryUtilSpec extends SparkTestBase {
  import spark.implicits._

  test("stagedOnce builds once per key, returns identical content, keys isolate") {
    var builds = 0
    def build(tag: Int) = () => {
      builds += 1
      spark.range(5).select(col("id"), lit(tag).as("tag"))
    }
    val key = s"spec_once_${System.nanoTime()}"
    val a = QueryUtil.stagedOnce(spark, key, build(1))
    val b = QueryUtil.stagedOnce(spark, key, build(99)) // must NOT rebuild
    assert(builds == 1)
    assert(a.orderBy("id").as[(Long, Int)].collect().toSeq ==
      b.orderBy("id").as[(Long, Int)].collect().toSeq)
    assert(b.select(max(col("tag"))).head().getInt(0) == 1)
    // a different key builds independently
    val c = QueryUtil.stagedOnce(spark, key + "_other", build(2))
    assert(builds == 2)
    assert(c.select(max(col("tag"))).head().getInt(0) == 2)
    // survives the harness's inter-query cleanup (unpersist + cache clear)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    assert(QueryUtil.stagedOnce(spark, key, build(3)).count() == 5 && builds == 2)
  }
}
