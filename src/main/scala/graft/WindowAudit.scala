package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Plan-audit utility: flags registry queries whose RETURNED frame's
  * optimized plan contains an UNPARTITIONED window (single-partition
  * WindowExec at runtime — the scale defect VERDICT r3 item 5 tracks).
  *
  * Scope caveat: queries that run driver-side sub-jobs eagerly inside
  * their builder (collect-and-fit, recall certificates, staged writes)
  * execute those during the audit, and any window inside such a sub-job is
  * NOT visible here — this audits the lazy surface only; the eager paths
  * are covered by the per-operator specs. Usage: runMain graft.WindowAudit
  * [sfDir]
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val bad = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) { flagged += 1; println(s"UNPARTITIONED-WINDOW $n (${bad.size} node(s))") }
      } catch { case e: Throwable => println(s"ERROR $n: ${e.getMessage}") }
    }
    println(s"== $flagged queries with unpartitioned windows ==")
    spark.stop()
  }
}
