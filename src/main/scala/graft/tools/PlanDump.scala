package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for registry queries to files.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [q1,q2,... | all] [suffix]
  *
  * `suffix` is appended to each output filename before `.txt` — the
  * evidence-trail convention is `_before` / `_after`
  * (plans/r18/<query>_{before,after}.txt).
  *
  * Plan capture for the optimization-round evidence trail: building the
  * DataFrame runs any eager staging a query performs, but the dump itself
  * never executes the final plan, so recorded bench numbers are unaffected.
  *
  * Exits non-zero when any requested query is unknown or fails to build, so
  * an evidence sweep cannot silently omit queries (a missing dump would
  * otherwise read as "not applicable" rather than "failed").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    outDir.mkdirs()
    val suffix = if (args.length > 3) args(3) else ""
    val names: Seq[String] =
      if (args.length < 3 || args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[plandump] unknown query: $name")
          failed ::= name
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(FormattedMode)
            val f = new java.io.File(outDir, s"$name$suffix.txt")
            java.nio.file.Files.write(f.toPath, txt.getBytes("UTF-8"))
            System.err.println(s"[plandump] wrote ${f.getPath} (${txt.length} chars)")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
              failed ::= name
          }
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[plandump] FAILED (${failed.size}): ${failed.reverse.mkString(",")}")
      sys.exit(1)
    }
  }
}
