package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for registry queries to files.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [q1,q2,... | all]
  *
  * Plan capture for the optimization-round evidence trail
  * (plans/r17/<query>_{before,after}.txt): building the DataFrame runs any
  * eager staging a query performs, but the dump itself never executes the
  * final plan, so recorded bench numbers are unaffected.
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
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
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
          }
      }
    }
    spark.stop()
  }
}
