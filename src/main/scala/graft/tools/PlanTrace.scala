package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.util.QueryExecutionListener

/** Captures the EXECUTED plan of every action a traced operation runs —
  * the evidence tool for optimizations whose interesting plans live behind
  * `localCheckpoint` boundaries (PlanDump sees only a query's FINAL plan,
  * which for the staged/checkpointed families is a checkpoint read).
  *
  * Usage: runMain graft.tools.PlanTrace <sfDir> <outDir> <suffix>
  *
  * Traces `GraphAnn.buildKnnGraph(k=12, rounds=1)` over the corpus
  * embeddings and writes one `knn_build_exec<i><suffix>.txt` per executed
  * plan (foldTwins checkpoint, init checkpoint, round checkpoint, ...) —
  * the round checkpoint's plan is where the NN-Descent candidate
  * expansion/scoring shape shows. Exits non-zero if nothing was captured.
  */
object PlanTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    outDir.mkdirs()
    val suffix = if (args.length > 2) args(2) else ""
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add((funcName, qe.explainString(FormattedMode)))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    graft.llm.GraphAnn.buildKnnGraph(e, k = 12, rounds = 1).count()
    // the listener bus is async — give it a moment to drain
    Thread.sleep(3000)
    var i = 0
    plans.forEach { case (fn, txt) =>
      val f = new java.io.File(outDir, s"knn_build_exec${i}_$fn$suffix.txt")
      java.nio.file.Files.write(f.toPath, txt.getBytes("UTF-8"))
      System.err.println(s"[plantrace] wrote ${f.getPath} (${txt.length} chars)")
      i += 1
    }
    spark.stop()
    if (i == 0) { System.err.println("[plantrace] captured nothing"); sys.exit(1) }
  }
}
