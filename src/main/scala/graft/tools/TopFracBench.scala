package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Head-to-head measurement of [[Sampling.topFractionByScore]] (sort +
  * limit — per-partition top-k, then k rows through ONE merge) vs
  * [[Sampling.topFractionByScoreDist]] (range-partitioned prefix — only
  * the boundary partition ranks) for the crossover behind
  * [[Sampling.topFractionByScoreAuto]]. The two forms must select the
  * identical set (asserted via order-independent checksum + row count);
  * the dist form's advantage is never materializing a corpus-fraction k
  * in one task, which shows up as wall-clock (and driver heap) once k
  * outgrows a merge task.
  *
  * Usage: tools/run_main.sh graft.tools.TopFracBench <sfDir>
  *    or: tools/run_main.sh graft.tools.TopFracBench synthetic:<N>
  * (synthetic:N builds an N-row hash-scored frame directly — corpus
  * texts stop mattering once the question is pure selection machinery.)
  * Prints one JSON line:
  * {"rows":N,"k":K,"sortlimit_sec":…,"dist_sec":…,"equal":true}
  */
object TopFracBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val frac = 0.3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Slim (id, score) frame, staged once so both forms read identical
    // pre-computed rows — the measurement isolates the SELECTION
    // machinery, not the scoring kernel.
    val d = (if (sfDir.startsWith("synthetic:")) {
      val n = sfDir.stripPrefix("synthetic:").toLong
      spark.range(n).select(col("id"),
        pmod(xxhash64(col("id")), lit(1000000L)).cast("double").as("score"))
    } else {
      spark.read.parquet(s"$sfDir/documents.parquet").select(
        col("doc_id").as("id"),
        graft.llm.TextAnalysis.qualityScore(col("text")).as("score"))
    }).localCheckpoint()

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("id")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (sl, slSec) = timed(checksum(
      Sampling.topFractionByScore(d, col("score"), frac, col("id"))))
    val (ds, dSec) = timed(checksum(
      Sampling.topFractionByScoreDist(d, col("score"), frac, col("id"))))
    val equal = sl == ds
    println(f"""{"rows":${d.count()},"k":${sl._1},"sortlimit_sec":$slSec%.2f,"dist_sec":$dSec%.2f,"equal":$equal}""")
    spark.stop()
    if (!equal) sys.exit(1)
  }
}
