package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.MixPlanner

/** Head-to-head measurement of [[MixPlanner.budgetSelect]] (per-domain
  * window — one task carries a whole domain) vs
  * [[MixPlanner.budgetSelectDist]] (range-partitioned two-level prefix —
  * every task bounded at ~n/P) on a MEGA-DOMAIN corpus: the whole
  * documents table as ONE domain, selected to a ¾ token budget. The two
  * forms must return identical results (asserted via order-independent
  * checksum + row count); the dist form's advantage is task-size
  * bounding, which shows up as wall-clock once one domain outgrows a
  * single sort task.
  *
  * Usage: tools/run_main.sh graft.tools.MixSelectBench <sfDir>
  *    or: tools/run_main.sh graft.tools.MixSelectBench synthetic:<N>
  * (synthetic:N builds an N-row one-domain frame with hash-mixed
  * priorities directly — corpus texts stop mattering once the question
  * is pure selection machinery, and N can then reach the scales where
  * one domain genuinely outgrows a single sort task.)
  * Prints one JSON line: {"rows":N,"window_sec":…,"dist_sec":…,"equal":true}
  */
object MixSelectBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // One mega-domain: the entire documents table (or a synthetic N-row
    // frame). Slim, staged once so both forms read identical
    // pre-computed (priority, tokens) rows — the measurement isolates
    // the SELECTION machinery, not the kernels.
    val d = (if (sfDir.startsWith("synthetic:")) {
      val n = sfDir.stripPrefix("synthetic:").toLong
      spark.range(n).select(
        lit("corpus").as("domain"),
        col("id").as("doc_id"),
        pmod(xxhash64(col("id")), lit(1000000L)).as("priority"),
        (pmod(xxhash64(col("id"), lit(1)), lit(400L)) + 20L).as("tokens"))
    } else {
      spark.read.parquet(s"$sfDir/documents.parquet").select(
        lit("corpus").as("domain"),
        col("doc_id"),
        (graft.llm.TextAnalysis.fingerprint(col("text")) % 1000000L).as("priority"),
        graft.llm.TextAnalysis.tokenCount(col("text")).cast("long").as("tokens"))
    }).localCheckpoint()
    val alloc = d.agg(expr("(sum(tokens) * 3) div 4").as("alloc_tokens"))
      .select(lit("corpus").as("domain"), col("alloc_tokens"))
      .localCheckpoint()

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("domain"), col("id"), col("tokens"), col("cum_tokens"))
          .cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (w, wSec) = timed(checksum(
      MixPlanner.budgetSelect(d, "domain", "doc_id", "tokens", "priority", alloc)))
    val (ds, dSec) = timed(checksum(
      MixPlanner.budgetSelectDist(d, "domain", "doc_id", "tokens", "priority", alloc)))
    val equal = w == ds
    println(f"""{"rows":${w._1},"window_sec":$wSec%.2f,"dist_sec":$dSec%.2f,"equal":$equal}""")
    spark.stop()
    if (!equal) sys.exit(1)
  }
}
