package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Continuum, Spectrum}
import graft.queries.QueryUtil

/** Multi-file radio scale-out smoke (VERDICT r11 task 7): N observation
  * files at FIXED per-file size through `Continuum.runAll` and
  * `Spectrum.runAll`, N ∈ {2, 8, 16}. The certificate a 1000-executor
  * deployment needs is that the multi-file reduction is
  *
  *   - ONE job chain whose JOB COUNT does not grow with N (per-file ST1 /
  *     A8 / A9 run executor-side inside `mapGroups`/aggregations — a
  *     per-file driver loop would issue O(N) jobs), and
  *   - ~flat in wall time at fixed per-file size while total data grows
  *     ∝ N (files are the parallelism unit; 32 local cores absorb 16
  *     files as easily as 2).
  *
  * Usage: tools/run_main.sh graft.SmokeMultiFile [sfDir]. Prints one JSON
  * line per (pipeline, N): {"pipeline":…,"n_files":N,"rows":…,"sec":…,
  * "jobs":…}.
  */
object SmokeMultiFile {

  /** [[QueryUtil.obsMultiFileFull]] generalized to `n` files of fixed
    * per-file size: keep only l_orderkey % 64 < n (≈ rows/64 rows per
    * file at any n), FILE_ID = the residue. Same flat-spike levels.
    */
  private def obsN(s: SparkSession, dir: String, n: Int): DataFrame = {
    val base0 = QueryUtil.li(s, dir).filter(col("l_orderkey") % 64 < n)
      .withColumn("FILE_ID", (col("l_orderkey") % 64).cast("string"))
    val base = QueryUtil.withPerFileRowIdx(base0, "FILE_ID", fileCountCol = Some("__n"))
    val spike = col("ROWIDX") < 16 || col("ROWIDX") >= col("__n") - 16
    val diodeOn = col("ROWIDX") < 8 || col("ROWIDX") >= col("__n") - 8
    base.select(
      col("FILE_ID"), col("ROWIDX"),
      expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
      when(spike && diodeOn, array(lit(2.0), lit(2.0), lit(2.0), lit(2.0)))
        .when(spike, array(lit(0.5), lit(0.5), lit(0.5), lit(0.5)))
        .otherwise(QueryUtil.data4).as("DATA"),
      lit(0).as("IFNUM"), lit(1).as("PLNUM"),
      when(diodeOn, 1).otherwise(0).as("CALSTATE"),
      when(spike, 0).otherwise(1).as("SWPVALID"),
      lit("onoff:on").as("OBSMODE"))
  }

  /** [[QueryUtil.obsSpectrumMulti]] generalized the same way. */
  private def obsSpectrumN(s: SparkSession, dir: String, n: Int): DataFrame = {
    val base0 = QueryUtil.li(s, dir).filter(col("l_orderkey") % 64 < n)
      .withColumn("FILE_ID", (col("l_orderkey") % 64).cast("string"))
    QueryUtil.withPerFileRowIdx(base0, "FILE_ID")
      .select(
        col("FILE_ID"), col("ROWIDX"),
        expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
        QueryUtil.int4.as("DATA"),
        lit(0).as("IFNUM"), lit(1).as("PLNUM"),
        lit(0).as("CALSTATE"), lit(0).as("SWPVALID"),
        when(col("ROWIDX") < 100, lit("onoff:on")).otherwise(lit("onoff:off")).as("OBSMODE"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobCounter.incrementAndGet()
    })

    def measure(tag: String, n: Int)(mk: => DataFrame): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val before = jobCounter.get()
      val t0 = System.nanoTime()
      val rows = mk.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // Listener events are posted asynchronously; give the bus a moment
      // to drain before reading (listenerBus is private[spark]).
      Thread.sleep(500)
      val jobs = jobCounter.get() - before
      println(f"""{"pipeline":"$tag","n_files":$n,"rows":$rows,"sec":$sec%.2f,"jobs":$jobs}""")
    }

    val params = Continuum.Params(ifnum = 0, plnum = 1)
    val sparams = Spectrum.Params(ifnum = 0, plnum = 1)
    for (n <- Seq(2, 8, 16)) {
      measure("continuum_all", n) {
        Continuum.runAll(obsN(spark, sfDir, n), QueryUtil.obsHeader(4), params)
      }
      measure("spectrum_all", n) {
        Spectrum.runAll(obsSpectrumN(spark, sfDir, n), QueryUtil.obsHeader(4), sparams)
      }
    }
    spark.stop()
  }
}
