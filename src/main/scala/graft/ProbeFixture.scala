package graft

import org.apache.spark.sql.SparkSession

/** One-off probe: time the obsSpectrumMulti / obsSpectrum FIXTURE
  * construction alone vs the full queries, to attribute sf1 growth between
  * fixture windows and engine operators. Usage: runMain graft.ProbeFixture <sfDir>
  */
object ProbeFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("fixture_obsSpectrumMulti") {
      queries.QueryUtil.obsSpectrumMulti(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    time("fixture_obsSpectrum") {
      queries.QueryUtil.obsSpectrum(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
