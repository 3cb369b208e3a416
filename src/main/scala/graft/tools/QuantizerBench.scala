package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench for the IVF quantizer path (guide §1: measure first).
  *
  * Times, separately: (1) driver-side Lloyd's training at the exact
  * parameters q_semdedup/q_bitext_margin/q_prune_prototypes use
  * (k = deriveK, sampleN = 16k), and (2) one full-corpus codegen'd
  * assignment pass (NearestCell). Prints corpus size, k, sampleN, and
  * seconds for each phase so a kernel change has an isolated
  * before/after number instead of a whole-query one.
  *
  * Usage: runMain graft.tools.QuantizerBench [sfDir] [reps]
  */
object QuantizerBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = 2L * e.count()
    val k = graft.llm.SemDedup.deriveK(n)
    val sampleN = math.max(2048, 16 * k)
    println(s"[qbench] corpus n/2=${n / 2}, doubled n=$n, k=$k, sampleN=$sampleN")
    var cents: Array[Array[Double]] = null
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      cents = graft.llm.Similarity.trainIvfCentroids(e, k = k, sampleN = sampleN)
      println(f"[qbench] lloyd rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // checksum so before/after runs prove bit-identical centroids
    val csum = cents.flatten.foldLeft(0.0)((a, b) => a + b)
    val h = cents.flatten.map(java.lang.Double.doubleToLongBits)
      .foldLeft(0L)((a, b) => a * 31L + b)
    println(s"[qbench] centroid checksum sum=$csum bits=$h")
    val withCopies = e.union(e.select(col("vec_id") + 1000000L, col("embedding")))
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val agg = withCopies
        .select(graft.llm.Similarity.ivfCell(col("embedding"), cents).as("cell"))
        .agg(sum(col("cell").cast("long")), count(lit(1))).collect()(0)
      println(f"[qbench] assign rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(cellsum=${agg.getLong(0)}, n=${agg.getLong(1)})")
    }
    spark.stop()
  }
}
