package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan of selected
  * registry queries so scan pruning, pushdown, join strategies and
  * whole-stage-codegen spans can be reviewed (findings in PLANS.md).
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "q_f1_feedpol", "q_a1_continuum", "q_a2_spectrum", "q_sim_bruteforce",
      "q_dedup_minhash", "q_dedup_ngram_jaccard", "q_continuum_all", "q_text_fingerprint",
      "q_join_bloom", "q_join_range", "q_join_bucketed", "q_sample_hash",
      "q_text_tfidf", "q_pipeline_curation", "q_upsert", "q_expectations")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
