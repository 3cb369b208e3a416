package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{GraphAnn, Similarity}

/** Throwaway diagnostic for the graph-ANN recall certificate: prints hit
  * counts across (k, rounds, beam, hops, entryK, hubStride) settings.
  * Usage: tools/run_main.sh graft.tools.GraphAnnProbe [sfDir]
  */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = Similarity.perturbedQueries(e, n = 10)
    for ((k, rounds) <- Seq((12, 2), (10, 2))) {
      val g = GraphAnn.buildKnnGraph(e, k = k, rounds = rounds).cache()
      // graph quality: fraction of nodes whose top-1 graph edge is their
      // true top-1 cosine neighbor would need brute force; print degree
      // and edge stats instead.
      println(s"[probe] graph k=$k rounds=$rounds edges=${g.count()}")
      for ((beam, hops, entryK, stride) <- Seq(
          (32, 3, 8, 16), (48, 3, 8, 16), (48, 4, 8, 16))) {
        val hits = GraphAnn.searchMulti(g, e, qs, k = 10, beam = beam,
            hops = hops, entryK = entryK, hubStride = stride)
          .filter(col("vec_id") === col("qid")).count()
        println(s"[probe] k=$k rounds=$rounds beam=$beam hops=$hops " +
          s"entryK=$entryK stride=$stride hits=$hits/10")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
