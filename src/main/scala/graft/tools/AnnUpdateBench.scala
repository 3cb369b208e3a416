package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{GraphAnn, Similarity}

/** Recording harness for the incremental-vs-rebuild claim behind
  * `q_sim_index_delta` (VERDICT r14 item 2): given a stored release over
  * the base corpus (vec_id % 10 != 0), time (a) the full NN-Descent
  * rebuild over base+delta against (b) the warm-started
  * [[GraphAnn.updateKnnGraph]] merge of the 10% delta, same k/rounds,
  * and print one JSON line with both times and the merged-graph recall
  * of planted delta queries. The base build is charged to neither side —
  * it is the pinned release both start from.
  *
  * Usage: tools/run_main.sh graft.tools.AnnUpdateBench \
  *          [sfDir] [k] [buildRounds] [updateRounds] [deltaMod]
  * deltaMod: delta = vec_id % deltaMod == 0 (10 → the certificate's 10%
  * batch; 100 → the 1% daily-tick shape the operator exists for).
  */
object AnnUpdateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 12
    val rounds = if (args.length > 2) args(2).toInt else 2
    val updRounds = if (args.length > 3) args(3).toInt else 1
    val deltaMod = if (args.length > 4) args(4).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val base = e.filter(col("vec_id") % deltaMod =!= 0)
    val delta = e.filter(col("vec_id") % deltaMod === 0)
    val n = e.count(); val nd = delta.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // Warm (JIT + codegen + the operator class graphs) AND produce the
    // pinned release both contestants start from. No block-clearing
    // between the timed sections: e and g0 are shared inputs whose
    // localCheckpoint blocks both contestants read.
    val g0 = GraphAnn.buildKnnGraph(base, k = k, rounds = rounds).localCheckpoint()
    g0.count()

    val (fullEdges, fullSec) = timed {
      GraphAnn.buildKnnGraph(e, k = k, rounds = rounds).count()
    }
    System.gc()
    val (updGraph, updSec) = timed {
      val g = GraphAnn.updateKnnGraph(g0, base, delta, k = k, rounds = updRounds)
        .localCheckpoint()
      g.count()
      g
    }
    val qs = Similarity.perturbedQueries(delta, n = 10)
    val hits = GraphAnn.searchMulti(updGraph, e, qs, k = 10, beam = 48,
        hops = 3, entryK = 8)
      .filter(col("vec_id") === col("qid")).count()

    println(f"""{"sf":"$sfDir","n":$n,"n_delta":$nd,"k":$k,"rounds":$rounds,"update_rounds":$updRounds,""" +
      f""""full_rebuild_sec":$fullSec%.3f,"incremental_sec":$updSec%.3f,""" +
      f""""ratio":${fullSec / updSec}%.2f,"full_edges":$fullEdges,""" +
      f""""delta_recall_hits":$hits}""")
    spark.stop()
  }
}
