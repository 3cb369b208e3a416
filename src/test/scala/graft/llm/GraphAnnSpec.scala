package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Graph-based ANN: bounded-round k-NN-graph build (structure vs a
  * driver-side brute force) and the two-layer beam search (agreement
  * between the single-query and batched mechanisms, planted recall).
  */
class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  // 3 axis clusters of 10 vectors each (ids 0..29, cluster = id % 3) with
  // small deterministic jitter — every vector's true nearest neighbor is
  // in its own cluster and cross-cluster cosine is far lower. The jitter
  // period (mod 11) is coprime to the corpus so no two vectors are exact
  // twins — buildKnnGraph's documented general-position contract (twins
  // must be exact-deduplicated before indexing).
  private def pts = (0 until 30).map { i =>
    val axis = i % 3
    val base = Array.tabulate(6)(j => 0.02f * (((i * 7 + j * 3) % 11) + 1))
    base(axis) = 1.0f
    (i.toLong, base.toSeq)
  }
  private def df = pts.toDF("vec_id", "embedding")

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }
  private def embs: Map[Long, Array[Double]] =
    pts.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap

  test("buildKnnGraph: <=K out-edges per node, and each node's best edge is its true NN") {
    val k = 4
    val g = GraphAnn.buildKnnGraph(df, k = k, rounds = 3, bucketSize = 4)
      .as[(Long, Long, Double)].collect()
    val bySrc = g.groupBy(_._1)
    assert(bySrc.keySet == (0L until 30L).toSet)
    assert(bySrc.values.forall(_.length <= k))
    bySrc.foreach { case (src, edges) =>
      val bestGraph = edges.maxBy(e => (e._3, -e._2))._2
      val trueNn = embs.keys.filter(_ != src)
        .map(id => (cos(embs(src), embs(id)), id))
        .maxBy { case (c, id) => (c, -id) }._2
      assert(bestGraph == trueNn,
        s"node $src: graph best $bestGraph, true NN $trueNn")
      // and the graph stays within the cluster for this easy corpus
      assert(edges.forall(e => e._2 % 3 == src % 3))
    }
  }

  test("search and searchMulti agree and find the true nearest on the easy corpus") {
    val g = GraphAnn.buildKnnGraph(df, k = 4, rounds = 2, bucketSize = 4)
    val q = embs(7L).map(_ * 1.001) // near id 7 (cluster 1)
    val single = GraphAnn.search(g, df, q, k = 5, beam = 8, hops = 3,
      entryK = 2, hubStride = 4).as[(Long, Double)].collect()
    val multi = GraphAnn.searchMulti(g, df, Seq((99L, q)), k = 5, beam = 8,
        hops = 3, entryK = 2, hubStride = 4)
      .select(col("vec_id"), col("cosine")).as[(Long, Double)].collect()
    assert(single.toSeq == multi.toSeq)
    assert(single.head._1 == 7L)
    assert(single.head._2 > 0.999)
    // top-5 all from cluster 1 (ids ≡ 1 mod 3)
    assert(single.forall(_._1 % 3 == 1))
  }

  test("exact twins are safe by construction: duplicates get real neighborhoods (r15 guard)") {
    // ids 30/31 duplicate id 0, id 32 duplicates id 7 — under the old
    // caller-enforced contract these would starve (no in-edges, garbage
    // out-edges); the folded build must give every copy its duplicates at
    // cosine 1.0 first, then its representative's neighbors.
    val k = 4
    val twins = pts ++ Seq(
      (30L, pts(0)._2), (31L, pts(0)._2), (32L, pts(7)._2))
    val g = GraphAnn.buildKnnGraph(twins.toDF("vec_id", "embedding"),
        k = k, rounds = 3, bucketSize = 4)
      .as[(Long, Long, Double)].collect()
    val bySrc = g.groupBy(_._1)
    assert(bySrc.keySet == (0L until 33L).toSet, "every copy has out-edges")
    assert(bySrc.values.forall(_.length <= k))
    // each member of the {0,30,31} group leads with the OTHER two at 1.0
    for (m <- Seq(0L, 30L, 31L)) {
      val sorted = bySrc(m).sortBy(e => (-e._3, e._2))
      val dups = Seq(0L, 30L, 31L).filter(_ != m)
      assert(sorted.take(2).map(_._2).toSeq == dups,
        s"node $m must lead with its duplicates, got ${sorted.toSeq}")
      assert(sorted.take(2).forall(_._3 == 1.0))
      // the rest are the representative's scored cluster-0 neighbors
      assert(sorted.drop(2).forall(e => e._2 % 3 == 0 && e._3 < 1.0))
    }
    val s32 = bySrc(32L).sortBy(e => (-e._3, e._2))
    assert(s32.head._2 == 7L && s32.head._3 == 1.0)
    assert(s32.forall(e => e._2 == 7L || e._2 % 3 == 1),
      "the id-32 twin inherits cluster-1 neighbors from its representative")
  }

  test("updateKnnGraph: warm-started delta merge reaches the same structural quality as a build") {
    val k = 4
    val base = pts.filter(_._1 % 5 != 0)   // 24 vectors
    val delta = pts.filter(_._1 % 5 == 0)  //  6 new arrivals
    // bucketSize 6, not 4: the 24-node base corpus needs the wider init
    // to converge (bucketSize 4 leaves a stuck pocket around node 2 that
    // NO number of rounds escapes — NN-Descent's init-diversity
    // property). Incremental maintenance extends a CONVERGED release;
    // it cannot repair a base graph that never converged, because the
    // seed search navigates the stored edges.
    val g0 = GraphAnn.buildKnnGraph(base.toDF("vec_id", "embedding"),
      k = k, rounds = 3, bucketSize = 6)
    val g = GraphAnn.updateKnnGraph(g0,
        base.toDF("vec_id", "embedding"), delta.toDF("vec_id", "embedding"),
        k = k, rounds = 3, beam = 8, entryK = 2, hubStride = 4)
      .as[(Long, Long, Double)].collect()
    val bySrc = g.groupBy(_._1)
    assert(bySrc.keySet == (0L until 30L).toSet,
      "delta nodes joined AND existing nodes kept their lists")
    assert(bySrc.values.forall(_.length <= k))
    bySrc.foreach { case (src, edges) =>
      val bestGraph = edges.maxBy(e => (e._3, -e._2))._2
      val trueNn = embs.keys.filter(_ != src)
        .map(id => (cos(embs(src), embs(id)), id))
        .maxBy { case (c, id) => (c, -id) }._2
      assert(bestGraph == trueNn,
        s"node $src after update: graph best $bestGraph, true NN $trueNn")
      assert(edges.forall(e => e._2 % 3 == src % 3))
    }
  }

  test("updateKnnGraph: a delta vector duplicating a base vector maps, never starves") {
    val base = pts
    val delta = Seq((40L, pts(4)._2)) // exact copy of id 4
    val g0 = GraphAnn.buildKnnGraph(base.toDF("vec_id", "embedding"),
      k = 4, rounds = 2, bucketSize = 4)
    val g = GraphAnn.updateKnnGraph(g0,
        base.toDF("vec_id", "embedding"), delta.toDF("vec_id", "embedding"),
        k = 4, rounds = 1, beam = 8, entryK = 2, hubStride = 4)
      .as[(Long, Long, Double)].collect()
    val e40 = g.filter(_._1 == 40L).sortBy(e => (-e._3, e._2))
    assert(e40.nonEmpty && e40.head._2 == 4L && e40.head._3 == 1.0)
    assert(e40.forall(e => e._2 == 4L || e._2 % 3 == 1))
    val e4 = g.filter(_._1 == 4L).sortBy(e => (-e._3, e._2))
    assert(e4.head._2 == 40L && e4.head._3 == 1.0,
      "the base copy reciprocally adopts its new duplicate")
  }

  test("planted perturbed queries surface their source (recall contract)") {
    val g = GraphAnn.buildKnnGraph(df, k = 4, rounds = 2, bucketSize = 4)
    val qs = Similarity.perturbedQueries(df, n = 6)
    val hits = GraphAnn.searchMulti(g, df, qs, k = 3, beam = 8, hops = 3,
        entryK = 2, hubStride = 4)
      .filter(col("vec_id") === col("qid")).count()
    assert(hits == 6L, s"expected all 6 planted sources found, got $hits")
  }
}
