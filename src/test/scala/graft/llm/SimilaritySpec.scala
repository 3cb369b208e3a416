package graft.llm

import graft.SparkTestBase

/** Similarity search: brute-force cosine baseline, LSH-bucketed ANN, and
  * the ANN-vs-exact agreement on an easy corpus.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // Three clusters around the axes plus one diagonal.
  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Seq(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private val e1 = Array(1.0, 0.0, 0.0, 0.0)

  test("exactPairsWithinLabel: pairs within label blocks, loud refusal past the cap") {
    import org.apache.spark.sql.functions.col
    val labeled = vecs.withColumn("label", (col("vec_id") % 2).cast("int"))
    val pairs = Similarity
      .exactPairsWithinLabel(labeled, minCosine = -1.0, maxInputRows = 100L)
      .as[(Long, Long, Double)].collect()
    // labels: odd {1,3,5}, even {2,4} -> C(3,2)+C(2,2)=3+1 pairs
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      Set((1L, 3L), (1L, 5L), (3L, 5L), (2L, 4L)))
    assert(pairs.forall(p => p._1 < p._2))
    // The guard is the point (VERDICT r13 item 1): the quadratic baseline
    // must refuse a corpus-sized input loudly, not plan it.
    val ex = intercept[IllegalArgumentException] {
      Similarity.exactPairsWithinLabel(labeled, minCosine = -1.0,
        maxInputRows = 4L)
    }
    assert(ex.getMessage.contains("refused"))
    assert(ex.getMessage.contains("ANN"))
  }

  test("brute-force top-k ranks by exact cosine with id tiebreak") {
    val top = Similarity.bruteForceTopK(vecs, e1, k = 3).as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 2L, 5L))
    assert(top.head._2 == 1.0)
  }

  test("isotropyReport: centered corpus scores 0, common direction scores high") {
    // Perfectly centered: +e1 and −e1 → mean 0 → anisotropy 0.
    val centered = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.isotropyReport(centered)
      .as[(Long, Long, Long, Long)].collect().head
    // each |v|² = 1e12 µ²; mean = (0,0)
    assert(c == ((4L, 1000000000000L, 0L, 0L)))
    // All-identical vectors: mean == every vector → anisotropy 1e6.
    val common = Seq((1L, Seq(0.6f, 0.8f)), (2L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val k = Similarity.isotropyReport(common)
      .as[(Long, Long, Long, Long)].collect().head
    assert(k._1 == 2L && k._4 == 1000000L)
  }

  test("outlierReport: the far tail flags, the bulk does not; exact z-gate algebra") {
    // 30 unit-ish inliers on a ring + 2 planted garbage vectors at 5×
    // the radius. The one-sided 3σ gate must flag exactly the plants.
    val ring = (0 until 30).map { i =>
      val a = 2 * math.Pi * i / 30
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val plants = Seq((100L, Seq(5.0f, 0.0f)), (101L, Seq(0.0f, -5.0f)))
    val df = (ring ++ plants).toDF("vec_id", "embedding")
    val got = Similarity.outlierReport(df)
      .select($"vec_id", $"is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got.size == 32)
    assert(got(100L) && got(101L), "planted 5x vectors must flag")
    assert(ring.forall { case (id, _) => !got(id) }, "ring inliers must not flag")
    // independent replay of the cross-multiplied gate on the tiny corpus
    val dists = Similarity.outlierReport(df)
      .select($"vec_id", $"dist2_micro").as[(Long, Long)].collect().toMap
    val n = dists.size.toLong
    val s1 = dists.values.sum
    val s2 = dists.values.map(d => BigInt(d) * d).sum
    dists.foreach { case (id, d) =>
      val lhs = (BigInt(n) * d - s1).pow(2)
      val rhs = 9 * (BigInt(n) * s2 - BigInt(s1) * s1)
      val want = BigInt(n) * d > s1 && lhs >= rhs
      assert(got(id) == want, s"vec $id gate mismatch")
    }
    intercept[IllegalArgumentException] {
      Similarity.outlierReport(df, zSquared = 0)
    }
  }

  test("matryoshka rerank: full-dim prefix equals brute force; coarse prune keeps true top") {
    // dims = full → identical to brute force by construction.
    val full = Similarity.matryoshkaTopK(vecs, e1, dims = 4, k = 3, rerank = 5)
      .as[(Long, Double)].collect().toSeq
    val bf = Similarity.bruteForceTopK(vecs, e1, k = 3).as[(Long, Double)].collect().toSeq
    assert(full == bf)
    // 2-dim prefix: coarse cosines to e1-prefix are (1, .994, 0, NaN-free 0, .707)
    // → prune to top-3 {1, 2, 5}, full rerank keeps the same exact order.
    val pruned = Similarity.matryoshkaTopK(vecs, e1, dims = 2, k = 2, rerank = 3)
      .as[(Long, Double)].collect().toSeq
    assert(pruned.map(_._1) == Seq(1L, 2L))
    assert(pruned.head._2 == 1.0)
    // guards
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(vecs, e1, dims = 9, k = 2, rerank = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaTopK(vecs, e1, dims = 2, k = 5, rerank = 3)
    }
  }

  test("ANN with stored bucket column returns the true neighbors on an easy corpus") {
    val planes = Similarity.hyperplanes(numPlanes = 6, dim = 4)
    val bucketed = Similarity.withLshBucket(vecs, planes)
    assert(bucketed.columns.contains("lsh_bucket"))
    val ann = Similarity.annTopKBucketed(bucketed, e1, planes, k = 2, probeHamming = 2)
      .as[(Long, Double)].collect()
    assert(ann.map(_._1).contains(1L))
    // every returned cosine must equal the exact cosine (ANN never distorts scores)
    val exact = Similarity.bruteForceTopK(vecs, e1, k = 5).as[(Long, Double)].collect().toMap
    ann.foreach { case (id, c) => assert(c == exact(id)) }
  }

  test("cosine near-dup candidates find planted exact copies") {
    val planes = Similarity.hyperplanes(numPlanes = 6, dim = 4)
    val withCopy = vecs.union(Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val cand = Similarity.cosineNearDupCandidates(withCopy, planes, threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(cand.map(c => (c._1, c._2)).contains((1L, 100L)))
    // orthogonal vectors never appear
    assert(!cand.exists(c => c._3 < 0.999))
  }

  test("IVF: cells separate the clusters and probed search finds the true neighbors") {
    // 3 tight clusters around e1/e2/e3 → k=3 cells recover them.
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array.fill(4)(0.05f * ((i * 7) % 3))
      base(axis) = 1.0f
      ((i + 1).toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(df, k = 3, sampleN = 30, iters = 5)
    val celled = Similarity.withIvfCell(df, cents)
    // every cluster lands in exactly one cell
    val cellsPerAxis = celled.as[(Long, Seq[Float], Int)].collect()
      .groupBy { case (id, _, _) => (id - 1) % 3 }
      .view.mapValues(_.map(_._3).toSet).toMap
    assert(cellsPerAxis.values.forall(_.size == 1))
    // probed search returns the same ranking as brute force over the e1 cluster
    val q = Array(1.0, 0.0, 0.0, 0.0)
    val ivf = Similarity.ivfTopK(celled, q, cents, k = 5, nprobe = 1)
      .as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(df, q, k = 5).as[(Long, Double)].collect()
    assert(ivf.map(_._1).toSeq == brute.map(_._1).toSeq)
  }

  test("query bucket matches the column bucket for the same vector") {
    val planes = Similarity.hyperplanes(numPlanes = 8, dim = 4)
    val colBucket = Similarity.withLshBucket(
        Seq((1L, Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"), planes)
      .select("lsh_bucket").as[Long].head()
    assert(colBucket == Similarity.queryBucket(e1, planes))
  }

  test("batched multi-query ANN matches the per-query form for every query") {
    val planes = Similarity.hyperplanes(numPlanes = 8, dim = 4)
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val bucketed = Similarity.withLshBucket(corpus, planes)
    val queries = Seq(
      (101L, Array(1.0, 0.0, 0.0, 0.0)),
      (102L, Array(0.0, -1.0, 0.5, 0.0)),
      (103L, Array(0.3, 0.3, 0.3, 0.3)))
    val multi = Similarity.annTopKMultiBucketed(bucketed, queries, planes, k = 5, probeHamming = 3)
      .select($"qid", $"vec_id", $"cosine").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)).map(_._2).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val single = Similarity.annTopKBucketed(bucketed, q, planes, k = 5, probeHamming = 3)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(multi(qid) == single, s"qid $qid: batched != per-query")
    }
  }

  test("batched multi-query IVF matches the per-query form for every query") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(corpus, k = 4, sampleN = 40, iters = 5)
    val celled = Similarity.withIvfCell(corpus, cents)
    val queries = Seq((201L, Array(1.0, 0.0, 0.0, 0.0)), (202L, Array(0.0, 1.0, -1.0, 0.0)))
    val multi = Similarity.ivfTopKMulti(celled, queries, cents, k = 5, nprobe = 2)
      .select($"qid", $"vec_id", $"cosine").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2)).map(_._2).toSeq).toMap
    queries.foreach { case (qid, q) =>
      val single = Similarity.ivfTopK(celled, q, cents, k = 5, nprobe = 2)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(multi(qid) == single, s"qid $qid: batched != per-query")
    }
  }

  test("distributed k-means separates axis clusters like the sampled trainer") {
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array.fill(4)(0.05f * ((i * 7) % 3))
      base(axis) = 1.0f
      ((i + 1).toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroidsDistributed(df, k = 3, iters = 5)
    val celled = Similarity.withIvfCell(df, cents)
    // every axis cluster lands wholly in one cell, and the cells differ
    val cellsPerAxis = celled.as[(Long, Seq[Float], Int)].collect()
      .groupBy { case (id, _, _) => (id - 1) % 3 }
      .view.mapValues(_.map(_._3).toSet).toMap
    assert(cellsPerAxis.values.forall(_.size == 1))
    assert(cellsPerAxis.values.map(_.head).toSet.size == 3)
    // probed search over the distributed centroids matches brute force
    val q = Array(1.0, 0.0, 0.0, 0.0)
    val ivf = Similarity.ivfTopK(celled, q, cents, k = 5, nprobe = 1)
      .as[(Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(df, q, k = 5).as[(Long, Double)].collect()
    assert(ivf.map(_._1).toSeq == brute.map(_._1).toSeq)
  }

  test("perturbed queries keep cosine ~1 to their source vectors") {
    val rnd = new scala.util.Random(13)
    val corpus = (0L until 5L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qs = Similarity.perturbedQueries(corpus, n = 5)
    assert(qs.map(_._1) == (0L until 5L))
    val embs = corpus.as[(Long, Seq[Float])].collect().toMap
    qs.foreach { case (id, v) =>
      val src = embs(id).map(_.toDouble).toArray
      val dot = src.zip(v).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(src.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
      assert(cos > 0.9999, s"query $id drifted from its source (cos=$cos)")
    }
  }

  test("hard negatives over IVF cells: positive is the in-cell nearest, ranks ordered") {
    // Same 3-tight-cluster construction as the IVF test: every vector's
    // true nearest neighbor shares its cell, so the cell-join miner must
    // agree with a per-cell brute force exactly.
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array.fill(4)(0.05f * ((i * 7) % 3))
      base(axis) = 1.0f
      ((i + 1).toLong, base.toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(df, k = 3, sampleN = 30, iters = 5)
    val mined = Similarity.hardNegativesCells(df, cents, id => id <= 3L, negK = 2)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(mined.keySet == Set(1L, 2L, 3L))
    // Driver-side reference: cells + exact cosine within each anchor's cell.
    val cells = Similarity.withIvfCell(df, cents)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    val embs = pts.toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    mined.foreach { case (anchor, rows) =>
      assert(rows.map(_._2).toSeq == Seq(1L, 2L, 3L)) // positive + 2 negatives
      assert(rows.head._5 && rows.tail.forall(!_._5))
      // ranks are ordered by cosine desc, and rank 1 matches the per-cell argmax
      assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
      val expected = embs.keys
        .filter(id => id != anchor && cells(id) == cells(anchor))
        .map(id => (cos(embs(anchor), embs(id)), id))
        .toSeq.sortBy { case (c, id) => (-c, id) }.head._2
      assert(rows.head._3 == expected, s"anchor $anchor positive mismatch")
    }
  }
}
