package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the SemDeDup semantics on a hand-built two-cluster fixture where
  * every cosine is computable by eye: cluster A holds a near-dup pair plus
  * a distinct member, cluster B holds only uniques, and one cross-cluster
  * near-dup pair documents the method's inherent boundary miss.
  */
class SemDedupSpec extends SparkTestBase {

  private val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))

  // Cluster A (x-axis): ids 1,2 are semantic near-dups (cos ≈ 0.99989),
  // id 3 is distinct (cos(1,3) ≈ 0.894). Cluster B (y-axis): 4 unique;
  // 5 sits in B but is a near-dup of 1 ACROSS the boundary (never compared).
  private def fixture = {
    val s = spark; import s.implicits._
    Seq(
      (1L, Array(1.0f, 0.00f, 0f)),
      (2L, Array(1.0f, 0.02f, 0f)), // near-dup of 1, slightly OFF-centroid
      (3L, Array(1.0f, 0.50f, 0f)),
      (4L, Array(0.0f, 1.00f, 0f)),
      (5L, Array(0.6f, 0.75f, 0f)) // lands in B (closer to y), near-dup of nobody in B
    ).toDF("vec_id", "embedding")
  }

  test("cellPairs finds only within-cluster pairs over the threshold") {
    val s = spark; import s.implicits._
    val pairs = SemDedup.cellPairs(fixture, centroids, threshold = 0.995)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("semDedup keeps the member least similar to its centroid") {
    // 1 IS the centroid (ccos = 1.0); 2 is tilted off it (ccos < 1.0) —
    // the paper's rule keeps the outlier 2 and drops 1.
    val s = spark; import s.implicits._
    val kept = SemDedup.semDedup(fixture, centroids, threshold = 0.995)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 4L, 5L))
  }

  test("identical vectors tie-break to the lowest id") {
    val s = spark; import s.implicits._
    val df = Seq(
      (10L, Array(1.0f, 0.1f, 0f)),
      (11L, Array(1.0f, 0.1f, 0f)),
      (12L, Array(0.0f, 1.0f, 0f))
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, centroids, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(10L, 12L))
  }

  test("a corpus with no near-dups passes through untouched") {
    val s = spark; import s.implicits._
    val kept = SemDedup.semDedup(fixture, centroids, threshold = 0.99999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("deriveK is linear in corpus size and clamps at both ends") {
    assert(SemDedup.deriveK(4000, targetCellSize = 128) === 32)
    assert(SemDedup.deriveK(8000, targetCellSize = 128) === 63) // 2× data → 2× k
    assert(SemDedup.deriveK(10, targetCellSize = 128) === 4) // kMin floor
    assert(SemDedup.deriveK(0) === 4)
    assert(SemDedup.deriveK(Long.MaxValue) === 4096) // kMax codegen bound
    intercept[IllegalArgumentException](SemDedup.deriveK(100, targetCellSize = 0))
  }

  test("fat-cell guard: identical copies survive salting; drop set unchanged") {
    // One cell holds 6 distinct members plus an identical planted copy —
    // maxCellSize = 2 forces the cell into ≥4 content-hash sub-buckets.
    // Byte-identical vectors hash identically, so the (30, 31) copy pair is
    // ALWAYS co-bucketed and found; the distinct members never reach 0.999
    // cosine, so the drop set is exactly the copy regardless of how the
    // sub-buckets fall.
    val s = spark; import s.implicits._
    val df = Seq(
      (30L, Array(1.00f, 0.00f, 0f)),
      (31L, Array(1.00f, 0.00f, 0f)), // identical copy of 30
      (32L, Array(1.00f, 0.10f, 0f)),
      (33L, Array(1.00f, 0.20f, 0f)),
      (34L, Array(1.00f, 0.30f, 0f)),
      (35L, Array(1.00f, 0.40f, 0f)),
      (36L, Array(0.00f, 1.00f, 0f)) // other cell, untouched
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, centroids, threshold = 0.999,
        maxCellSize = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(30L, 32L, 33L, 34L, 35L, 36L))
    // And the guard really bounds the compared pairs: unguarded the fat
    // cell yields C(6,2) = 15 candidate joins; sub-bucketed strictly fewer
    // reach the cosine filter (the planted pair among them).
    val unguarded = SemDedup.cellPairs(df, centroids, threshold = -1.0)
      .count()
    val guarded = SemDedup.cellPairs(df, centroids, threshold = -1.0,
      maxCellSize = 2).count()
    assert(guarded < unguarded)
  }

  test("prunePrototypes drops the floor(f·n) most-prototypical per cell, deterministically") {
    val s = spark; import s.implicits._
    // Cell A (x-axis), 5 members at decreasing centroid-cosine; cell B,
    // 2 members (floor(0.4·2) = 0 → B drops nothing).
    val df = Seq(
      (1L, Array(1.0f, 0.00f, 0f)), // ccos = 1.0         — most prototypical
      (2L, Array(1.0f, 0.10f, 0f)), // ccos ≈ 0.995       — 2nd
      (3L, Array(1.0f, 0.30f, 0f)),
      (4L, Array(1.0f, 0.50f, 0f)),
      (5L, Array(1.0f, 0.80f, 0f)), // least prototypical in A
      (6L, Array(0.0f, 1.00f, 0f)),
      (7L, Array(0.2f, 1.00f, 0f))
    ).toDF("vec_id", "embedding")
    // f = 0.4: cell A (n=5) drops floor(2.0) = 2 → ids 1, 2; cell B keeps both.
    val kept = SemDedup.prunePrototypes(df, centroids, dropFraction = 0.4)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 5L, 6L, 7L))
    // ties on ccos resolve by lowest id first: two copies of the centroid
    // direction → the lower id drops.
    val ties = Seq(
      (10L, Array(1.0f, 0f, 0f)), (11L, Array(2.0f, 0f, 0f)), // both ccos 1.0
      (12L, Array(1.0f, 0.5f, 0f)), (13L, Array(1.0f, 0.9f, 0f))
    ).toDF("vec_id", "embedding")
    val keptTies = SemDedup.prunePrototypes(ties, centroids, dropFraction = 0.25)
      .select("vec_id").as[Long].collect().toSet
    assert(keptTies === Set(11L, 12L, 13L))
    // f = 0 is the identity
    assert(SemDedup.prunePrototypes(df, centroids, 0.0).count() === 7L)
  }

  test("d4 composes: near-dups first, then prototype cores of the survivors") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.00f, 0f)),  // semantic dup pair with 2 (cos ≈ 0.99989)
      (2L, Array(1.0f, 0.02f, 0f)),  // kept by semDedup (off-centroid outlier)
      (3L, Array(1.0f, 0.30f, 0f)),
      (4L, Array(1.0f, 0.60f, 0f)),
      (5L, Array(1.0f, 1.00f, 0f)),  // ccos ≈ 0.707, least prototypical in A
      (6L, Array(0.0f, 1.00f, 0f))
    ).toDF("vec_id", "embedding")
    // semDedup at 0.995 drops 1 (keeps outlier 2) → survivors 2,3,4,5 in A,
    // 6 in B. prunePrototypes f=0.25: cell A (n=4) drops floor(1.0) = 1 —
    // its most prototypical survivor, 2; cell B (n=1) drops nothing.
    val kept = SemDedup.d4(df, centroids, threshold = 0.995, dropFraction = 0.25)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 5L, 6L))
  }

  test("cross-cluster near-dups are missed by construction (documented)") {
    // cos(1,5) ≈ 0.625/ (1 * 0.9605) — actually compute: not a near-dup at
    // 0.995; use a genuinely near pair split by the boundary instead.
    val s = spark; import s.implicits._
    val df = Seq(
      (20L, Array(0.70f, 0.72f, 0f)), // cell B (y slightly closer)
      (21L, Array(0.72f, 0.70f, 0f)), // cell A — cos(20,21) ≈ 0.9992
      (22L, Array(1.00f, 0.00f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = SemDedup.cellPairs(df, centroids, threshold = 0.995).count()
    assert(pairs === 0L) // split across the boundary → never compared
    val kept = SemDedup.semDedup(df, centroids, threshold = 0.995)
      .select("vec_id").as[Long].collect().toSet
    assert(kept === Set(20L, 21L, 22L))
  }

  test("clusterCappedSample: mega-cluster capped best-first, small cells untouched") {
    val s = spark; import s.implicits._
    // 20 copies of one direction (the mega-cluster) + 3 distinct far
    // vectors. cap=5 must keep exactly 5 of the copies — the 5 best by
    // score — and all 3 singletons.
    val mega = (0 until 20).map(i => (i.toLong, Seq(1.0f, 0.0f)))
    val rest = Seq((100L, Seq(0.0f, 1.0f)), (101L, Seq(-1.0f, 0.1f)),
      (102L, Seq(0.1f, -1.0f)))
    val df = (mega ++ rest).toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(df, k = 3, sampleN = 32)
    // score = vec_id → best-first keeps the HIGHEST ids
    val kept = SemDedup.clusterCappedSample(df, cents, cap = 5, col("vec_id"))
      .select($"vec_id").as[Long].collect().toSet
    assert(kept.intersect((0L until 20L).toSet) == Set(15L, 16L, 17L, 18L, 19L),
      s"mega-cluster must keep its top 5 by score: $kept")
    assert(Set(100L, 101L, 102L).subsetOf(kept), "under-cap cells keep everything")
    intercept[IllegalArgumentException] {
      SemDedup.clusterCappedSample(df, cents, cap = 0, col("vec_id"))
    }
    intercept[IllegalArgumentException] {
      SemDedup.clusterCappedSample(df, Array.empty, cap = 5, col("vec_id"))
    }
  }
}
