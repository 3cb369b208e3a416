package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Margin-based bitext mining: hand-computed margin values, planted-pair
  * recovery above threshold, hub suppression below it.
  */
class BitextMiningSpec extends SparkTestBase {

  // One centroid → one cell → the candidate set is the full cross of the
  // fixture, so every margin is hand-computable.
  private val oneCell = Array(Array(1.0, 0.0, 0.0, 0.0))

  test("planted parallel pairs mine above threshold; the hub stays below") {
    val s = spark; import s.implicits._
    // X: three near-orthogonal "source sentences"; Y: their exact copies
    // plus a hub vector moderately close to everything.
    val x = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val h = (math.sqrt(1.0 / 3)).toFloat
    val y = Seq(
      (11L, Array(1f, 0f, 0f, 0f)),
      (12L, Array(0f, 1f, 0f, 0f)),
      (13L, Array(0f, 0f, 1f, 0f)),
      (14L, Array(h, h, h, 0f))).toDF("vec_id", "embedding")
    val mined = BitextMining.minePairs(x, y, oneCell, threshold = 1.3, k = 2)
      .select($"src_id", $"tgt_id").as[(Long, Long)].collect().toSet
    // Each source's best match is its copy (cos 1). avgK(src, k=2) =
    // (1 + cos-to-hub)/2 = (1 + 0.577)/2 ≈ 0.789; avgK(copy, k=2) =
    // (1 + 0)/2 = 0.5 → margin = 1 / ((0.789 + 0.5)/2) ≈ 1.55 ≥ 1.3.
    assert(mined == Set((1L, 11L), (2L, 12L), (3L, 13L)))
  }

  test("margin value matches the hand-computed ratio") {
    val s = spark; import s.implicits._
    val x = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val y = Seq(
      (11L, Array(1f, 0f, 0f, 0f)),   // cos 1
      (12L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding") // cos 0
    val row = BitextMining.minePairs(x, y, oneCell, threshold = 0.0, k = 2)
      .select($"src_id", $"tgt_id", $"margin").as[(Long, Long, Double)]
      .collect()
    assert(row.length == 1)
    val (src, tgt, margin) = row.head
    // avg_src = (1 + 0)/2 = 0.5; avg_tgt(11) = 1 (only one source) →
    // margin = 1 / ((0.5 + 1)/2) = 4/3
    assert(src == 1L && tgt == 11L)
    assert(math.abs(margin - 4.0 / 3.0) < 1e-12, s"margin $margin")
  }

  test("one best target per source; cosine ties break to the lower target id") {
    val s = spark; import s.implicits._
    val x = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val y = Seq(
      (21L, Array(2f, 0f, 0f, 0f)),   // cos 1 (scaled copy)
      (22L, Array(3f, 0f, 0f, 0f))).toDF("vec_id", "embedding") // cos 1 too
    val mined = BitextMining.minePairs(x, y, oneCell, threshold = 0.0, k = 2)
      .select($"src_id", $"tgt_id").as[(Long, Long)].collect()
    assert(mined.toSeq == Seq((1L, 21L)))
  }
}
