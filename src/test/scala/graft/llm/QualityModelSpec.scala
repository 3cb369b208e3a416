package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hashed linear quality classifier: scoring exactness (integer-micro
  * weights, closed-form check), separable training to perfect accuracy,
  * and bit-deterministic training (same corpus → same weights).
  */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  private def labeledFixture = {
    // 40 docs: label-1 docs carry 'excellent' markers, label-0 docs carry
    // 'garbage' markers, over a shared vocabulary — linearly separable on
    // the marker buckets.
    val docs = (0 until 40).map { i =>
      val label = i % 2
      val marker = if (label == 1) "excellent wonderful" else "garbage junk"
      (i.toLong, s"common words here $marker number$i more common text", label)
    }
    docs.toDF("doc_id", "text", "label")
  }

  test("training separates planted labels and is bit-deterministic") {
    val df = labeledFixture
    val w1 = QualityModel.train(df, epochs = 5, nBuckets = 512)
    val w2 = QualityModel.train(df, epochs = 5, nBuckets = 512)
    assert(w1.toSeq == w2.toSeq, "same corpus, same epochs -> same weights")
    val scored = QualityModel.scoreBy(df, "doc_id", "text", w1)
      .join(df.select($"doc_id", $"label"), "doc_id")
    val acc = scored
      .select(when(($"prob_micro" >= 500000L) === ($"label" === 1), 1).otherwise(0).as("ok"))
      .agg(avg($"ok")).head().getDouble(0)
    assert(acc == 1.0, s"separable fixture must classify perfectly, got $acc")
  }

  test("scoreBy matches a hand-computed score for known weights") {
    // every token in bucket b contributes w(b); a 1-bucket model pins the
    // plumbing: sum = n_tokens * w(0), mean logit = w(0)/1e6 for any length
    val df = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = QualityModel.scoreBy(df, "doc_id", "text", Array(250000L))
      .select($"doc_id", $"n_tokens", $"score_micro", $"prob_micro")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 750000L && out(2L)._3 == 250000L)
    // mean logit 0.25 -> table step (250000 + 8050000) / 100000 = 83
    val p = QualityModel.SigmoidTableMicro(83)
    assert(out(1L)._4 == p && out(2L)._4 == p,
      "mean logit is length-invariant for a constant model")
  }

  test("kernel scorer ≡ aggregation scorer (values and schema)") {
    val df = labeledFixture.select($"doc_id", $"text")
      .union(Seq((999L, ""), (998L, "  padded   text  "), (997L, "ÜPPER Case Tökens"))
        .toDF("doc_id", "text"))
    val weights = Array.tabulate(128)(i => (i.toLong * 97) % 700001L - 350000L)
    val agg = QualityModel.scoreBy(df, "doc_id", "text", weights)
      .orderBy($"doc_id").collect().toSeq
    val ker = QualityModel.scoreByKernel(df, "doc_id", "text", weights)
      .orderBy($"doc_id").collect().toSeq
    assert(agg == ker, s"agg $agg vs kernel $ker")
  }

  test("an untrained (zero) model scores probability 0.5 everywhere") {
    val df = Seq((1L, "anything at all")).toDF("doc_id", "text")
    val p = QualityModel.scoreBy(df, "doc_id", "text", new Array[Long](64))
      .select($"prob_micro").as[Long].head()
    assert(p == 500000L)
  }

  test("quantized fixed-point logistic: integer replication, clamping, accuracy") {
    // JVM replication of the exact integer steps probMicroQuantized runs.
    def ref(scoreMicro: Long, nTokens: Long): Long = {
      val sMean = Math.floorDiv(scoreMicro, nTokens)
      val cl = math.max(-8000000L, math.min(8000000L, sMean))
      QualityModel.SigmoidTableMicro(((cl + 8050000L) / 100000L).toInt)
    }
    val cases = Seq((0L, 5L), (750000L, 3L), (-750000L, 3L), (4000000L, 1L),
      (-4000000L, 1L), (99999999L, 2L), (-99999999L, 2L), (1L, 7L),
      (-1L, 7L), (1234567L, 11L), (-1234567L, 11L))
    val got = cases.toDF("sm", "nt")
      .select($"sm", $"nt",
        QualityModel.probMicroQuantized($"sm", $"nt").as("pm"))
      .as[(Long, Long, Long)].collect()
    for ((sm, nt, pm) <- got) {
      assert(pm == ref(sm, nt), s"pm($sm, $nt)")
      // quantization stays within half a table step of the true sigmoid
      val x = sm.toDouble / (1e6 * nt)
      val trueP = 1e6 / (1.0 + math.exp(-math.max(-8.0, math.min(8.0, x))))
      assert(math.abs(pm - trueP) < 13000.0, s"pm($sm, $nt)=$pm vs $trueP")
    }
    // symmetry: sigmoid(0) is exactly half, table is symmetric
    assert(QualityModel.SigmoidTableMicro(80) == 500000L)
    assert(QualityModel.SigmoidTableMicro.size == 161)
  }
}
