package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.TextAnalysis

/** The frozen-LM kernels must be BIT-IDENTICAL to the relational scorer
  * (same tokenization, float op order and HALF_UP rounding), and the gate
  * must behave as a stateless filter over a real MemoryStream — stream
  * output == batch output, the property that lets one LM definition serve
  * the backfill and the live ingest path.
  */
class StreamingLmGateSpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick fox jumps over the lazy dog"),
    (2L, "the quick fox runs past the lazy dog")
  ).toDF("doc_id", "text")

  private val scoreDocs = Seq(
    (10L, "the quick fox"),
    (11L, "quick the fox"),
    (12L, "the zorp fox"),
    (13L, "zzq wvx plm"),
    (14L, "THE  Quick   fox"), // case + runs of spaces: tokenization pinned
    (15L, "")
  )

  test("frozen kernels equal the relational scorer bit-for-bit") {
    val lm = TextAnalysis.freezeLm(train)
    val fromKernel = StreamingLmGate
      .scoreWithFrozenLm(scoreDocs.toDF("doc_id", "text"), lm)
      .as[(Long, Long, Long, Long)].collect().toSet
    val fromJoins = TextAnalysis
      .bigramBackoffScoreAgainst(train, scoreDocs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fromKernel === fromJoins)
  }

  test("the gate is a stateless stream filter; stream rows == batch rows") {
    implicit val sqlCtx = spark.sqlContext
    val lm = TextAnalysis.freezeLm(train)
    // threshold between the fluent doc's norm and the shuffled doc's norm
    val norms = StreamingLmGate.scoreWithFrozenLm(scoreDocs.toDF("doc_id", "text"), lm)
      .selectExpr("doc_id", "(-logp_micro) DIV n_tokens AS nn")
      .as[(Long, Long)].collect().toMap
    val cut = (norms(10L) + norms(11L)) / 2

    val input = MemoryStream[(Long, String)]
    val q = StreamingLmGate.perplexityGate(input.toDS().toDF("doc_id", "text"), lm, cut)
      .select("doc_id")
      .writeStream.format("memory").queryName("slmgate").outputMode("append").start()
    try {
      input.addData(scoreDocs.take(3): _*)
      q.processAllAvailable()
      input.addData(scoreDocs.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("slmgate").as[Long].collect().toSet
      val batch = StreamingLmGate
        .perplexityGate(scoreDocs.toDF("doc_id", "text"), lm, cut)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed.contains(10L) && !streamed.contains(11L),
        s"fluent passes, shuffled fails: $streamed")
    } finally q.stop()
  }
}
