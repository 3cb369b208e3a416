package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.Dedup

/** Streaming dedup: exact dedup across micro-batches with watermark-bounded
  * state, and stream-vs-stored-corpus near-dup detection, both driven
  * through real micro-batches via MemoryStream.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: String) = Timestamp.valueOf(s"2024-01-01 00:$m:00")

  test("exact dedup keeps first arrival per content hash across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.exactDedupWithinWatermark(
        input.toDS().toDF("doc_id", "ts", "text"), "ts", "10 minutes")
      .select($"doc_id")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData((1L, ts("01"), "alpha body"), (2L, ts("01"), "beta body"))
      q.processAllAvailable()
      input.addData((3L, ts("02"), "alpha body"), (4L, ts("03"), "gamma body"))
      q.processAllAvailable()
      val kept = spark.table("sdedup").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 4L)) // doc 3 is a duplicate of doc 1's content
    } finally q.stop()
  }

  test("stream near-dup gate flags collisions against the stored corpus signatures") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "completely different content about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus)

    // Stateless default: one row per colliding band — consumers read a set.
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupAgainstCorpus(
        input.toDS().toDF("doc_id", "text"), sigs)
      .filter($"est_jaccard" >= 0.5)
      .writeStream.format("memory").queryName("sneardup").outputMode("append").start()
    try {
      input.addData(
        (100L, "the quick brown fox jumps over the lazy dog and runs far away house"),
        (200L, "entirely novel text with no overlap to anything stored before now"))
      q.processAllAvailable()
      val hits = spark.table("sneardup")
        .select($"stream_id", $"corpus_id").as[(Long, Long)].collect().toSet
      assert(hits == Set((100L, 1L))) // near-dup flagged, novel doc passes
    } finally q.stop()
  }

  test("stream fuzzy-decontamination gate agrees with the batch operator") {
    // The ingestion-time shape of Decontamination.fuzzyContaminatedIds:
    // the benchmark's signatures are the static side of
    // nearDupAgainstCorpus, and the flagged stream ids must equal the
    // batch operator's drop set on the same documents — same signatures,
    // same bands, same estimator, so agreement is exact, not approximate.
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (900L, "the quick brown fox jumps over the lazy dog and runs far away home"))
      .toDF("doc_id", "text")
    val docsAll = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away house"),
      (2L, "entirely novel text with no overlap to anything stored before now"),
      (3L, "the quick brown fox jumps over the lazy dog and runs far away home"))
      .toDF("doc_id", "text")
    val batchBad = graft.llm.Decontamination
      .fuzzyContaminatedIds(docsAll, benchmark, 0.5)
      .as[Long].collect().toSet
    val benchSigs = Dedup.minhashSignatures(benchmark)
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupAgainstCorpus(
        input.toDS().toDF("doc_id", "text"), benchSigs)
      .filter($"est_jaccard" >= 0.5)
      .writeStream.format("memory").queryName("sfuzzy").outputMode("append").start()
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog and runs far away house"),
        (2L, "entirely novel text with no overlap to anything stored before now"),
        (3L, "the quick brown fox jumps over the lazy dog and runs far away home"))
      q.processAllAvailable()
      val streamBad = spark.table("sfuzzy").select($"stream_id")
        .as[Long].collect().toSet
      assert(streamBad == batchBad && batchBad == Set(1L, 3L),
        s"stream $streamBad vs batch $batchBad")
    } finally q.stop()
  }

  test("foreachBatch ROUGE-2 admission gate agrees with the batch operator") {
    // The per-candidate argmax (best pool match) is a per-doc aggregate —
    // unbounded in-stream state — so the documented ingestion shape is
    // foreachBatch with the batch operator against the static pool:
    // each micro-batch gates exactly, and the union of batch outputs must
    // equal the one-shot batch gate on the same candidates (the operator
    // is per-candidate independent, so micro-batching cannot change it).
    implicit val sqlCtx = spark.sqlContext
    val pool = Seq(
      (1L, "write a poem about the sea"),
      (2L, "sort a list in python")).toDF("doc_id", "text")
    val cands = Seq(
      (10L, "write a poem about the sea please"),
      (11L, "explain quantum physics"),
      (12L, "sort a list"))
    val batchGate = Dedup.rouge2Gate(pool, cands.toDF("doc_id", "text"),
        thrMicro = 700000L)
      .as[(Long, Option[Long], Long, Boolean)].collect().toSet
    val got = scala.collection.mutable.Set[(Long, Option[Long], Long, Boolean)]()
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= Dedup.rouge2Gate(pool, batch, thrMicro = 700000L)
          .as[(Long, Option[Long], Long, Boolean)].collect()
        ()
      }
      .start()
    try {
      input.addData(cands.take(2): _*); q.processAllAvailable()
      input.addData(cands.drop(2): _*); q.processAllAvailable()
      assert(got.toSet == batchGate, s"stream ${got.toSet} vs batch $batchGate")
      assert(batchGate.map(t => (t._1, t._4)) ==
        Set((10L, false), (11L, true), (12L, true)))
    } finally q.stop()
  }

  test("stream contamination gate flags benchmark-gram collisions, set semantics + watermarked collapse") {
    implicit val sqlCtx = spark.sqlContext
    val gram = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val benchmark = Seq((9L, s"benchmark material includes $gram verbatim"))
      .toDF("doc_id", "text")
    val benchGrams = graft.llm.Decontamination.benchmarkGrams(benchmark)

    // stateless default: any shared gram flags the doc (≥1 row per doc)
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.contaminatedAgainstBenchmark(
        input.toDS().toDF("doc_id", "text"), benchGrams)
      .writeStream.format("memory").queryName("scontam").outputMode("append").start()
    try {
      input.addData(
        (100L, s"training text that leaks $gram straight from the benchmark"),
        (200L, "entirely clean text with no overlap to the benchmark material at all"))
      q.processAllAvailable()
      val flagged = spark.table("scontam").select($"stream_id").as[Long].collect().toSet
      assert(flagged == Set(100L))
    } finally q.stop()

    // watermarked variant: exactly one row per contaminated doc
    val input2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = StreamingDedup.contaminatedAgainstBenchmark(
        input2.toDS().toDF("doc_id", "ts", "text"), benchGrams,
        tsCol = Some("ts"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("scontam_wm").outputMode("append").start()
    try {
      // the leaked doc repeats the gram twice → multiple gram collisions
      input2.addData(
        (100L, ts("01"), s"leak one $gram and again $gram end"))
      q2.processAllAvailable()
      val rows = spark.table("scontam_wm").select($"stream_id").as[Long].collect().toSeq
      assert(rows == Seq(100L), s"expected one collapsed row, got $rows")
    } finally q2.stop()

    // exact semantics: a fingerprint collision (same hash, different gram —
    // same construction as the batch PropertiesSpec) must NOT flag the doc
    val p = 1000000007L
    def poly(str: String): Long =
      str.foldLeft(0L)((a, c) => java.lang.Math.floorMod(a * 131L + c.toLong, p))
    val rnd = new scala.util.Random(42)
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var pair: Option[(String, String)] = None
    while (pair.isEmpty) {
      val t = Array.fill(7)(('a' + rnd.nextInt(26)).toChar).mkString
      seen.get(poly(t)) match {
        case Some(u) if u != t => pair = Some((u, t))
        case _                 => seen(poly(t)) = t
      }
    }
    val (t1, t2) = pair.get
    val prefix = "one two three four five six seven"
    val benchGrams2 = graft.llm.Decontamination.benchmarkGrams(
      Seq((9L, s"$prefix $t2")).toDF("doc_id", "text"))
    val input3 = MemoryStream[(Long, String)]
    val q3 = StreamingDedup.contaminatedAgainstBenchmark(
        input3.toDS().toDF("doc_id", "text"), benchGrams2)
      .writeStream.format("memory").queryName("scontam_coll").outputMode("append").start()
    try {
      input3.addData((300L, s"$prefix $t1")) // fp-collides, shares no gram
      q3.processAllAvailable()
      assert(spark.table("scontam_coll").count() == 0,
        "collision must not flag a clean stream doc")
    } finally q3.stop()
  }

  test("stream near-dup gate with tsCol collapses band collisions via watermarked state") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home")
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus)

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.nearDupAgainstCorpus(
        input.toDS().toDF("doc_id", "ts", "text"), sigs,
        tsCol = Some("ts"), watermark = "10 minutes")
      .filter($"est_jaccard" >= 0.5)
      .writeStream.format("memory").queryName("sneardup_wm").outputMode("append").start()
    try {
      input.addData(
        (100L, ts("01"), "the quick brown fox jumps over the lazy dog and runs far away house"))
      q.processAllAvailable()
      val rows = spark.table("sneardup_wm")
        .select($"stream_id", $"corpus_id").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((100L, 1L))) // exactly ONE row despite multi-band collisions
    } finally q.stop()
  }
}
