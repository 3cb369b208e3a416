package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.{C4Rules, GopherRules}

/** The C4 and Gopher gates are stateless pure-map projections, so they
  * must compose with Structured Streaming UNCHANGED — stream output ==
  * batch output over a real MemoryStream, the property that lets the same
  * gate definition serve the backfill and the live ingest path (the
  * [[StreamingLmGate]] contract, extended to the round-10 quality gates).
  */
class StreamingQualityGatesSpec extends SparkTestBase {
  import spark.implicits._

  private val docsSeq = Seq(
    (1L, "This first sentence carries enough words to stay.\n" +
      "And the second sentence also keeps its place here.\n" +
      "Finally the third sentence closes the set properly."),
    (2L, "short junk\nno punctuation at all"),
    (3L, "Lorem ipsum filler with markers { inside } of code.")
  )

  test("C4 gate: stream rows == batch rows over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = C4Rules(input.toDS().toDF("doc_id", "text"))
      .filter(col("keep")).select("doc_id")
      .writeStream.format("memory").queryName("c4gate").outputMode("append").start()
    try {
      input.addData(docsSeq.take(2): _*)
      q.processAllAvailable()
      input.addData(docsSeq.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("c4gate").as[Long].collect().toSet
      val batch = C4Rules(docsSeq.toDF("doc_id", "text"))
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(1L), s"only the prose doc passes: $streamed")
    } finally q.stop()
  }

  test("Gopher gate: stream rows == batch rows over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = GopherRules(input.toDS().toDF("doc_id", "text"), minWords = 5)
      .select("doc_id", "keep")
      .writeStream.format("memory").queryName("gophergate").outputMode("append").start()
    try {
      input.addData(docsSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("gophergate").as[(Long, Boolean)].collect().toSet
      val batch = GopherRules(docsSeq.toDF("doc_id", "text"), minWords = 5)
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("robots gate: stream-static form filters a live URL stream like batch") {
    // The gate is a broadcast stream-static join + a projection fold, so
    // it must run UNCHANGED on a stream — the live-crawl frontier path.
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq(("d.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"))
      .toDF("domain", "robots_txt")
    val input = MemoryStream[(Long, String)]
    val q = graft.llm.RobotsTxt.allowedGate(
        input.toDS().toDF("id", "url"), "url", robots, "domain", "robots_txt")
      .select("id")
      .writeStream.format("memory").queryName("robogate").outputMode("append").start()
    try {
      input.addData(
        (1L, "https://www.d.com/p/x"),    // disallowed
        (2L, "https://www.d.com/p/ok/y"), // allow-wins
        (3L, "https://other.com/p/x"))    // no policy → allowed
      q.processAllAvailable()
      val streamed = spark.table("robogate").as[Long].collect().toSet
      assert(streamed == Set(2L, 3L))
    } finally q.stop()
  }

  test("trap-template gate: trained trap list filters a live URL stream like batch") {
    // The trap REPORT is the trained artifact (computed batch-side over
    // crawl history); the PRE-FETCH gate is then a stateless
    // broadcast anti-join on (host, template) — it must run unchanged on
    // the frontier stream. (The capped keep-first-k variant needs
    // per-group state and stays batch — this is the stream-side shape.)
    implicit val sqlCtx = spark.sqlContext
    import graft.llm.UrlOps
    val history = ((1L to 30L).map(i => (i, s"https://t.com/d/2026/$i")) ++
      Seq((31L, "https://t.com/about/x"), (32L, "https://o.com/p/1")))
      .toDF("doc_id", "url")
    val traps = UrlOps.templateReport(history, "url", trapFracMicro = 200000L)
      .filter($"is_trap").select($"host", $"template")
    val gate = (urls: org.apache.spark.sql.DataFrame) => urls
      .withColumn("host", UrlOps.urlHost($"url"))
      .withColumn("template", UrlOps.urlTemplate($"url"))
      .join(broadcast(traps), Seq("host", "template"), "left_anti")
      .select($"id")
    val fresh = Seq(
      (100L, "https://t.com/d/2027/99"),   // trap template → dropped
      (101L, "https://t.com/about/new"),   // organic → kept
      (102L, "https://o.com/p/7"))         // organic → kept
    val batch = gate(fresh.toDF("id", "url")).as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDS().toDF("id", "url"))
      .writeStream.format("memory").queryName("trapgate").outputMode("append").start()
    try {
      input.addData(fresh: _*)
      q.processAllAvailable()
      val streamed = spark.table("trapgate").as[Long].collect().toSet
      assert(streamed == batch && batch == Set(101L, 102L))
    } finally q.stop()
  }

  test("unigram token-budget gate: stateless kernel filter, stream == batch") {
    // The trained-tokenizer count is a pure codegen map (the piece table
    // rides inside the expression), so a token-budget gate composes with
    // streaming unchanged — the property that prices ingest against the
    // SAME tokenizer the trainer uses.
    implicit val sqlCtx = spark.sqlContext
    val pieces = Seq("th" -> -1.0, "er" -> -1.0, "on" -> -1.0)
    val rows = Seq((1L, "the other one keeps going on and on with many words"),
      (2L, "hi"), (3L, "this other longer row also carries plenty of words on it"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .filter(graft.llm.UnigramLm.tokenCount(col("text"), pieces) >= 20)
      .select("doc_id")
      .writeStream.format("memory").queryName("unigate").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("unigate").as[Long].collect().toSet
      val batch = rows.toDF("doc_id", "text")
        .filter(graft.llm.UnigramLm.tokenCount(col("text"), pieces) >= 20)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && streamed == Set(1L, 3L), s"$streamed")
    } finally q.stop()
  }

  test("PCA projection: stateless kernel map, stream == batch") {
    // Projection through a fitted model is a pure map — embeddings
    // compress at ingest with no state store, same artifact as the batch
    // index build.
    implicit val sqlCtx = spark.sqlContext
    val model = graft.llm.EmbeddingPca.Model(
      mean = Seq(0.0, 0.0, 0.0, 0.0),
      components = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0)),
      variances = Seq(2.0, 1.0))
    val rows = Seq((1L, Array(1f, 2f, 3f, 4f)), (2L, Array(-1f, 0f, 1f, 0f)))
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDS().toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.llm.EmbeddingPca.transform(col("embedding"), model).as("p"))
      .writeStream.format("memory").queryName("pcamap").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("pcamap")
        .as[(Long, Seq[Float])].collect().toMap
      assert(streamed(1L) == Seq(1f, 2f) && streamed(2L) == Seq(-1f, 0f))
    } finally q.stop()
  }

  test("badwords gate: the Aho-Corasick kernel filters a stream like batch") {
    implicit val sqlCtx = spark.sqlContext
    val pats = Seq("spam", "buy now")
    val rows = Seq((1L, "clean prose only"), (2L, "please buy now"),
      (3L, "spammy but not spam-bounded? no: spam."), (4L, "buynow unbounded"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .filter(!graft.functions.AcKernels.acAnyMatch(lower(col("text")), pats))
      .select("doc_id")
      .writeStream.format("memory").queryName("bwgate").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("bwgate").as[Long].collect().toSet
      val batch = rows.toDF("doc_id", "text")
        .filter(!graft.functions.AcKernels.acAnyMatch(lower(col("text")), pats))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(1L, 4L))
    } finally q.stop()
  }

  test("readability gate: pure-map fkGradeMicro streams and equals the relational form") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "The cat sat. It ran away fast. Simple words here."),
      (2L, "Incomprehensibility characterizes multisyllabic terminological obfuscation. " +
        "Organizational contextualization necessitates interdisciplinary conceptualization."))
    // map form == relational form on the same rows (the equivalence cert)
    val viaMap = rows.toDF("id", "text")
      .select($"id", graft.llm.TextAnalysis.fkGradeMicro($"text").as("g"))
      .as[(Long, Long)].collect().toMap
    val viaAgg = graft.llm.TextAnalysis.readabilityBy(
        rows.toDF("id", "text"), "id", "text")
      .select($"id", $"fk_grade_micro").as[(Long, Long)].collect().toMap
    assert(viaMap === viaAgg)
    assert(viaMap(2L) > viaMap(1L), "polysyllabic text must grade higher")
    // and the map form runs UNCHANGED as an append-mode stream filter
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("id", "text")
      .select($"id", graft.llm.TextAnalysis.fkGradeMicro($"text").as("g"))
      .writeStream.format("memory").queryName("fkgate").outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      assert(spark.table("fkgate").as[(Long, Long)].collect().toMap === viaMap)
    } finally q.stop()
  }

  test("CDX pre-fetch gate: stream rows == batch rows (pure-map parse + gate)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("status", StringType),
      StructField("mime", StringType)))
    val lines = Seq(
      (1L, """com,a)/x 20240101000000 {"url":"https://a.com/x","status":"200","mime":"text/html"}"""),
      (2L, """com,b)/y 20240101000001 {"url":"https://b.com/y","status":"404","mime":"text/html"}"""),
      (3L, """com,c)/z 20240101000002 {"url":"https"""))  // truncated JSON
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.sources.Warc.parseCdxj(df, "line", schema)
        .filter(col("fields.url").isNotNull && col("fields.status") === "200" &&
          col("fields.mime") === "text/html")
        .select("id")
    val input = MemoryStream[(Long, String)]
    val q = gate(input.toDS().toDF("id", "line"))
      .writeStream.format("memory").queryName("cdxgate").outputMode("append").start()
    try {
      input.addData(lines: _*)
      q.processAllAvailable()
      val streamed = spark.table("cdxgate").as[Long].collect().toSet
      assert(streamed === gate(lines.toDF("id", "line")).as[Long].collect().toSet)
      assert(streamed === Set(1L), s"only the parsed 200 text/html row passes: $streamed")
    } finally q.stop()
  }
}
