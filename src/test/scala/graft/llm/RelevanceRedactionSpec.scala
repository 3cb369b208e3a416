package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RelevanceRedactionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat cat cat dog"),
    (4L, "completely unrelated words here")
  ).toDF("doc_id", "text")

  test("term and document frequencies") {
    val tf = Relevance.termFrequencies(corpus, "doc_id", "text")
    val tfMap = tf.as[(Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(tfMap((1L, "the")) == 2L)
    assert(tfMap((3L, "cat")) == 3L)
    val df = Relevance.docFrequencies(tf).as[(String, Long)].collect().toMap
    assert(df("cat") == 2L && df("the") == 2L && df("sat") == 2L && df("here") == 1L)
  }

  test("tfidf ranks distinctive terms above common ones") {
    val top = Relevance.tfidfTopK(corpus, "doc_id", "text", k = 2)
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(-_._3).map(_._2).toSeq }
    // doc 3: 'cat' (tf 3, df 2) must outrank 'dog' (tf 1, df 2)
    assert(top(3L).head == "cat")
    // every doc yields exactly k (or fewer if vocabulary smaller)
    assert(top.values.forall(_.size <= 2))
    // micro(tf * ln(N/df)): doc3 'cat' = 3 * ln(4/2) * 1e6 within the
    // fixed-point kernel's quantization (≲2 micro at tf 3)
    val scores = Relevance.tfidfTopK(corpus, "doc_id", "text", k = 2)
      .filter($"id" === 3L && $"term" === "cat").as[(Long, String, Long)].head()
    assert(math.abs(scores._3 - 3.0 * math.log(2.0) * 1e6) <= 2.0)
    // And exactly the JVM fixed-point reference (same kernel, bit-equal).
    import graft.functions.FixedPointLog.{lnNanoWideRef, microOfNanoRef}
    assert(scores._3 == microOfNanoRef(3L * lnNanoWideRef(4L, 2L)))
  }

  test("bm25 scores query-bearing docs, omits the rest, favors higher tf") {
    val out = Relevance.bm25(corpus, "doc_id", "text", Seq("cat"))
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 3L)) // docs 2 and 4 have no 'cat'
    assert(out(3L) > out(1L)) // tf 3 in a short doc beats tf 1
    // hand-check doc 1: idf = ln(1 + (4-2+0.5)/(2+0.5)); tf=1, len=6,
    // avglen = (6+3+4+4)/4 = 4.25 — micro(idf) quantizes before the
    // saturation product, so allow 2 micro around the double reference
    val idf = math.log(1 + 2.5 / 2.5)
    val expected = idf * (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * 6.0 / 4.25))
    assert(math.abs(out(1L) - math.round(expected * 1e6)) <= 2)
  }

  test("relevance plans leave no persisted state behind (library cache hygiene)") {
    // VERDICT r6: a library consumer of tfidfTopK/bm25 must not inherit a
    // silently pinned block. The plans are now persist-free — pin that.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    Relevance.tfidfTopK(corpus, "doc_id", "text", k = 2).collect()
    Relevance.bm25(corpus, "doc_id", "text", Seq("cat")).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "relevance query left persisted RDDs behind")
  }

  test("redaction replaces emails, IPs and phones and counts them") {
    val df = Seq(
      (1L, "write bob.smith+x@mail.example.org or ping 192.168.0.1 now"),
      (2L, "call +1 555 0100 twice"),
      (3L, "clean text, nothing here")
    ).toDF("id", "text")
    val out = Redaction.redact(df, "text")
      .select($"id", $"redacted", $"n_emails", $"n_ips", $"n_phones")
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "write [EMAIL] or ping [IP] now")
    assert(out(1L)._3 == 1 && out(1L)._4 == 1 && out(1L)._5 == 0)
    assert(out(2L)._2 == "call [PHONE] twice")
    assert(out(2L)._5 == 1)
    assert(out(3L)._2 == "clean text, nothing here")
    assert(out(3L)._3 == 0 && out(3L)._4 == 0 && out(3L)._5 == 0)
  }

  test("email with dotted-quad host still hides the quad (as an IP)") {
    // The email pattern requires an alphabetic TLD, so 'admin@10.0.0.42'
    // is not an email match — the IPv4 pass catches the quad instead. The
    // PII (the address) is hidden either way; pin the behavior.
    val df = Seq((1L, "x admin@10.0.0.42 y")).toDF("id", "text")
    val r = Redaction.redact(df, "text").select($"redacted").as[String].head()
    assert(r == "x admin@[IP] y")
  }

  test("card redaction: Luhn-valid cards redact, an invalid 16-digit decoy survives") {
    val df = Seq(
      (1L, "pay with 4539 1488 0343 6467 today"),   // valid, separated
      (2L, "ref 1234 5678 9012 3456 invoice"),      // 16 digits, Luhn-invalid
      (3L, "amex 379354508162306 works"),           // valid, contiguous 15
      (4L, "short 4111 1111 and words"),            // too few digits: no candidate
      (5L, "both 4539 1488 0343 6467 and 1234 5678 9012 3456 here")
    ).toDF("id", "text")
    val out = Redaction.redactCardsBy(df, "text")
      .select($"id", $"n_card_candidates", $"n_cards", $"redacted")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1, 1, "pay with [CARD] today")))
    assert(out(2L) == ((2L, 1, 0, "ref 1234 5678 9012 3456 invoice")),
      "decoy candidate counted but NOT redacted")
    assert(out(3L) == ((3L, 1, 1, "amex [CARD] works")))
    assert(out(4L) == ((4L, 0, 0, "short 4111 1111 and words")))
    assert(out(5L) == ((5L, 2, 1, "both [CARD] and 1234 5678 9012 3456 here")))
  }

  test("luhnValid kernel: length gate and checksum truth table") {
    import graft.functions.TextKernels.luhnValid
    val got = Seq(
      "4539148803436467",      // 16, valid
      "4539 1488 0343 6467",   // separators ignored
      "4539148803436468",      // last digit off
      "379354508162306",       // 15, valid
      "123456789012",          // 12 digits: under the gate
      "no digits at all", "")
      .toDF("c").select(luhnValid($"c")).as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false, true, false, false, false))
  }

  test("canaryScan: exact per-doc occurrence counts, misses emit nothing") {
    val docs = Seq(
      (1L, "prefix SECRET-A body SECRET-A tail"),   // canary 0 twice
      (2L, "clean document with nothing planted"),
      (3L, "one probe-B here"),                     // canary 1 once
      (4L, "SECRET-ASECRET-A"))                     // adjacent occurrences
      .toDF("doc_id", "text")
    val got = Redaction.canaryScan(docs, "doc_id", "text",
        Seq("SECRET-A", "probe-B"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L), (3L, 1L, 1L), (4L, 0L, 2L)))
  }

  test("canaryScan: non-BMP canary counts by code points, not UTF-16 units") {
    // "🔑-key" is 5 code points but 6 UTF-16 units — a kernel dividing by
    // String.length would under-count (2·5/6 = 1). ADVICE r11 task 8.
    val canary = "🔑-key" // 🔑-key
    val docs = Seq(
      (1L, s"start $canary middle $canary end"), // twice
      (2L, "no canary here")).toDF("doc_id", "text")
    val got = Redaction.canaryScan(docs, "doc_id", "text", Seq(canary))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 2L)))
  }

  test("aucMicro: Mann-Whitney with ties matches hand-counted pair wins") {
    // scores [1, 2, 2, 3], labels [0, 1, 0, 1]: pairs (pos vs neg) score
    // 1 + 0.5 + 1 + 1 of 4 → AUC 0.875.
    val df = Seq((1L, 0L), (2L, 1L), (2L, 0L), (3L, 1L))
      .toDF("score", "label")
    val got = Relevance.aucMicro(df, "score", "label")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 2L, 875000L)))
    // perfect separation → 1e6; random-identical scores → 500000
    val perfect = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("score", "label")
    assert(Relevance.aucMicro(perfect, "score", "label")
      .as[(Long, Long, Long)].collect().head._3 == 1000000L)
    val flat = Seq((5L, 0L), (5L, 1L), (5L, 0L), (5L, 1L)).toDF("score", "label")
    assert(Relevance.aucMicro(flat, "score", "label")
      .as[(Long, Long, Long)].collect().head._3 == 500000L)
  }

  test("rankingMetrics: recall/precision/MRR/nDCG on a hand-computed fixture") {
    // q0: relevant {1,2,3}; ranked [2@1, 9@2, 1@3] (k=3) → hits 2,
    //   recall 2/3, precision 2/3, MRR 1 (first hit at rank 1),
    //   dcg = g(1)+g(3) = 1000000+500000, idcg = g(1)+g(2)+g(3).
    // q1: relevant {4}; ranked [7@1, 8@2] → all zero except n_rel.
    // q2: relevant {5}; ranker returned NOTHING → still reported, zeros.
    val ranked = Seq((0L, 2L, 1L), (0L, 9L, 2L), (0L, 1L, 3L),
      (1L, 7L, 1L), (1L, 8L, 2L)).toDF("query_id", "id", "rank")
    val judged = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 5L))
      .toDF("query_id", "id")
    val got = Relevance.rankingMetrics(ranked, judged, k = 3)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    val g1 = 1000000L                       // round(1e6/log2(2))
    val g2 = math.round(1e6 / (math.log(3) / math.log(2)))  // 630930
    val g3 = 500000L                        // round(1e6/log2(4))
    val ndcg0 = (g1 + g3) * 1000000L / (g1 + g2 + g3)
    assert(got == Seq(
      (0L, 3L, 2L, 666666L, 666666L, 1000000L, ndcg0),
      (1L, 1L, 0L, 0L, 0L, 0L, 0L),
      (2L, 1L, 0L, 0L, 0L, 0L, 0L)))
  }
}
