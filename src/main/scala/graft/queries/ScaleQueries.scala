package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Redaction, Relevance}
import graft.ops.{BloomPrune, Profiling, RangeJoin, Sampling}
import QueryUtil._

/** Driver-contract queries for the round-6 scale operators: bloom-prune
  * join, bucketized range join, deterministic sampling, TF-IDF/BM25
  * relevance, PII redaction, profiling.
  *
  * Oracle notes (the QueryUtil exactness discipline):
  *  - bloom/range joins: the operator contract is "exactly the plain
  *    join" — the oracle IS the plain join, so a hash match certifies the
  *    pruning/bucketing machinery end to end;
  *  - sampling: the Knuth multiplicative mix is plain modular arithmetic,
  *    re-derived textually in SQL (and bijective mod 2^32, so rank order
  *    has no ties to break);
  *  - TF-IDF/BM25: transcendental (ln) kernels round to 6 decimals
  *    (per-term, pre-sum for BM25 — integer micro-units keep the cross-row
  *    sum order-independent);
  *  - redaction: RE2-compatible patterns mean the same in Java regex and
  *    DuckDB.
  */
object ScaleQueries {

  private val bm25Terms = Seq("join", "hash", "filter")

  def queries: Map[String, Q] = Map(
    "q_join_bloom" -> ((s, dir) => {
      // Selective fact⋈dim: ~20% of orders survive the dim filter, so the
      // bloom probe prunes ~80% of lineitem before the shuffle. Result
      // must equal the plain join (no false negatives + exact join).
      val dim = ord(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      BloomPrune.prunedJoin(li(s, dir), dim, "l_orderkey", "o_orderkey",
          expectedItems = 200000)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q_join_range" -> ((s, dir) => {
      // Point-in-interval: 1%-sampled orders define width-1000 price
      // intervals (folded into the l_extendedprice domain); every lineitem
      // price is a point. Bucketized equi-join, never a nested loop.
      val ivals = ord(s, dir).filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), (col("o_totalprice") % 100000.0).as("lo"))
        .withColumn("hi", col("lo") + 1000.0)
      RangeJoin.pointInInterval(
          li(s, dir).select(col("l_extendedprice")), col("l_extendedprice"),
          ivals, col("lo"), col("hi"), bucketWidth = 1000.0)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderkey"))
    }),

    "q_sample_hash" -> ((s, dir) =>
      // Deterministic 10% Bernoulli keyed on l_orderkey: a pure map-side
      // filter (scan → filter, no shuffle), stable under any layout.
      Sampling.hashSample(li(s, dir), col("l_orderkey"), num = 1, den = 10)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_sample_strat" -> ((s, dir) =>
      // 100 rows per l_returnflag stratum picked by hash order. The row key
      // (orderkey*8+linenumber) is unique and the mix is bijective mod
      // 2^32, so the pick is tie-free and layout-independent.
      Sampling.stratifiedFirstN(li(s, dir), Seq("l_returnflag"),
          col("l_orderkey") * 8 + col("l_linenumber"), n = 100)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))),

    "q_text_tfidf" -> ((s, dir) =>
      Relevance.tfidfTopK(docs(s, dir), "doc_id", "text", k = 5)
        .orderBy(col("id"), col("term"))),

    "q_text_bm25" -> ((s, dir) =>
      Relevance.bm25(docs(s, dir), "doc_id", "text", bm25Terms)
        .orderBy(col("id"))),

    "q_text_redact" -> ((s, dir) => {
      // The corpus carries no PII, so plant one email, one IP and one phone
      // per doc deterministically; redact and hash-compare the full
      // redacted text plus per-category counts.
      val planted = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com via 10.0.0."), (col("doc_id") % 256).cast("string"),
        lit(" or +1 555 01"), lpad((col("doc_id") % 100).cast("string"), 2, "0")
      ).as("text"))
      Redaction.redact(planted, "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),

    "q_profile_summary" -> ((s, dir) =>
      Profiling.summarize(li(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey"))
        .orderBy(col("column"))),

    "q_profile_quantiles" -> ((s, dir) =>
      // Sketch-vs-exact rank-error certificate (the q_approx_distinct
      // pattern): deterministic for a given dataset, constant oracle.
      Profiling.quantileCert(li(s, dir), "l_extendedprice",
        Seq(0.25, 0.5, 0.9, 0.99), accuracy = 1000)),

    "q_sink_layout" -> ((s, dir) => {
      // Layout-aware sink round-trip: write partitioned by l_returnflag +
      // sorted by l_shipdate, reread one partition, certify (a) the scan
      // touched only that partition's directory and (b) the partition's
      // rows survived bit-exact (count + integer-valued quantity sum).
      val out = stagingDir() + "/layout_lineitem"
      graft.sources.LayoutWriter.write(
        li(s, dir).select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_shipdate"), col("l_quantity")),
        out, partCols = Seq("l_returnflag"), sortCols = Seq("l_shipdate"))
      val (back, pruned) = graft.sources.LayoutWriter.prunedRead(
        s, out, "l_returnflag", "R")
      back.agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .withColumn("pruned", lit(pruned))
    })
  )

  /** Shared tokenization fragment for the relevance oracles. */
  private val toksSql =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> length(t) > 0)"

  def oracleSql: Map[String, String] = Map(
    "q_join_bloom" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_range" ->
      """WITH i AS (SELECT o_orderkey, o_totalprice % 100000.0 AS lo,
        |    (o_totalprice % 100000.0) + 1000.0 AS hi
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT i.o_orderkey, CAST(count(*) AS BIGINT) AS n
        |FROM i JOIN lineitem l
        |  ON l.l_extendedprice >= i.lo AND l.l_extendedprice <= i.hi
        |GROUP BY i.o_orderkey ORDER BY i.o_orderkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE (l_orderkey * 2654435761) % 4294967296 % 10 < 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_sample_strat" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY ((l_orderkey * 8 + l_linenumber) * 2654435761) % 4294967296,
        |        l_orderkey * 8 + l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 100
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,

    "q_text_tfidf" ->
      s"""WITH tf AS (SELECT id, term, count(*) AS tf FROM (
        |    SELECT doc_id AS id, unnest($toksSql) AS term FROM documents)
        |  GROUP BY id, term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |scored AS (SELECT id, term,
        |    round(CAST(tf AS DOUBLE) * ln((SELECT n FROM n) / df), 6) AS tfidf
        |  FROM tf JOIN df USING (term)),
        |ranked AS (SELECT id, term, tfidf,
        |    row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term) AS rn
        |  FROM scored)
        |SELECT id, term, tfidf FROM ranked WHERE rn <= 5 ORDER BY id, term""".stripMargin,

    "q_text_bm25" ->
      s"""WITH toks AS (SELECT doc_id AS id, unnest($toksSql) AS term FROM documents),
        |lens AS (SELECT doc_id AS id, CAST(len($toksSql) AS DOUBLE) AS len FROM documents),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |a AS (SELECT sum(len) / (SELECT n FROM n) AS avglen FROM lens),
        |tf AS (SELECT id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('join', 'hash', 'filter') GROUP BY id, term),
        |idf AS (SELECT term, ln(1.0 + ((SELECT n FROM n) - CAST(count(*) AS DOUBLE) + 0.5)
        |    / (CAST(count(*) AS DOUBLE) + 0.5)) AS idf
        |  FROM tf GROUP BY term),
        |c AS (SELECT t.id, CAST(round(i.idf * (CAST(t.tf AS DOUBLE) * (1.2 + 1.0))
        |      / (CAST(t.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
        |        + 0.75 * l.len / (SELECT avglen FROM a))) * 1000000.0) AS BIGINT) AS cm
        |  FROM tf t JOIN idf i USING (term) JOIN lens l USING (id))
        |SELECT id, CAST(sum(cm) AS BIGINT) AS score_micro FROM c
        |GROUP BY id ORDER BY id""".stripMargin,

    "q_text_redact" ->
      """WITH p AS (SELECT doc_id, text || ' contact u' || CAST(doc_id AS VARCHAR)
        |    || '@example.com via 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || ' or +1 555 01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\+\d{1,3}([ -]?\d{3,4}){2,3}\b')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |    '\+\d{1,3}([ -]?\d{3,4}){2,3}\b', '[PHONE]', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_profile_summary" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n,
          |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
          |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
          |  CAST(min($c) AS DOUBLE) AS vmin, CAST(max($c) AS DOUBLE) AS vmax
          |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey")
        .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
    },

    "q_profile_quantiles" -> "SELECT true AS within_bound",

    "q_sink_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, sum(l_quantity) AS sum_qty,
        |  true AS pruned
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin
  )
}
