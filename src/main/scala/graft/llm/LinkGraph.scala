package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HtmlKernels

/** Host-level link analysis over a crawled corpus — the stage that turns a
  * page archive into a domain authority signal. Crawl curation recipes use
  * link centrality both as a quality prior (Common Crawl's harmonic/PageRank
  * host rankings) and as a seed-selection input for the next crawl; neither
  * the reference nor the earlier crawl family covered the graph view, so
  * this module closes it: pages → registered-domain edges → PageRank.
  *
  * Scale design (100 TB of WARC → ~10⁸ registered domains):
  *  - edge extraction is a map-side pass (href kernel + URL kernels, all
  *    codegen'd) followed by ONE `groupBy(src,dst)` shuffle whose rows are
  *    slim domain pairs — page text never shuffles;
  *  - PageRank iterates shuffle joins keyed on `src`/`dst` — uniform unless
  *    the web graph's natural hubs dominate, which AQE skew-join splits;
  *    the edge+outdegree frame is `localCheckpoint`ed ONCE (it feeds every
  *    iteration) so the corpus scan never re-runs;
  *  - ranks are integer micro-units (see [[pageRank]]) — exact under any
  *    partial-aggregation order, so results are reproducible run-to-run
  *    and hash-checkable against a sequential oracle. For deep iteration
  *    counts, checkpoint `ranks` every few rounds to truncate lineage
  *    (3 damped rounds — this module's default — does not need it).
  */
object LinkGraph {

  /** Weighted registered-domain edge list from a page frame: extract every
    * anchor href ([[HtmlKernels.hrefs]]), keep absolute http(s) targets,
    * resolve source host and target host to registered domains, drop
    * self-edges (intra-site navigation is not an authority signal), and
    * count link multiplicity per (src, dst).
    *
    * Output: `src_domain, dst_domain, links` — one shuffle, slim keys.
    */
  def hostEdges(pages: DataFrame, srcHost: Column, html: Column): DataFrame =
    pages
      .select(
        UrlOps.registeredDomain(lower(srcHost)).as("src_domain"),
        explode(HtmlKernels.hrefs(html)).as("href"))
      .where(lower(UrlOps.urlScheme(col("href"))).isin("http", "https"))
      .withColumn("dst_domain",
        UrlOps.registeredDomain(lower(UrlOps.urlHost(col("href")))))
      .where(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("links"))

  /** Anchor-text profile per TARGET domain — "what the web calls this
    * site", the query-independent relevance signal (anchor terms describe
    * the target better than the target's own boilerplate). Same gates as
    * [[hostEdges]] (http(s) only, self-references excluded), then anchor
    * text tokenizes to lowercase whitespace terms and the top `k` terms
    * per target domain survive, ranked by distinct-mention count with a
    * lexicographic tie-break (deterministic, oracle-matchable).
    *
    * Scale: the heavy `groupBy(dst_domain, term)` count shuffles slim
    * (domain, term) pairs only; the top-k window then runs on the
    * domain×term AGGREGATE (one row per pair), not the corpus.
    */
  def anchorTerms(pages: DataFrame, srcHost: Column, html: Column,
      k: Int = 3): DataFrame = {
    val counts = pages
      .select(
        UrlOps.registeredDomain(lower(srcHost)).as("src_domain"),
        explode(HtmlKernels.anchors(html)).as("a"))
      .where(lower(UrlOps.urlScheme(col("a.href"))).isin("http", "https"))
      .withColumn("dst_domain",
        UrlOps.registeredDomain(lower(UrlOps.urlHost(col("a.href")))))
      .where(col("dst_domain").isNotNull &&
        col("dst_domain") =!= col("src_domain"))
      .select(col("dst_domain"),
        explode(split(lower(trim(col("a.text"))), "\\s+")).as("term"))
      .where(col("term") =!= "")
      .groupBy("dst_domain", "term")
      .agg(count(lit(1)).as("mentions"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("dst_domain").orderBy(col("mentions").desc, col("term"))
    counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** PageRank in integer micro-rank units: every node starts at 1 000 000 µ,
    * and each synchronous round recomputes
    *
    *   rank' = 150 000 + Σ_in ((rank_src div outdeg_src) · 850 000 div 1 000 000)
    *
    * i.e. the classic damping-0.85 update with BOTH divisions truncated to
    * integers and the damping applied PER EDGE. The integer form is chosen
    * deliberately: contributions are exact longs, so the cross-row sum is
    * associative (bit-identical under Spark's partial aggregation and a
    * sequential oracle), and per-edge damping keeps every addend ≤ 850 000·
    * rank_src/outdeg — no intermediate exceeds 2⁶³ even for a 10⁸-in-degree
    * hub. Dangling nodes (no outlinks) simply leak their rank, the standard
    * simplification. Truncation costs < 1 µ-unit per edge per round vs the
    * real-valued recurrence — negligible against rank magnitudes of 10⁶.
    *
    * `edges` is any frame with `src_domain`/`dst_domain` columns (weights
    * ignored: the link GRAPH is what ranks, not link multiplicity).
    */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    val e = edges.select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
    // One materialization feeds the node set and every iteration's join.
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val nodes = withDeg.select(col("src").as("domain"))
      .union(withDeg.select(col("dst").as("domain")))
      .distinct()
      .localCheckpoint()
    var ranks = nodes.select(col("domain"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val sums = withDeg
        .join(ranks, col("src") === col("domain"))
        .select(col("dst"),
          expr("(rank div outdeg) * 850000 div 1000000").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("s"))
      ranks = nodes
        .join(sums, nodes("domain") === sums("dst"), "left")
        .select(nodes("domain"), (lit(150000L) + coalesce(col("s"), lit(0L))).as("rank"))
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) — the duality
    * PageRank's single score collapses: an AUTHORITY is pointed at by good
    * hubs, a HUB points at good authorities. Focused-crawl seed discovery
    * wants exactly the hub side (a directory page listing many good
    * domains outranks every domain it lists), which is why this
    * complements [[pageRank]]/[[trustRank]] rather than repeating them.
    *
    * Synchronous integer micro iteration: every score starts at 10⁶;
    * each round computes `a'(v) = Σ_{u→v} h(u)`, then `h'(u) = Σ_{u→v}
    * a'(v)`, then SUM-normalizes both sides back to mean 10⁶
    * (`x · n · 10⁶ div Σx`, cross-multiplied in DECIMAL(38,0) — the L2
    * norm of the paper is transcendental, the sum norm has the same
    * fixed-point directions and stays exact). All sums are exact longs →
    * associative → the distributed join chain hash-matches a sequential
    * oracle. Zero-in-degree (resp. zero-out-degree) nodes hold authority
    * (resp. hub) 0 from round 1 on, the paper's semantics.
    */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    val e = edges.select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("domain"))
      .union(e.select(col("dst").as("domain")))
      .distinct()
      .localCheckpoint()
    def normalized(scores: DataFrame, c: String): DataFrame = {
      val tot = scores.agg(sum(col(c)).as("__tot"), count(lit(1)).as("__n"))
      scores.crossJoin(broadcast(tot))
        .withColumn(c, expr(
          s"CAST((CAST($c AS DECIMAL(38,0)) * __n * 1000000) div __tot AS BIGINT)"))
        .select(col("domain"), col(c))
    }
    var auth = nodes.select(col("domain"), lit(1000000L).as("auth"))
    var hub = nodes.select(col("domain"), lit(1000000L).as("hub"))
    for (_ <- 1 to iters) {
      val aSums = e.join(hub, e("src") === hub("domain"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("__s"))
      val aRaw = nodes.join(aSums, nodes("domain") === aSums("dst"), "left")
        .select(nodes("domain"), coalesce(col("__s"), lit(0L)).as("auth"))
      val hSums = e.join(aRaw, e("dst") === aRaw("domain"))
        .groupBy(col("src")).agg(sum(col("auth")).as("__s"))
      val hRaw = nodes.join(hSums, nodes("domain") === hSums("src"), "left")
        .select(nodes("domain"), coalesce(col("__s"), lit(0L)).as("hub"))
      auth = normalized(aRaw, "auth")
      hub = normalized(hRaw, "hub")
    }
    auth.join(hub, "domain")
      .select(col("domain"), col("auth").as("auth_micro"), col("hub").as("hub_micro"))
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): the biased
    * twin of [[pageRank]] whose teleport mass lands ONLY on a hand-vetted
    * seed set, so trust flows outward from known-good domains and spam
    * farms — however densely they interlink — accumulate none beyond what
    * reputable sites link to them. Crawl curation uses the score as the
    * spam-demotion prior next to PageRank's authority prior.
    *
    * Same integer micro discipline as [[pageRank]] (exact longs, per-edge
    * damping, truncating divisions → associative sums, hash-checkable
    * against a sequential oracle): seeds start at 1 000 000 µ and receive a
    * constant 150 000 µ teleport each round; every other node starts at 0
    * and gets only propagated trust:
    *
    *   trust' = (seed ? 150 000 : 0) + Σ_in ((trust_src div outdeg_src) · 850 000 div 1 000 000)
    *
    * `seeds` is a curated whitelist — inherently small (the paper's point
    * is that a few hundred human-checked seeds suffice), so it ships as a
    * broadcast-trivial literal predicate, never a join.
    */
  def trustRank(edges: DataFrame, seeds: Seq[String], iters: Int = 3): DataFrame = {
    require(seeds.nonEmpty, "trustRank needs at least one seed domain")
    val e = edges.select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val nodes = withDeg.select(col("src").as("domain"))
      .union(withDeg.select(col("dst").as("domain")))
      .distinct()
      .localCheckpoint()
    val isSeed = col("domain").isin(seeds: _*)
    var ranks = nodes.select(col("domain"),
      when(isSeed, lit(1000000L)).otherwise(lit(0L)).as("trust"))
    for (_ <- 1 to iters) {
      val sums = withDeg
        .join(ranks, col("src") === col("domain"))
        .select(col("dst"),
          expr("(trust div outdeg) * 850000 div 1000000").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("s"))
      ranks = nodes
        .join(sums, nodes("domain") === sums("dst"), "left")
        .select(nodes("domain"),
          (when(isSeed, lit(150000L)).otherwise(lit(0L)) +
            coalesce(col("s"), lit(0L))).as("trust"))
    }
    ranks
  }
}
