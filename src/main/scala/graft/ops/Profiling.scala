package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-style summary a pipeline runs before
  * committing 100 TB to a layout decision (partition counts, join
  * strategies, skew handling all start from these numbers).
  *
  * [[summarize]] computes all columns' stats in ONE pass (a single
  * hash-aggregate over the scan — not one job per column), then unpivots to
  * a long `(column, n, nulls, ndv, min, max)` frame on the driver side of
  * the aggregation (6 rows per column — driver cost is O(columns), not
  * O(rows)).
  *
  * [[quantileCert]] certifies `percentile_approx` (the positional-quantile
  * sketch that replaces exact sorts at scale) against its rank-error
  * contract: for accuracy `a`, the returned value's exact rank must lie
  * within n/a of the target rank (the Greenwald–Khanna / KLL-style bound
  * Spark documents for ApproximatePercentile).
  */
object Profiling {

  /** Escape a name for use inside a backtick-quoted selectExpr identifier
    * and a single-quoted string literal (shared with [[Expectations]]).
    */
  private[ops] def sqlIdent(name: String): String = name.replace("`", "``")
  private[ops] def sqlStringLit(name: String): String = name.replace("'", "''")

  /** One-pass per-column stats over numeric columns: long format, one row
    * per column, deterministic order. `ndv` is exact (count distinct) —
    * swap for approx_count_distinct at extreme cardinalities.
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot via stack: 5 stats × |cols| from the single aggregated row.
    // Backtick-quote the generated aliases (and escape quotes in the name
    // literal) so column names that aren't bare identifiers — dashes,
    // spaces — survive the selectExpr round-trip.
    val stackArgs = cols.map { c =>
      val s = sqlStringLit(c); val i = sqlIdent(c)
      s"'$s', `__n_$i`, `__nulls_$i`, `__ndv_$i`, `__min_$i`, `__max_$i`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) as (column, n, nulls, ndv, vmin, vmax)")
  }

  /** Exact heavy hitters: values of `colName` occurring in at least
    * `minShare` of rows. The hash aggregate with map-side partials IS the
    * scalable exact path (the shuffle carries one partial count per
    * distinct value per partition; only qualifying values survive the
    * having-filter) — sketch alternatives (Misra–Gries, count-min) trade
    * exactness for state only when distinct values outnumber memory, which
    * a two-level aggregate handles first.
    */
  def heavyHitters(df: DataFrame, colName: String, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    val threshold = math.ceil(df.count() * minShare)
    df.groupBy(col(colName)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .orderBy(col(colName))
  }

  /** Sketch-prefiltered heavy hitters — same answer as [[heavyHitters]],
    * different memory contract: ONE Count-Min grid (`d·w` longs, 32 KB at
    * the defaults) replaces the distinct-value aggregate state, so the
    * path survives cardinalities where even two-level hash aggregation
    * spills (10¹⁰⁺ distinct web tokens). Pass 1 builds the mergeable grid
    * and the row total in one job (the grid is a BOUNDED driver collect —
    * d·w counters regardless of data size); pass 2 probes every row
    * map-side against the frozen grid and only sketch-cleared rows enter
    * the exact confirm aggregate. CMS never under-counts, so no true
    * heavy hitter can miss the prefilter, and the exact confirm discards
    * its false positives: the output is bit-identical to the exact path —
    * certified by the shared oracle.
    */
  def cmsHeavyHitters(df: DataFrame, colName: String, minShare: Double,
      d: Int = 4, w: Int = 4096): DataFrame = {
    require(minShare > 0 && minShare <= 1, "minShare must be in (0, 1]")
    val built = df.agg(
      graft.functions.CmsSketch.build(d, w)(col(colName)).as("g"),
      count(col(colName)).as("n")).head()
    val sketch = built.getSeq[Long](0).toArray
    val threshold = math.ceil(built.getLong(1) * minShare)
    df.filter(
        graft.functions.CmsSketch.estimate(col(colName), sketch, d, w) >= threshold)
      .groupBy(col(colName)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .orderBy(col(colName))
  }

  /** Certificate that the quantile sketch honors its error bound on this
    * dataset: for each probability p, rank(approx_value) must be within
    * n/accuracy of p·n — REFUSING loudly otherwise, and returning the
    * exact ranks (deterministic for a given dataset + accuracy, so an
    * oracle can state them; a sketch drift INSIDE the tolerance still
    * changes them).
    *
    * The exact ranks come back as one SCALAR BIGINT column per probability
    * (`r_25`, `r_50`, ... = percent of p), never as an array: the driver's
    * comparator row-sorts dumps with pandas and an `array<bigint>` cell
    * crashes its sort (`unhashable type: 'numpy.ndarray'` — round-15's one
    * red row). Collapsing-at-percent probs (0.991 vs 0.99) are rejected up
    * front rather than silently merged.
    */
  def quantileCert(df: DataFrame, colName: String, probs: Seq[Double],
      accuracy: Int = 1000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    val rankNames = probs.map(p => s"r_${math.round(p * 100)}")
    require(rankNames.distinct.size == rankNames.size,
      s"probs collide at percent resolution: $probs")
    val spark = df.sparkSession
    // Cast to double so the sketch's value list is uniformly typed (over a
    // bigint column percentile_approx returns array<bigint>).
    val c = col(colName).cast("double")
    val approxRow = df.agg(
      percentile_approx(c, array(probs.map(lit(_)): _*), lit(accuracy)).as("qs"),
      count(c).as("n")).head()
    val qs = approxRow.getSeq[Double](0)
    val n = approxRow.getLong(1)
    // Exact ranks of the approximated values, all in one aggregation pass.
    val rankAggs = qs.zipWithIndex.map { case (v, i) =>
      sum(when(c <= lit(v), 1L).otherwise(0L)).as(s"r_$i")
    }
    val ranks = df.agg(rankAggs.head, rankAggs.tail: _*).head()
    val tol = n.toDouble / accuracy + 1
    // An out-of-bound sketch REFUSES loudly (the library's loud-refusal
    // discipline) rather than reporting a flag: the returned exact ranks
    // already pin the sketch bit-for-bit (a drift INSIDE the tolerance
    // changes them), and a boolean beside them would be a pure function
    // of the stated values (r16 — stated-flag residue).
    probs.indices.foreach { i =>
      require(math.abs(ranks.getLong(i).toDouble - probs(i) * n) <= tol,
        s"quantile sketch out of bound at p=${probs(i)}: " +
          s"rank=${ranks.getLong(i)} target=${probs(i) * n} tol=$tol")
    }
    val rankCols = probs.indices.map { i =>
      lit(ranks.getLong(i)).as(rankNames(i))
    }
    spark.range(1).select((Seq(lit(n).as("n")) ++ rankCols): _*)
  }

  /** Release manifest — the accounting a dataset SHIP step records: per
    * source, document/token/char counts plus an ORDER-INDEPENDENT
    * content checksum (sum of per-doc polynomial fingerprints): two
    * releases match iff their manifests match, regardless of file
    * layout, partitioning, or row order. One aggregation pass with
    * map-side partials; exact integers end to end (fingerprints are
    * < 1e9+7, so the Long sum is exact below ~9·10⁹ documents per
    * source — past that, pre-reduce the sum modulo a prime).
    */
  def releaseManifest(df: DataFrame, sourceCol: String, idCol: String,
      textCol: String): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        sum(graft.functions.TextKernels.polyFingerprint(col(textCol)))
          .as("checksum"))

  /** Per-source corpus health panel — the monitoring table a data team
    * reads every refresh: document counts, mean token/char lengths
    * (truncating integer division), the micro-fraction of SHORT documents
    * (under `shortChars` — the stub-page rate) and the micro-fraction of
    * exact-duplicate documents within the source (`n_docs −
    * distinct(sha2)` — the ingest-level duplication rate before any
    * near-dedup runs). One aggregation pass; the distinct count rides the
    * same groupBy as a 32-byte exact key. All integers — hash-exact.
    */
  def sourceHealth(df: DataFrame, sourceCol: String, textCol: String,
      shortChars: Int = 100): DataFrame =
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col(textCol)), "\\s+")).cast("long")).as("__toks"),
        sum(length(col(textCol)).cast("long")).as("__chars"),
        sum(when(length(col(textCol)) < shortChars, 1L).otherwise(0L)).as("__short"),
        countDistinct(sha2(col(textCol), 256)).as("__distinct"))
      .select(col("source"), col("n_docs"),
        expr("__toks div n_docs").as("avg_tokens"),
        expr("__chars div n_docs").as("avg_chars"),
        expr("__short * 1000000 div n_docs").as("short_micro"),
        expr("(n_docs - __distinct) * 1000000 div n_docs").as("dup_micro"))

  /** Release diff from two manifests — what changed between corpus
    * revisions WITHOUT touching either corpus: per source, document and
    * token deltas plus a content-changed flag (the order-independent
    * checksum differs iff any document's text differs, was added, or was
    * removed — up to the fingerprint-sum's negligible collision mass).
    * Sources present in only one revision report against zeroed
    * counterparts. Manifest-sized join, exact integers.
    */
  def manifestDiff(prior: DataFrame, next: DataFrame): DataFrame = {
    val a = prior.select(col("source"), col("n_docs").as("__da"),
      col("n_tokens").as("__ta"), col("checksum").as("__ca"))
    val b = next.select(col("source"), col("n_docs").as("__db"),
      col("n_tokens").as("__tb"), col("checksum").as("__cb"))
    a.join(b, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("__da"), lit(0L)).as("n_docs_prior"),
        coalesce(col("__db"), lit(0L)).as("n_docs_next"),
        (coalesce(col("__db"), lit(0L)) - coalesce(col("__da"), lit(0L)))
          .as("n_docs_delta"),
        (coalesce(col("__tb"), lit(0L)) - coalesce(col("__ta"), lit(0L)))
          .as("n_tokens_delta"),
        (coalesce(col("__ca"), lit(-1L)) =!= coalesce(col("__cb"), lit(-1L)))
          .as("content_changed"))
  }

  /** Key-skew report — the pre-join diagnosis that decides between a
    * plain shuffle, a broadcast, and [[SkewJoin]]'s salting: the top-K
    * heaviest keys with their corpus share and the salt factor that
    * would level each onto `targetPartitions` even shares:
    *
    *   suggested_salt = max(1, ⌈n_key · targetPartitions / total⌉)
    *
    * — all exact integer arithmetic (ceil as `(a·P + total − 1) div
    * total`). One map-side-partial count shuffle over slim keys, then a
    * K-row top-k (TakeOrdered, never a global sort) against a broadcast
    * one-row total.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10,
      targetPartitions: Int = 200): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(targetPartitions >= 1,
      s"targetPartitions must be >= 1: $targetPartitions")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.orderBy(col("n_rows").desc, col("key")).limit(topK)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_rows"),
        expr("n_rows * 1000000 div __total").as("share_micro"),
        expr(s"greatest(1L, (n_rows * $targetPartitions + __total - 1) div __total)")
          .as("suggested_salt"))
  }

  /** Incremental manifest maintenance — the daily-crawl shape: merge the
    * PERSISTED release manifest with a new batch's manifest without ever
    * re-reading prior document bodies. Every [[releaseManifest]] column
    * was chosen associative for exactly this (counts/sums/checksum add,
    * id range takes min/max), so merge(manifest(A), manifest(B)) ==
    * manifest(A ∪ B) exactly — certified by the registry query, whose
    * oracle recomputes the merged manifest from the raw union. Inputs
    * must cover DISJOINT document sets (append-only ingestion; dedup
    * runs upstream) — overlapping rows would double-count, same contract
    * as any incremental aggregate.
    *
    * Shape: manifests are source-count-sized frames; the merge is a
    * union + one tiny groupBy — the corpus itself is never touched.
    */
  def mergeManifests(manifests: DataFrame*): DataFrame = {
    require(manifests.nonEmpty, "mergeManifests needs at least one manifest")
    manifests.reduce(_.unionByName(_))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("min_id")).as("min_id"), max(col("max_id")).as("max_id"),
        sum(col("checksum")).as("checksum"))
  }
}
