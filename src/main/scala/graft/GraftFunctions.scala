package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SQL-surface registration for graft's native Catalyst kernels, so SQL
  * users (and `spark.sql(...)` pipelines) get the same codegen'd operators
  * the DataFrame API exposes:
  *
  * {{{
  * SELECT vec_dot(a.embedding, b.embedding),
  *        minhash_murmur_sig(text, 3, 64),
  *        graft_fingerprint(text)
  * }}}
  *
  * Two deployment routes, same function set:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection path, applied to
  *    every session built in the application);
  *  - per-session at runtime: `GraftFunctions.register(spark)` for
  *    sessions that already exist (goes through the same builder list via
  *    the session's own extension hook in `org.apache.spark.sql`).
  *
  * Int parameters (shingle size, hash count, n-gram n) arrive as SQL
  * literals and are folded at registration — non-literal arguments are
  * rejected at analysis time, mirroring the plan-time `require` checks the
  * kernel constructors perform.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** (name, description, builder) for every exposed kernel. */
  val functions: Seq[(String, String, FunctionBuilder)] = Seq(
    ("vec_dot", "dot product of two double arrays",
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("vec_l2distsq", "squared L2 distance of two double arrays",
      (args: Seq[Expression]) => L2DistSq(args(0), args(1))),
    ("minhash_murmur_sig", "murmur3 MinHash signature: (text, shingleSize, numHashes)",
      (args: Seq[Expression]) => MinHashMurmurSig(args(0),
        intLit(args(1), "minhash_murmur_sig", "shingleSize"),
        intLit(args(2), "minhash_murmur_sig", "numHashes"))),
    ("minhash_poly_sig", "polynomial-hash MinHash signature: (text, shingleSize, numHashes)",
      (args: Seq[Expression]) => MinHashPolySig(args(0),
        intLit(args(1), "minhash_poly_sig", "shingleSize"),
        intLit(args(2), "minhash_poly_sig", "numHashes"))),
    ("simhash_xx_sig", "xxhash64 SimHash signature of whitespace tokens",
      (args: Seq[Expression]) => SimHashXxSig(args(0))),
    ("simhash_poly_sig", "polynomial-hash SimHash signature",
      (args: Seq[Expression]) => SimHashPolySig(args(0))),
    ("word_ngrams_distinct", "distinct word n-grams: (text, n)",
      (args: Seq[Expression]) => WordNgramsDistinct(args(0),
        intLit(args(1), "word_ngrams_distinct", "n"))),
    ("word_ngram_count", "distinct word n-gram count: (text, n)",
      (args: Seq[Expression]) => WordNgramCount(args(0),
        intLit(args(1), "word_ngram_count", "n"))),
    ("char_ngram_count", "distinct char n-gram count: (text, n)",
      (args: Seq[Expression]) => CharNgramCount(args(0),
        intLit(args(1), "char_ngram_count", "n"))),
    ("graft_fingerprint", "rolling polynomial fingerprint of a string",
      (args: Seq[Expression]) => PolyFingerprint(args(0))),
    ("word_ngram_fps", "fingerprints of ALL word n-grams in position order: (text, n)",
      (args: Seq[Expression]) => WordNgramFps(args(0),
        intLit(args(1), "word_ngram_fps", "n"))),
    ("luhn_valid", "Luhn checksum validity of a candidate card number (13-19 digits)",
      (args: Seq[Expression]) => LuhnValid(args(0))),
    ("html_to_text", "one-pass HTML to text extraction (tags stripped, entities decoded)",
      (args: Seq[Expression]) => HtmlToText(args(0))),
    ("html_hrefs", "anchor href targets in document order (script/style/comments excluded)",
      (args: Seq[Expression]) => HtmlHrefs(args(0))),
    ("html_anchors", "anchor (href, text) struct pairs in document order",
      (args: Seq[Expression]) => HtmlAnchors(args(0))),
    ("norm_text", "NFC normalization + control strip + space/tab collapse + end trim",
      (args: Seq[Expression]) => NormText(args(0))),
    ("robots_rules", "wildcard-agent (allow, prefix) rules of a robots.txt body",
      (args: Seq[Expression]) => RobotsWildcardRules(args(0))),
    ("robots_sitemaps", "Sitemap directive values of a robots.txt body (agent-independent)",
      (args: Seq[Expression]) => RobotsSitemaps(args(0))),
    ("url_scheme", "lowercased URL scheme, null for non-URLs",
      (args: Seq[Expression]) => UrlStringPart(args(0), "scheme")),
    ("url_host", "lowercased URL host, port stripped, null for non-URLs",
      (args: Seq[Expression]) => UrlStringPart(args(0), "host")),
    ("url_path", "URL path; empty path reads as '/'",
      (args: Seq[Expression]) => UrlStringPart(args(0), "path")),
    ("url_query", "URL query string sans '?', null when absent",
      (args: Seq[Expression]) => UrlStringPart(args(0), "query")),
    ("url_normalize", "crawl-normal URL form (case-folded, default ports and fragments dropped)",
      (args: Seq[Expression]) => UrlStringPart(args(0), "normalize")),
    ("url_port", "explicit URL port as a long, null when absent",
      (args: Seq[Expression]) => UrlPort(args(0))),
    ("registered_domain", "registrable domain of a HOST (core multi-label public suffixes)",
      (args: Seq[Expression]) => RegisteredDomain(args(0), graft.llm.UrlOps.multiLabelSuffixes))
  )

  /** Inject into a `SparkSessionExtensions` (the `spark.sql.extensions`
    * route — see [[GraftExtensions]]): the SQL function set plus the
    * opt-in range-join rewrite rule (inert until
    * `spark.graft.rangeJoin.bucketWidth` is set).
    */
  def inject(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, desc, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, desc), builder))
    }
    e.injectOptimizerRule(graft.plans.RangeJoinRule.apply)
    // channel-slice projection pushdown for the sdfits connector; must be
    // an operator-optimization rule (NOT extraOptimizations) so it runs
    // before V2ScanRelationPushDown builds the scan
    e.injectOptimizerRule(_ => graft.plans.SdfitsSliceRule)
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftRegistrar.register(spark, functions)
}

/** `spark.sql.extensions=graft.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
