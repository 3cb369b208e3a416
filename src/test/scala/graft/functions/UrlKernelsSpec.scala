package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.llm.UrlOps

/** The single-pass URL kernels against their executable specification,
  * [[UrlOps.regexSpec]] (the regexp formulation the DuckDB oracles
  * mirror): every field must agree on a fuzzed URL corpus plus the
  * hand-picked degenerate shapes. `UrlOpsSpec` covers the semantics
  * themselves; this spec covers kernel ≡ spec.
  */
class UrlKernelsSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic fuzz corpus: cross-product of scheme/authority/path/
    * query/fragment fragments, including degenerate and non-URL shapes.
    */
  private lazy val fuzz: Seq[String] = {
    val schemes = Seq("http://", "HTTPS://", "ftp+ssh://", "a.-+://", "", "1http://", "http:/",
      "http:", "://")
    val auths = Seq("ex.com", "WWW.Example.COM", "a.b.news.co.uk", "192.168.0.1", "host:8080",
      "host:80", "host:", "host::", "a:b:443", "ab:12x", "", "user@ex.com")
    val paths = Seq("", "/", "/a/b.html", "/a b", "//double")
    val tails = Seq("", "?", "?q=1&r=2", "#frag", "?q=1#frag", "#f?notquery", "?#")
    val whole = for (s <- schemes; a <- auths; p <- paths; t <- tails) yield s + a + p + t
    whole ++ Seq("", "not a url", "x", "junk?q=1", "weird#f", "a//b", ":// ")
  }

  test("all parse fields and normalize agree with regexSpec on the fuzz corpus") {
    val df = fuzz.toDF("u")
    val cmp = df.select(
      col("u"),
      UrlKernels.urlScheme(col("u")).as("k_scheme"), UrlOps.regexSpec.urlScheme(col("u")).as("s_scheme"),
      UrlKernels.urlHost(col("u")).as("k_host"), UrlOps.regexSpec.urlHost(col("u")).as("s_host"),
      UrlKernels.urlPort(col("u")).as("k_port"), UrlOps.regexSpec.urlPort(col("u")).as("s_port"),
      UrlKernels.urlPath(col("u")).as("k_path"), UrlOps.regexSpec.urlPath(col("u")).as("s_path"),
      UrlKernels.urlQuery(col("u")).as("k_query"), UrlOps.regexSpec.urlQuery(col("u")).as("s_query"),
      UrlKernels.normalizeUrl(col("u")).as("k_norm"), UrlOps.regexSpec.normalizeUrl(col("u")).as("s_norm"))
    val bad = cmp.filter(
      !(col("k_scheme") <=> col("s_scheme")) || !(col("k_host") <=> col("s_host")) ||
      !(col("k_port") <=> col("s_port")) || !(col("k_path") <=> col("s_path")) ||
      !(col("k_query") <=> col("s_query")) || !(col("k_norm") <=> col("s_norm")))
      .collect()
    assert(bad.isEmpty, s"kernel/spec divergence on ${bad.length} URLs, first: ${bad.headOption}")
  }

  test("registeredDomain agrees with regexSpec on fuzzed hosts") {
    val hosts = Seq(
      "www.example.com", "example.com", "localhost", "a.b.news.co.uk", "news.co.uk", "co.uk",
      "example.com.au", "x.example.com.au", "192.168.0.1", "10.0.0.1.2.3", "a.b.c.d.e",
      "", "a", "a.", ".a", "a..b", "sub.org.uk", "deep.sub.org.uk", "1.2", "1.2.3.4.co.uk")
    val df = hosts.toDF("h")
    val bad = df.select(
        col("h"),
        UrlKernels.registeredDomain(col("h"), UrlOps.multiLabelSuffixes).as("k"),
        UrlOps.regexSpec.registeredDomain(col("h")).as("s"))
      .filter(!(col("k") <=> col("s"))).collect()
    assert(bad.isEmpty, s"registeredDomain divergence: ${bad.mkString(", ")}")
  }

  test("interpreted eval path matches codegen (nullSafeEval vs doGenCode)") {
    // Column ops on a literal-free plan go through codegen; force the
    // interpreted path via direct expression eval on the same inputs.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val inputs = Seq("HTTP://Ex.COM:80/p?q=1#f", "https://a.co.uk", "junk", "")
    for (u <- inputs; part <- Seq("scheme", "host", "path", "query", "normalize")) {
      val viaEval = UrlStringPart(Literal(UTF8String.fromString(u), org.apache.spark.sql.types.StringType), part).eval(null)
      val colFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column = part match {
        case "scheme" => UrlKernels.urlScheme
        case "host" => UrlKernels.urlHost
        case "path" => UrlKernels.urlPath
        case "query" => UrlKernels.urlQuery
        case "normalize" => UrlKernels.normalizeUrl
      }
      val viaDf = Seq(u).toDF("u").select(colFn(col("u"))).collect().head.get(0)
      val evalStr = if (viaEval == null) null else viaEval.toString
      assert(evalStr == viaDf, s"eval/codegen divergence for $part on '$u'")
    }
  }
}
