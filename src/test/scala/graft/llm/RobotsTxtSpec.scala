package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.RobotsKernels

/** robots.txt parser kernel + REP longest-prefix matching gate. */
class RobotsTxtSpec extends SparkTestBase {
  import spark.implicits._

  private def rules(txt: String): Seq[(Boolean, String)] =
    Seq(txt).toDF("t")
      .select(explode(RobotsKernels.wildcardRules(col("t"))).as("r"))
      .select(col("r.allow"), col("r.prefix"))
      .as[(Boolean, String)].collect().toSeq

  test("parser: records, agent scoping, comments, unknown directives") {
    val txt =
      """# policy
        |User-agent: googlebot
        |Disallow: /
        |
        |User-agent: bingbot
        |User-agent: *
        |Disallow: /a   # trailing comment
        |Allow: /a/b
        |Crawl-delay: 10
        |Sitemap: https://x/s.xml
        |
        |User-agent: yandex
        |Disallow: /c
        |""".stripMargin
    // only the record containing * contributes; shared-agent record works
    assert(rules(txt) == Seq((false, "/a"), (true, "/a/b")))
  }

  test("parser: empty Disallow is allow-all; case/space tolerance; CRLF") {
    assert(rules("User-agent: *\nDisallow:\n") == Seq())
    assert(rules("USER-AGENT : *\r\nDISALLOW : /x\r\nallow: /x/y\r\n") ==
      Seq((false, "/x"), (true, "/x/y")))
    assert(rules("User-agent: googlebot\nDisallow: /\n") == Seq())
    assert(rules("") == Seq())
  }

  test("sitemaps: agent-independent, any record, comments stripped") {
    val txt =
      """User-agent: googlebot
        |Sitemap: https://a/s1.xml
        |User-agent: *
        |Disallow: /x
        |sitemap: https://a/s2.xml  # lowercase directive, trailing comment
        |Sitemap:
        |""".stripMargin
    val got = Seq(txt).toDF("t")
      .select(explode(RobotsKernels.sitemaps(col("t"))).as("s"))
      .as[String].collect().toSeq
    assert(got == Seq("https://a/s1.xml", "https://a/s2.xml")) // empty value skipped
  }

  test("gate: longest prefix wins, ties prefer Allow, absent domain allows") {
    val robots = Seq(
      ("d.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\nDisallow: /p/ok\n"),
      ("open.com", "User-agent: *\nDisallow:\n"))
      .toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://www.d.com/p/x"),      // Disallow /p → drop
      (2L, "https://www.d.com/p/ok/y"),   // Allow /p/ok ties Disallow /p/ok → keep
      (3L, "https://www.d.com/free"),     // no rule matches → keep
      (4L, "https://www.open.com/p/x"),   // allow-all domain → keep
      (5L, "https://no-robots.com/x"))    // domain without robots → keep
      .toDF("id", "url")
    val kept = RobotsTxt.allowedGate(urls, "url", robots, "domain", "robots_txt")
      .select(col("id")).as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L))
  }
}
