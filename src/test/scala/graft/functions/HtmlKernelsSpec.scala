package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** HTML → text extraction kernel: tag stripping, raw-element drop, entity
  * decode, whitespace collapse, truncated-page tolerance — checked through
  * the Column API (codegen path) against hand-derived expectations.
  */
class HtmlKernelsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(html: String*): Seq[String] =
    html.toDF("h").select(HtmlKernels.htmlToText(col("h")).as("t"))
      .as[String].collect().toSeq

  test("tags strip to word breaks; whitespace collapses; ends trim") {
    assert(run("<p>a</p><p>b</p>") == Seq("a b"))
    assert(run("  <div> hello   <b>bold</b>world </div> ") == Seq("hello bold world"))
    assert(run("<br/>x<img src='y.png'>z") == Seq("x z"))
  }

  test("script and style content drops, case-insensitively, attributes allowed") {
    assert(run("a<script>var x = '<b>not text</b>';</script>b") == Seq("a b"))
    assert(run("a<STYLE type=\"text/css\">p { color: red }</STYLE>b") == Seq("a b"))
    assert(run("<scripty>keep</scripty>") == Seq("keep")) // not a script tag
  }

  test("comments drop; entities decode; unknown entities pass through") {
    assert(run("a<!-- <p>gone</p> -->b") == Seq("a b"))
    assert(run("x &amp; y &lt;z&gt; &quot;q&quot; &#65;&#x42;") == Seq("x & y <z> \"q\" AB"))
    assert(run("5 &undefined; 6") == Seq("5 &undefined; 6"))
    assert(run("a&nbsp;&nbsp;b") == Seq("a b")) // nbsp collapses as whitespace
  }

  test("truncated pages keep the text extracted so far") {
    assert(run("good text <script>never closes") == Seq("good text"))
    assert(run("good <b unclosed") == Seq("good"))
    assert(run("good <!-- open comment") == Seq("good"))
  }

  test("null-safety and empty input") {
    val out = Seq[Option[String]](None, Some(""), Some("<p></p>"))
      .toDF("h").select(HtmlKernels.htmlToText(col("h")).as("t"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(None, Some(""), Some("")))
  }

  private def main(html: String, minLen: Int = 25, maxLinkPermille: Int = 200): String =
    Seq(html).toDF("h")
      .select(HtmlKernels.mainContent(col("h"), minLen, maxLinkPermille).as("t"))
      .as[String].collect().head

  test("mainContent: link-dense nav and short blocks drop, prose survives") {
    val page =
      """<nav><a href="/">home page</a> <a href="/a">about us team</a></nav>
        |<h1>Doc 7</h1>
        |<p>this is the long article paragraph with plenty of prose content in it</p>
        |<footer>copyright 2026</footer>""".stripMargin
    assert(main(page) ==
      "this is the long article paragraph with plenty of prose content in it")
  }

  test("mainContent: moderate in-prose links survive; two good blocks join with newline") {
    val page =
      "<p>read the <a href='/d'>docs</a> for all the configuration details here</p>" +
        "<div>another sufficiently long block of plain prose without any links</div>"
    // block 1: textLen 55, linkChars 4 → 4000 ≤ 200·55 = 11000 → keep
    assert(main(page) ==
      "read the docs for all the configuration details here\n" +
        "another sufficiently long block of plain prose without any links")
  }

  test("mainContent: all-link block drops even when long; pure-link page yields empty") {
    val rail = (1 to 8).map(i => s"<a href='/$i'>related article number $i</a>").mkString(" ")
    assert(main(s"<aside>$rail</aside>") == "")
    // same text without anchors is prose → kept
    val prose = (1 to 8).map(i => s"related article number $i").mkString(" ")
    assert(main(s"<aside>$prose</aside>") == prose)
  }

  test("mainContent: script/comments never count; entities decode; trailing text flushes") {
    val page = "<p>alpha &amp; beta gamma delta epsilon zeta eta</p>" +
      "<script>var x = 'not visible text at all';</script>" +
      "trailing tail text after the last closing tag runs long enough"
    assert(main(page) ==
      "alpha & beta gamma delta epsilon zeta eta\n" +
        "trailing tail text after the last closing tag runs long enough")
  }

  test("mainContent: article tag is a boundary, not an anchor (whole-name match)") {
    val page = "<article>the article element starts a block not an anchor here</article>"
    assert(main(page) ==
      "the article element starts a block not an anchor here")
  }

  test("metaRobots: quote styles, case, token-not-substring noindex gate") {
    val cases = Seq(
      ("""<head><meta name="robots" content="noindex, nofollow"></head>""",
        Some("noindex, nofollow"), true),
      ("""<head><meta NAME='ROBOTS' Content='INDEX, follow'></head>""",
        Some("index, follow"), false),
      ("""<head><meta name="robots" content="NOINDEX"></head>""", Some("noindex"), true),
      // substring must not match the token gate
      ("""<meta name="robots" content="nonoindexy">""", Some("nonoindexy"), false),
      ("""<head><title>no directive</title></head>""", None, false),
      ("""<meta name="viewport" content="width=device-width">""", None, false))
    val got = cases.map(_._1).toDF("h")
      .select($"h", HtmlKernels.metaRobots($"h"), HtmlKernels.robotsNoindex($"h"))
      .as[(String, Option[String], Boolean)].collect().toSeq
    got.zip(cases).foreach { case ((_, robots, noindex), (html, wantR, wantN)) =>
      assert(robots == wantR && noindex == wantN, s"html: $html")
    }
  }

  private def hrefs(html: String*): Seq[Seq[String]] =
    html.toDF("h").select(HtmlKernels.hrefs(col("h")).as("a"))
      .as[Seq[String]].collect().toSeq

  test("hrefs: quote styles, attribute order, case, first-href-wins") {
    assert(hrefs("""<a href="http://x.com/1">t</a> <a href='y'>u</a>""") ==
      Seq(Seq("http://x.com/1", "y")))
    assert(hrefs("""<a class="big" HREF=plain rel="nofollow">t</a>""") ==
      Seq(Seq("plain")))
    assert(hrefs("""<A href = "spaced">t</A>""") == Seq(Seq("spaced")))
    assert(hrefs("""<a href="first" href="second">t</a>""") == Seq(Seq("first")))
  }

  test("hrefs: anchors inside script/style/comments do not count") {
    assert(hrefs(
      """<a href="real">r</a><script>var s = '<a href="js">x</a>';</script>
        |<!-- <a href="ghost">g</a> --><style>a[href="css"]{}</style>""".stripMargin) ==
      Seq(Seq("real")))
  }

  test("anchors: (href, text) pairs; inner markup strips; truncation drops") {
    val got = Seq(
      """<a href="http://x.com">Example <b>Site</b></a> mid <a href='y'>two</a>""",
      """<a name="frag">no href</a><a href="z"></a><a href="w">kept</a>""",
      """<script><a href="js">x</a></script><a href="real">r &amp; s</a>""",
      """<a href="trunc">never closes""")
      .toDF("h").select(HtmlKernels.anchors(col("h")).as("a"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(got == Seq(
      Seq(("http://x.com", "Example Site"), ("y", "two")),
      Seq(("z", ""), ("w", "kept")),
      Seq(("real", "r & s")),
      Seq()))
  }

  test("hrefs: empty values, missing href, truncation, no anchors") {
    assert(hrefs("""<a href="">e</a><a name="frag">f</a>""") == Seq(Seq()))
    assert(hrefs("""<a href="unterminated""") == Seq(Seq()))
    assert(hrefs("plain text, no anchors") == Seq(Seq()))
    // an abbreviation tag is not an anchor
    assert(hrefs("""<abbr href="nope">a</abbr>""") == Seq(Seq()))
  }
}
