package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Link-graph family: href → registered-domain edge extraction (scheme
  * gate, self-edge drop, case folding, multiplicity) and the integer
  * micro-rank PageRank against hand-computed power-iteration values.
  */
class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  test("hostEdges: scheme gate, self-edges drop, domains fold, links count") {
    val pages = Seq(
      ("www.one.com",
        """<a href="https://www.two.com/a">1</a><a href="HTTPS://WWW.TWO.COM/b">2</a>
          |<a href="https://news.three.co.uk/c">3</a>
          |<a href="http://www.one.com/self">me</a>
          |<a href="mailto:x@two.com">m</a><a href="/rel/p">r</a>""".stripMargin),
      ("news.three.co.uk", """<a href="https://www.one.com/x">1</a>"""))
      .toDF("host", "html")
    val got = LinkGraph.hostEdges(pages, col("host"), col("html"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("one.com", "two.com", 2L),        // mixed-case link folds in
      ("one.com", "three.co.uk", 1L),    // multi-label suffix resolves
      ("three.co.uk", "one.com", 1L)))   // self/mailto/relative all gone
  }

  test("pageRank: hand-computed integer micro-rank, two damped rounds") {
    // A→B, A→C, B→A, C→A: outdeg A=2, B=C=1.
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"))
      .toDF("src_domain", "dst_domain")
    // r1: A = 150000 + 2·850000 = 1850000; B = C = 150000 + 425000 = 575000
    // r2: A = 150000 + 2·(575000·850000 div 10⁶)        = 1127500
    //     B = C = 150000 + (1850000 div 2)·850000 div 10⁶ = 936250
    val got = LinkGraph.pageRank(edges, iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1127500L, "B" -> 936250L, "C" -> 936250L))
  }

  test("anchorTerms: per-target term counts, top-k rank, gates hold") {
    val pages = Seq(
      ("www.one.com",
        """<a href="https://www.two.com/a">great search site</a>
          |<a href="https://www.two.com/b">search</a>
          |<a href="http://www.one.com/self">home</a>
          |<a href="mailto:x@two.com">mail me</a>""".stripMargin),
      ("www.three.com", """<a href="https://www.two.com/c">search engine</a>"""))
      .toDF("host", "html")
    val got = LinkGraph.anchorTerms(pages, col("host"), col("html"), k = 2)
      .as[(String, String, Long)].collect().toSet
    // two.com: search×3, engine/great/site×1 → top-2 = search, engine (lex)
    assert(got == Set(("two.com", "search", 3L), ("two.com", "engine", 1L)))
  }

  test("trustRank: trust flows only outward from seeds, spam ring gets none") {
    // Seed S → A → B, plus a 2-cycle spam farm X⇄Y with no inbound from
    // the trusted region. outdeg: S=1, A=1, X=1, Y=1; B dangling.
    val edges = Seq(("S", "A"), ("A", "B"), ("X", "Y"), ("Y", "X"))
      .toDF("src_domain", "dst_domain")
    // r0: S=1000000, rest 0.
    // r1: S = 150000; A = (1000000 div 1)·850000 div 10⁶ = 850000; B=X=Y=0.
    // r2: S = 150000; A = 150000·850000 div 10⁶ = 127500;
    //     B = 850000·850000 div 10⁶ = 722500; X=Y=0 forever.
    val got = LinkGraph.trustRank(edges, seeds = Seq("S"), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("S" -> 150000L, "A" -> 127500L, "B" -> 722500L,
      "X" -> 0L, "Y" -> 0L))
  }

  test("hits: hand-computed two-round hub/authority duality") {
    // S→A, S→B, A→B. Round 1: a = (0, 1e6, 2e6) (already sum-normal);
    // h_raw = (3e6, 2e6, 0) → ·3·10⁶ div 5e6 = (1800000, 1200000, 0).
    // Round 2: a_raw = (0, 1800000, 3000000) → (0, 1125000, 1875000);
    // h_raw (from RAW a) = (4800000, 3000000, 0) → (1846153, 1153846, 0).
    val edges = Seq(("S", "A"), ("S", "B"), ("A", "B"))
      .toDF("src_domain", "dst_domain")
    val got = LinkGraph.hits(edges, iters = 2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      "S" -> ((0L, 1846153L)),
      "A" -> ((1125000L, 1153846L)),
      "B" -> ((1875000L, 0L))))
  }

  test("trustRank: multiple seeds each hold the teleport base") {
    val edges = Seq(("S1", "S2"), ("S2", "S1")).toDF("src_domain", "dst_domain")
    // r1: each = 150000 + (1000000 div 1)·850000 div 10⁶ = 1000000.
    val got = LinkGraph.trustRank(edges, seeds = Seq("S1", "S2"), iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("S1" -> 1000000L, "S2" -> 1000000L))
  }

  test("pageRank: dangling destination keeps base rank plus inbound") {
    // B has no outlinks: it must still appear as a node, receive inbound
    // rank, and simply leak its own (the standard simplification).
    val edges = Seq(("A", "B")).toDF("src_domain", "dst_domain")
    val got = LinkGraph.pageRank(edges, iters = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 150000L, "B" -> (150000L + 850000L)))
  }
}
