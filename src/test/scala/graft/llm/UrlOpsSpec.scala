package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** URL parse/normalize/registered-domain/blocklist/dedup semantics on
  * hand-picked URLs covering the RFC-subset contract.
  */
class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(u: String): org.apache.spark.sql.DataFrame = Seq(u).toDF("url")

  test("parse splits scheme/host/port/path/query; case folds; fragment ignored") {
    val r = one("HTTP://WWW.Example.COM:8080/A/b?x=1&y=2#frag")
      .select(UrlOps.urlScheme($"url"), UrlOps.urlHost($"url"), UrlOps.urlPort($"url"),
        UrlOps.urlPath($"url"), UrlOps.urlQuery($"url"))
      .as[(String, String, Option[Long], String, String)].head()
    assert(r == (("http", "www.example.com", Some(8080L), "/A/b", "x=1&y=2")))
  }

  test("missing pieces: no port, empty path → '/', no query → null, non-URL → nulls") {
    val r = one("https://ex.com")
      .select(UrlOps.urlScheme($"url"), UrlOps.urlHost($"url"), UrlOps.urlPort($"url"),
        UrlOps.urlPath($"url"), UrlOps.urlQuery($"url"))
      .as[(String, String, Option[Long], String, Option[String])].head()
    assert(r == (("https", "ex.com", None, "/", None)))
    val bad = one("definitely not a url")
      .select(UrlOps.urlScheme($"url"), UrlOps.urlHost($"url"))
      .as[(Option[String], Option[String])].head()
    assert(bad == ((None, None)))
  }

  test("registeredDomain: two labels, multi-label public suffix, IP, short hosts") {
    val cases = Seq(
      "www.example.com" -> "example.com",
      "a.b.news.co.uk" -> "news.co.uk",
      "deep.sub.domain.example.org" -> "example.org",
      "example.com.au" -> "example.com.au",
      "192.168.0.1" -> "192.168.0.1",
      "localhost" -> "localhost",
      "co.uk" -> "co.uk")
    val got = cases.map(_._1).toDF("h")
      .select($"h", UrlOps.registeredDomain($"h")).as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(got(h) == want, s"host $h") }
  }

  test("normalizeUrl drops default ports and fragments, keeps real ports and query") {
    val cases = Seq(
      "HTTP://Ex.COM:80/p#f" -> "http://ex.com/p",
      "https://Ex.com:443/" -> "https://ex.com/",
      "https://ex.com:8443/p?a=1#x" -> "https://ex.com:8443/p?a=1",
      "http://ex.com" -> "http://ex.com/",
      "nope" -> null)
    val got = cases.map(_._1).toDF("u")
      .select($"u", UrlOps.normalizeUrl($"u")).as[(String, Option[String])].collect().toMap
    cases.foreach { case (u, want) => assert(got(u) == Option(want), s"url $u") }
  }

  test("blocklist drops by registrable domain; non-URLs survive") {
    val df = Seq(
      (1L, "http://ads.blocked.net/x"),
      (2L, "http://sub.ads.blocked.net/y"),
      (3L, "http://fine.example.com/z"),
      (4L, "not a url")).toDF("id", "url")
    val kept = UrlOps.filterBlockedDomains(df, "url", Seq("blocked.net"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L))
    val keptDf = UrlOps.filterBlockedDomainsDf(df, "url", Seq("blocked.net").toDF("domain"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(keptDf == Seq(3L, 4L))
  }

  test("normalizeUrlStrict strips tracking params by key, keeps real ones") {
    val cases = Seq(
      "https://Ex.COM/p?utm_source=n&x=1&utm_campaign=c#f" -> "https://ex.com/p?x=1",
      "http://site.com:80/q?gclid=abc" -> "http://site.com/q",
      "https://a.io/r?x=1&y=2" -> "https://a.io/r?x=1&y=2",
      // key match is exact/prefixed, not substring: 'xutm_a' and 'agclid' keep
      "https://a.io/s?xutm_a=1&agclid=2" -> "https://a.io/s?xutm_a=1&agclid=2",
      // a VALUE containing a tracking key is not a key
      "https://a.io/t?next=gclid" -> "https://a.io/t?next=gclid",
      "junk" -> null)
    val got = cases.map(_._1).toDF("u")
      .select($"u", UrlOps.normalizeUrlStrict($"u")).as[(String, Option[String])]
      .collect().toMap
    cases.foreach { case (u, want) => assert(got(u) == Option(want), s"url $u") }
  }

  test("politenessSlots: ≤ perSlot URLs per host per round, priority order, null host → null slot") {
    val df = Seq(
      (5L, "http://a.com/p5"), (1L, "http://a.com/p1"), (3L, "http://a.com/p3"),
      (2L, "http://a.com/p2"), (4L, "http://a.com/p4"),
      (6L, "http://b.org/x"), (7L, "http://b.org/y"),
      (8L, "not a url")).toDF("id", "url")
    val out = UrlOps.politenessSlots(df, "url", "id", perSlot = 2)
      .select($"id", $"host", $"slot")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // a.com by priority (id): 1,2 → slot 0; 3,4 → slot 1; 5 → slot 2
    assert(Seq(1L, 2L).forall(out(_)._3.contains(0L)))
    assert(Seq(3L, 4L).forall(out(_)._3.contains(1L)))
    assert(out(5L)._3.contains(2L))
    // b.org schedules independently from round 0
    assert(out(6L)._3.contains(0L) && out(7L)._3.contains(0L))
    // non-URL: null host, null slot, row preserved
    assert(out(8L)._2.isEmpty && out(8L)._3.isEmpty)
    // global invariant: no (host, slot) bucket exceeds perSlot
    val buckets = out.values.collect { case (_, Some(h), Some(sl)) => (h, sl) }
      .groupBy(identity).map(_._2.size)
    assert(buckets.forall(_ <= 2))
  }

  test("dedupByUrl keeps first by order per normalized URL; non-URLs all pass") {
    val df = Seq(
      (10L, "http://EX.com:80/a"),
      (11L, "http://ex.com/a"),      // same normalized URL as 10
      (12L, "http://ex.com/b"),
      (13L, "junk"),
      (14L, "junk")).toDF("id", "url")
    val kept = UrlOps.dedupByUrl(df, "url", "id").select($"id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 12L, 13L, 14L))
  }

  test("capPerDomain: best-k per registered domain, WindowGroupLimit plan, null pass-through") {
    // 6 docs on a.com (subdomains fold into one registered domain),
    // 2 on b.co.uk (multi-label suffix), 1 null host.
    val df = Seq(
      (1L, "www.a.com", 50L), (2L, "cdn.a.com", 90L), (3L, "a.com", 70L),
      (4L, "www.a.com", 90L), (5L, "a.com", 10L), (6L, "www.a.com", 30L),
      (7L, "news.b.co.uk", 5L), (8L, "b.co.uk", 99L),
      (9L, null.asInstanceOf[String], 42L)).toDF("id", "host", "score")
    val capped = UrlOps.capPerDomain(df, "host", "score", "id", maxPerDomain = 3)
    val rows = capped.as[(Long, String, Long, String, java.lang.Long)].collect()
      .map(r => (r._4, r._5, r._1)).sortBy(t => (Option(t._1).getOrElse(""), Option(t._2).map(_.toLong).getOrElse(99L)))
    // a.com keeps ids 2,4 (score 90, id tiebreak) then 3 (70); 1/5/6 dropped
    assert(rows.filter(_._1 == "a.com").map(t => (t._2.toLong, t._3)).toSeq ==
      Seq((1L, 2L), (2L, 4L), (3L, 3L)))
    // b.co.uk under cap: both kept, best-first
    assert(rows.filter(_._1 == "b.co.uk").map(t => (t._2.toLong, t._3)).toSeq ==
      Seq((1L, 8L), (2L, 7L)))
    // null host passes through with null rank
    assert(rows.exists(t => t._1 == null && t._2 == null && t._3 == 9L))
    // the rank filter must plan as WindowGroupLimit (bounded map-side
    // top-k), not a full window sort feeding a filter
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("urlTemplate: hex runs collapse before digit runs, braces literal") {
    val got = Seq(
      "https://a.com/cal/2026/day/14",
      "https://a.com/item/12/s/000000000000beef",
      "https://a.com/plain/path",
      "https://a.com/deadbeefdeadbeef01",   // 18 hex chars → one {h}
      "https://a.com/abc123def")            // short hex-ish: only digits fold
      .toDF("url").select(UrlOps.urlTemplate($"url")).as[String].collect().toSeq
    assert(got == Seq("/cal/{n}/day/{n}", "/item/{n}/s/{h}", "/plain/path",
      "/{h}", "/abc{n}def"))
  }

  test("templateReport + trapGate: scale-invariant flag, capped survivors") {
    // 12 calendar-trap URLs on one host/template, 4 organic across two
    // templates, one non-URL. Corpus (with host) = 16; 5% threshold →
    // trap needs > 0.8 URLs... use 200000µ (20%): trap group 12/16 = 75%
    // flags, organic 2/16 = 12.5% does not.
    val rows = (1L to 12L).map(i => (i, s"https://t.com/d/2026/$i")) ++
      Seq((13L, "https://t.com/about/x"), (14L, "https://t.com/about/y"),
        (15L, "https://o.com/p/1"), (16L, "https://o.com/p/2"),
        (17L, "not a url"))
    val df = rows.toDF("doc_id", "url")
    val rep = UrlOps.templateReport(df, "url", trapFracMicro = 200000L)
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(rep == Set(
      ("t.com", "/d/{n}/{n}", 12L, true),
      ("t.com", "/about/x", 1L, false), ("t.com", "/about/y", 1L, false),
      ("o.com", "/p/{n}", 2L, false)))
    val gate = UrlOps.trapGate(df, "url", "doc_id",
      trapFracMicro = 200000L, cap = 3)
    val kept = gate.as[(Long, String)].collect().map(_._1).sorted.toSeq
    // trap keeps first 3 by doc_id; organic and the non-URL all pass
    assert(kept == Seq(1L, 2L, 3L, 13L, 14L, 15L, 16L, 17L))
    // the cap must plan as WindowGroupLimit (bounded map-side state)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("refetchSchedule: change counts, unchanged tail, exponential backoff, cap") {
    val rows = Seq(
      // u1: A A B B B → 1 change, tail 2 → 60·4 = 240
      ("u1", 1L, "A"), ("u1", 2L, "A"), ("u1", 3L, "B"),
      ("u1", 4L, "B"), ("u1", 5L, "B"),
      // u2: changes every fetch → tail 0 → 60
      ("u2", 1L, "x"), ("u2", 2L, "y"), ("u2", 3L, "z"),
      // u3: single snapshot → tail 0, no changes → 60
      ("u3", 1L, "solo"),
      // u4: stable for 8 fetches → tail 7, capped at 2^6 → 3840
      ) ++ (1L to 8L).map(i => ("u4", i, "same"))
    val got = UrlOps.refetchSchedule(rows.toDF("url", "ts", "content"),
        "url", "ts", "content", baseIntervalS = 60L, maxDoublings = 6)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("u1") == (("u1", 5L, 1L, 2L, 240L)))
    assert(got("u2") == (("u2", 3L, 2L, 0L, 60L)))
    assert(got("u3") == (("u3", 1L, 0L, 0L, 60L)))
    assert(got("u4") == (("u4", 8L, 0L, 7L, 3840L)))
  }

  test("keepLatestSnapshot: newest per URL via max-struct agg, null URL passes") {
    val df = Seq(
      (1L, "http://x.com/a", 100L, "v1"), (2L, "http://x.com/a", 300L, "v3"),
      (3L, "http://x.com/a", 200L, "v2"), (4L, "http://x.com/b", 50L, "only"),
      (5L, null.asInstanceOf[String], 999L, "junk")).toDF("id", "url", "ts", "body")
    val kept = UrlOps.keepLatestSnapshot(df.select($"url", $"ts", $"id", $"body"), "url", "ts")
      .as[(String, Long, Long, String)].collect().sortBy(r => Option(r._1).getOrElse(""))
    assert(kept.length == 3)
    assert(kept.find(_._1 == "http://x.com/a").get == (("http://x.com/a", 300L, 2L, "v3")))
    assert(kept.find(_._1 == "http://x.com/b").get == (("http://x.com/b", 50L, 4L, "only")))
    assert(kept.exists(r => r._1 == null && r._3 == 5L))
    // the keep is an aggregation (map-side combine on hot URLs), never a window
    val plan = UrlOps.keepLatestSnapshot(df, "url", "ts").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
