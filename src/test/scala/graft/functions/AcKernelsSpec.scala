package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist kernels vs a naive per-pattern reference scan.
  *
  * The reference implementation is the SEMANTICS (per pattern: every
  * occurrence index, boundary-checked) — O(patterns × text), exactly the
  * blow-up the automaton exists to avoid; equality on adversarial and
  * fuzzed inputs certifies the automaton.
  */
class AcKernelsSpec extends SparkTestBase {

  private def alnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Naive boundary-checked multi-pattern match. */
  private def naive(text: String, patterns: Seq[String]): Seq[String] =
    patterns.distinct.filter { p =>
      var i = text.indexOf(p)
      var hit = false
      while (i >= 0 && !hit) {
        val e = i + p.length
        if ((i == 0 || !alnum(text.charAt(i - 1))) &&
            (e == text.length || !alnum(text.charAt(e)))) hit = true
        else i = text.indexOf(p, i + 1)
      }
      hit
    }.sortWith(_.compareTo(_) < 0)

  private def kernel(text: String, patterns: Seq[String]): Seq[String] = {
    val ac = new AcAutomaton(patterns.toArray)
    val seen = ac.matchedIds(text)
    patterns.toArray.zipWithIndex.collect { case (p, i) if seen(i) => p }
      .distinct.sortWith(_.compareTo(_) < 0).toSeq
  }

  test("nested / prefix / suffix patterns, all boundary cases") {
    val pats = Seq("scan", "sca", "an", "a", "scan fast", "fast")
    // "scan" bounded; "sca" inside "scan" NOT bounded; "an" inside NOT
    // bounded; "a" alone bounded; phrase crosses the space.
    val t = "scan fast a sca an"
    assert(kernel(t, pats) === naive(t, pats))
    assert(naive(t, pats) === Seq("a", "an", "fast", "sca", "scan", "scan fast"))
  }

  test("pattern at string edges and back-to-back occurrences") {
    val pats = Seq("ab", "b", "aba")
    for (t <- Seq("ab", "abab", "ab ab", "aba", "ab.aba", "xabx", "", "b"))
      assert(kernel(t, pats) === naive(t, pats), s"text=[$t]")
  }

  test("boundary char classes: punctuation and digits") {
    val pats = Seq("slow", "x1")
    assert(kernel("slow.", pats) === Seq("slow"))
    assert(kernel("slows", pats) === Seq())      // 's' after = alnum, not bounded
    assert(kernel("slow9", pats) === Seq())      // digit after = alnum
    assert(kernel("a-slow-b", pats) === Seq("slow"))
    assert(kernel("x1!", pats) === Seq("x1"))
    assert(kernel("x12", pats) === Seq())
  }

  test("dict-suffix chains: a match ending inside a longer failed path") {
    // While scanning "bcd", after 'c' the automaton is on the "bc" path;
    // pattern "c" must still surface via the dictionary suffix link.
    val pats = Seq("bcx", "c")
    assert(kernel("b c d", pats) === Seq("c"))
    assert(kernel("bcd", pats) === Seq())        // "c" inside bcd: not bounded
    assert(kernel("b.c", pats) === Seq("c"))
  }

  test("surrogate-pair text is scanned safely (literal char units)") {
    val emoji = new String(Character.toChars(0x1F600))
    val pats = Seq("ok")
    assert(kernel(s"$emoji ok $emoji", pats) === Seq("ok"))
    // The emoji is non-alnum on both of its UTF-16 units, so it bounds.
    assert(kernel(s"${emoji}ok", pats) === Seq("ok"))
  }

  test("fuzz: 400 random texts × random pattern sets over a tiny alphabet") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc ."
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 400) {
      val pats = (0 until (1 + rnd.nextInt(6)))
        .map(_ => randStr(1 + rnd.nextInt(4)).replace(" ", "a").replace(".", "b"))
        .distinct
      val patsWithPhrase =
        if (rnd.nextBoolean()) pats :+ (randStr(2).trim + " " + randStr(2).trim).trim
        else pats
      val clean = patsWithPhrase.filter(_.nonEmpty).distinct
      if (clean.nonEmpty) {
        val t = randStr(rnd.nextInt(60))
        assert(kernel(t, clean) === naive(t, clean),
          s"text=[$t] pats=${clean.mkString("|")}")
      }
    }
  }

  test("anyMatch agrees with matchedIds non-emptiness, early-exit path") {
    val rnd = new scala.util.Random(7L)
    val pats = Seq("abc", "ca", "b b")
    for (_ <- 0 until 200) {
      val t = (0 until rnd.nextInt(40))
        .map(_ => "abc .".charAt(rnd.nextInt(5))).mkString
      val ac = new AcAutomaton(pats.toArray)
      assert(ac.anyMatch(t) === ac.matchedIds(t).exists(identity), s"text=[$t]")
    }
  }

  test("empty patterns rejected; duplicate patterns collapse") {
    intercept[IllegalArgumentException](new AcAutomaton(Array("a", "")))
    val ac = new AcAutomaton(Array("a", "a"))
    assert(ac.matchedIds("a").count(identity) >= 1)
  }

  test("Column kernels run inside codegen over a DataFrame") {
    val s = spark
    import s.implicits._
    val pats = Seq("slow", "merge batch", "art", "naughty")
    val df = Seq(
      (1L, "the slow merge batch path"),
      (2L, "parts depart smartly"),          // "art" only ever inside words
      (3L, "art of the deal"),
      (4L, "")).toDF("id", "text")
    val got = df.select($"id",
        array_join(AcKernels.acMatches(lower($"text"), pats), ",").as("m"),
        AcKernels.acAnyMatch(lower($"text"), pats).as("any"))
      .orderBy($"id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq ===
      Seq((1L, "merge batch,slow", true), (2L, "", false),
          (3L, "art", true), (4L, "", false)))
  }

  test("scale shape: thousands of patterns build once and scan linearly") {
    val rnd = new scala.util.Random(99L)
    val pats = (0 until 2000).map(i =>
      s"w${i}x" + (0 until rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .distinct
    val ac = new AcAutomaton(pats.toArray)
    val text = "w17x hit and w1999x" + pats(1999).drop(5)
    val seen = ac.matchedIds(text)
    assert(seen.count(identity) === naive(text, pats).size)
  }
}
