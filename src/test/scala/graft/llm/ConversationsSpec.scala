package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Conversation (SFT/chat) operators: shape validation edge cases, render
  * exactness, loss-mask span extraction identity, dedup tie-break, and
  * preference-pair flags.
  */
class ConversationsSpec extends SparkTestBase {

  private def turns(rows: (Long, Long, String, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("conv", "idx", "role", "content")
  }

  test("validate: system prefix ok, broken alternation/empty/user-ending flagged") {
    val s = spark; import s.implicits._
    val t = turns(
      // conv 1: system, user, assistant — valid
      (1L, 0L, "system", "be nice"), (1L, 1L, "user", "hi"), (1L, 2L, "assistant", "hello"),
      // conv 2: user, user — alternation broken, ends wrong
      (2L, 0L, "user", "a"), (2L, 1L, "user", "b"),
      // conv 3: user, assistant but empty assistant content
      (3L, 0L, "user", "q"), (3L, 1L, "assistant", "  "),
      // conv 4: single turn — too short
      (4L, 0L, "user", "alone"),
      // conv 5: user, assistant, user — ends with user
      (5L, 0L, "user", "q"), (5L, 1L, "assistant", "a"), (5L, 2L, "user", "thx"))
    val v = Conversations.validate(t, "conv", "idx", "role", "content")
      .select($"id", $"alternates", $"has_empty", $"ends_with_assistant", $"valid")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(1L) == (1L, true, false, true, true))
    assert(v(2L)._2 == false && v(2L)._5 == false)
    assert(v(3L)._3 == true && v(3L)._5 == false)
    assert(v(4L)._5 == false) // < 2 non-system turns happens to be 1 turn total
    assert(v(5L)._4 == false && v(5L)._5 == false)
  }

  /** Code-point-aware slice — span offsets count code points (the
    * documented contract), so consumers must NOT use raw UTF-16
    * `substring`.
    */
  private def cpSlice(s: String, start: Long, end: Long): String = {
    val a = s.offsetByCodePoints(0, start.toInt)
    val b = s.offsetByCodePoints(0, end.toInt)
    s.substring(a, b)
  }

  test("render + lossMaskSpans: extracting each span yields content + terminator") {
    val s = spark; import s.implicits._
    val t = turns(
      (1L, 0L, "user", "what is spark"),
      (1L, 1L, "assistant", "a distributed engine"),
      (1L, 2L, "user", "thanks"),
      (1L, 3L, "assistant", "welcome"))
    val rendered = Conversations.render(t, "conv", "idx", "role", "content")
      .select($"rendered").as[String].head()
    val spans = Conversations.lossMaskSpans(t, "conv", "idx", "role", "content")
      .orderBy($"start_char")
      .select($"start_char", $"end_char").as[(Long, Long)].collect()
    assert(spans.length == 2)
    val cut = spans.map { case (a, b) => cpSlice(rendered, a, b) }
    assert(cut(0) == "a distributed engine<|im_end|>\n", s"got '${cut(0)}'")
    assert(cut(1) == "welcome<|im_end|>\n")
    // masked regions are exactly the complement: role headers + user turns
    assert(rendered.startsWith("<|im_start|>user\nwhat is spark<|im_end|>\n"))
  }

  test("lossMaskSpans offsets are CODE POINTS: astral chars don't shift later spans") {
    val s = spark; import s.implicits._
    // The user turn carries two astral-plane emoji (1 code point, 2 UTF-16
    // units each): a raw substring consumer would be short by 2 on every
    // later span; the code-point contract keeps spans exact.
    val emoji = new String(Character.toChars(0x1F600))
    val t = turns(
      (1L, 0L, "user", s"look $emoji$emoji wow"),
      (1L, 1L, "assistant", "nice one"))
    val rendered = Conversations.render(t, "conv", "idx", "role", "content")
      .select($"rendered").as[String].head()
    val spans = Conversations.lossMaskSpans(t, "conv", "idx", "role", "content")
      .select($"start_char", $"end_char").as[(Long, Long)].collect()
    assert(spans.length == 1)
    assert(cpSlice(rendered, spans.head._1, spans.head._2)
      == "nice one<|im_end|>\n")
    // and the naive UTF-16 substring is demonstrably WRONG here
    assert(rendered.substring(spans.head._1.toInt, spans.head._2.toInt)
      != "nice one<|im_end|>\n")
  }

  test("dedupExact: same turn sequence with different idx values is a duplicate") {
    val s = spark; import s.implicits._
    val t = turns(
      (1L, 0L, "user", "q"), (1L, 1L, "assistant", "a"),
      (2L, 10L, "user", "q"), (2L, 20L, "assistant", "a"), // same sequence, other idx
      (3L, 0L, "user", "different"), (3L, 1L, "assistant", "a"))
    val d = Conversations.dedupExact(t, "conv", "idx", "role", "content")
      .select($"id", $"n_dups", $"keep").as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(d(1L) == (1L, 2L, true))
    assert(d(2L) == (2L, 2L, false))
    assert(d(3L) == (3L, 1L, true))
  }

  test("preferenceCheck flags empties, identical pairs and prompt dups") {
    val s = spark; import s.implicits._
    val pairs = Seq(
      (1L, "p1", "good", "bad"),
      (2L, "p1", "also", "fine"),   // dup prompt with 1 → keep only 1
      (3L, "p2", "", "bad"),        // empty chosen
      (4L, "p3", "same", "same"))   // identical
      .toDF("id", "prompt", "chosen", "rejected")
    val c = Conversations.preferenceCheck(pairs, "id", "prompt", "chosen", "rejected")
      .select($"id", $"chosen_empty", $"identical", $"prompt_dup", $"keep", $"valid")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(c(1L)._4 == true && c(1L)._5 == true && c(1L)._6 == true)
    assert(c(2L)._4 == true && c(2L)._5 == false && c(2L)._6 == true)
    assert(c(3L)._2 == true && c(3L)._6 == false)
    assert(c(4L)._3 == true && c(4L)._6 == false)
  }

  test("fuzzy conversation dedup: a regenerated-turn clone pairs with its source") {
    val s = spark; import s.implicits._
    // Conv 0 and its clone 1000 share all turns up to an appended ' v2';
    // conv 1 is unrelated. MinHash over the rendered texts must pair
    // (0, 1000) and nothing else at the 0.5 estimator threshold.
    val words = (0 until 40).map(i => s"w$i").mkString(" ")
    val turns = Seq(
      (0L, 0L, "user", words), (0L, 1L, "assistant", s"reply $words"),
      (1000L, 0L, "user", s"$words v2"), (1000L, 1L, "assistant", s"reply $words v2"),
      (1L, 0L, "user", (100 until 140).map(i => s"x$i").mkString(" ")))
      .toDF("conv", "idx", "role", "text")
    val rendered = turns.groupBy($"conv")
      .agg(array_sort(collect_list(struct($"idx", $"text"))).as("ts"))
      .select($"conv".as("doc_id"),
        array_join(transform($"ts", x => x.getField("text")), " ").as("text"))
    val sigs = Dedup.minhashSignaturesPoly(rendered)
    val pairs = Dedup.minhashCandidatesFromSigsPlain(sigs)
      .filter($"est_jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((0L, 1000L)), pairs.toString)
  }

  test("Bradley-Terry: MM iteration recovers a planted skill gradient, integer-exact") {
    val s = spark; import s.implicits._
    // The q_conv_bradley_terry fixture at 500 matches: 8 systems, winner
    // decided by a threshold that tilts with the index gap.
    val outcomes = (0 until 500).map { doc =>
      val a = doc % 8
      val b = (a + 1 + (doc / 8) % 7) % 8
      if ((doc * 31) % 17 < 6 + a - b) (a.toLong, b.toLong) else (b.toLong, a.toLong)
    }.toDF("winner", "loser")
    val got = Conversations.bradleyTerry(outcomes, "winner", "loser", iters = 20)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // Strengths pinned from an independent integer-arithmetic replay
    // (numerically validated before implementation); monotone in system
    // index — the planted gradient — and anchored at p(0) = 1e6.
    assert(got.map(_._1) == (0L until 8L))
    assert(got.map(_._2) == Seq(33L, 41L, 52L, 57L, 66L, 77L, 82L, 92L))
    assert(got.map(_._3) == Seq(1000000L, 1319097L, 1875822L, 2216929L,
      2965584L, 4175141L, 4888953L, 6789780L))
  }

  test("lengthBias: hand-computed counts, rates and signed mean on a tiny pair set") {
    val s = spark; import s.implicits._
    val pairs = Seq(
      (1L, "a b c d", "a b"),        // +2
      (2L, "a b", "a b c d e"),      // -3
      (3L, "a b c", "x y z"),        // 0 (tie)
      (4L, "a b c d e f", "a")       // +5
    ).toDF("id", "chosen", "rejected")
    val got = Conversations.lengthBias(pairs, "chosen", "rejected")
      .as[(Long, Long, Long, Long, Long)].collect().head
    // n=4, longer=2, ties=1, rate=500000µ, mean=(2-3+0+5)*1e6 DIV 4 = 1000000µ
    assert(got == ((4L, 2L, 1L, 500000L, 1000000L)))
  }

  test("lengthBias: empty pair frame yields a well-defined zero report, no DIV 0 (ADVICE r14)") {
    val s = spark; import s.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("id", "chosen", "rejected")
    val row = Conversations.lengthBias(empty, "chosen", "rejected").collect().head
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L && row.getLong(2) == 0L)
    assert(row.isNullAt(3) && row.isNullAt(4),
      "rates are undefined on zero pairs — must be null, not an ANSI DIV-0 error")
  }

  test("validateToolCalls: parse, tool-set and required-key failures each flag; guards fire") {
    val s = spark; import s.implicits._
    val calls = Seq(
      (1L, "search", """{"query":"cats","limit":"10"}"""), // fully valid
      (2L, "search", """{"query":"dogs"}"""),              // missing 'limit'
      (3L, "search", """{"query":"birds","limit":"5""""),  // truncated JSON
      (4L, "paint", """{"color":"red"}"""),                // unknown tool
      (5L, "calc", """{"expr":"1+1"}"""),                  // valid, other tool
      (6L, "calc", """{"other":"x"}""")                    // wrong key
    ).toDF("id", "tool", "args")
    val got = Conversations.validateToolCalls(calls, "id", "tool", "args",
        Map("search" -> Seq("query", "limit"), "calc" -> Seq("expr")))
      .as[(Long, String, Boolean, Boolean, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "search", true, true, 0L, true)))
    assert(got(2L) == ((2L, "search", true, true, 1L, false)))
    assert(got(3L) == ((3L, "search", false, true, 0L, false)))
    assert(got(4L) == ((4L, "paint", true, false, 0L, false)))
    assert(got(5L) == ((5L, "calc", true, true, 0L, true)))
    assert(got(6L) == ((6L, "calc", true, true, 1L, false)))
    intercept[IllegalArgumentException] {
      Conversations.validateToolCalls(calls, "id", "tool", "args", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Conversations.validateToolCalls(calls, "id", "tool", "args",
        Map("search" -> Seq.empty))
    }
  }
  test("bestOfN: argmax/argmin per prompt, deterministic ties, margin gate") {
    val s = spark; import s.implicits._
    val resp = Seq(
      // p0: clear spread — best id 3 (900), worst id 1 (100)
      (0L, 1L, 100L), (0L, 2L, 500L), (0L, 3L, 900L),
      // p1: best-reward TIE between ids 11 and 12 -> smaller id wins;
      //     worst-reward tie between 13 and 14 -> smaller id
      (1L, 11L, 700L), (1L, 12L, 700L), (1L, 13L, 200L), (1L, 14L, 200L),
      // p2: single response — never a valid pair
      (2L, 21L, 999999L),
      // p3: all equal — margin 0 fails even a zero minMargin (strict gate)
      (3L, 31L, 400L), (3L, 32L, 400L)
    ).toDF("prompt", "id", "reward_micro")
    val got = Conversations.bestOfN(resp, "prompt", "id", "reward_micro",
        minMarginMicro = 300000L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 3L, 900L, 1L, 100L, 800L, false))) // margin 800 < 300000
    assert(got(1L) == ((1L, 4L, 11L, 700L, 13L, 200L, 500L, false)))
    assert(got(2L) == ((2L, 1L, 21L, 999999L, 21L, 999999L, 0L, false)))
    assert(got(3L) == ((3L, 2L, 31L, 400L, 31L, 400L, 0L, false)))
    // with a clearing margin, only the spread prompts mint pairs
    val open = Conversations.bestOfN(resp, "prompt", "id", "reward_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r._8).toMap
    assert(open == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
  }

  test("bestOfN: negative rewards order correctly (signed micro scale)") {
    val s = spark; import s.implicits._
    val resp = Seq((0L, 1L, -500000L), (0L, 2L, -100L), (0L, 3L, -999999L))
      .toDF("prompt", "id", "reward_micro")
    val r = Conversations.bestOfN(resp, "prompt", "id", "reward_micro")
      .select("best_id", "worst_id", "margin_micro")
      .as[(Long, Long, Long)].collect().head
    assert(r == ((2L, 3L, 999899L)))
  }

  test("rlooAdvantages: exact leave-one-out baseline, null for solo prompts") {
    val s = spark; import s.implicits._
    // p0: rewards 10, 20, 60 (micro) -> LOO means 40, 35, 15 ->
    // advantages -30, -15, +45. p1: single response -> null baseline.
    // p2: negative numerator exercises truncation-toward-zero parity:
    // rewards 0, 1, 5 -> adv_1 = (3*0-6)/2 = -3, adv_2 = (3*1-6)/2 = -1
    // (floor would give -2), adv_3 = (3*5-6)/2 = 4 (exact: 4.5 -> 4).
    val resp = Seq(
      ("p0", 1L, 10L), ("p0", 2L, 20L), ("p0", 3L, 60L),
      ("p1", 4L, 999L),
      ("p2", 5L, 0L), ("p2", 6L, 1L), ("p2", 7L, 5L))
      .toDF("prompt", "id", "reward_micro")
    val got = Conversations.rlooAdvantages(resp, "prompt", "id", "reward_micro")
      .select("id", "adv_micro", "has_baseline")
      .as[(Long, Option[Long], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some(-30L), true)))
    assert(got(2L) == ((2L, Some(-15L), true)))
    assert(got(3L) == ((3L, Some(45L), true)))
    assert(got(4L) == ((4L, None, false)))
    assert(got(6L) == ((6L, Some(-1L), true)), "truncation toward zero, not floor")
    assert(got(7L) == ((7L, Some(4L), true)))
    // group sum of advantages is within N of zero (truncation residue)
    assert(Seq(got(1L), got(2L), got(3L)).flatMap(_._2).sum.abs <= 3)
  }

  test("bestOfN: null and Long.MinValue rewards fail loudly, never win") {
    val s = spark; import s.implicits._
    // null would sort FIRST in min(struct(-r, id)) and silently become
    // best_id with a null margin (ADVICE r15); MinValue's negation is
    // unrepresentable. Both must refuse, naming the offending response.
    val withNull = Seq((0L, 1L, Some(10L)), (0L, 2L, None))
      .toDF("prompt", "id", "reward_micro")
    val e1 = intercept[Exception] {
      Conversations.bestOfN(withNull, "prompt", "id", "reward_micro").collect()
    }
    assert(e1.getMessage.contains("bestOfN") && e1.getMessage.contains("2"))
    val withMin = Seq((0L, 1L, 10L), (0L, 2L, Long.MinValue))
      .toDF("prompt", "id", "reward_micro")
    val e2 = intercept[Exception] {
      Conversations.bestOfN(withMin, "prompt", "id", "reward_micro").collect()
    }
    assert(e2.getMessage.contains("bestOfN"))
  }
}
