package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Water-filling mix allocation: the closed-form order-free allocation vs a
  * literal iterative reference (grow-proportionally / cap / redistribute),
  * exactness invariants, and the budget-enforced corpus selection.
  */
class MixPlannerSpec extends SparkTestBase {
  import spark.implicits._


  /** Literal iterative water-filling on BigInt rationals: repeatedly give
    * every active domain its proportional share of the residual, saturate
    * any domain whose ideal share exceeds capacity, and repeat until no new
    * saturation. Returns the REAL-valued fixed point as (numerator over
    * wSum) per domain — the distributed form must match its floor within
    * the 1-token largest-remainder rounding.
    */
  private def referenceLevel(doms: Seq[(String, Long, Long)], budget: Long,
      maxEpochsMicro: Long): (Map[String, BigInt], Set[String]) = {
    val cap = doms.map(d => d._1 ->
      (BigInt(d._3) * maxEpochsMicro / 1000000)).toMap
    var sat = Set.empty[String]
    var changed = true
    while (changed) {
      changed = false
      val resid = BigInt(budget) - sat.toSeq.map(cap).sum
      val wUn = doms.filterNot(d => sat(d._1)).map(d => BigInt(d._2)).sum
      if (wUn > 0) {
        for (d <- doms if !sat(d._1)) {
          // ideal share resid·w/wUn ≥ cap ⇒ saturate (exact rational compare)
          if (resid * d._2 >= cap(d._1) * wUn) {
            sat += d._1; changed = true
          }
        }
      }
    }
    (cap, sat)
  }

  private def run(doms: Seq[(String, Long, Long)], budget: Long,
      maxEpochsMicro: Long = 4000000L): Map[String, (Long, Long, Boolean)] =
    MixPlanner.budgetAllocation(
        doms.toDF("domain", "w", "avail"), "domain", "w", "avail",
        budget, maxEpochsMicro)
      .select("domain", "alloc_tokens", "cap_tokens", "saturated")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("allocation matches the iterative reference's saturation set and level") {
    val doms = Seq(("a", 500000L, 100L), ("b", 300000L, 10000L),
      ("c", 150000L, 40L), ("d", 50000L, 7L))
    val budget = 2000L
    val (cap, sat) = referenceLevel(doms, budget, 4000000L)
    val got = run(doms, budget)
    // same saturation set
    assert(got.filter(_._2._3).keySet == sat,
      s"saturated sets differ: got ${got.filter(_._2._3).keySet}, ref $sat")
    // saturated domains take exactly capacity
    for (d <- sat) assert(BigInt(got(d)._1) == cap(d))
    // unsaturated: floor of the exact proportional share, within the
    // largest-remainder +1
    val resid = BigInt(budget) - sat.toSeq.map(cap).sum
    val wUn = doms.filterNot(d => sat(d._1)).map(d => BigInt(d._2)).sum
    for (d <- doms if !sat(d._1)) {
      val ideal = resid * d._2 / wUn
      val a = BigInt(got(d._1)._1)
      assert(a == ideal || a == ideal + 1,
        s"${d._1}: alloc $a vs floor-share $ideal")
    }
    // the budget is spent exactly (total capacity exceeds it here)
    assert(got.values.map(_._1).sum == budget)
  }

  test("sum(alloc) = min(budget, sum(cap)) exactly, across regimes") {
    val doms = Seq(("a", 700000L, 50L), ("b", 200000L, 500L),
      ("c", 100000L, 5000L))
    val capSum = doms.map(_._3 * 4L).sum // maxEpochs 4.0
    for (budget <- Seq(0L, 1L, 17L, 199L, capSum - 1, capSum, capSum + 123)) {
      val got = run(doms, budget)
      assert(got.values.map(_._1).sum == math.min(budget, capSum),
        s"budget $budget")
      assert(got.values.forall { case (a, c, _) => a >= 0 && a <= c })
      // saturated ⟺ alloc == cap for every domain when budget ≥ capSum
      if (budget >= capSum) assert(got.values.forall(v => v._1 == v._2))
    }
  }

  test("equal-ratio domains saturate (or not) together and split proportionally") {
    // b and c have identical cap/w ratios; any order-dependent tie handling
    // would give them different treatment.
    val doms = Seq(("a", 100000L, 10000L), ("b", 200000L, 20L),
      ("c", 400000L, 40L))
    val got = run(doms, 500L)
    assert(got("b")._3 == got("c")._3)
    if (!got("b")._3) {
      val (ab, ac) = (BigInt(got("b")._1), BigInt(got("c")._1))
      // proportional up to 1-token rounding: |ab·wc − ac·wb| ≤ max(w)
      assert((ab * 400000 - ac * 200000).abs <= 400000)
    }
  }

  test("zero-inventory and zero-budget degenerate cleanly") {
    val doms = Seq(("a", 500000L, 0L), ("b", 500000L, 100L))
    val got = run(doms, 50L)
    assert(got("a")._1 == 0 && got("a")._3) // empty domain is saturated at 0
    assert(got("b")._1 == 50)
    val zero = run(doms, 0L)
    assert(zero.values.map(_._1).sum == 0)
  }

  test("epochs_micro reports alloc/avail in micro-epochs, capped by maxEpochs") {
    val doms = Seq(("a", 900000L, 10L), ("b", 100000L, 1000L))
    val df = MixPlanner.budgetAllocation(
      doms.toDF("domain", "w", "avail"), "domain", "w", "avail",
      budgetTokens = 200L, maxEpochsMicro = 2500000L)
    val m = df.select("domain", "alloc_tokens", "epochs_micro")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // a saturates at cap = 10 * 2.5 = 25 tokens → 2.5 epochs exactly
    assert(m("a")._2 == 25 && m("a")._3 == 2500000L)
    assert(m("b")._2 == 175 && m("b")._3 == (175L * 1000000L) / 1000L)
  }

  test("budgetSelect keeps the exact priority-ordered prefix per domain") {
    val docs = Seq(
      ("a", 1L, 90L, 40L), ("a", 2L, 80L, 40L), ("a", 3L, 70L, 40L),
      ("a", 4L, 60L, 40L),
      ("b", 5L, 99L, 10L), ("b", 6L, 98L, 10L))
      .toDF("domain", "id", "priority", "tokens")
    val alloc = Seq(("a", 100L), ("b", 10L)).toDF("domain", "alloc_tokens")
    val kept = MixPlanner.budgetSelect(docs, "domain", "id", "tokens",
      "priority", alloc).select("id", "cum_tokens")
      .as[(Long, Long)].collect().toMap
    // a: 40+40 = 80 ≤ 100, third doc overshoots (120 > 100) → ids 1,2
    // b: first doc fills the budget exactly → id 5
    assert(kept.keySet == Set(1L, 2L, 5L))
    assert(kept(2L) == 80L && kept(5L) == 10L)
  }

  test("mixReport: realized vs planned, untouched domains surface at zero") {
    val alloc = Seq(("a", 100L), ("b", 50L), ("c", 50L))
      .toDF("domain", "alloc_tokens")
    val selected = Seq(("a", 40L), ("a", 40L), ("b", 50L))
      .toDF("domain", "tokens")
    val got = MixPlanner.mixReport(selected, "domain", "tokens", alloc)
      .select("domain", "alloc_tokens", "realized_tokens", "shortfall_tokens",
        "planned_share_micro", "realized_share_micro", "drift_micro")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 100L, 80L, 20L, 500000L, 615384L, 115384L)))
    assert(got("b") == (("b", 50L, 50L, 0L, 250000L, 384615L, 134615L)))
    // c was never selected: realized 0, full shortfall, share 0
    assert(got("c") == (("c", 50L, 0L, 50L, 250000L, 0L, -250000L)))
  }

  test("budgetSelectDist equals the windowed form at every partition count, mega-domain") {
    // ONE domain carries ~95% of the corpus (the Pile-CC shape the windowed
    // form single-tasks), with heavy priority ties broken by id, a
    // zero-token doc straddling the boundary, and a small domain beside it.
    val docs = ((0L until 400L).map(i =>
        ("mega", i, (i % 11).toDouble, if (i % 13 == 0) 0L else (i % 7) + 1L)) ++
      (0L until 20L).map(i => ("small", 1000L + i, i.toDouble, 5L)))
      .toDF("domain", "id", "priority", "tokens")
    val alloc = Seq(("mega", 570L), ("small", 37L)).toDF("domain", "alloc_tokens")
    val expect = MixPlanner.budgetSelect(docs, "domain", "id", "tokens",
        "priority", alloc)
      .select("domain", "id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSet
    assert(expect.nonEmpty && expect.size < 420, "fixture must cut a prefix")
    for (p <- Seq(2, 3, 7, 32)) {
      val got = MixPlanner.budgetSelectDist(docs, "domain", "id", "tokens",
          "priority", alloc, partitions = p)
        .select("domain", "id", "cum_tokens")
        .as[(String, Long, Long)].collect().toSet
      assert(got == expect, s"partition count $p diverged")
    }
  }

  test("budgetSelectAuto dispatches on the crossover and outputs stay identical") {
    val docs = ((0L until 300L).map(i =>
        ("mega", i, (i % 11).toDouble, (i % 7) + 1L)) ++
      (0L until 20L).map(i => ("small", 1000L + i, i.toDouble, 5L)))
      .toDF("domain", "id", "priority", "tokens")
    val alloc = Seq(("mega", 500L), ("small", 37L)).toDF("domain", "alloc_tokens")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("domain", "id", "cum_tokens")
        .as[(String, Long, Long)].collect().toSet
    // Probe path: 300 rows/domain is far under the 1M crossover → the
    // windowed form (no range-partitioned __chunk machinery in the plan).
    val auto = MixPlanner.budgetSelectAuto(docs, "domain", "id", "tokens",
      "priority", alloc)
    assert(!auto.queryExecution.analyzed.toString.contains("__chunk"),
      "probe under threshold must pick the windowed form")
    // Hint above the crossover forces the dist form...
    val dist = MixPlanner.budgetSelectAuto(docs, "domain", "id", "tokens",
      "priority", alloc,
      maxDomainRowsHint = MixPlanner.DistDomainRowThreshold + 1)
    assert(dist.queryExecution.analyzed.toString.contains("__chunk"),
      "hint above threshold must pick the dist form")
    // ...and the dispatch is a pure cost decision: identical kept sets
    // and cum_tokens either way.
    assert(key(auto) == key(dist) && key(auto).nonEmpty)
    // Hint at/below the threshold forces windowed without a probe job.
    val win = MixPlanner.budgetSelectAuto(docs, "domain", "id", "tokens",
      "priority", alloc, maxDomainRowsHint = 0L)
    assert(!win.queryExecution.analyzed.toString.contains("__chunk"))
  }

  test("budgetSelectDist refuses a document-granularity allocation frame loudly") {
    // A per-document alloc would silently pull O(docs) subtotal rows to
    // the driver (ADVICE r16) — the loud-refusal guard must fire first.
    val docs = Seq(("a", 1L, 1.0, 5L)).toDF("domain", "id", "priority", "tokens")
    val bigAlloc = spark.range(MixPlanner.MaxDomains + 1)
      .selectExpr("cast(id as string) as domain", "10L as alloc_tokens")
    val e = intercept[IllegalArgumentException] {
      MixPlanner.budgetSelectDist(docs, "domain", "id", "tokens",
        "priority", bigAlloc).collect()
    }
    assert(e.getMessage.contains("per-DOMAIN"))
  }

  test("budgetAllocation refuses zero/negative weights and negative inventories loudly") {
    // A zero-weight domain would pass the cleared-denominator saturation
    // test (0 <= B*0), read as saturated, and silently take its FULL
    // capacity out of the budget (ADVICE r15) — must refuse instead.
    val zeroW = Seq(("a", 0L, 100L), ("b", 500000L, 100L))
      .toDF("domain", "w", "avail")
    val e1 = intercept[IllegalArgumentException] {
      MixPlanner.budgetAllocation(zeroW, "domain", "w", "avail", 100L)
    }
    assert(e1.getMessage.contains("weight_micro"))
    val negAvail = Seq(("a", 500000L, -1L)).toDF("domain", "w", "avail")
    intercept[IllegalArgumentException] {
      MixPlanner.budgetAllocation(negAvail, "domain", "w", "avail", 100L)
    }
  }

  test("the domain-count guard refuses oversized inputs loudly") {
    val big = spark.range(MixPlanner.MaxDomains + 1)
      .selectExpr("cast(id as string) as domain", "1000L as w", "10L as avail")
    val e = intercept[IllegalArgumentException] {
      MixPlanner.budgetAllocation(big, "domain", "w", "avail", 100L)
    }
    assert(e.getMessage.contains("budgetSelect"))
  }
}
