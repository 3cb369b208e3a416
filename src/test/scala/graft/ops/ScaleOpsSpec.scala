package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Bloom-prune join, bucketized range join, deterministic sampling,
  * profiling: each pinned against its brute-force / plain-plan equivalent.
  */
class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val big = (1L to 500L).map(i => (i, i % 50, s"r$i")).toDF("id", "k", "tag")
  private lazy val dim = Seq((3L, "x"), (7L, "y"), (11L, "z"), (999L, "missing"))
    .toDF("k", "attr")

  test("bloom-pruned join equals the plain inner equi-join") {
    val plain = big.join(dim, big("k") === dim("k"))
      .select(big("id"), dim("attr")).as[(Long, String)].collect().toSet
    val pruned = BloomPrune.prunedJoin(big, dim, "k", "k", expectedItems = 10)
      .select(big("id"), dim("attr")).as[(Long, String)].collect().toSet
    assert(pruned == plain)
    assert(pruned.nonEmpty)
  }

  test("bloom semi-join equals plain left-semi; empty dim prunes everything") {
    val plain = big.join(dim, big("k") === dim("k"), "left_semi")
      .as[(Long, Long, String)].collect().toSet
    val sem = BloomPrune.semiJoin(big, dim, "k", "k", expectedItems = 10)
      .as[(Long, Long, String)].collect().toSet
    assert(sem == plain)
    assert(BloomPrune.semiJoin(big, dim.filter(lit(false)), "k", "k", 10).count() == 0)
    assert(BloomPrune.prunedJoin(big, dim.filter(lit(false)), "k", "k", 10).count() == 0)
  }

  test("bloom filter prunes a selective big side substantially") {
    // 3 of 50 keys survive; the bloom filter alone (before the exact join)
    // should keep ~3/50 of rows, allowing fpp slack.
    val bf = BloomPrune.buildFilter(dim, dim("k"), expectedItems = 10).get
    val kept = big.filter(BloomPrune.mightContain(bf, col("k"))).count()
    assert(kept >= 30 && kept <= 60, s"kept $kept of 500") // exact-match 3 keys ≈ 30 rows
  }

  test("bucketized range join equals the naive non-equi join") {
    val points = (0 to 300).map(i => (i.toLong, i * 1.0)).toDF("pid", "x")
    val intervals = Seq((1L, 5.0, 12.0), (2L, 10.0, 10.0), (3L, 250.5, 260.25),
      (4L, 299.0, 310.0), (5L, 50.0, 40.0) /* degenerate: hi < lo */)
      .toDF("iid", "lo", "hi")
    val naive = points.join(intervals,
        points("x") >= intervals("lo") && points("x") <= intervals("hi"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val bucketized = RangeJoin.pointInInterval(
        points, col("x"), intervals, col("lo"), col("hi"), bucketWidth = 7.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(bucketized == naive)
    assert(naive.exists(_._2 == 2L)) // zero-width interval still matches its point
    assert(!naive.exists(_._2 == 5L)) // degenerate interval matches nothing
  }

  test("interval overlap join equals the naive non-equi join, no duplicate pairs") {
    val rnd = new scala.util.Random(7)
    def ivals(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextInt(1000).toDouble
      (s"$tag$i", lo, lo + rnd.nextInt(120))
    }.toDF("key", "lo", "hi")
    val a = ivals(80, "a")
    val b = ivals(60, "b")
    val got = RangeJoin.intervalOverlap(
        a.toDF("a_key", "a_lo", "a_hi"), col("a_lo"), col("a_hi"),
        b.toDF("b_key", "b_lo", "b_hi"), col("b_lo"), col("b_hi"),
        bucketWidth = 50.0)
      .select($"a_key", $"b_key").as[(String, String)].collect().toSeq
    val naive = a.toDF("a_key", "a_lo", "a_hi")
      .join(b.toDF("b_key", "b_lo", "b_hi"),
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select($"a_key", $"b_key").as[(String, String)].collect().toSeq
    assert(got.size == got.toSet.size, "canonical-bucket emit must not duplicate pairs")
    assert(got.toSet == naive.toSet)
    // zero-length and touching intervals behave as closed intervals
    val t1 = Seq(("x", 10.0, 10.0)).toDF("a_key", "a_lo", "a_hi")
    val t2 = Seq(("y", 10.0, 20.0), ("z", 20.5, 21.0)).toDF("b_key", "b_lo", "b_hi")
    val touch = RangeJoin.intervalOverlap(t1, col("a_lo"), col("a_hi"),
        t2, col("b_lo"), col("b_hi"), bucketWidth = 7.0)
      .select($"b_key").as[String].collect().toSeq
    assert(touch == Seq("y"))
  }

  test("range join honors extra equi keys") {
    val points = Seq(("u1", 5.0), ("u2", 5.0)).toDF("user", "x")
    val intervals = Seq(("u1", 0.0, 10.0)).toDF("user", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, col("x"), intervals,
      col("lo"), col("hi"), bucketWidth = 4.0, equiKeys = Seq("user"))
    assert(out.select($"user").as[String].collect().toSeq == Seq("u1"))
  }

  test("hash sample is deterministic, rate-accurate, and partition-independent") {
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 1, 10).select($"id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), col("id"), 1, 10)
      .select($"id").as[Long].collect().toSet
    assert(a == b) // layout-independent
    assert(math.abs(a.size - 1000) < 150, s"got ${a.size} of expected ~1000")
    // complementary split covers everything exactly once
    val (tr, ho) = Sampling.split(df, col("id"), 1, 10)
    assert(tr.count() + ho.count() == 10000L)
    assert(ho.select($"id").as[Long].collect().toSet == a)
  }

  test("stratified sample returns exactly n per stratum, deterministically") {
    val df = (1L to 1000L).map(i => (i, (i % 3).toString)).toDF("id", "g")
    val s1 = Sampling.stratifiedFirstN(df, Seq("g"), col("id"), 5)
      .select($"g", $"id").as[(String, Long)].collect().toSet
    val s2 = Sampling.stratifiedFirstN(df.repartition(7), Seq("g"), col("id"), 5)
      .select($"g", $"id").as[(String, Long)].collect().toSet
    assert(s1 == s2)
    assert(s1.groupBy(_._1).forall(_._2.size == 5))
    // small stratum yields all its rows
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.stratifiedFirstN(tiny, Seq("g"), col("id"), 5).count() == 3)
  }

  test("weighted token-budget sampling: budget-proportional, deterministic, exact gates") {
    // two sources: one far over budget (thins), one under budget (passes whole)
    val df = ((1L to 800L).map(i => (i, "big", 100L)) ++
      (10001L to 10050L).map(i => (i, "small", 100L))).toDF("id", "src", "nt")
    val budgets = Map("big" -> 20000L, "small" -> 100000L, "ghost" -> 5L)
    val kept = Sampling.weightedByTokenBudget(df, "src", col("id"), col("nt"), budgets)
    val bySrc = kept.groupBy($"src").count().as[(String, Long)].collect().toMap
    // big: 80k tokens vs 20k budget → keep rate 1/4; small: all 50 rows
    assert(bySrc("small") == 50L, s"under-budget source must pass whole: $bySrc")
    assert(math.abs(bySrc("big") - 200L) < 60, s"~25% of big expected: $bySrc")
    // layout-independent and a pure function of (key, totals, budget)
    val again = Sampling.weightedByTokenBudget(
      df.repartition(13), "src", col("id"), col("nt"), budgets)
    assert(kept.select($"id").as[Long].collect().toSet ==
      again.select($"id").as[Long].collect().toSet)
    // un-budgeted sources are dropped
    val extra = (1L to 10L).map(i => (i + 90000L, "other", 7L)).toDF("id", "src", "nt")
    val all = Sampling.weightedByTokenBudget(df.unionAll(extra), "src",
      col("id"), col("nt"), budgets)
    assert(all.filter($"src" === "other").count() == 0)
  }

  test("temperature budgets: sqrt-proportional, integer-exact, feeds the gate") {
    // big: 40000 tokens (st=200), small: 400 tokens (st=20) → budgets 10:1
    val df = ((1L to 400L).map(i => (i, "big", 100L)) ++
      (10001L to 10004L).map(i => (i, "small", 100L))).toDF("id", "src", "nt")
    val b = Sampling.temperatureBudgets(df, "src", col("nt"), globalBudget = 11000L)
      .as[(String, Long)].collect().toMap
    assert(b == Map("big" -> 10000L, "small" -> 1000L))
    assert(b.values.sum <= 11000L)
    // the Df form gates with those budgets: big thins to ~1/4, small passes
    val kept = Sampling.weightedByTokenBudgetDf(df, "src", col("id"), col("nt"),
        Sampling.temperatureBudgets(df, "src", col("nt"), 11000L))
      .groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 4L && math.abs(kept("big") - 100L) < 40, s"$kept")
  }

  test("epoch up-sampling: copy counts, epoch tags, determinism, drops") {
    val df = ((1L to 400L).map(i => (i, "up")) ++
      (1001L to 1400L).map(i => (i, "down")) ++
      (2001L to 2010L).map(i => (i, "gone")) ++
      (3001L to 3010L).map(i => (i, "unlisted"))).toDF("id", "src")
    val out = Sampling.upsampleEpochs(df, "src", col("id"),
      Map("up" -> 2250L, "down" -> 400L, "gone" -> 0L))
    val bySrc = out.groupBy($"src").count().as[(String, Long)].collect().toMap
    // up: 2.25 epochs over 400 rows → ≈900 copies (2 guaranteed + ~25%)
    assert(bySrc("up") >= 800 && math.abs(bySrc("up") - 900L) < 80, s"$bySrc")
    assert(math.abs(bySrc("down") - 160L) < 60, s"~40% of down expected: $bySrc")
    assert(!bySrc.contains("gone"), s"factor-0 source must drop: $bySrc")
    assert(bySrc("unlisted") == 10L, s"unlisted passes at one epoch: $bySrc")
    // every multi-copy row carries consecutive 0-based epoch tags
    val epochs = out.filter($"src" === "up").groupBy($"id")
      .agg(collect_list($"epoch").as("es")).as[(Long, Seq[Long])].collect()
    epochs.foreach { case (id, es) =>
      assert(es.sorted == (0L until es.length).toSeq, s"id $id epochs $es")
    }
    // layout-independent: same realized multiset under a different layout
    val again = Sampling.upsampleEpochs(df.repartition(13), "src", col("id"),
      Map("up" -> 2250L, "down" -> 400L, "gone" -> 0L))
    assert(out.select($"id", $"epoch").as[(Long, Long)].collect().toSet ==
      again.select($"id", $"epoch").as[(Long, Long)].collect().toSet)
  }

  test("mergeManifests: merge of disjoint halves equals the full recompute") {
    import graft.ops.Profiling
    val docs = Seq(
      (1L, "src0", "alpha beta"), (2L, "src0", "gamma"),
      (3L, "src1", "delta epsilon zeta"), (4L, "src0", "eta"),
      (5L, "src1", "theta"))
      .toDF("doc_id", "source", "text")
    val full = Profiling.releaseManifest(docs, "source", "doc_id", "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val merged = Profiling.mergeManifests(
        Profiling.releaseManifest(docs.filter($"doc_id" % 2 === 0), "source", "doc_id", "text"),
        Profiling.releaseManifest(docs.filter($"doc_id" % 2 === 1), "source", "doc_id", "text"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("profiling summarize computes per-column stats in long format") {
    val df = Seq((1.0, Some(10L)), (2.0, None), (2.0, Some(30L)))
      .toDF("a", "b")
    val out = Profiling.summarize(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 3L, 0L, 2L, 1.0, 2.0)))
    assert(out("b") == (("b", 2L, 1L, 2L, 10.0, 30.0)))
  }

  test("profiling summarize handles non-identifier column names") {
    val df = Seq((1.0, 2.0)).toDF("col-1", "col 2")
    val out = Profiling.summarize(df, Seq("col-1", "col 2"))
      .as[(String, Long, Long, Long, Double, Double)].collect().map(_._1).toSet
    assert(out == Set("col-1", "col 2"))
  }

  test("quantile certificate holds on a skewed column") {
    val df = (1L to 5000L).map(i => i * i).toDF("v") // quadratic skew
    val out = Profiling.quantileCert(df, "v", Seq(0.1, 0.5, 0.99), accuracy = 100)
    // Scalar rank columns (never an array — the driver comparator cannot
    // row-sort array cells), named by percent; an out-of-bound sketch
    // would have thrown inside quantileCert.
    assert(out.columns.toSeq == Seq("n", "r_10", "r_50", "r_99"))
    val (n, r10, r50, r99) = out.as[(Long, Long, Long, Long)].head()
    assert(n == 5000L)
    // exact ranks sit within the sketch tolerance of the target ranks
    val tol = n.toDouble / 100 + 1
    Seq(0.1 -> r10, 0.5 -> r50, 0.99 -> r99).foreach { case (p, r) =>
      assert(math.abs(r - p * n) <= tol, s"p=$p rank=$r")
    }
  }

  test("quantile certificate rejects probs colliding at percent resolution") {
    val df = (1L to 100L).toDF("v")
    intercept[IllegalArgumentException] {
      Profiling.quantileCert(df, "v", Seq(0.99, 0.991))
    }
  }

  test("topFractionByScoreDist equals sort+limit at every partition count, ties exact") {
    // scores with heavy TIES (score = id % 7) so the tie column genuinely
    // decides boundary membership
    val df = (0L until 500L).map(i => (i, (i % 7).toDouble)).toDF("id", "s")
    val expect = Sampling.topFractionByScore(df, col("s"), 0.3, col("id"))
      .select($"id").as[Long].collect().toSet
    for (p <- Seq(2, 3, 8, 32)) {
      val got = Sampling.topFractionByScoreDist(df, col("s"), 0.3, col("id"), p)
        .select($"id").as[Long].collect().toSet
      assert(got == expect, s"partition count $p must not change the selected set")
    }
    // frac = 1 keeps everything; tiny frac keeps exactly ceil(n/500)=1 row
    assert(Sampling.topFractionByScoreDist(df, col("s"), 1.0, col("id"))
      .count() == 500L)
    val one = Sampling.topFractionByScoreDist(df, col("s"), 0.001, col("id"))
      .select($"id").as[Long].collect().toSeq
    assert(one == Seq(6L), s"top-1 is the lowest id at the max score: $one")
    intercept[IllegalArgumentException] {
      Sampling.topFractionByScoreDist(df, col("s"), 0.0, col("id"))
    }
  }

  test("topFractionByScoreAuto dispatches on the crossover and outputs stay identical") {
    val df = (0L until 500L).map(i => (i, (i % 7).toDouble)).toDF("id", "s")
    val expect = Sampling.topFractionByScore(df, col("s"), 0.3, col("id"))
      .select($"id").as[Long].collect().toSet
    // Probe path: k = 150 is far under the 1M crossover → sort+limit (no
    // range-partitioned __pid machinery in the plan).
    val auto = Sampling.topFractionByScoreAuto(df, col("s"), 0.3, col("id"))
    assert(!auto.queryExecution.analyzed.toString.contains("__pid"),
      "probe under threshold must pick the sort+limit form")
    assert(auto.select($"id").as[Long].collect().toSet == expect)
    // Hint above the crossover forces the dist form...
    val dist = Sampling.topFractionByScoreAuto(df, col("s"), 0.3, col("id"),
      kHint = Sampling.DistKThreshold + 1)
    assert(dist.queryExecution.analyzed.toString.contains("__pid"),
      "hint above threshold must pick the dist form")
    // ...and the dispatch is a pure cost decision: the hint picks the
    // FORM only, the selected set comes from the form's own exact count.
    assert(dist.select($"id").as[Long].collect().toSet == expect)
    // Hint at/below the threshold forces sort+limit without a probe job,
    // still with the exact k from the form's own count.
    val win = Sampling.topFractionByScoreAuto(df, col("s"), 0.3, col("id"),
      kHint = 0L)
    assert(!win.queryExecution.analyzed.toString.contains("__pid"))
    assert(win.select($"id").as[Long].collect().toSet == expect)
  }
}
