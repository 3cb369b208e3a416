package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.sdfits.SdfitsFormat
import graft.sources.sdfits.SdfitsFormat.ColSpec

/** SDFITS connector pushdown: filters evaluated on raw row bytes before
  * decode, global COUNT/MIN/MAX as one partial row per file (counts from
  * the header when unfiltered), group-bys and unsupported shapes falling
  * back with identical results. The plan-shape assertions pin what the
  * oracle cannot see: that the scan really carried the filter/aggregate.
  */
class SdfitsPushdownSpec extends SparkTestBase {
  import spark.implicits._

  private val cols = Seq(
    ColSpec("ROWIDX", 1, 'K'),
    ColSpec("DATA", 4, 'D'),
    ColSpec("IFNUM", 1, 'J'),
    ColSpec("ELEVATIO", 1, 'D'),
    ColSpec("OBSMODE", 12, 'A'))

  private def writeObs(path: String, fileTag: Int, n: Int): Unit = {
    val out = new FileOutputStream(path)
    try SdfitsFormat.write(out,
      headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
      stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
      history = Seq("DATAMODE HIRES / data resolution mode"),
      cols = cols,
      rows = (0 until n).iterator.map { i =>
        Seq[Any](
          (fileTag * 1000 + i).toLong,
          Array(1.0 * i, 2.0 * i, 3.0 * i, 0.5 * i),
          i % 3,
          40.0 + i,
          if (i % 2 == 0) "onoff:on" else "onoff:off")
      },
      nRows = n)
    finally out.close()
  }

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-sdfits-push").toFile
    writeObs(s"$dir/a.fits", fileTag = 1, n = 30)
    writeObs(s"$dir/b.fits", fileTag = 2, n = 20)
    dir.getAbsolutePath
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("comparison and IN filters are pushed to the scan and match a residual-only read") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val pushed = df.filter($"IFNUM" === 1 && $"ELEVATIO" >= 45.0 &&
      $"OBSMODE".isin("onoff:on", "onoff:off"))
    val plan = planOf(pushed)
    assert(plan.contains("PushedFilters"), s"no pushed filters in:\n$plan")
    assert(plan.contains("EqualTo(IFNUM,1)"), plan)
    // brute-force expectation straight from the generator
    val expect = (0 until 30).count(i => i % 3 == 1 && 40.0 + i >= 45.0) +
      (0 until 20).count(i => i % 3 == 1 && 40.0 + i >= 45.0)
    assert(pushed.count() == expect)
    // values (not just counts) survive: the projected DATA decodes only
    // for passing rows, and must still be the right rows' vectors
    val rows = pushed.select($"ROWIDX", element_at($"DATA", 2)).as[(Long, Double)]
      .collect().toMap
    assert(rows(1007L) == 14.0 && rows(2007L) == 14.0)
  }

  test("global count(*) is answered from the headers: PushedAggregates, zero decode columns") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val agg = df.agg(count(lit(1)).as("n"))
    val plan = planOf(agg)
    assert(plan.contains("PushedAggregates"), s"aggregate not pushed:\n$plan")
    assert(agg.head().getLong(0) == 50L)
  }

  test("filtered count + min/max push together; empty matches yield null extrema") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val agg = df.filter($"IFNUM" === 2)
      .agg(count(lit(1)).as("n"), min($"ROWIDX").as("lo"), max($"ROWIDX").as("hi"),
        min($"OBSMODE").as("ms"), max($"ELEVATIO").as("me"))
    val plan = planOf(agg)
    assert(plan.contains("PushedAggregates") && plan.contains("PushedFilters"), plan)
    val r = agg.head()
    val matches = (0 until 30).filter(_ % 3 == 2).map(i => 1000L + i) ++
      (0 until 20).filter(_ % 3 == 2).map(i => 2000L + i)
    assert(r.getLong(0) == matches.length.toLong)
    assert(r.getLong(1) == matches.min && r.getLong(2) == matches.max)
    assert(r.getString(3) == "onoff:off") // min string among ifnum==2 rows
    assert(r.getDouble(4) == 40.0 + 29)   // i=29 has i%3==2
    // no row matches: count 0, extrema null
    val none = df.filter($"IFNUM" === 7)
      .agg(count(lit(1)), min($"ROWIDX"), max($"ELEVATIO")).head()
    assert(none.getLong(0) == 0L && none.isNullAt(1) && none.isNullAt(2))
  }

  test("scalar group-by pushes per-file group partials; key decode only") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val grouped = df.groupBy($"IFNUM")
      .agg(count(lit(1)).as("n"), max($"ROWIDX").as("hi"))
    val plan = planOf(grouped)
    assert(plan.contains("PushedAggregates") && plan.contains("PushedGroupBy"),
      plan)
    assert(grouped.orderBy($"IFNUM").as[(Int, Long, Long)].collect().toSeq ==
      Seq((0, 17L, 2018L), (1, 17L, 2019L), (2, 16L, 2017L)))
    // grouped + filtered: both push, groups absent from a file contribute
    // no partials and the final result has only surviving keys
    val gf = df.filter($"ROWIDX" >= 2000L).groupBy($"OBSMODE")
      .agg(count(lit(1)).as("n"))
    assert(planOf(gf).contains("PushedGroupBy"), planOf(gf))
    assert(gf.orderBy($"OBSMODE").as[(String, Long)].collect().toSeq ==
      Seq(("onoff:off", 10L), ("onoff:on", 10L)))
  }

  test("expression group-bys and array-column extrema fall back, results identical") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    // grouping on an EXPRESSION of a column cannot push
    val exprGroup = df.groupBy((col("IFNUM") % 2).as("k")).agg(count(lit(1)).as("n"))
    assert(!planOf(exprGroup).contains("PushedAggregates"), planOf(exprGroup))
    assert(exprGroup.orderBy($"k").as[(Int, Long)].collect().toSeq ==
      Seq((0, 33L), (1, 17L)))
    // min over an expression of the DATA vector cannot push — plan falls
    // back to a full agg over the (pruned) scan with the same answer
    val arrMax = df.agg(max(element_at($"DATA", 3)))
    assert(!planOf(arrMax).contains("PushedAggregates"), planOf(arrMax))
    assert(arrMax.head().getDouble(0) == 3.0 * 29)
  }

  test("scalar SUM pushes — global, filtered, grouped — in the final sum type") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    // global: long column sums in LongType, double column in DoubleType
    val g = df.agg(sum($"ROWIDX").as("sr"), sum($"ELEVATIO").as("se"),
      sum($"IFNUM").as("si"), count(lit(1)).as("n"))
    val plan = planOf(g)
    assert(plan.contains("PushedAggregates"), s"sum not pushed:\n$plan")
    assert(plan.contains("SumCol(ROWIDX)"), plan)
    val allIdx = (0 until 30).map(i => 1000L + i) ++ (0 until 20).map(2000L + _)
    val r = g.head()
    assert(r.getLong(0) == allIdx.sum)
    assert(r.getDouble(1) == (0 until 30).map(40.0 + _).sum + (0 until 20).map(40.0 + _).sum)
    assert(r.getLong(2) == (0 until 30).map(_ % 3).sum + (0 until 20).map(_ % 3).sum)
    assert(r.getLong(3) == 50L)
    // filtered + grouped: per-file group partials, merged by Spark's SUM
    val gf = df.filter($"ROWIDX" >= 2000L).groupBy($"IFNUM")
      .agg(sum($"ELEVATIO").as("se"))
    assert(planOf(gf).contains("PushedGroupBy") &&
      planOf(gf).contains("SumCol(ELEVATIO)"), planOf(gf))
    val expect = (0 until 20).groupBy(_ % 3).view
      .mapValues(_.map(40.0 + _).sum).toMap
    assert(gf.orderBy($"IFNUM").as[(Int, Double)].collect().toSeq ==
      Seq(0, 1, 2).map(k => (k, expect(k))))
    // zero matches: the global partial carries a NULL sum, final sum null
    val none = df.filter($"IFNUM" === 7).agg(sum($"ROWIDX")).head()
    assert(none.isNullAt(0))
    // sum over a STRING column is refused at translation (never pushed);
    // DISTINCT sums fall back too — both still answer via the normal scan
    val sd = df.agg(sum_distinct($"IFNUM"))
    assert(!planOf(sd).contains("PushedAggregates"), planOf(sd))
    assert(sd.head().getLong(0) == 3L)
  }

  test("an unsupported predicate stays residual while its siblings push") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val mixed = df.filter($"IFNUM" === 0 && element_at($"DATA", 1) > 10.0)
    val plan = planOf(mixed)
    assert(plan.contains("EqualTo(IFNUM,0)"), plan)
    val expect = (0 until 30).count(i => i % 3 == 0 && 1.0 * i > 10.0) +
      (0 until 20).count(i => i % 3 == 0 && 1.0 * i > 10.0)
    assert(mixed.count() == expect)
  }

  test("channels option decodes only the slice, clamps like Spark's slice") {
    val dir = fixture()
    val full = spark.read.format("sdfits").load(dir)
    val sliced = spark.read.format("sdfits").option("channels", "1:2").load(dir)
    // plan carries the pushed range
    val plan = planOf(sliced.select($"ROWIDX", $"DATA"))
    assert(plan.contains("PushedChannelRange: [1:2]"), plan)
    // values are exactly slice($"DATA", 2, 2) of the full read
    val expect = full.select($"ROWIDX", slice($"DATA", 2, 2).as("d"))
      .as[(Long, Seq[Double])].collect().toMap
    val got = sliced.select($"ROWIDX", $"DATA")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got == expect && got.values.forall(_.length == 2))
    assert(got(1003L) == Seq(6.0, 9.0)) // channels 2,3 of row i=3: 2i, 3i
    // filters + scalar columns ride along unaffected
    val f = spark.read.format("sdfits").option("channels", "1:2").load(dir)
      .filter($"IFNUM" === 1).select(element_at($"DATA", 1).as("c"))
    assert(planOf(f).contains("EqualTo(IFNUM,1)"))
    assert(f.as[Double].collect().sorted.take(2).toSeq == Seq(2.0, 2.0))
    // past-the-end ranges CLAMP (slice semantics — the rule rewrite must
    // be value-preserving), they don't throw
    val clamp = spark.read.format("sdfits").option("channels", "3:5").load(dir)
      .select(size($"DATA")).as[Int].collect()
    assert(clamp.forall(_ == 1))
    val empty = spark.read.format("sdfits").option("channels", "9:2").load(dir)
      .select(size($"DATA")).as[Int].collect()
    assert(empty.forall(_ == 0))
    // malformed option refuses loudly
    val e = intercept[Exception] {
      spark.read.format("sdfits").option("channels", "2").load(dir).collect()
    }
    assert(e.getMessage.contains("channels"))
    // digit strings past Int.MaxValue refuse with the SAME contextual
    // message, not a bare NumberFormatException
    val big = intercept[Exception] {
      spark.read.format("sdfits").option("channels", "99999999999:2")
        .load(dir).collect()
    }
    assert(big.getMessage.contains("channels"), big.getMessage)
  }

  test("non-ANSI sessions do not push integral SUMs (wrap vs addExact divergence)") {
    val dir = fixture()
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = spark.read.format("sdfits").load(dir)
      // integral sum: falls back (unpushed long sum would WRAP on overflow
      // where the pushed partial throws via addExact — ADVICE r16: pushdown
      // must never change observable semantics)
      val gi = df.agg(sum($"ROWIDX").as("sr"))
      assert(!planOf(gi).contains("SumCol"), planOf(gi))
      val allIdx = (0 until 30).map(i => 1000L + i) ++ (0 until 20).map(2000L + _)
      assert(gi.head().getLong(0) == allIdx.sum)
      // double sum: IEEE-identical either way — still pushes
      val gd = df.agg(sum($"ELEVATIO").as("se"))
      assert(planOf(gd).contains("SumCol(ELEVATIO)"), planOf(gd))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("AVG pushes as its Sum+Count decomposition (partial-pushdown contract)") {
    // Spark decomposes Avg into Sum + Count when a source supports only
    // PARTIAL aggregate pushdown (SPARK-37839) — the scan must receive
    // both, and the final avg is Spark's division over the merged
    // partials (so the ANSI overflow contract rides on the pushed SUM).
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val a = df.agg(avg($"IFNUM").as("ai"), avg($"ELEVATIO").as("ae"))
    val plan = planOf(a)
    assert(plan.contains("SumCol(IFNUM)") && plan.contains("SumCol(ELEVATIO)"),
      s"avg not decomposed into pushed sums:\n$plan")
    assert(plan.contains("RowCount"), plan)
    val r = a.head()
    val ifs = (0 until 30).map(_ % 3) ++ (0 until 20).map(_ % 3)
    val els = (0 until 30).map(40.0 + _) ++ (0 until 20).map(40.0 + _)
    assert(r.getDouble(0) == ifs.sum.toDouble / ifs.size)
    assert(r.getDouble(1) == els.sum / els.size)
    // grouped avg decomposes too
    val g = df.groupBy($"IFNUM").agg(avg($"ELEVATIO").as("ae"))
    assert(planOf(g).contains("SumCol(ELEVATIO)") &&
      planOf(g).contains("PushedGroupBy"), planOf(g))
    val expect = ((0 until 30) ++ (0 until 20)).groupBy(_ % 3).view
      .mapValues(is => is.map(40.0 + _).sum / is.size).toMap
    assert(g.orderBy($"IFNUM").as[(Int, Double)].collect().toSeq ==
      Seq(0, 1, 2).map(k => (k, expect(k))))
  }

  test("statistics report the byte size of the listing") {
    val dir = fixture()
    val df = spark.read.format("sdfits").load(dir)
    val scan = df.queryExecution.optimizedPlan.stats
    val onDisk = new java.io.File(dir).listFiles().map(_.length()).sum
    assert(scan.sizeInBytes == BigInt(onDisk), s"${scan.sizeInBytes} vs $onDisk")
  }
}
