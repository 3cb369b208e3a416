package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FixedPointLog: the Spark Column implementation must be BIT-IDENTICAL to
  * the JVM reference (that is the whole point — two engines, one integer
  * algorithm), and the reference must track math.log to the documented
  * accuracy.
  */
class FixedPointLogSpec extends SparkTestBase {

  // A grid spanning the operating range: x = p/q from ~1e-7 up to exactly
  // 2, small and hugeint-wide operands (q up to ~2e16 exercises the
  // decimal path on the Spark side).
  private val cases: Seq[(Long, Long)] = Seq(
    (1L, 1L), (2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L),
    (16L, 8L), (999L, 1000L), (1000L, 999L), (1L, 7L), (13L, 7L),
    (1L, 1000000L), (1L, 9999999L), (19999999L, 10000000L),
    (123456789L, 987654321L), (987654321L, 1234567890L),
    (1L, 20000000000000000L), (19999999999999999L, 10000000000000000L),
    (7L, 20000000000000000L), (3141592653589793L, 2718281828459045L),
    (2718281828459045L, 3141592653589793L))
    .filter { case (p, q) => p <= 2 * q }

  test("lnNanoRef tracks math.log within quantization error") {
    for ((p, q) <- cases) {
      val got = FixedPointLog.lnNanoRef(p, q) / 1e9
      val want = math.log(p.toDouble / q.toDouble)
      // u-quantization dominates for tiny x: |err| ≲ 1/u = q/(p·2^30).
      val tol = 2.0 * q.toDouble / (p.toDouble * FixedPointLog.Scale) + 1e-7
      assert(math.abs(got - want) < tol, s"ln($p/$q): got $got want $want")
    }
  }

  test("lnNanoCol is bit-identical to lnNanoRef") {
    val s = spark; import s.implicits._
    val df = cases.toDF("p", "q")
      .withColumn("ln", FixedPointLog.lnNanoCol(col("p"), col("q")))
    val got = df.select("p", "q", "ln").as[(Long, Long, Long)].collect()
    for ((p, q, ln) <- got)
      assert(ln == FixedPointLog.lnNanoRef(p, q), s"ln($p/$q)")
  }

  test("idiv truncates toward zero like DuckDB //, fdiv floors") {
    val s = spark; import s.implicits._
    val df = Seq((-7L, 2L), (7L, 2L), (-8L, 2L), (1L, 3L)).toDF("a", "b")
      .select(FixedPointLog.idiv(col("a"), col("b")).as("i"),
        FixedPointLog.fdiv(col("a"), col("b")).as("f"))
    assert(df.as[(Long, Long)].collect().toSeq ==
      Seq((-3L, -4L), (3L, 3L), (-4L, -4L), (0L, 0L)))
  }

  // Wide-domain grid: ratios from tiny up to near the 2^46 guard, with
  // exact powers of two sitting ON ladder branch boundaries.
  private val wideCases: Seq[(Long, Long)] = Seq(
    (1L, 3L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
    (1L << 31, 1L), ((1L << 31) - 1L, 1L), ((1L << 31) + 1L, 1L),
    (1L << 45, 1L), ((1L << 45) + 12345L, 7L), ((1L << 46) - 1L, 1L),
    (987654321098L, 12345L), (999999999999999L, 31L),
    (70368744177663L, 1L), (20000000000000000L, 450L),
    (7L, 20000000000000000L), (3141592653589793L, 271828L))

  test("lnNanoWideRef tracks math.log within quantization error") {
    for ((p, q) <- wideCases) {
      val got = FixedPointLog.lnNanoWideRef(p, q) / 1e9
      val want = math.log(p.toDouble / q.toDouble)
      // Same u-quantization bound as the narrow test (dominates for tiny x).
      val tol = 2.0 * q.toDouble / (p.toDouble * FixedPointLog.Scale) + 1e-6
      assert(math.abs(got - want) < tol, s"lnWide($p/$q): got $got want $want")
    }
  }

  test("lnNanoWideRef agrees with lnNanoRef on the shared domain") {
    for ((p, q) <- cases)
      assert(FixedPointLog.lnNanoWideRef(p, q) == FixedPointLog.lnNanoRef(p, q),
        s"lnWide($p/$q) != ln($p/$q)")
  }

  test("lnNanoWideCol is bit-identical to lnNanoWideRef") {
    val s = spark; import s.implicits._
    val df = wideCases.toDF("p", "q")
      .withColumn("ln", FixedPointLog.lnNanoWideCol(col("p"), col("q")))
    val got = df.select("p", "q", "ln").as[(Long, Long, Long)].collect()
    for ((p, q, ln) <- got)
      assert(ln == FixedPointLog.lnNanoWideRef(p, q), s"lnWide($p/$q)")
  }

  test("withLnNanoWide chain is bit-identical to lnNanoWideRef") {
    val s = spark; import s.implicits._
    val df = FixedPointLog.withLnNanoWide(
      wideCases.toDF("p", "q"), col("p"), col("q"), "ln")
    val got = df.select("p", "q", "ln").as[(Long, Long, Long)].collect()
    for ((p, q, ln) <- got)
      assert(ln == FixedPointLog.lnNanoWideRef(p, q), s"lnWide($p/$q)")
    assert(df.columns.toSeq == Seq("p", "q", "ln"), "intermediates dropped")
  }

  test("kernel expressions propagate null (never crash, never fabricate)") {
    // Every call site feeds coalesced counts, so no compared value sees a
    // null — but the expression contract (nullSafeEval / nullSafeCodeGen)
    // must still be null-in-null-out, not an NPE or a junk value.
    val s = spark; import s.implicits._
    val df = Seq((Some(3L), Some(2L)), (None, Some(2L)), (Some(3L), None))
      .toDF("p", "q")
      .select(FixedPointLog.lnNanoCol(col("p"), col("q")).as("n"),
        FixedPointLog.lnNanoWideCol(col("p"), col("q")).as("w"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == FixedPointLog.lnNanoRef(3L, 2L))
    assert(rows(0).getLong(1) == FixedPointLog.lnNanoWideRef(3L, 2L))
    for (i <- 1 to 2; j <- 0 to 1) assert(rows(i).isNullAt(j), s"row $i col $j")
  }

  test("lnNanoWide fails loudly past the 2^46 ratio guard") {
    // Ratio exactly 2^46 is the last admitted value (reduces to the series
    // edge m = 2^31); the first value beyond errors in both engines.
    assert(FixedPointLog.lnNanoWideRef(1L << 46, 1L) ==
      FixedPointLog.lnNanoRef(2L, 1L) + 45L * FixedPointLog.Ln2Nano)
    assertThrows[IllegalArgumentException] {
      FixedPointLog.lnNanoWideRef((1L << 46) + 1L, 1L)
    }
    val s = spark; import s.implicits._
    val ex = intercept[Exception] {
      Seq(((1L << 46) + 1L, 1L)).toDF("p", "q")
        .select(FixedPointLog.lnNanoWideCol(col("p"), col("q"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("lnNanoWideDuckSteps emits the guard, both ladders and the j recombination") {
    val steps = FixedPointLog.lnNanoWideDuckSteps("nn", "dd", "w")
    assert(steps.last._2 == "w_ln")
    assert(steps.map(_._2).distinct.size == steps.size)
    assert(steps.head._1.contains("error("))
    assert(steps(1)._2 == "w_j")
    assert(steps.last._1.contains(s"w_j * CAST(${FixedPointLog.Ln2Nano} AS BIGINT)"))
  }

  test("lnNanoDuckSteps emits one alias chain ending in _ln with shared constants") {
    val steps = FixedPointLog.lnNanoDuckSteps("2*xa", "qq", "a")
    assert(steps.last._2 == "a_ln")
    assert(steps.map(_._2).distinct.size == steps.size)
    // The ln2 constant and scale must be the shared ones (never recomputed).
    assert(steps.last._1.contains(FixedPointLog.Ln2Nano.toString))
    assert(steps.head._1.contains(FixedPointLog.Scale.toString))
  }
}
