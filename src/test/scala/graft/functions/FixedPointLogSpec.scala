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

  test("lnNanoDuckSteps emits one alias chain ending in _ln with shared constants") {
    val steps = FixedPointLog.lnNanoDuckSteps("2*xa", "qq", "a")
    assert(steps.last._2 == "a_ln")
    assert(steps.map(_._2).distinct.size == steps.size)
    // The ln2 constant and scale must be the shared ones (never recomputed).
    assert(steps.last._1.contains(FixedPointLog.Ln2Nano.toString))
    assert(steps.head._1.contains(FixedPointLog.Scale.toString))
  }
}
