package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FixedPointExp: the Spark Column implementation must be BIT-IDENTICAL to
  * the JVM reference (two engines, one integer algorithm), the reference
  * must track math.exp to the documented accuracy, and the domain guard
  * must fail loudly on both ends.
  */
class FixedPointExpSpec extends SparkTestBase {

  // A grid spanning [0, 2] nano, including both endpoints and values that
  // stress every Taylor term.
  private val cases: Seq[Long] = Seq(0L, 1L, 999L, 1000000L, 123456789L,
    500000000L, 693147181L, 1000000000L, 1234567890L, 1999999999L,
    2000000000L)

  test("expNanoRef tracks math.exp within documented accuracy") {
    for (x <- cases) {
      val got = FixedPointExp.expNanoRef(x) / 1e9
      val want = math.exp(x / 1e9)
      assert(math.abs(got - want) < 1e-7, s"exp($x): got $got want $want")
    }
  }

  test("expNanoRef rejects out-of-domain input") {
    intercept[IllegalArgumentException](FixedPointExp.expNanoRef(-1L))
    intercept[IllegalArgumentException](
      FixedPointExp.expNanoRef(FixedPointExp.MaxNano + 1))
  }

  test("expNanoCol is bit-identical to expNanoRef") {
    val s = spark; import s.implicits._
    val df = cases.toDF("x")
      .withColumn("e", FixedPointExp.expNanoCol(col("x")))
    for ((x, e) <- df.select("x", "e").as[(Long, Long)].collect())
      assert(e == FixedPointExp.expNanoRef(x), s"exp($x)")
  }

  test("expNanoCol raises on out-of-domain input") {
    val s = spark; import s.implicits._
    val err = intercept[Exception] {
      Seq(FixedPointExp.MaxNano + 1).toDF("x")
        .select(FixedPointExp.expNanoCol(col("x"))).collect()
    }
    assert(err.getMessage.contains("expNanoCol domain"))
  }

  test("exp kernel expression propagates null") {
    val s = spark; import s.implicits._
    val rows = Seq(Some(1000000000L), None).toDF("x")
      .select(FixedPointExp.expNanoCol(col("x")).as("e")).collect()
    assert(rows(0).getLong(0) == FixedPointExp.expNanoRef(1000000000L))
    assert(rows(1).isNullAt(0))
  }

  test("expNanoDuckSteps emits one alias chain ending in _exp with shared constants") {
    val steps = FixedPointExp.expNanoDuckSteps("x_nano", "d")
    assert(steps.last._2 == "d_exp")
    assert(steps.map(_._2).distinct.size == steps.size)
    assert(steps.head._1.contains(FixedPointExp.MaxNano.toString))
    assert(steps.last._1.contains(FixedPointExp.Scale.toString))
  }
}
