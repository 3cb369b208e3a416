package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the generic admission gate a
  * pipeline runs before committing a batch (the radio-specific F4/C4
  * validations are instances of the same shape).
  *
  * Every expectation is a named boolean predicate counted over the frame;
  * [[report]] evaluates ALL of them in ONE aggregation pass (a single scan
  * regardless of expectation count, map-side partials) and unpivots to a
  * long `(expectation, violations, ok)` report. [[enforce]] is the gating
  * form: fail the batch when any expectation is violated.
  */
object Expectations {

  final case class Violation(msg: String) extends RuntimeException(msg)

  /** `(name, predicate)` pairs; a row violates an expectation when the
    * predicate is false OR null (SQL three-valued logic must not let nulls
    * slip through a gate).
    */
  def report(df: DataFrame, expectations: Seq[(String, Column)]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val aggs = expectations.map { case (name, pred) =>
      // coalesce(sum, 0): over an EMPTY frame sum is null, and a null
      // violation count would read as "not ok" (or slip through enforce's
      // filter) — an empty batch has zero violations by definition.
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = expectations.map { case (name, _) =>
      s"'${Profiling.sqlStringLit(name)}', `__v_${Profiling.sqlIdent(name)}`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${expectations.size}, $stackArgs) as (expectation, violations)")
      .withColumn("ok", col("violations") === 0L)
  }

  /** Throw [[Violation]] listing every failed expectation (all evaluated in
    * the same single pass), else return `df` unchanged for chaining.
    */
  def enforce(df: DataFrame, expectations: Seq[(String, Column)]): DataFrame = {
    val bad = report(df, expectations).filter(!col("ok"))
      .collect().map(r => s"${r.getString(0)} (${r.getLong(1)} rows)")
    if (bad.nonEmpty) throw Violation(s"expectations violated: ${bad.mkString(", ")}")
    df
  }

  // --- common expectation builders ---------------------------------------
  def notNull(c: String): (String, Column) = (s"not_null_$c", col(c).isNotNull)
  def nonNegative(c: String): (String, Column) = (s"non_negative_$c", col(c) >= 0)
  def inRange(c: String, lo: Double, hi: Double): (String, Column) =
    (s"in_range_$c", col(c) >= lo && col(c) <= hi)
  def matches(c: String, re: String): (String, Column) =
    (s"matches_$c", col(c).rlike(re))
}
