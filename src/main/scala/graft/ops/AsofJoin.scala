package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series enrichment operator a
  * telemetry/training-data pipeline needs constantly (attach the latest
  * calibration/weather/model-version row at or before each sample) and
  * plain Spark SQL lacks: writing it as a range join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-row max) plans as a
  * sort-merge/broadcast-nested-loop with an O(|matches|) explosion before
  * the max prunes it.
  *
  * This implementation is the scale-safe union+window shape: tag both
  * sides, union, ONE shuffle on the key, and a running `last(_, ignoreNulls)`
  * over (ts, side) order fills each left row with the latest right row at or
  * before it (right sorts before left at equal ts → `>=` semantics, matching
  * DuckDB `ASOF JOIN`). Cost is one shuffle + per-partition sort over
  * |left| + |right| rows, independent of match multiplicity — the plan that
  * survives 100 TB. The right row travels as ONE struct so all its columns
  * come from the SAME matched row (independent per-column `last`s could mix
  * rows when a right value is legitimately null).
  *
  * Inner semantics: left rows with no right row at or before their ts are
  * dropped (DuckDB `ASOF JOIN` default). Right rows must be unique per
  * (keys, ts) — with duplicates the winner among equal timestamps is
  * tie-broken arbitrarily (same as any engine's ASOF).
  */
object AsofJoin {

  /** For each `left` row, attach the single `right` row with the greatest
    * `rightTs` <= `leftTs` within the same `keys`. Right columns surface as
    * `prefix + name` (the matched timestamp as `prefix + rightTs`).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val payload = struct(col(rightTs).as("__ts") +: rightVals.map(col): _*)
    val payloadType = right.select(payload.as("__r")).schema("__r").dataType

    val lSide = left.select(
      (keys.map(col) :+ col(leftTs).cast("timestamp").as("__ats") :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__r")) ++
        lCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    // A right row with a NULL timestamp can never be "at or before" anything,
    // but nulls-first ascending order would make it the running last() and
    // hand left rows a match no range formulation would produce — drop them.
    val rSide = right.filter(col(rightTs).cast("timestamp").isNotNull).select(
      (keys.map(col) :+ col(rightTs).cast("timestamp").as("__ats") :+ lit(0).as("__side") :+
        payload.as("__r")) ++
        lCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(
        lCols.map(c => if (keys.contains(c)) col(c) else col(s"__l_$c").as(c)) ++
          (col("__m.__ts").as(s"$prefix$rightTs") +:
            rightVals.map(v => col(s"__m.$v").as(s"$prefix$v"))): _*)
  }
}
