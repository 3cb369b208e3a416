package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** F6/F7 — observer-selected time and frequency range filters
  * (ref utils.py:239-309). Pure Catalyst: the time filter is a row predicate
  * (pushes down past projections), the frequency filter is a per-row array
  * projection driven by a header-derived literal index list (constant-folded,
  * no shuffle, no UDF).
  */
object RangeFilters {

  /** Relative-seconds column: `DATE_OBS − t0` in seconds (C4,
    * ref utils.py:114-117, 245-247). Computed in microsecond integer space
    * then divided — keeps sub-second precision without double-rounding drift.
    * Accepts both TIMESTAMP and TIMESTAMP_NTZ inputs (the cast is a no-op on
    * the former; on the latter, wall-clock under the session zone — UTC in
    * every harness session — so it matches DuckDB's naive `epoch_us`).
    */
  def relSeconds(ts: Column, t0: Column): Column =
    (unix_micros(ts.cast("timestamp")) - unix_micros(t0.cast("timestamp")))
      .cast("double") / 1e6

  /** F6 — time-range include/exclude (ref utils.py:239-271). Bounds are
    * exclusive. Include ranges OR together; exclude ranges AND-NOT together.
    *
    * Deliberate divergence (SURVEY §7.5.4): the reference computes the mask
    * lengths from the pre-filter table, so supplying BOTH include and exclude
    * crashes on a length mismatch (`utils.py:261-269`). The evident intent —
    * one combined per-row predicate — is implemented here.
    */
  def timeRangePredicate(
      relSec: Column,
      include: Seq[(Double, Double)],
      exclude: Seq[(Double, Double)]): Column = {
    def in(r: (Double, Double)): Column = (relSec > r._1) && (relSec < r._2)
    val inc = if (include.isEmpty) lit(true) else include.map(in).reduce(_ || _)
    val exc = if (exclude.isEmpty) lit(false) else exclude.map(in).reduce(_ || _)
    inc && !exc
  }

  def filterTimeRanges(
      df: DataFrame,
      t0: Column,
      include: Seq[(Double, Double)],
      exclude: Seq[(Double, Double)],
      tsCol: String = "DATE_OBS"): DataFrame =
    if (include.isEmpty && exclude.isEmpty) df
    else df.filter(timeRangePredicate(relSeconds(col(tsCol), t0), include, exclude))

  /** F7 — frequency-range include/exclude (ref utils.py:273-309): compute the
    * kept channel indices once on the driver from the synthesized descending
    * axis, then project them out of every row's vector. Returns the filtered
    * axis alongside the transformed frame, mirroring the reference's
    * `(frequencies, data)` return.
    */
  def filterFrequencyRanges(
      df: DataFrame,
      freqs: Array[Double],
      include: Seq[(Double, Double)],
      exclude: Seq[(Double, Double)],
      dataCol: String = "DATA"): (Array[Double], DataFrame) = {
    keptChannelIndices(freqs, include, exclude) match {
      case None => (freqs, df)
      case Some(kept) =>
        (kept.map(freqs),
          df.withColumn(dataCol, ArrayOps.pickChannels(col(dataCol), kept)))
    }
  }

  /** The index side of [[filterFrequencyRanges]]: the kept channel indices
    * against the synthesized axis, or None when no ranges are given (the
    * identity crop). Exposed so callers that must GATE the crop on a
    * predicate (Continuum.runAll's F1 branch, where other IFs carry shorter
    * DATA arrays an ungated element_at would crash on under ANSI) can
    * construct `when(pred, pickChannels(DATA, kept))` explicitly instead of
    * relying on CollapseProject to inline an unconditional withColumn crop
    * into the branch (ADVICE r13).
    */
  def keptChannelIndices(
      freqs: Array[Double],
      include: Seq[(Double, Double)],
      exclude: Seq[(Double, Double)]): Option[Array[Int]] = {
    if (include.isEmpty && exclude.isEmpty) None
    else {
      // Reference applies include first, then exclude against the already-
      // filtered axis (utils.py:285-307) — order matters, mirror it.
      val afterInc =
        if (include.isEmpty) freqs.indices.toArray
        else ArrayOps.keepIndices(freqs, include, Nil)
      val incFreqs = afterInc.map(freqs)
      val afterExc =
        if (exclude.isEmpty) incFreqs.indices.toArray
        else ArrayOps.keepIndices(incFreqs, Nil, exclude)
      Some(afterExc.map(afterInc))
    }
  }
}
