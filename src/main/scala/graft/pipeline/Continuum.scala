package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps
import graft.model.HeaderRecord
import graft.model.HeaderRecord.Header
import graft.ops._

/** Entry point 2 — the continuum reduction (ref continuum.py:140-191):
  * F1 feed/pol filter → optional F6/F7 range filters → ST1 spike scan →
  * A8 calibration heights on the pre/post windows → A1 integration of the
  * data window → A9 gain division. Returns (t, intensity) ordered by t.
  *
  * Plan shape at scale: the filters + A1 are one narrow map-only chain over
  * the scan (predicate pushdown + column pruning reach parquet); ST1 collects
  * only three flag columns; A8 collects two doubles per spike row; A9 is a
  * broadcast-literal `withColumn`. Nothing shuffles except the final orderBy,
  * which the caller can drop when order is not needed.
  */
object Continuum {

  final case class Params(
      ifnum: Int,
      plnum: Int,
      includeFreq: Seq[(Double, Double)] = Nil,
      excludeFreq: Seq[(Double, Double)] = Nil,
      includeTime: Seq[(Double, Double)] = Nil,
      excludeTime: Seq[(Double, Double)] = Nil,
      strictCompat: Boolean = false)

  /** Positional index within the (already filtered) single-file frame —
    * the reference's implicit row position (F9). Window over the explicit
    * ingest order; single-file frames are one observation, so the window is
    * per-FILE_ID and parallel across files when several are processed.
    */
  private def withPos(df: DataFrame): DataFrame =
    df.withColumn("__pos",
      row_number().over(Window.partitionBy(col("FILE_ID")).orderBy(col("ROWIDX"))) - 1)

  def run(df: DataFrame, header: Header, p: Params): DataFrame = {
    // A3 — sweep-interleave factor from the PRE-filter table (continuum.py:24-28).
    val channelCount = Integration.sweepInterleaveFactor(df)

    // F1 — feed/pol selection (continuum.py:30-33).
    var d = df.filter(col("IFNUM") === p.ifnum && col("PLNUM") === p.plnum)

    // F6 — time ranges (continuum.py:147-148).
    val t0 = lit(header.date)
    d = RangeFilters.filterTimeRanges(d, t0, p.includeTime, p.excludeTime)

    // F7 — frequency ranges, else synthesized axis (continuum.py:149-153).
    val fr = HeaderRecord.frequencyRange(header, p.ifnum)
    val freqs = ArrayOps.freqAxis(fr.high, fr.low, fr.channelCount)
    val (_, d2) = RangeFilters.filterFrequencyRanges(d, freqs, p.includeFreq, p.excludeFreq)

    // ST1 — three indices on the filtered frame (continuum.py:156).
    val flagged = withPos(d2).cache()
    try {
      val idx = CalibrationScan.scanSingleFile(flagged, channelCount, header.obsmode, "ROWIDX")
      val dataStart = idx.dataStart.getOrElse(0)
      val postCal = idx.postCalStart

      // A1 over each window once, then F9 positional slicing on the result —
      // one pass computes t/intensity for every row.
      val integ = flagged.select(
        col("__pos"),
        col("CALSTATE"), col("SWPVALID"),
        RangeFilters.relSeconds(col("DATE_OBS"), t0).as("t"),
        ArrayOps.arraySum(col("DATA")).as("intensity"))

      // A8 — heights from the pre/post calibration windows (continuum.py:161-169).
      val pre = GainCal.calibrationHeight(integ.filter(col("__pos") < dataStart))
      val post = GainCal.calibrationHeight(integ.filter(col("__pos") >= postCal))

      // Data window integration (continuum.py:171) + A9 gain division.
      val cont = integ
        .filter(col("__pos") >= dataStart && col("__pos") < postCal)
        .select(col("t"), col("intensity"))
      GainCal.applyGain(cont, pre, post, p.strictCompat).orderBy(col("t"))
    } finally flagged.unpersist()
  }
}
