package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Positional index within the (already filtered) frame — the reference's
    * implicit row position (F9). Bucketed form ([[graft.ops.Positions]])
    * on BOTH paths (r14): a constant FILE_ID would constant-fold a
    * per-file window's partition key away and funnel every row through
    * one WindowExec partition, and even the genuine multi-file window
    * parallelizes only by file COUNT — the sf10 certificate measured it
    * at 20× for 10× data on a 4-file fixture. The bucketed offsets side
    * re-reads the checkpointed/cached upstream, a narrow extra scan.
    */
  private def withPos(df: DataFrame): DataFrame = Positions.withPos(df)

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
    // flagged is cached: the ST1 scan, both A8 height collects and the final
    // consumer all read it. NOT unpersisted here — the returned frame is
    // lazy and still reads `flagged`; an eager unpersist would force the
    // final consumer to recompute the whole chain. Cache lifecycle is the
    // CALLER's: clear with spark.catalog.clearCache() once the result is
    // consumed (the harness does this between queries). Callers looping
    // over MANY files should use [[runAll]] — one job chain, no per-file
    // caches — rather than calling run() per file.
    val flagged = withPos(d2).cache()
    // Distributed ST1: flag rows reduce executor-side; one row reaches the
    // driver (scanSingleFile semantics, pinned by q_st1_calscan).
    val idx = CalibrationScan.scanSingleFileDistributed(flagged, channelCount, header.obsmode)
    val dataStart = idx.dataStart.getOrElse(0)
    val postCal = idx.postCalStart

    // A1 over each window once, then F9 positional slicing on the result —
    // one pass computes t/intensity for every row.
    val integ = flagged.select(
      col("__pos"),
      col("CALSTATE"), col("SWPVALID"),
      RangeFilters.relSeconds(col("DATE_OBS"), t0).as("t"),
      ArrayOps.arraySum(col("DATA")).as("intensity"))

    // A8 — heights from the pre/post calibration windows (continuum.py:161-169),
    // both windows in one tagged collect (one driver round trip, not four).
    val (pre, post) = GainCal.calibrationHeights(integ, dataStart, postCal)

    // Data window integration (continuum.py:171) + A9 gain division.
    val cont = integ
      .filter(col("__pos") >= dataStart && col("__pos") < postCal)
      .select(col("t"), col("intensity"))
    GainCal.applyGain(cont, pre, post, p.strictCompat).orderBy(col("t"))
  }

  /** Multi-file scale path: the whole reduction for N files in ONE Spark job
    * chain — no per-file driver orchestration ([[run]] issues ~6 driver-
    * synchronous jobs per file, which at 100k files makes the driver loop the
    * bottleneck; here the driver issues a constant number of jobs total).
    *
    * Plan shape: one narrow projection computes (t, intensity) for every row
    * (column pruning keeps the wide DATA out of everything downstream of
    * A1); per-file ST1 + A8 + the A9 branch decision run executor-side in a
    * `groupByKey(FILE_ID).mapGroups` over the pruned five-column frame (a
    * file's rows must fit one executor's memory — they are one observation);
    * the resulting per-file gain parameters broadcast-join back onto the
    * integrated frame and the division is a codegen'd `when` expression.
    *
    * Semantics per file are identical to [[run]] (same scan, same fits, same
    * truthiness/z/strictCompat branches, interpolation over the data
    * window's min/max t), pinned by ContinuumAllSpec against [[run]].
    */
  def runAll(df: DataFrame, header: Header, p: Params): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val t0 = lit(header.date)
    val fr = HeaderRecord.frequencyRange(header, p.ifnum)
    val freqs = ArrayOps.freqAxis(fr.high, fr.low, fr.channelCount)

    // ONE evaluation of the (possibly expensive) source subtree: a narrow
    // PRE-F1 projection in which DATA is already consumed into intensity
    // (A1 after the F7 channel crop, both per-row), so the checkpoint holds
    // nine scalar columns and never the channel vectors. Both the A3
    // interleave aggregate (pre-filter semantics, continuum.py:24-28) and
    // the filtered integ frame below re-read this materialization —
    // previously each evaluated the full source independently, and the sf1
    // smoke measured the multi-file fixture at ~7 s PER evaluation (the
    // dominant term of q_continuum_all's 5× ratio for 10× data).
    // The crop/integration is gated on the F1 predicate (CaseWhen
    // short-circuits in codegen): the crop indices derive from p.ifnum's
    // channel geometry, and under ANSI an unconditional element_at would
    // crash on another IF's shorter DATA array — besides wasting the
    // arraySum on every row F1 drops anyway. Gated, the surviving values
    // are exactly what [[run]] computes post-filter. The gate is
    // CONSTRUCTED — pickChannels sits inside the when() branch directly
    // (ADVICE r13): the earlier form cropped via an unconditional
    // withColumn and depended on CollapseProject inlining it into the
    // branch; an optimizer duplicate-reference guard change would have
    // evaluated the crop ungated.
    val f1 = col("IFNUM") === p.ifnum && col("PLNUM") === p.plnum
    val croppedData = RangeFilters
      .keptChannelIndices(freqs, p.includeFreq, p.excludeFreq)
      .map(kept => ArrayOps.pickChannels(col("DATA"), kept))
      .getOrElse(col("DATA"))
    val base = df.select(
      col("FILE_ID").cast("string").as("FILE_ID"),
      col("ROWIDX").cast("long").as("ROWIDX"),
      col("IFNUM").cast("int").as("IFNUM"),
      col("PLNUM").cast("int").as("PLNUM"),
      col("CALSTATE").cast("int").as("CALSTATE"),
      col("SWPVALID").cast("int").as("SWPVALID"),
      col("OBSMODE").cast("string").as("OBSMODE"),
      RangeFilters.relSeconds(col("DATE_OBS"), t0).as("t"),
      when(f1, ArrayOps.arraySum(croppedData))
        .otherwise(lit(null).cast("double")).as("intensity"))
      .localCheckpoint()

    // A3 per file, in-plan (no driver agg): |IFNUM| x |PLNUM| distinct.
    val cc = base.groupBy(col("FILE_ID"))
      .agg((countDistinct(col("IFNUM")) * countDistinct(col("PLNUM"))).as("__cc"))

    var d = base.filter(col("IFNUM") === p.ifnum && col("PLNUM") === p.plnum)
    if (p.includeTime.nonEmpty || p.excludeTime.nonEmpty)
      d = d.filter(RangeFilters.timeRangePredicate(col("t"), p.includeTime, p.excludeTime))

    // Materialized ONCE (localCheckpoint): integ feeds both the mapGroups
    // params side and the final join side — unmaterialized, the per-file
    // position window would run twice for the same information. Bucketed
    // positions (Positions.withPos) rather than a per-FILE window, for the
    // same rows-not-file-count parallelism reason as Spectrum.runAll (the
    // offsets side re-reads the cheap checkpointed base, so the extra
    // pass is a narrow scan).
    val integ = Positions.withPos(d).select(
      col("FILE_ID"),
      col("__pos").cast("long").as("__pos"),
      col("CALSTATE"), col("SWPVALID"), col("OBSMODE"),
      col("t"), col("intensity"))
      .localCheckpoint()

    val strict = p.strictCompat
    val obsmode = header.obsmode
    // Per-file gain parameters: mode 0 = identity, 1 = divide by constant
    // `pv`, 2 = divide by the height interpolated between (t1, pv)..(t2, qv).
    val params = integ
      .join(broadcast(cc), "FILE_ID")
      .select(col("FILE_ID"), col("__pos"), col("CALSTATE"), col("SWPVALID"),
        col("OBSMODE"), col("t"), col("intensity"), col("__cc"))
      .as[(String, Long, Int, Int, String, Double, Double, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val rows = it.toArray.sortBy(_._2)
        val flags = rows.map(r => CalibrationScan.Flags(r._3, r._4, r._5)).toIndexedSeq
        val idx = CalibrationScan.scan(flags, rows.headOption.map(_._8).getOrElse(1L), obsmode)
        val dataStart = idx.dataStart.getOrElse(0)
        val postCal = idx.postCalStart

        def height(window: Array[(String, Long, Int, Int, String, Double, Double, Long)]) = {
          val on = window.filter(r => r._3 == 1 && r._4 == 0)
          val off = window.filter(r => r._3 == 0 && r._4 == 0)
          GainCal.calibrationHeightLocal(
            on.map(_._6), on.map(_._7), off.map(_._6), off.map(_._7))
        }
        val pre = height(rows.filter(_._2 < dataStart)).filter(_.delta != 0.0)
        val post = height(rows.filter(_._2 >= postCal)).filter(_.delta != 0.0)
        val window = rows.filter(r => r._2 >= dataStart && r._2 < postCal)

        // Branch decision mirrors GainCal.applyGain exactly.
        val (mode, pv, qv, t1, t2) = (pre, post) match {
          case (Some(a), Some(b)) =>
            val z = math.abs(a.delta - b.delta) / math.sqrt(a.sd * a.sd + b.sd * b.sd)
            if (z >= 1.96) {
              if (strict || window.isEmpty) (0, 0.0, 0.0, 0.0, 0.0)
              else {
                val w1 = window.map(_._6).min; val w2 = window.map(_._6).max
                if (w2 == w1) (1, (a.delta + b.delta) / 2, 0.0, 0.0, 0.0)
                else (2, a.delta, b.delta, w1, w2)
              }
            } else (1, (a.delta + b.delta) / 2, 0.0, 0.0, 0.0)
          case (Some(a), None) => (1, a.delta, 0.0, 0.0, 0.0)
          case (None, Some(b)) => (1, b.delta, 0.0, 0.0, 0.0)
          case (None, None)    => (0, 0.0, 0.0, 0.0, 0.0)
        }
        (file, dataStart.toLong, postCal.toLong, mode, pv, qv, t1, t2)
      }
      .toDF("FILE_ID", "__ds", "__pc", "__mode", "__p", "__q", "__t1", "__t2")

    // Broadcast the tiny per-file parameter table back onto the integrated
    // frame; the gain division is a codegen'd expression (same op order as
    // GainCal.applyGain for bit parity with the single-file path).
    val h = col("__p") + (col("__q") - col("__p")) * ((col("t") - col("__t1")) / (col("__t2") - col("__t1")))
    integ.join(broadcast(params), "FILE_ID")
      .filter(col("__pos") >= col("__ds") && col("__pos") < col("__pc"))
      .select(col("FILE_ID"), col("t"),
        when(col("__mode") === 2, col("intensity") / h)
          .when(col("__mode") === 1, col("intensity") / col("__p"))
          .otherwise(col("intensity")).as("intensity"))
      .orderBy(col("FILE_ID"), col("t"))
  }
}
