package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{ArrayOps, VectorSum}
import graft.model.HeaderRecord
import graft.model.HeaderRecord.Header
import graft.ops._

/** Entry point 3 — the spectrum reduction (ref spectrum.py:46-71):
  * F1+F2 filter → optional F6/F7 → ST1 off-transition index → A2 time-axis
  * integration (ON and OFF halves for onoff files) → A10 difference.
  * Returns one row per channel: (pos, frequency, intensity).
  *
  * One shuffle total: the A2 aggregate (map-side partial vector sums via the
  * custom Aggregator — the shuffle carries one array per partition, not
  * n_rows × n_channels exploded rows).
  */
object Spectrum {

  final case class Params(
      ifnum: Int,
      plnum: Int,
      includeFreq: Seq[(Double, Double)] = Nil,
      excludeFreq: Seq[(Double, Double)] = Nil,
      includeTime: Seq[(Double, Double)] = Nil,
      excludeTime: Seq[(Double, Double)] = Nil)

  def run(df: DataFrame, header: Header, p: Params): DataFrame = {
    val spark = df.sparkSession
    // F1+F2 — feed/pol + science-data filter (spectrum.py:28-33).
    var d = df.filter(
      col("IFNUM") === p.ifnum && col("PLNUM") === p.plnum &&
      col("CALSTATE") === 0 && col("SWPVALID") === 0)

    d = RangeFilters.filterTimeRanges(d, lit(header.date), p.includeTime, p.excludeTime)

    val fr = HeaderRecord.frequencyRange(header, p.ifnum)
    val axis = ArrayOps.freqAxis(fr.high, fr.low, fr.channelCount)
    val (freqs, d2) = RangeFilters.filterFrequencyRanges(d, axis, p.includeFreq, p.excludeFreq)

    // Bucketed per-file position (graft.ops.Positions): a constant FILE_ID
    // would constant-fold a plain per-file window's partition key away and
    // funnel every row through one WindowExec partition. flagged is cached
    // SLIM (only the three columns both consumers read — the off probe and
    // the A2 aggregate): the materialization is the per-row cost here. Not
    // unpersisted here (the returned frame is lazy) — cache lifecycle is
    // the caller's (spark.catalog.clearCache() after consumption; the
    // harness does this between queries); for many files use [[runAll]],
    // which caches nothing.
    // Cache only when the off probe will read the frame a second time (the
    // onoff branch): otherwise the single A2 aggregate is the only
    // consumer and the cache would be pure materialization overhead.
    val flagged0 = Positions.withPos(d2)
      .select(col("__pos"), col("DATA"), col("OBSMODE"))
    val flagged = if (header.obsmode == "onoff") flagged0.cache() else flagged0

    // ST1, spectrum form: the spectrum path reads ONLY the scan's
    // offStart, which is the index of the FIRST row (in __pos order) whose
    // OBSMODE contains 'onoff:off' (CalibrationScan.scanStreaming's
    // offStart register) — i.e. min(__pos) over a contains filter, a fully
    // PARALLEL aggregation. The sequential per-file state machine
    // (secondary sort + one ordered pass) is only needed for
    // dataStart/postCal, which the spectrum path never reads — running it
    // here serialized the whole table through one task (the sf1 smoke's
    // super-constant stage: 10x data = 10x single-task scan while every
    // other stage parallelizes). Gated on header.obsmode == "onoff"
    // exactly like CalIndices.off.
    val offStart: Option[Int] =
      if (header.obsmode == "onoff") {
        val r = flagged.filter(col("OBSMODE").contains("onoff:off"))
          .agg(min(col("__pos"))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0).toInt)
      } else None

    // A2 (+ A10 for onoff): aggregate both halves in ONE pass by grouping on
    // the on/off flag, then zip-subtract the two 1-row arrays.
    val spec: DataFrame = offStart.filter(_ != 0) match { // Python truthiness: off index 0 = falsy (spectrum.py:62)
      case Some(off) =>
        // ONE aggregation pass: group on the on/off flag, then fold the two
        // rows with first(when(...)) — a filter+crossJoin here would run the
        // whole A2 aggregate twice.
        flagged
          .groupBy((col("__pos") < off).as("on"))
          .agg(VectorSum.vecSum(ArrayOps.fillNulls(col("DATA"))).as("s"))
          .agg(
            first(when(col("on"), col("s")), ignoreNulls = true).as("s_on"),
            first(when(!col("on"), col("s")), ignoreNulls = true).as("s_off"))
          .select(ArrayOps.vecDiff(col("s_on"), col("s_off")).as("spectrum"))
      case None =>
        flagged.agg(VectorSum.vecSum(ArrayOps.fillNulls(col("DATA"))).as("spectrum"))
    }

    // Attach the frequency axis: (pos, frequency, intensity) per channel.
    val freqLit = array(freqs.map(lit(_)).toIndexedSeq: _*)
    spec.select(posexplode(col("spectrum")).as(Seq("pos", "intensity")))
      .withColumn("frequency", element_at(freqLit, col("pos") + 1))
      .select(col("pos"), col("frequency"), col("intensity"))
      .orderBy(col("pos"))
  }

  /** Multi-file scale path (the [[graft.pipeline.Continuum.runAll]] analog):
    * spectra for N files in ONE job chain. The per-file off-transition index
    * comes from the distributed ST1 scan (flag columns only — DATA pruned),
    * broadcast-joins back, and the ON/OFF vector sums aggregate in a single
    * groupBy(FILE_ID, half) pass with map-side partial whole-array sums.
    * Output: one row per (FILE_ID, channel).
    */
  def runAll(df: DataFrame, header: Header, p: Params): DataFrame = {
    var d = df.filter(
      col("IFNUM") === p.ifnum && col("PLNUM") === p.plnum &&
      col("CALSTATE") === 0 && col("SWPVALID") === 0)
    d = RangeFilters.filterTimeRanges(d, lit(header.date), p.includeTime, p.excludeTime)
    val fr = HeaderRecord.frequencyRange(header, p.ifnum)
    val axis = ArrayOps.freqAxis(fr.high, fr.low, fr.channelCount)
    val (freqs, d2) = RangeFilters.filterFrequencyRanges(d, axis, p.includeFreq, p.excludeFreq)

    // The spectrum path needs no row POSITIONS at all (r14, the sf10
    // certificate's lesson): the per-file off index was only ever compared
    // — `off_start === 0` and `__pos < off_start` — and positions are
    // ranks of the unique per-file ROWIDX, so every comparison rewrites to
    // a ROWIDX threshold: "off index exists" = min off-ROWIDX non-null,
    // "off index is 0" = min off-ROWIDX equals the file's first ROWIDX,
    // "row before the off transition" = ROWIDX < min off-ROWIDX. That
    // removes the per-file window (whose parallelism scaled with file
    // COUNT — 20× for 10× data on the 4-file fixture) AND the wide
    // checkpoint (93 s materializing 60M DATA arrays at sf10): the frame
    // is evaluated twice, but the offs side prunes to three slim columns
    // and every aggregate is evaluation-order-independent, so no
    // materialization is needed for determinism.
    val slim = d2.withColumn("FILE_ID", col("FILE_ID").cast("string"))
      .select(col("FILE_ID"), col("ROWIDX").cast("long").as("ROWIDX"),
        col("DATA"), col("OBSMODE"))

    // Per-file thresholds (spectrum form of the off index, see [[run]]):
    // a parallel groupBy aggregate, not the sequential per-file state
    // machine (which only dataStart/postCal need, and the spectrum path
    // reads neither). Null off threshold when the header isn't onoff or
    // the file has no off rows, like CalIndices.off.
    val offs =
      if (header.obsmode == "onoff")
        slim.groupBy(col("FILE_ID"))
          .agg(min(col("ROWIDX")).as("__first_row"),
            min(when(col("OBSMODE").contains("onoff:off"), col("ROWIDX")))
              .as("__off_row"))
      else
        slim.groupBy(col("FILE_ID"))
          .agg(min(col("ROWIDX")).as("__first_row"),
            first(lit(null).cast("long")).as("__off_row"))

    // Python truthiness (ref spectrum.py:62): off index 0 or absent → no split.
    val halves = slim
      .join(broadcast(offs), "FILE_ID")
      .withColumn("__split",
        !(col("__off_row").isNull || col("__off_row") === col("__first_row")))
      .withColumn("__on", !col("__split") || col("ROWIDX") < col("__off_row"))
      .groupBy(col("FILE_ID"), col("__on"))
      .agg(VectorSum.vecSum(ArrayOps.fillNulls(col("DATA"))).as("s"),
        first(col("__split")).as("__split"))

    // Mirrors run() exactly: a file WITHOUT a real off index returns its
    // plain sum; a file WITH one returns on−off — null (→ no rows after the
    // posexplode) when either half is empty, same as the single-file path.
    val spec = halves.groupBy(col("FILE_ID"))
      .agg(
        first(when(col("__on"), col("s")), ignoreNulls = true).as("s_on"),
        first(when(!col("__on"), col("s")), ignoreNulls = true).as("s_off"),
        first(col("__split")).as("__split"))
      .select(col("FILE_ID"),
        when(!col("__split"), col("s_on"))
          .otherwise(ArrayOps.vecDiff(col("s_on"), col("s_off"))).as("spectrum"))

    val freqLit = array(freqs.map(lit(_)).toIndexedSeq: _*)
    spec.select(col("FILE_ID"), posexplode(col("spectrum")).as(Seq("pos", "intensity")))
      .withColumn("frequency", element_at(freqLit, col("pos") + 1))
      .select(col("FILE_ID"), col("pos"), col("frequency"), col("intensity"))
      .orderBy(col("FILE_ID"), col("pos"))
  }
}
