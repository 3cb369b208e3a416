package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{ArrayOps, VectorSum}

/** Structured Streaming extensions (SURVEY §2.10 — additions beyond the
  * batch-only reference): the ST1 diode-spike state machine as
  * `flatMapGroupsWithState` keyed by file, and watermarked time-windowed A2
  * spectra. Both reuse the batch operators' semantics.
  */
object StreamingCal {

  final case class CalRow(fileId: String, rowIdx: Long, calstate: Int, swpvalid: Int)
  final case class SpikeSegment(fileId: String, startIdx: Long, endIdx: Long, rows: Long)
  final case class ScanState(inSpike: Boolean, startIdx: Long, lastIdx: Long, count: Long)

  /** Streaming diode-spike segmenter: emits one record per completed
    * CALSTATE==1 run. The per-file state is O(1); rows may arrive across many
    * micro-batches. (The full ST1 "last post-cal run" semantics need the
    * whole file and stay batch; this is the incremental analog that tags
    * spikes as they close.)
    *
    * `idleTimeout`: when set, a file whose rows stop arriving for this
    * long has its state EVICTED (flushing a trailing open spike as a final
    * segment). UNBOUNDED deployments must set it — without eviction every
    * completed observation leaves a ScanState entry in the state store
    * forever. It is None by default because processing-time timeouts make
    * Spark run no-data micro-batches to fire them (busy even when idle),
    * which bounded/test pipelines don't want.
    */
  def spikeSegments(rows: Dataset[CalRow],
      idleTimeout: Option[String] = None): Dataset[SpikeSegment] = {
    implicit val stateEnc = Encoders.product[ScanState]
    implicit val outEnc = Encoders.product[SpikeSegment]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    rows.groupByKey(_.fileId)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (fileId: String, it: Iterator[CalRow], state: GroupState[ScanState]) => {
          if (state.hasTimedOut) {
            // Idle file: flush the trailing open spike (a file ending
            // mid-spike closes it at end-of-data) and evict the state.
            val leftover = state.getOption.filter(_.inSpike)
              .map(s => SpikeSegment(fileId, s.startIdx, s.lastIdx, s.count))
            state.remove()
            leftover.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.rowIdx)
            var s = state.getOption.getOrElse(ScanState(inSpike = false, -1L, -1L, 0L))
            val out = Seq.newBuilder[SpikeSegment]
            sorted.foreach { r =>
              if (r.calstate == 1) {
                s = if (s.inSpike) s.copy(lastIdx = r.rowIdx, count = s.count + 1)
                    else ScanState(inSpike = true, r.rowIdx, r.rowIdx, 1L)
              } else if (s.inSpike) {
                out += SpikeSegment(fileId, s.startIdx, s.lastIdx, s.count)
                s = ScanState(inSpike = false, -1L, -1L, 0L)
              }
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }

  /** Watermarked, windowed A2: element-wise vector sum of DATA per
    * (window, group). Map-side partial aggregation via the same custom
    * Aggregator as batch; late data beyond the watermark is dropped.
    */
  def windowedSpectra(
      df: DataFrame,
      tsCol: String,
      windowDur: String,
      watermark: String,
      dataCol: String = "DATA"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(VectorSum.vecSum(ArrayOps.fillNulls(col(dataCol))).as("spectrum"))

  /** Watermarked dynamic-gap session aggregation: one row per (key,
    * session), a session being a run of events with no `gap`-sized silence.
    * Sessions close when the watermark passes their end, so append-mode
    * sinks receive each session exactly once and state is evicted — the
    * streaming face of the batch q_events_sessions replica.
    */
  def sessionCounts(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("session_start"), col("n"))
}
