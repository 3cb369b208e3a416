package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state (SURVEY §2.10).
  *
  * The canonical real-time shape: match each left event to the right
  * events of the same key arriving within a bounded event-time horizon
  * (impressions ⋈ clicks, click ⋈ purchase attribution). The TIME-RANGE
  * conjunct is not a convenience — it is what makes the join runnable
  * unbounded: with both sides watermarked and the range condition
  * present, Spark derives a state-eviction bound (a buffered left row is
  * droppable once the watermark passes `ts + within`; a right row once
  * it passes `ts`). An equi-only stream-stream join would buffer BOTH
  * streams forever — the state-store OOM at any real event rate.
  *
  * The same code runs batch: `withWatermark` is a no-op on batch frames
  * (Catalyst's EliminateEventTimeWatermark), so a registry query and its
  * streaming twin share one definition — StreamingJoinSpec certifies
  * micro-batched output == the batch join, and that late rows past the
  * watermark stop matching.
  */
object StreamingJoin {

  /** Inner-join `left` and `right` on `key` equality AND
    * `right.rightTs ∈ [left.leftTs, left.leftTs + within]`.
    *
    * The two frames must carry DISTINCT timestamp column names (rename
    * upstream: attribution output wants both times anyway); `key` may be
    * the same name on both sides — the right copy is dropped from the
    * output.
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermark: String): DataFrame = {
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct column names (rename upstream)")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"),
        "inner")
      .drop(r(key))
  }
}
