package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracker — the incremental analog of the batch
  * `q_events_funnelsteps` query (first view → first click after it → first
  * purchase after that): per-user O(1) state advances through the stages
  * and emits ONE completion record the moment the final stage lands.
  * Real-time conversion tracking runs exactly this shape; recomputing the
  * batch funnel per micro-batch is corpus-sized work for a three-long
  * state.
  *
  * Ordering contract (the [[StreamingCal.spikeSegments]] discipline):
  * events are sorted by event time WITHIN each micro-batch, and per-user
  * delivery across batches is assumed time-ordered — under that contract
  * the tracker's stage times equal the batch query's conditional minima
  * (spec-certified). Cross-batch out-of-order arrivals can commit a later
  * first-view than batch would; bound them upstream with a watermark
  * (the same trade every streaming sessionizer makes).
  *
  * `idleTimeout`: evict state for users gone quiet (unbounded deployments
  * must set it — same contract as spikeSegments; no trailing emission
  * here, an incomplete funnel is simply unconverted).
  */
object StreamingFunnel {

  final case class FunnelEvent(userId: Long, eventType: String, us: Long)
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class FunnelCompletion(userId: Long, t1Us: Long, t2Us: Long, t3Us: Long)

  def completions(events: Dataset[FunnelEvent],
      stage1: String = "view", stage2: String = "click",
      stage3: String = "purchase",
      idleTimeout: Option[String] = None): Dataset[FunnelCompletion] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelCompletion]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (userId: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            val out = Seq.newBuilder[FunnelCompletion]
            it.toSeq.sortBy(_.us).foreach { e =>
              if (s.t3 == -1L) {
                if (e.eventType == stage1 && s.t1 == -1L) s = s.copy(t1 = e.us)
                else if (e.eventType == stage2 && s.t1 != -1L && s.t2 == -1L &&
                  e.us > s.t1) s = s.copy(t2 = e.us)
                else if (e.eventType == stage3 && s.t2 != -1L && e.us > s.t2) {
                  s = s.copy(t3 = e.us)
                  out += FunnelCompletion(userId, s.t1, s.t2, s.t3)
                }
              }
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
