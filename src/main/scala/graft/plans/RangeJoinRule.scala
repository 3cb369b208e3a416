package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Opt-in optimizer rule: rewrite a naive point-in-interval join —
  * `points JOIN intervals ON p >= lo AND p <= hi` — into the bucketized
  * equi-join form of [[graft.ops.RangeJoin]], inside the optimizer, so SQL
  * users (and any plan that reaches the pattern) get the O(N + M·span/w)
  * plan instead of the O(N·M) `BroadcastNestedLoopJoin` Spark would
  * otherwise produce.
  *
  * The rewrite: tag each point row with `floor(p / w)`, explode each
  * interval row onto `sequence(floor(lo/w), floor(hi/w))`, join on bucket
  * equality AND the original range condition (which removes the bucket
  * false positives), project the bucket columns away. Result rows are
  * exactly the naive join's (RangeJoinRuleSpec pins equality, including
  * null and degenerate-interval behavior, which the unchanged original
  * condition preserves).
  *
  * Off by default: set `spark.graft.rangeJoin.bucketWidth` (a positive
  * double in point units) to enable — width tuning is data-dependent, the
  * same knob [[graft.ops.RangeJoin.pointInInterval]] exposes. Activate via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `spark.experimental.extraOptimizations` on a live session.
  *
  * Only plain `Inner` joins whose WHOLE condition is the two-sided range
  * (point strictly from one side, both bounds from the other) are
  * rewritten; anything else — extra conjuncts, equi keys (those already
  * plan as hash joins), outer joins — is left untouched.
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def width: Option[Double] =
    // toDoubleOption: a malformed conf value must disable the rule, not
    // throw from inside the optimizer (which would fail EVERY query in
    // the session, not just range joins).
    spark.conf.getOption("spark.graft.rangeJoin.bucketWidth")
      .flatMap(_.toDoubleOption).filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        matchRange(cond, left, right) match {
          case Some((p, lo, hi, pointsLeft)) =>
            rewrite(j, left, right, p, lo, hi, pointsLeft, w, hint)
          case None => j
        }
    }
  }

  /** cond == (p >= lo && p <= hi) with p from one side, lo/hi from the
    * other → (p, lo, hi, pointsOnLeft). Accepts both conjunct orders.
    */
  private def matchRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    val (ge, le) = cond match {
      case And(g @ GreaterThanOrEqual(_, _), l @ LessThanOrEqual(_, _)) => (g, l)
      case And(l @ LessThanOrEqual(_, _), g @ GreaterThanOrEqual(_, _)) => (g, l)
      case _ => return None
    }
    (ge, le) match {
      // p >= lo, p <= hi with the same p on both comparisons
      case (GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))
          if p1.semanticEquals(p2) =>
        (sideOf(p1), sideOf(lo), sideOf(hi)) match {
          case (Some(ps), Some(ls), Some(hs))
              if ls == hs && ps != ls && p1.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
                && lo.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
                && hi.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
            Some((p1, lo, hi, ps))
          case _ => None
        }
      case _ => None
    }
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      p: Expression, lo: Expression, hi: Expression, pointsLeft: Boolean,
      w: Double, hint: JoinHint): LogicalPlan = {
    val (points, intervals) = if (pointsLeft) (left, right) else (right, left)
    // points side: one bucket column
    val pBkt = Alias(bucketOf(p, w), "__graft_pbkt")()
    val pPlan = Project(points.output :+ pBkt, points)
    // Degenerate (hi < lo) intervals match nothing in the naive join, but
    // Sequence(start, stop) defaults to step -1 when start > stop — an
    // inverted interval would explode onto a huge DESCENDING bucket range
    // (or overflow Sequence's length check). Drop them first, exactly as
    // RangeJoin.pointInInterval does.
    val iFiltered = Filter(GreaterThanOrEqual(hi, lo), intervals)
    // intervals side: explode onto covered buckets. Sequence is
    // TimeZoneAware (unresolved without a zone id) even for numeric
    // sequences — pin the session zone.
    val gen = Explode(Sequence(bucketOf(lo, w), bucketOf(hi, w), None,
      Some(conf.sessionLocalTimeZone)))
    val genOut = AttributeReference("__graft_ibkt", LongType, nullable = false)()
    val iPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(genOut), child = iFiltered)
    val (nl, nr) = if (pointsLeft) (pPlan, iPlan) else (iPlan, pPlan)
    val newCond = And(EqualTo(pBkt.toAttribute, genOut), j.condition.get)
    Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
  }
}
