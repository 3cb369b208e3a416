package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Channel-slice projection pushdown for the SDFITS connector (VERDICT r16
  * item 2): rewrite `slice($"DATA", a, n)` over an sdfits relation into the
  * connector's `channels` read option, so the scan decodes only n cells of
  * each row's vector instead of the full channel axis — the reference's
  * crop (validate.py:102) and the dominant SDFITS access pattern (F7/F8
  * channel selection feeding the A1/A2 integrations). DSv2 column pruning
  * is whole-column only; array-element ranges have no V2 pushdown API, so
  * this is the idiomatic Catalyst route: a `Rule[LogicalPlan]` that runs in
  * the operator-optimization batch — BEFORE `V2ScanRelationPushDown` turns
  * the relation into a scan — and edits the relation's options.
  *
  * Semantics-preserving by construction: the reader's sliced decode clamps
  * exactly like Spark's `slice` (elements `[a-1, min(a-1+n, len))`, empty
  * past the end), so the rewrite is a pure I/O reduction. Rewrites only
  * when it is provably safe:
  *   - the child is a bare sdfits [[DataSourceV2Relation]] (optionally
  *     under one Filter) with no `channels` option already set;
  *   - every slice over vector columns uses the SAME literal range
  *     (start ≥ 1, length ≥ 0); multiple vector attributes may be sliced,
  *     but all with that one range — the option applies to ALL vector
  *     columns of the scan, so mixed ranges cannot push;
  *   - NO vector attribute of the relation appears unsliced anywhere
  *     (projections or filter) — the option slices every vector column the
  *     scan decodes, so a single whole-vector use (even of a DIFFERENT
  *     vector column than the sliced one) would be silently corrupted.
  *
  * Registered via [[graft.GraftFunctions.inject]]
  * (`spark.sql.extensions=graft.GraftExtensions`); `injectOptimizerRule`
  * lands in the operator-optimization batches, which precede the "Early
  * Filter and Projection Push-Down" batch (`spark.experimental.
  * extraOptimizations` would run AFTER it — too late, the relation is
  * already a scan).
  */
object SdfitsSliceRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, rel: DataSourceV2Relation) if isSdfits(rel) =>
      rewrite(p, rel, None).getOrElse(p)
    case p @ Project(_, f @ Filter(_, rel: DataSourceV2Relation)) if isSdfits(rel) =>
      rewrite(p, rel, Some(f)).getOrElse(p)
  }

  private def isSdfits(rel: DataSourceV2Relation): Boolean =
    rel.table.isInstanceOf[graft.sources.sdfits.SdfitsTable] &&
      !rel.options.containsKey("channels")

  /** `(start1, len, slice count)` when every Slice over a relation array
    * attribute in `list` uses the same literal range; None otherwise.
    * Several DIFFERENT vector attributes may be sliced — the pushed range
    * applies to all of them identically, matching the connector.
    */
  private def sliceTarget(rel: DataSourceV2Relation,
      list: Seq[NamedExpression]): Option[(Int, Int, Int)] = {
    val slices = list.flatMap(_.collect {
      case Slice(a: AttributeReference, Literal(st: Int, IntegerType),
          Literal(ln: Int, IntegerType))
          if rel.outputSet.contains(a) && a.dataType.isInstanceOf[ArrayType] =>
        (a, st, ln)
    })
    slices.headOption.flatMap { case (_, st, ln) =>
      val agree = slices.forall { case (_, st2, ln2) => st2 == st && ln2 == ln }
      if (agree && st >= 1 && ln >= 0) Some((st, ln, slices.size)) else None
    }
  }

  private def refsOf(as: Seq[AttributeReference], es: Seq[Expression]): Int = {
    val ids = as.map(_.exprId).toSet
    es.map(_.collect { case r: AttributeReference if ids.contains(r.exprId) => r }.size).sum
  }

  private def rewrite(p: Project, rel: DataSourceV2Relation,
      filter: Option[Filter]): Option[LogicalPlan] =
    sliceTarget(rel, p.projectList).flatMap { case (start1, len, nSlices) =>
      // The pushed option slices EVERY vector column the scan decodes, so
      // the rewrite is safe only when every reference to ANY vector
      // attribute of the relation is one of the agreed slices: one bare use
      // (projected whole, filtered on, element_at past the range) — of the
      // sliced column OR a sibling vector column — needs the full vector.
      val vecAttrs = rel.output.collect {
        case a: AttributeReference if a.dataType.isInstanceOf[ArrayType] => a
      }
      val bareRefs = refsOf(vecAttrs, p.projectList) - nSlices +
        filter.map(f => refsOf(vecAttrs, Seq(f.condition))).getOrElse(0)
      if (bareRefs != 0) None
      else {
        val newOpts = new CaseInsensitiveStringMap(
          (rel.options.asCaseSensitiveMap().asScala.toMap +
            ("channels" -> s"${start1 - 1}:$len")).asJava)
        val newRel = rel.copy(options = newOpts)
        val vecIds = vecAttrs.map(_.exprId).toSet
        val newList = p.projectList.map(_.transform {
          case Slice(a2: AttributeReference, Literal(_: Int, IntegerType),
              Literal(_: Int, IntegerType)) if vecIds.contains(a2.exprId) => a2
        }.asInstanceOf[NamedExpression])
        val newChild = filter.map(f => f.copy(child = newRel)).getOrElse(newRel)
        Some(Project(newList, newChild))
      }
    }
}
