package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Registry-wide sweep for the finding-51 plan trap: a global Sort whose
  * child is a PURE-MAP chain (Project/Filter over the scan, no exchange-
  * producing operator in between). A range sort's sampling job executes
  * its child in full and — with no exchange between scan and sort — no
  * shuffle files are reused, so every expression in that chain is
  * evaluated TWICE, at the scan's split count. The fix is mechanical when
  * the sort key doesn't depend on the expensive projection: sort first,
  * project after the exchange (projections preserve row order).
  *
  * This audit only BUILDS each registered query's optimized plan (no
  * execution of the final job — though registry closures that train or
  * stage files on the driver during construction still do that work) and
  * prints every query whose top-level Sort sits on a map-only chain,
  * with the projection expressions so a human can judge whether they are
  * expensive (kernel chains, HOFs) or trivial (column picks, cheap
  * arithmetic — not worth an extra exchange).
  *
  * Usage: tools/run_main.sh graft.tools.SortShapeAudit [sfDir] [qName...]
  */
object SortShapeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args.drop(1).toSet) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Trivial = the whole expression tree is column picks / literals /
    // casts / plain arithmetic+comparison. Classified by SHAPE, not SQL
    // string length (ADVICE r13): a short-named kernel Expression or HOF
    // renders tersely but is exactly the expensive double-evaluation the
    // audit exists to flag — any node outside this closed set (including
    // every graft.functions kernel, HOFs, UDFs, regex ops) is non-trivial.
    import org.apache.spark.sql.catalyst.expressions._
    def trivialExpr(e: Expression): Boolean = e match {
      case _: AttributeReference | _: Literal => true
      case a: Alias => trivialExpr(a.child)
      case c: Cast => trivialExpr(c.child)
      case b: BinaryArithmetic => trivialExpr(b.left) && trivialExpr(b.right)
      case b: BinaryComparison => trivialExpr(b.left) && trivialExpr(b.right)
      case _ => false
    }

    // Pure-map = only these between the Sort and the leaf; anything else
    // (Aggregate, Join, Window, Generate, RepartitionOperation, …) either
    // produces an exchange whose shuffle files the sampling job reuses,
    // or changes cardinality in ways that need human eyes anyway.
    def mapChain(p: LogicalPlan): Option[Seq[String]] = p match {
      case Project(exprs, child) =>
        mapChain(child).map(tail =>
          exprs.filterNot(trivialExpr).map(_.sql) ++ tail)
      case f: Filter => mapChain(f.child)
      case _: LeafNode => Some(Nil)
      case _ => None
    }

    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.optimizedPlan
          catch { case e: Throwable =>
            println(s"SKIP $name: plan build failed: ${e.getMessage}")
            spark.catalog.clearCache()
            null
          }
        if (plan != null) {
          plan match {
            case Sort(_, true, child, _) =>
              mapChain(child) match {
                case Some(exprs) if exprs.nonEmpty =>
                  flagged += 1
                  println(s"SORT-OVER-MAP $name: global sort over a pure-map " +
                    s"chain with ${exprs.size} non-trivial projection(s):")
                  exprs.take(3).foreach(e => println(s"    ${e.take(160)}"))
                case Some(_) =>
                  println(s"ok $name: sort over trivial projection only")
                case None => () // exchange/aggregate below the sort — fine
              }
            case _ => () // no top-level global sort
          }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      }
    println(s"== sort-shape audit done: $flagged flagged ==")
    spark.stop()
  }
}
