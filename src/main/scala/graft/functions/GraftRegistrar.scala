package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Package-placed shim (like [[GraftColumnBridge]]): `sessionState` is
  * `private[sql]` in Spark 4, so runtime function registration on an
  * EXISTING session — the path for notebooks/REPLs that didn't set
  * `spark.sql.extensions` at build time — needs to live in this package.
  */
object GraftRegistrar {
  def register(spark: SparkSession,
      functions: Seq[(String, String, FunctionBuilder)]): Unit = {
    val registry = spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, desc, builder) =>
      registry.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo("graft", name, desc), builder)
    }
  }

  /** Execute a hand-transformed logical plan — the spec harness for
    * optimizer rules applied manually to an analyzed plan
    * (`Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
