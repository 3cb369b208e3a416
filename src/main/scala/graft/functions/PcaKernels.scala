package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** PCA projection kernel: y = W · (x − μ) in one compiled loop per row —
  * the [[BpeKernels]] discipline (trained artifact as a codegen reference
  * object, no UDF boundary, participates in whole-stage codegen). At
  * dims × d = 16 × 64 that is 1024 multiply-adds per row; folding them in
  * as literals would bloat the generated class, so the matrix rides as
  * data.
  */
final class PcaMatrix(
    val mean: Array[Double],
    /** row-major dims × d — each row one principal component. */
    val components: Array[Array[Double]]) extends Serializable {
  require(components.nonEmpty && components.forall(_.length == mean.length),
    "components must be non-empty rows of the mean's dimension")
}

object PcaImpl {

  /** Project ONE embedding: centered dot with each component row. Output
    * Float (the embedding column convention); null-length mismatch fails
    * loudly — a corpus with ragged embedding dims is corrupt.
    */
  def project(xs: ArrayData, m: PcaMatrix): ArrayData = {
    val d = m.mean.length
    require(xs.numElements() == d,
      s"pca: embedding dim ${xs.numElements()} != model dim $d")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = xs.getFloat(i) - m.mean(i); i += 1 }
    val out = new Array[Any](m.components.length)
    var k = 0
    while (k < m.components.length) {
      val w = m.components(k)
      var s = 0.0
      var j = 0
      while (j < d) { s += w(j) * x(j); j += 1 }
      out(k) = s.toFloat
      k += 1
    }
    new GenericArrayData(out)
  }
}

case class PcaProject(child: Expression, mean: Seq[Double],
    components: Seq[Seq[Double]]) extends UnaryExpression {
  @transient private lazy val matrix: PcaMatrix =
    new PcaMatrix(mean.toArray, components.map(_.toArray).toArray)

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"
  override def nullSafeEval(input: Any): Any =
    PcaImpl.project(input.asInstanceOf[ArrayData], matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pcaMatrix", matrix, "graft.functions.PcaMatrix")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.PcaImpl.project($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
}

object PcaKernels {
  def pcaProject(emb: Column, mean: Seq[Double],
      components: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(PcaProject(
      GraftColumnBridge.expression(emb.cast("array<float>")), mean, components))
}
