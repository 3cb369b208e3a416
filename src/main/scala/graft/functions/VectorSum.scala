package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** A2 — time-axis integration: element-wise vector sum across rows
  * (ref utils.py:120-124, `np.sum(axis=0)`).
  *
  * Custom typed `Aggregator` instead of `posexplode + groupBy(pos)`: partial
  * aggregation happens map-side on whole arrays, so the shuffle carries one
  * array per (group × partition) instead of n_rows × n_channels exploded
  * rows — at 100 TB that is the difference between shuffling kilobytes and
  * shuffling the whole dataset.
  *
  * NULL elements are not expected (run [[ArrayOps.fillNulls]] first — the
  * reference masks NaNs and numpy treats masked as absent, i.e. 0 for sums).
  * Rows with different lengths widen the buffer (shorter rows pad with 0).
  */
object VectorSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def addInto(acc: Array[Double], xs: Seq[Double]): Array[Double] = {
    if (xs == null) return acc
    val out = if (acc.length >= xs.length) acc else java.util.Arrays.copyOf(acc, xs.length)
    var i = 0
    val it = xs.iterator
    while (it.hasNext) { out(i) += it.next(); i += 1 }
    out
  }

  override def reduce(acc: Array[Double], row: Seq[Double]): Array[Double] =
    addInto(acc, row)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    // Primitive while-loop (no boxing): merge runs once per shuffle block.
    val (base, add) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < add.length) { base(i) += add(i); i += 1 }
    base
  }

  override def finish(acc: Array[Double]): Seq[Double] = acc.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VectorSum {
  /** Untyped column form: `df.groupBy(k).agg(VectorSum.vecSum($"DATA"))`. */
  lazy val vecSum: UserDefinedFunction =
    udaf(VectorSumAgg, ExpressionEncoder[Seq[Double]]())
}
