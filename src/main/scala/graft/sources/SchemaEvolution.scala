package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution reads — the operational reality of a corpus that
  * lives for years: revision N+1 adds columns (a new quality signal, a
  * license tag) while petabytes of revision-N files stay untouched. A
  * plain `spark.read.parquet` silently projects the FIRST footer's
  * schema (new columns vanish or appear file-dependently); the merged
  * read makes the union schema explicit, with NULL backfill on files
  * predating a column.
  *
  * Spark-first: `mergeSchema` is the engine feature (footer-level union
  * at planning, no data rewrite — the 100 TB property: adding a column
  * costs zero bytes of rewrite). This wrapper adds the two things the
  * raw option lacks operationally:
  *   - a LOUD, column-named failure when revisions changed a column's
  *     TYPE incompatibly (Spark refuses too, but deep in a stack trace);
  *   - [[revisionReport]], the migration dashboard: per revision
  *     directory, which merged-schema columns its files actually carry.
  */
object SchemaEvolution {

  /** Merged-schema read over all revisions under `path`. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    try spark.read.option("mergeSchema", "true").parquet(path)
    catch {
      case e: Throwable if causeChain(e).exists(m =>
          m.contains("Failed to merge") || m.contains("Failed merging")) =>
        throw new IllegalStateException(
          s"incompatible column-type change across revisions under $path: " +
            causeChain(e).find(m => m.contains("Failed to merge") ||
              m.contains("Failed merging")).get +
            " — schema evolution only ADDS columns; a type change needs a rewrite",
          e)
    }

  private def causeChain(t: Throwable): Seq[String] = {
    var cur = t
    val out = Seq.newBuilder[String]
    while (cur != null) { out += String.valueOf(cur.getMessage); cur = cur.getCause }
    out.result()
  }

  /** Per-revision column coverage: for each value of `revCol` (a
    * partition-style directory column or any discriminator), the row
    * count and, for every NULLABLE added column, how many rows carry it.
    * One aggregation pass over the merged read.
    */
  def revisionReport(df: DataFrame, revCol: String, addedCols: Seq[String]): DataFrame =
    df.groupBy(col(revCol))
      .agg(count(lit(1)).as("n_rows"),
        addedCols.map(c =>
          sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"n_$c")): _*)
}
