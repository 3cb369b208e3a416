package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) over parquet — the backfill/correction primitive a
  * pipeline without a transactional table format still needs.
  *
  * [[merged]] is the logical operator: updates win on key collision,
  * unmatched target rows survive — expressed as a left-anti join (target ∖
  * update keys) unioned with the updates. The anti join shuffles on the
  * key like any equi-join (broadcast when the update batch is small — the
  * common case: a day's corrections against years of history).
  *
  * [[overwritePartitions]] is the physical fast path when the table is
  * partitioned and updates replace WHOLE partitions: dynamic partition
  * overwrite rewrites only the partitions present in the batch, leaving
  * the rest of 100 TB untouched — no read-modify-write of the full table.
  */
object Upsert {

  /** Updates win per key; target rows with no update survive. Schemas must
    * match by position (union semantics).
    */
  def merged(target: DataFrame, updates: DataFrame, key: String): DataFrame =
    target.join(updates.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Rewrite only the partitions present in `updates` (hive-style
    * partitioned table at `path`, partitioned by `partCol`).
    */
  def overwritePartitions(updates: DataFrame, path: String, partCol: String): Unit =
    updates.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(path)
}
