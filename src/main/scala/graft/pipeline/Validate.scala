package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.model.HeaderRecord
import graft.model.HeaderRecord.Header
import graft.ops.Validation

/** Entry point 1 — the validation stage (ref validate.py:104-127): NaN mask
  * (F5) → time check (C4) → non-negativity row filter (F4) → channel crop
  * (F8), with the crop bounds parsed from the header's HISTORY cards.
  * One straight-line lazy chain; the caller decides whether to checkpoint
  * (the reference's `_validated` file boundary is an optional
  * `.write.parquet(HeaderRecord.stagedPath(path, "validated"))`).
  */
object Validate {
  def run(df: DataFrame, header: Header): DataFrame = {
    val ss = header.history.nums("START,STOP channels")
      .getOrElse(throw new IllegalArgumentException("missing START,STOP channels"))
    Validation.validate(df, ss(0).toInt, ss(1).toInt)
  }
}
