package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayOps

/** Stage 1 — validation (ref validate.py:104-127): NaN masking (F5), time
  * parse check (C4), non-negativity row filter (F4), channel crop (F8),
  * composed as one lazy `DataFrame => DataFrame` chain. The reference
  * materializes a `_validated` file between stages; here the stages fuse into
  * one Catalyst plan (predicate pushdown reaches the scan) and a checkpoint is
  * written only if the caller asks for one.
  */
object Validation {

  /** F4 — non-negativity row filter (ref validate.py:51-70): for each listed
    * column *present in the schema*, drop rows with a negative value. Missing
    * columns are skipped (the reference logs and continues). Null values
    * survive (numpy comparison with masked values keeps the row).
    */
  def filterNonPhysical(df: DataFrame, columns: Seq[String] = graft.model.Schemas.nonNegativeColumns): DataFrame = {
    val present = columns.filter(df.columns.contains)
    if (present.isEmpty) df
    else df.filter(present.map(c => col(c).isNull || col(c) >= 0).reduce(_ && _))
  }

  /** F5 — mask NaNs inside `DATA` as SQL NULLs (ref validate.py:25-37);
    * masked, not removed, so element order (= channel identity) is kept.
    */
  def maskNaN(df: DataFrame, dataCol: String = "DATA"): DataFrame =
    df.withColumn(dataCol, ArrayOps.maskNaN(col(dataCol)))

  /** C4 — time-validity check (ref validate.py:39-49): parse check only, no
    * mutation. Returns a column counting rows whose `DATE_OBS` fails to parse
    * relative to t0; callers may assert it is 0. Kept check-only to match the
    * reference (which just prints on failure).
    */
  def invalidTimeCount(df: DataFrame, tsCol: String = "DATE_OBS"): Long =
    df.filter(col(tsCol).isNull).count()

  /** F8 — channel crop to `[start, stop]` inclusive, 0-based
    * (ref validate.py:72-102; the START/STOP channels come from the HISTORY
    * header, parsed driver-side by [[graft.model.HeaderRecord]]).
    */
  def cropChannels(df: DataFrame, start: Int, stop: Int, dataCol: String = "DATA"): DataFrame =
    df.withColumn(dataCol, ArrayOps.cropChannels(col(dataCol), start, stop))

  /** Full validation composition (ref validate.py:104-127). */
  def validate(df: DataFrame, startChannel: Int, stopChannel: Int): DataFrame =
    cropChannels(filterNonPhysical(maskNaN(df)), startChannel, stopChannel)
}
