package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.model.HeaderRecord
import graft.model.HeaderRecord.Header

/** S3 — staged writes (ref utils.py:216-237): each pipeline stage may
  * materialize to `{base}_{process}{ext}`, overwriting, and the next stage
  * re-reads that path — the reference's inter-stage disk boundary. In Spark
  * the stages normally FUSE lazily (no materialization); these helpers exist
  * for the cases a real deployment checkpoints: audit trails, restartable
  * long pipelines, or handing a validated table to another system.
  */
object Staged {

  /** Write `df` to the staged path for `process` and return that path. */
  def write(df: DataFrame, basePath: String, process: String): String = {
    val out = HeaderRecord.stagedPath(basePath, process)
    df.write.mode(SaveMode.Overwrite).parquet(out)
    out
  }

  /** The reference's stage-1 boundary: read → validate → `{base}_validated`
    * (ref validate.py:127 writes `<base>_validated.fits`).
    */
  def validateStage(spark: SparkSession, basePath: String, header: Header): String =
    write(Validate.run(spark.read.parquet(basePath), header), basePath, "validated")
}
