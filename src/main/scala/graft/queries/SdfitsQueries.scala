package graft.queries

import java.io.FileOutputStream
import org.apache.spark.sql.functions._
import graft.sources.sdfits.{SdfitsFormat, SdfitsWriter}
import graft.sources.sdfits.SdfitsFormat.ColSpec
import QueryUtil._

/** Driver-contract queries for the real SDFITS connector (S1 as the
  * reference actually does it — `fits.open` → BINTABLE, validate.py:18-23):
  * a deterministic observation derived from lineitem is written as an
  * actual two-HDU FITS file, read back through
  * `spark.read.format("sdfits")`, and aggregated — so the byte-level
  * encode → verify → decode → Spark scan chain is inside the hash check,
  * not just the Parquet model of it.
  */
object SdfitsQueries {

  private val cols = Seq(
    ColSpec("ROWKEY", 1, 'K'),
    ColSpec("DATA", 4, 'D'),
    ColSpec("IFNUM", 1, 'J'),
    ColSpec("CALSTATE", 1, 'J'))

  /** Write the lineitem-derived observation (every 20th order key) as a
    * FITS file under staging; idempotent per (sf dir, source fingerprint)
    * via the same marker discipline as the bucketed tables. Returns the
    * file path.
    */
  private def ensureObservation(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val out = new java.io.File(stagingDir() + s"/sdfits/obs_$tag.fits")
    val marker = new java.io.File(out.getPath + ".src")
    val fp = sourceSignature(dir, "lineitem")
    val current = out.isFile && marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == fp
    if (!current) {
      out.getParentFile.mkdirs()
      // Deterministic order — FITS row order is semantically meaningful
      // (SURVEY §1.1), so the writer pins it. rowkey alone is NOT unique
      // (the synthetic lineitem holds duplicate (l_orderkey, l_linenumber)
      // pairs), so the data channels break the remaining ties; rows still
      // tied after that are byte-identical and any order is the same file.
      val rows = li(s, dir).filter(col("l_orderkey") % 20 === 0)
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("rowkey"),
          data4.as("data"),
          (col("l_orderkey") % 3).cast("int").as("ifnum"),
          (col("l_linenumber") % 2).cast("int").as("calstate"))
        .orderBy(col("rowkey"), element_at(col("data"), 1),
          element_at(col("data"), 2), element_at(col("data"), 3),
          element_at(col("data"), 4))
        .collect()
      val os = new FileOutputStream(out)
      try SdfitsFormat.write(os,
        headerValues = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
        stringHeaderValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff"),
        history = Seq("DATAMODE HIRES / data resolution mode",
          "START,STOP channels  0_3", "HIRES bands  1355, 1435"),
        cols = cols,
        rows = rows.iterator.map(r => Seq[Any](
          r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2), r.getInt(3))),
        nRows = rows.length)
      finally os.close()
      java.nio.file.Files.write(marker.toPath, fp.getBytes("UTF-8"))
    }
    out.getAbsolutePath
  }

  def queries: Map[String, Q] = Map(
    "q_sdfits_read" -> ((s, dir) => {
      // FITS round trip under the hash check: per-IF row counts + the
      // integer-valued quantity channel summed (exact at any aggregation
      // order). The DATA vector survives encode/decode bit-for-bit (IEEE
      // doubles, big-endian) so sum_q matches lineitem exactly.
      val path = ensureObservation(s, dir)
      s.read.format("sdfits").load(path)
        .groupBy(col("IFNUM").as("ifnum"))
        .agg(count(lit(1)).as("n"), sum(element_at(col("DATA"), 1)).as("sum_q"))
        .orderBy(col("ifnum"))
    }),

    "q_sdfits_verify" -> ((s, dir) => {
      // S2/S4 through the real connector: the END-stripped corruption
      // analog (ref file_corruption.py:15-34) must be rejected by the
      // structural verification, while the intact file still reads.
      import s.implicits._
      val path = ensureObservation(s, dir)
      val bytes = java.nio.file.Files.readAllBytes(new java.io.File(path).toPath)
      val bad = new java.io.File(stagingDir() + "/sdfits/obs_corrupted.fits")
      java.nio.file.Files.write(bad.toPath, SdfitsFormat.corruptStripEnd(bytes))
      val rejected =
        try { s.read.format("sdfits").load(bad.getPath).count(); false }
        catch { case e: Throwable =>
          Iterator.iterate(e.asInstanceOf[Throwable])(_.getCause)
            .takeWhile(_ != null).take(10)
            .exists(_.isInstanceOf[SdfitsFormat.SdfitsVerificationException])
        }
      val validRows = s.read.format("sdfits").load(path).count()
      Seq((rejected, validRows)).toDF("rejected", "valid_rows")
    }),

    "q_sdfits_roundtrip" -> ((s, dir) => {
      // The WRITE half under the hash check (ref utils.py:216-237): encode
      // the observation with the distributed writer — executor-side, staged
      // {base}_{process}{ext} naming — re-read it through the connector,
      // and return EVERY row, so the whole byte path (schema-derived specs
      // → big-endian encode → structural verify → decode → Spark scan) is
      // hashed against lineitem. Written fresh each run: the writer is the
      // thing being certified.
      val frame = li(s, dir).filter(col("l_orderkey") % 20 === 0)
        .select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("rowkey"),
          data4.as("data"),
          (col("l_orderkey") % 3).cast("int").as("ifnum"),
          (col("l_linenumber") % 2).cast("int").as("calstate"))
      val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
      new java.io.File(stagingDir() + "/sdfits").mkdirs()
      val out = SdfitsWriter.writeStaged(frame, Seq("rowkey"),
        stagingDir() + s"/sdfits/rt_$tag.fits", "calibrated",
        SdfitsWriter.Header(
          values = Seq("OBSFREQ" -> "1400.0", "OBSBW" -> "80.0"),
          stringValues = Seq("DATE" -> "2024-01-01T00:00:00", "OBSMODE" -> "onoff")))
      // rowkey is NOT unique here (duplicate (l_orderkey, l_linenumber)
      // pairs exist in the synthetic lineitem), and the driver's comparator
      // zips rows IN ORDER — an under-keyed sort passes only while both
      // engines break ties identically. The data channels make the order
      // total up to byte-identical rows (which any order satisfies).
      s.read.format("sdfits").load(out)
        .select(col("rowkey"),
          element_at(col("data"), 1).as("d1"),
          element_at(col("data"), 2).as("d2"),
          element_at(col("data"), 3).as("d3"),
          element_at(col("data"), 4).as("d4"),
          col("ifnum"), col("calstate"))
        .orderBy(col("rowkey"), col("d1"), col("d2"), col("d3"), col("d4"))
    }),

    "q_sdfits_pushdown" -> ((s, dir) => {
      // Filter + aggregate pushdown through the connector: the CALSTATE
      // predicate is evaluated on the raw row bytes before any decode, and
      // COUNT/MIN/MAX arrive as one partial row per file (an unfiltered
      // count comes straight from the header's NAXIS2). SUMs push too
      // (r16) — the engine's own dominant SDFITS access pattern (A1/A2
      // integrations) — accumulating per file in the FINAL sum type
      // (ANSI-exact for the integral columns here). Values are fully
      // derivable from lineitem; the PLAN shape (PushedFilters +
      // PushedAggregates on the scan) is pinned by SdfitsPushdownSpec.
      val path = ensureObservation(s, dir)
      s.read.format("sdfits").load(path)
        .filter(col("CALSTATE") === 1)
        .agg(count(lit(1)).as("n_cal"),
          min(col("ROWKEY")).as("min_key"), max(col("ROWKEY")).as("max_key"),
          min(col("IFNUM")).as("min_if"), max(col("IFNUM")).as("max_if"),
          sum(col("ROWKEY")).as("sum_key"), sum(col("IFNUM")).as("sum_if"))
    }),

    "q_sdfits_slice" -> ((s, dir) => {
      // Channel-slice projection pushdown (VERDICT r16 item 2 — the
      // reference's crop, validate.py:102): the `channels` option makes
      // the scan decode ONLY bytes of channels 1..2 of each row's DATA
      // vector (here l_extendedprice, l_discount), composing with the
      // CALSTATE filter pushdown. Every surviving row's sliced cells are
      // returned, so the byte-slice arithmetic is inside the hash check;
      // SdfitsSliceRule (rewriting slice($"DATA",a,n) into this option)
      // and the clamp semantics are pinned by SdfitsSliceRuleSpec.
      val path = ensureObservation(s, dir)
      s.read.format("sdfits").option("channels", "1:2").load(path)
        .filter(col("CALSTATE") === 1)
        .select(col("ROWKEY").as("rowkey"),
          element_at(col("DATA"), 1).as("c1"),
          element_at(col("DATA"), 2).as("c2"),
          size(col("DATA")).as("width"))
        .orderBy(col("rowkey"), col("c1"), col("c2"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_sdfits_read" ->
      """SELECT CAST(l_orderkey % 3 AS INT) AS ifnum, CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_q
        |FROM lineitem WHERE l_orderkey % 20 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sdfits_verify" ->
      """SELECT true AS rejected, CAST(count(*) AS BIGINT) AS valid_rows
        |FROM lineitem WHERE l_orderkey % 20 = 0""".stripMargin,

    "q_sdfits_roundtrip" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rowkey,
        |  l_quantity AS d1, l_extendedprice AS d2, l_discount AS d3, l_tax AS d4,
        |  CAST(l_orderkey % 3 AS INT) AS ifnum,
        |  CAST(l_linenumber % 2 AS INT) AS calstate
        |FROM lineitem WHERE l_orderkey % 20 = 0
        |ORDER BY rowkey, d1, d2, d3, d4""".stripMargin,

    "q_sdfits_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_cal,
        |  min(l_orderkey * 8 + l_linenumber) AS min_key,
        |  max(l_orderkey * 8 + l_linenumber) AS max_key,
        |  CAST(min(l_orderkey % 3) AS INT) AS min_if,
        |  CAST(max(l_orderkey % 3) AS INT) AS max_if,
        |  CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT) AS sum_key,
        |  CAST(sum(l_orderkey % 3) AS BIGINT) AS sum_if
        |FROM lineitem
        |WHERE l_orderkey % 20 = 0 AND l_linenumber % 2 = 1""".stripMargin,

    "q_sdfits_slice" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rowkey,
        |  l_extendedprice AS c1, l_discount AS c2, CAST(2 AS INT) AS width
        |FROM lineitem
        |WHERE l_orderkey % 20 = 0 AND l_linenumber % 2 = 1
        |ORDER BY rowkey, c1, c2""".stripMargin
  )
}
