package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Shared builders for the driver-contract queries (`SparkEntry.queries`).
  *
  * The driver's correctness corpus is TPC-H-ish (TESTDATA.md), while the
  * reference operates on SDFITS observation cubes — so these helpers project
  * the corpus into the observation shape deterministically: `DATA` array
  * columns synthesized from lineitem numerics, observation flags synthesized
  * from key arithmetic. Every derivation is expressible in the DuckDB oracle
  * SQL, which is what makes the operator results hash-checkable.
  *
  * Exactness discipline (the driver hash-compares against DuckDB):
  *  - per-row arithmetic uses the same IEEE op sequence on both sides →
  *    bit-exact;
  *  - cross-row double sums only ever aggregate integer-valued doubles
  *    (exact at any summation order, so Spark's partial aggregation and
  *    DuckDB's sequential sum agree bit-for-bit);
  *  - the few transcendental kernels (exp/pow/sin) are rounded to 6 decimals
  *    on BOTH sides, absorbing possible last-ulp libm differences.
  */
object QueryUtil {

  type Q = (SparkSession, String) => DataFrame

  def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")
  def ord(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "orders")
  def docs(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "documents")

  /** [[docs]] spread to session parallelism. The sf corpora are single
    * parquet files, so every scan is ONE task and CPU-heavy per-doc
    * pipelines (LM position explodes, line shingling) run single-threaded
    * end to end — a small-file artifact a real corpus never has (a
    * multi-file 100 TB scan gets thousands of tasks from
    * maxPartitionBytes). One explicit round-robin repartition up front
    * restores the parallelism the scan would have at scale; map-only
    * queries keep reading [[docs]] directly — there the shuffle would cost
    * more than it buys.
    */
  def docsSpread(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).repartition(s.sparkContext.defaultParallelism)
  def emb(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "embeddings")
  def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** 4-channel DATA vector from lineitem numerics (per-row ops only — the
    * price/discount elements are NOT exact under cross-row summation).
    */
  def data4: Column =
    array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))

  /** Oracle-side rendering of [[data4]]. */
  val data4Sql = "[l_quantity, l_extendedprice, l_discount, l_tax]"

  /** Integer-valued 3-channel DATA vector — exact under any summation order,
    * used wherever a query aggregates across rows.
    */
  def int3: Column =
    array(col("l_quantity"), col("l_linenumber").cast("double"),
      (col("l_partkey") % 7).cast("double"))

  /** Integer-valued 4-channel variant for the 4-channel spectrum pipeline. */
  def int4: Column =
    array(col("l_quantity"), col("l_linenumber").cast("double"),
      (col("l_partkey") % 7).cast("double"), (col("l_suppkey") % 5).cast("double"))

  /** Global 0-based row index over the unique lineitem 4-key order, computed
    * WITHOUT a single-partition window over the DATA (VERDICT r3 item 5):
    * row_number within monotone `l_orderkey` buckets (parallel windows) +
    * cumulative bucket offsets computed in-plan on the tiny per-bucket
    * counts frame (one row per bucket — bounded by max(l_orderkey)/
    * bucketWidth, a few hundred at any tested SF; at 100 TB widen the
    * bucket) and broadcast-joined back. The offsets running sum IS a
    * single-partition window, but over the counts frame only — its
    * `partitionBy(lit(0))` keeps Spark from warning about an empty
    * partition spec while meaning exactly that. No driver collect: the
    * former driver-side cumulative loop was an extra job per query.
    * Values are identical to `row_number() OVER (ORDER BY 4-key) - 1`
    * because the bucket is a monotone function of the leading order column.
    */
  def withGlobalRowIdx(df: DataFrame, out: String = "ROWIDX",
      bucketWidth: Long = 4096L): DataFrame = {
    val withB = df.withColumn("__bkt", (col("l_orderkey") / bucketWidth).cast("long"))
    // Deliberately single-partition (WindowAudit flags it): this window runs
    // over the per-BUCKET counts — one row per 4096 source rows — not the
    // data. A fixture-construction helper, not an engine operator.
    val wOff = Window.partitionBy(lit(0)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .drop("__cnt")
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    withB.withColumn("__rn", (row_number().over(w) - 1).cast("long"))
      .join(broadcast(offs), "__bkt")
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__bkt", "__rn", "__off")
  }

  /** Single-file observation frame, continuum-flavored flag pattern:
    * rows [0,8) diode-on spike, [8,16) diode-off spike, [16, L−16) science
    * data, [L−16, L−8) post-cal diode-off, [L−8, L) post-cal diode-on.
    * Designed so ST1 resolves data_start=16, post_cal_start=L−16.
    */
  def obsContinuum(s: SparkSession, dir: String): DataFrame = {
    withGlobalRowIdx(li(s, dir))
      .crossJoin(broadcast(li(s, dir).agg(count(lit(1)).as("__n"))))
      .select(
        lit("0").as("FILE_ID"),
        col("ROWIDX"),
        expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
        data4.as("DATA"),
        lit(0).as("IFNUM"),
        lit(1).as("PLNUM"),
        when(col("ROWIDX") < 8 || col("ROWIDX") >= col("__n") - 8, 1).otherwise(0).as("CALSTATE"),
        when(col("ROWIDX") < 16 || col("ROWIDX") >= col("__n") - 16, 0).otherwise(1).as("SWPVALID"),
        when(col("ROWIDX") < 100, lit("onoff:on")).otherwise(lit("onoff:off")).as("OBSMODE"))
  }

  /** Single-file observation frame, spectrum-flavored: every row is science
    * data (CALSTATE=0, SWPVALID=0 — the reference's F2 keep-set), OBSMODE
    * flips to 'onoff:off' at row 100, integer-valued 4-channel DATA.
    */
  def obsSpectrum(s: SparkSession, dir: String): DataFrame = {
    withGlobalRowIdx(li(s, dir))
      .select(
        lit("0").as("FILE_ID"),
        col("ROWIDX"),
        expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
        int4.as("DATA"),
        lit(0).as("IFNUM"),
        lit(1).as("PLNUM"),
        lit(0).as("CALSTATE"),
        lit(0).as("SWPVALID"),
        when(col("ROWIDX") < 100, lit("onoff:on")).otherwise(lit("onoff:off")).as("OBSMODE"))
  }

  /** Per-file 0-based row index over the 4-key order, WITHOUT a
    * file-partitioned window (a fixture with 4 FILE_IDs would sort the
    * whole table through 4 tasks — the sf1 smoke measured that window at
    * 8.5 s of q_spectrum_all's 13.9 s): row_number within (file, monotone
    * orderkey bucket) partitions — parallelism = files × buckets — plus
    * cumulative per-(file, bucket) offsets from a tiny counts frame,
    * broadcast back. Values identical to `row_number() OVER (PARTITION BY
    * file ORDER BY 4-key) − 1` because the bucket is monotone in the
    * leading order column. The [[withGlobalRowIdx]] trick, per file.
    */
  def withPerFileRowIdx(df: DataFrame, fileCol: String, out: String = "ROWIDX",
      bucketWidth: Long = 4096L, fileCountCol: Option[String] = None): DataFrame = {
    val withB = df.withColumn("__bkt", (col("l_orderkey") / bucketWidth).cast("long"))
    val wOff = Window.partitionBy(col(fileCol)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // Per-file TOTALS ride the same tiny counts frame when requested
    // (window over the full file partition) — a separate groupBy(file)
    // count would scan the input a second time and materialize a second
    // broadcast stage for the same information.
    val wTot = Window.partitionBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs0 = withB.groupBy(col(fileCol), col("__bkt")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
    val offs = fileCountCol
      .fold(offs0)(n => offs0.withColumn(n, sum(col("__cnt")).over(wTot)))
      .drop("__cnt")
    val w = Window.partitionBy(col(fileCol), col("__bkt"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    withB.withColumn("__rn", (row_number().over(w) - 1).cast("long"))
      .join(broadcast(offs), Seq(fileCol, "__bkt"))
      .withColumn(out, col("__rn") + col("__off"))
      .drop("__bkt", "__rn", "__off")
  }

  /** Multi-file spectrum-flavored observation: FILE_ID = l_orderkey % 4,
    * every row science data (CALSTATE=0, SWPVALID=0), OBSMODE flips to
    * 'onoff:off' at per-file row 100, integer-valued 4-channel DATA (exact
    * under any summation order).
    */
  def obsSpectrumMulti(s: SparkSession, dir: String): DataFrame = {
    val fid = col("l_orderkey") % 4
    withPerFileRowIdx(li(s, dir).withColumn("FILE_ID", fid.cast("string")), "FILE_ID")
      .select(
        col("FILE_ID"), col("ROWIDX"),
        expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
        int4.as("DATA"),
        lit(0).as("IFNUM"), lit(1).as("PLNUM"),
        lit(0).as("CALSTATE"), lit(0).as("SWPVALID"),
        when(col("ROWIDX") < 100, lit("onoff:on")).otherwise(lit("onoff:off")).as("OBSMODE"))
  }

  /** Multi-file observation flags (FILE_ID = l_orderkey % 4) with the same
    * per-file pattern as [[obsContinuum]] — the ST1 scale-path input.
    */
  def obsMultiFile(s: SparkSession, dir: String): DataFrame = {
    val fid = col("l_orderkey") % 4
    val base = li(s, dir).withColumn("FILE_ID", fid.cast("string"))
    withPerFileRowIdx(base, "FILE_ID", fileCountCol = Some("__n"))
      .select(
        col("FILE_ID"), col("ROWIDX"),
        when(col("ROWIDX") < 8 || col("ROWIDX") >= col("__n") - 8, 1).otherwise(0).as("CALSTATE"),
        when(col("ROWIDX") < 16 || col("ROWIDX") >= col("__n") - 16, 0).otherwise(1).as("SWPVALID"),
        when(col("ROWIDX") < 100, lit("onoff:on")).otherwise(lit("onoff:off")).as("OBSMODE"))
  }

  /** Multi-file FULL observation (flags + DATE_OBS + DATA), continuum
    * pattern per file with FLAT calibration spike levels (diode-on rows sum
    * to 8.0, diode-off to 2.0 → height exactly (6.0, 0.0) on both sides,
    * z = 0/0 = NaN → mean-height branch) so the whole multi-file reduction
    * has a closed-form oracle: science intensity / 6.
    */
  def obsMultiFileFull(s: SparkSession, dir: String): DataFrame = {
    val fid = col("l_orderkey") % 4
    val withFid = li(s, dir).withColumn("FILE_ID", fid.cast("string"))
    val base = withPerFileRowIdx(withFid, "FILE_ID", fileCountCol = Some("__n"))
    val spike = col("ROWIDX") < 16 || col("ROWIDX") >= col("__n") - 16
    val diodeOn = col("ROWIDX") < 8 || col("ROWIDX") >= col("__n") - 8
    base.select(
      col("FILE_ID"), col("ROWIDX"),
      expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
      when(spike && diodeOn, array(lit(2.0), lit(2.0), lit(2.0), lit(2.0)))
        .when(spike, array(lit(0.5), lit(0.5), lit(0.5), lit(0.5)))
        .otherwise(data4).as("DATA"),
      lit(0).as("IFNUM"), lit(1).as("PLNUM"),
      when(diodeOn, 1).otherwise(0).as("CALSTATE"),
      when(spike, 0).otherwise(1).as("SWPVALID"),
      lit("onoff:on").as("OBSMODE"))
  }

  /** Single-file FULL observation with the [[obsMultiFileFull]] FLAT spike
    * levels (diode-on sums to 8.0, diode-off to 2.0 → pre/post heights
    * exactly (6.0, 0.0), z = 0/0 = NaN → mean branch) so the END-TO-END
    * Continuum.run has a closed-form oracle: science intensity / 6 at
    * t = ROWIDX.
    */
  def obsContinuumFlat(s: SparkSession, dir: String): DataFrame =
    obsContinuumFlatFrom(li(s, dir))

  /** 1/5-sampled [[obsContinuumFlat]] — the bounded fixture for the FULL
    * driver composition (q_pipeline_full runs continuum AND spectrum over
    * it; the lossless-composition proof doesn't need the whole table).
    */
  def obsContinuumFlatSampled(s: SparkSession, dir: String): DataFrame =
    obsContinuumFlatFrom(li(s, dir).filter(col("l_orderkey") % 5 === 0))

  private def obsContinuumFlatFrom(lineitem: DataFrame): DataFrame = {
    val base = withGlobalRowIdx(lineitem)
      .crossJoin(broadcast(lineitem.agg(count(lit(1)).as("__n"))))
    val spike = col("ROWIDX") < 16 || col("ROWIDX") >= col("__n") - 16
    val diodeOn = col("ROWIDX") < 8 || col("ROWIDX") >= col("__n") - 8
    base.select(
      lit("0").as("FILE_ID"), col("ROWIDX"),
      expr("timestampadd(SECOND, ROWIDX, TIMESTAMP '2024-01-01 00:00:00')").as("DATE_OBS"),
      when(spike && diodeOn, array(lit(2.0), lit(2.0), lit(2.0), lit(2.0)))
        .when(spike, array(lit(0.5), lit(0.5), lit(0.5), lit(0.5)))
        .otherwise(data4).as("DATA"),
      lit(0).as("IFNUM"), lit(1).as("PLNUM"),
      when(diodeOn, 1).otherwise(0).as("CALSTATE"),
      when(spike, 0).otherwise(1).as("SWPVALID"),
      lit("onoff:on").as("OBSMODE"))
  }

  /** The synthetic observation header shared by the pipeline queries:
    * HIRES mode, band centers 1355/1435 MHz, 80 MHz bandwidth, 4 channels
    * (START,STOP 0_3) → ifnum 0 axis = linspace(1395, 1315, 4) descending.
    */
  def obsHeader(nChannels: Int = 4): graft.model.HeaderRecord.Header =
    graft.model.HeaderRecord.Header(
      date = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      obsmode = "onoff",
      obsfreq = 1400.0,
      obsbw = 80.0,
      // Double-space key/value separation: with a single space the greedy
      // key regex swallows all but the last word (a reference quirk shared
      // by graft — pinned by q_c1_history and HeaderRecordSpec).
      history = graft.model.HeaderRecord.parseHistory(Seq(
        "DATAMODE HIRES / data resolution mode",
        s"START,STOP channels  0_${nChannels - 1}",
        "HIRES bands  1355, 1435",
        "RFFILTER  1350 1450")))

  /** Cheap change-detection fingerprint of source parquet tables under
    * `dir`: per table the recursive (file count, total bytes, max mtime).
    * No data is read — this keys idempotent layout publishes (bucketed
    * tables) so a republish happens exactly when the source files change.
    */
  def sourceSignature(dir: String, tables: String*): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.isFile) Seq(f) else Seq.empty
    tables.map { t =>
      val fs = walk(new java.io.File(dir, s"$t.parquet"))
      s"$t:${fs.size}:${fs.map(_.length).sum}:${fs.map(_.lastModified).foldLeft(0L)(math.max)}"
    }.mkString(";")
  }

  /** Round a driver-side double to 6 decimals (HALF_UP), mirroring SQL
    * `round(x, 6)` on the oracle side.
    */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Scratch directory for the S3/S4 staged-write queries: the build target
    * when the JVM runs from the repo root (the harness does), otherwise the
    * system temp dir — never a cwd-relative path that could land outside
    * either when some launcher sets a different working directory.
    */
  def stagingDir(): String = {
    val repoTarget = new java.io.File("target")
    val d = if (repoTarget.isDirectory) new java.io.File(repoTarget, "staging")
            else new java.io.File(System.getProperty("java.io.tmpdir"), "graft-staging")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Per-JVM scratch root for PER-RUN staged writes (snapshot stores, ORC
    * round trips, ANN index roots — anything a query destroys and rebuilds
    * every run). PID-scoped so a concurrently-running sibling JVM (Bench
    * beside Verify — measured in r17: a `SnapshotStore.destroy` /
    * `mode("overwrite")` from one JVM deleted the other's `_temporary`
    * mid-write) can never clobber this one's scratch; swept recursively on
    * JVM exit. PUBLISHED artifacts (fingerprint-keyed bucketed tables,
    * `stagedOnce` graphs) intentionally do NOT live here — their reuse
    * across queries is the thing they certify.
    */
  lazy val scratchDir: String = {
    val p = new java.io.File(stagingDir(), "run_" + ProcessHandle.current().pid())
    p.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rec)); f.delete(); ()
      }
      rec(p)
    }))
    p.getAbsolutePath
  }

  /** Build-once-per-JVM staged derived input (VERDICT r15 item 2).
    *
    * Several certificates exercise SEMANTICS over the same expensive
    * derived artifact — e.g. the full-corpus kNN graph feeds `q_sim_hnsw`,
    * `q_sim_hnsw_recall` and `q_sim_index_release`'s v2 rebuild — and
    * rebuilding it per query benchmarks the same build three times without
    * certifying anything new. The first caller in a JVM builds and writes
    * the artifact to staging PARQUET; later callers read it back. Parquet,
    * not a cached/checkpointed DataFrame, because the bench/verify harness
    * unpersists every block between queries.
    *
    * Keys must embed the input dir (hash suffices) and all build params so
    * runs at different scale factors never collide; results stay
    * deterministic because the builders themselves are partition-invariant
    * (certified in INVARIANCE_*) — content is identical whichever query
    * triggers the build, and each query remains independently runnable.
    */
  private val stagedArtifacts =
    scala.collection.concurrent.TrieMap[String, StagedSlot]()
  /** Per-key memo cell: the lock is the SLOT, not the map (ADVICE r16 —
    * a single global lock would serialize unrelated keys behind an
    * ~80-job graph build). `path` is written once under the slot's
    * monitor; double-checked read outside it.
    */
  private final class StagedSlot { @volatile var path: String = _ }
  def stagedOnce(s: SparkSession, key: String, build: () => DataFrame): DataFrame = {
    // The artifact path embeds the PID because the file is only ever READ
    // by the JVM that built it (the map gates) — so a concurrent sibling
    // process (Bench beside Verify) can never overwrite a staged file
    // mid-read. deleteOnExit sweeps the PID's artifacts when the JVM
    // leaves (ADVICE r16: staged files used to accumulate across runs);
    // parquet is a DIRECTORY, so register its files too.
    val slot = stagedArtifacts.getOrElseUpdate(key, new StagedSlot)
    if (slot.path == null) slot.synchronized {
      if (slot.path == null) {
        val p = stagingDir() + "/once_" +
          ProcessHandle.current().pid() + "_" + key
        build().write.mode("overwrite").parquet(p)
        val d = new java.io.File(p)
        d.deleteOnExit()
        Option(d.listFiles()).foreach(_.foreach(_.deleteOnExit()))
        slot.path = p
      }
    }
    s.read.parquet(slot.path)
  }
}
