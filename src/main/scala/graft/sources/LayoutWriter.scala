package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Layout-aware parquet sink: the write-side half of scan pruning.
  *
  * At 100 TB the scan cost of every later query is decided when the data is
  * WRITTEN: hive-style partition directories on the low-cardinality columns
  * queries filter by (partition pruning skips whole directories at plan
  * time), and in-file ordering on the range-filter columns (parquet
  * row-group min/max statistics skip pages/groups at read time — only
  * effective when values are clustered, i.e. sorted).
  *
  * `write` composes the two: `repartition(partCols)` so each partition
  * directory is produced by few tasks (no small-files explosion — without
  * it every task writes a file into every directory it holds rows for),
  * then `sortWithinPartitions(partCols ++ sortCols)` so row groups cover
  * narrow sorted ranges, then `partitionBy(partCols)`.
  *
  * `prunedRead` demonstrates/verifies the contract: a reread with an
  * equality filter on a partition column must scan ONLY files under that
  * partition's directory (checked via `input_file_name`).
  */
object LayoutWriter {

  /** Write `df` with pruning-friendly layout. `maxRecordsPerFile` bounds
    * file size (0 = Spark default).
    */
  def write(df: DataFrame, path: String, partCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Write `df` as a bucketed (+ bucket-sorted) catalog table: rows are
    * hash-distributed into `numBuckets` files per partition by `bucketCol`.
    * Two tables co-bucketed on their join key SORT-MERGE JOIN WITHOUT A
    * SHUFFLE — at 100 TB that converts every recurring fact⋈fact join on
    * the bucket key from a full-data exchange into a local merge, the
    * single biggest recurring-cost lever a layout decision controls.
    * (Bucketing requires the catalog — `saveAsTable`, not `parquet(path)` —
    * because bucket metadata lives in the table definition.)
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // A previous JVM's in-memory catalog is gone but its warehouse files
    // survive; CREATE TABLE refuses an existing location, so clear it.
    // Only attempted for the simple-name + local-file case this library's
    // harness uses — a database-qualified name lives under {wh}/{db}.db/
    // and a remote warehouse URI isn't a java.io path, so guessing a
    // location to delete would be wrong; those deployments should rely on
    // the catalog surviving (or drop the location themselves).
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    if (!tableName.contains(".") && (wh.startsWith("file:") || !wh.contains(":")))
      deleteRecursively(new java.io.File(wh.stripPrefix("file:"), tableName.toLowerCase))
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(tableName)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Idempotent [[writeBucketed]]: publish `df` as a bucketed EXTERNAL table
    * at `location`, skipping the write when the published copy is already
    * current. Returns true iff data was (re)written.
    *
    * A bucketed table is a LAYOUT INVESTMENT — written once, amortized over
    * every later join — so the publisher, not the consumer, must carry the
    * "already done" check or each consumer pays the full write again (the
    * round-6 bench lost ~12 s/run to exactly that). Currency is decided by a
    * spec marker persisted NEXT TO THE DATA (`_GRAFT_BUCKET_SPEC`: bucket
    * column/count, sort column, schema DDL, caller-supplied source
    * fingerprint): the in-memory catalog dies with the JVM but the files
    * don't, so on a fresh session a matching marker lets us re-register the
    * surviving files as an external bucketed table (bucket ids live in the
    * file names — `BucketingUtils.getBucketId` — so a catalog entry with the
    * same spec reads them exactly as the writing session did) without
    * touching the data. The marker's leading underscore keeps it invisible
    * to the parquet file index.
    */
  def ensureBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String], location: String,
      fingerprint: String): Boolean = {
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    val spec = Seq(bucketCol, numBuckets.toString, sortCol.getOrElse(""),
      df.schema.toDDL, fingerprint).mkString("\n")
    val dir = new java.io.File(location)
    val marker = new java.io.File(dir, "_GRAFT_BUCKET_SPEC")
    val current = marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == spec
    // An existing same-named catalog entry is only trusted if it actually
    // points at THIS location with THIS bucket spec — a leftover table
    // registered elsewhere (or bucketed differently) would silently serve
    // wrong data to the no-shuffle join. Anything that doesn't match (or
    // can't be read) is dropped and re-registered from the marker spec.
    def catalogEntryMatches: Boolean =
      spark.catalog.tableExists(tableName) && (try {
        val meta = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(tableName))
        val sameLoc = new java.io.File(meta.location).getCanonicalPath ==
          dir.getCanonicalPath
        sameLoc && meta.bucketSpec.exists(bs =>
          bs.numBuckets == numBuckets &&
            bs.bucketColumnNames == Seq(bucketCol) &&
            bs.sortColumnNames == sortCol.toSeq)
      } catch { case _: Exception => false })
    if (current && catalogEntryMatches) false
    else if (current) {
      spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
      val sorted = sortCol.fold("")(c => s"SORTED BY (`$c`) ")
      spark.sql(s"CREATE TABLE `$tableName` (${df.schema.toDDL}) USING parquet " +
        s"CLUSTERED BY (`$bucketCol`) ${sorted}INTO $numBuckets BUCKETS " +
        s"LOCATION '${dir.getAbsolutePath}'")
      false
    } else {
      spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
      deleteRecursively(dir)
      val w = df.write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", dir.getAbsolutePath)
        .bucketBy(numBuckets, bucketCol)
      sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(tableName)
      // Marker written only after a completed write: a crashed write leaves
      // no marker, so the next attempt rebuilds rather than trusting debris.
      java.nio.file.Files.write(marker.toPath, spec.getBytes("UTF-8"))
      true
    }
  }

  /** Globally-sorted write: `repartitionByRange` splits the key space into
    * contiguous ranges (one per output file set), `sortWithinPartitions`
    * orders inside each — together a total order across files WITHOUT a
    * single-reducer sort (the terasort layout). Readers get disjoint
    * per-file min/max on the sort key, so any range predicate prunes to
    * the few files covering it.
    */
  def writeGloballySorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int): Unit = {
    require(sortCols.nonEmpty && numFiles > 0)
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compaction: rewrite a directory into ~`targetFiles` files (small-files
    * mitigation after streaming/incremental appends — at scale, thousands
    * of KB-sized files cost more in task scheduling and footer reads than
    * the data itself). Round-robin repartition gives evenly-sized output.
    * Writes to `tmpPath` first, then swaps, so a failed compaction never
    * destroys the source.
    */
  /** Column-chunk compression codecs actually present in every parquet
    * file under `dirPath` — read from the FOOTERS (parquet-hadoop), not
    * from write options, because the option silently falls back when a
    * codec's native lib is missing and a "zstd corpus" quietly becomes
    * snappy. Driver-side: one footer read per file, metadata-sized.
    */
  def parquetCodecs(spark: SparkSession, dirPath: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dirPath).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala.map(_.getCodec.name())).toSet
      finally r.close()
    }.toSet
  }

  def compact(spark: SparkSession, path: String, targetFiles: Int): Unit = {
    require(targetFiles > 0)
    // Refuse hive-partitioned directories: spark.read would infer the
    // partition column as data and the rewrite would flatten the layout,
    // silently destroying the partition pruning the directory exists for.
    // Compact each partition directory (path/col=value) individually.
    val partDirs = Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.contains("="))
    require(partDirs.isEmpty,
      s"$path is hive-partitioned (${partDirs.head.getName}, ...): compact each partition directory instead")
    val tmpPath = path + "__compact_tmp"
    spark.read.parquet(path).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmpPath)
    // Swap by renaming the SOURCE aside first: the original is never
    // deleted until the compacted copy is in place, so a failure at any
    // step leaves a complete copy on disk (restore on failed swap-in).
    val dst = new java.io.File(path)
    val old = new java.io.File(path + "__compact_old")
    deleteRecursively(old)
    if (!dst.renameTo(old)) {
      deleteRecursively(new java.io.File(tmpPath))
      throw new java.io.IOException(s"compaction: cannot move $path aside")
    }
    if (!new java.io.File(tmpPath).renameTo(dst)) {
      val restored = old.renameTo(dst)
      throw new java.io.IOException(
        if (restored) s"compaction swap failed for $path (original restored; compacted copy left at $tmpPath)"
        else s"compaction swap failed for $path AND restore failed: original is at ${old.getPath}, compacted copy at $tmpPath")
    }
    deleteRecursively(old)
  }

  /** Read back with an equality filter on a partition column, returning
    * (rows, all scanned files under the selected partition directory).
    * The boolean is the partition-pruning proof: `input_file_name` exposes
    * which files the scan actually touched.
    */
  def prunedRead(spark: SparkSession, path: String, partCol: String,
      value: String): (DataFrame, Boolean) = {
    val df = spark.read.parquet(path).filter(col(partCol) === value)
    val seg = partitionSegment(partCol, value)
    val pruned = df.select(input_file_name().as("f"))
      .agg(coalesce(min(col("f").contains(seg).cast("int")), lit(1)).as("ok"))
      .head().getInt(0) == 1
    (df, pruned)
  }

  /** Escaped `"/col=value/"` directory segment for partition-pruning
    * certificates. Match the full SEGMENT, not a raw substring: "id=1" is
    * a substring of ".../id=10/..." (a broken scan would pass the check),
    * and values with special characters appear percent-escaped in the
    * path.
    */
  def partitionSegment(partCol: String, value: String): String =
    "/" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString(partCol, value) + "/"
}
