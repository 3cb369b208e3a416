package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot / time-travel table layout — the Iceberg/Delta commit
  * discipline distilled to what a daily-crawl corpus needs: read release
  * N, byte-stable, while release N+1 lands.
  *
  * ```
  * <root>/data/v<N>_part-*.parquet    immutable, append-only data files
  * <root>/_snapshots/v<N>.manifest    complete file list of snapshot N
  * <root>/_snapshots/CURRENT          atomic pointer to the latest N
  * ```
  *
  * The commit protocol gives readers snapshot isolation without any
  * coordination:
  *  1. data files are written to a scratch dir, then MOVED into `data/`
  *     under version-prefixed names — a reader never observes a partial
  *     file, because nothing references it yet;
  *  2. the version manifest (prior version's file list + the new files)
  *     is written complete to a temp name and RENAMED into place — the
  *     rename is the commit point for that version;
  *  3. `CURRENT` flips by the same write-temp-then-rename, so "latest"
  *     readers atomically move from N to N+1.
  * A pinned read resolves a manifest ONCE and hands Spark the explicit
  * file list — no directory listing, so files added by N+1 (or a
  * concurrent compaction writing new files) are invisible to it. At
  * 100 TB the manifest is one small file per release and the read plan
  * is a plain pruned parquet scan of the pinned files.
  *
  * Single-writer contract (documented, not enforced): concurrent
  * committers would need a CAS on CURRENT — serialize SHIP steps
  * upstream, the same assumption the incremental-manifest op makes.
  */
object SnapshotStore {

  private def snapDir(root: String) = new File(root, "_snapshots")
  private def dataDir(root: String) = new File(root, "data")
  private def manifestFile(root: String, v: Int) = new File(snapDir(root), s"v$v.manifest")

  /** Remove the whole table (fixture reset — commits are append-only, so
    * a re-run against the same root would otherwise keep accreting
    * versions).
    */
  def destroy(root: String): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new File(root))
  }

  /** Latest committed version, or None for an empty table. */
  def currentVersion(root: String): Option[Int] = {
    val cur = new File(snapDir(root), "CURRENT")
    if (cur.isFile)
      Some(new String(Files.readAllBytes(cur.toPath), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  /** The pinned file list of snapshot `v` (relative to root/data). */
  def manifest(root: String, v: Int): Seq[String] = {
    val f = manifestFile(root, v)
    require(f.isFile, s"no snapshot v$v at $root")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Append `df` as the next snapshot; returns the new version number. */
  def commit(df: DataFrame, root: String): Int = {
    snapDir(root).mkdirs()
    dataDir(root).mkdirs()
    val prior = currentVersion(root)
    val next = prior.getOrElse(0) + 1

    // 1. write data files to scratch, move them in under unique names
    val scratch = new File(root, s"_tmp_v$next")
    df.write.mode("overwrite").parquet(scratch.getAbsolutePath)
    val moved = scratch.listFiles((_, n) => n.endsWith(".parquet")).toSeq
      .sortBy(_.getName)
      .map { f =>
        val name = s"v${next}_${f.getName}"
        Files.move(f.toPath, new File(dataDir(root), name).toPath,
          StandardCopyOption.ATOMIC_MOVE)
        name
      }
    scratch.listFiles().foreach(_.delete()); scratch.delete()

    // 2. complete file list -> temp -> rename (the commit point)
    val files = prior.map(manifest(root, _)).getOrElse(Nil) ++ moved
    val mTmp = new File(snapDir(root), s"v$next.manifest.tmp")
    Files.write(mTmp.toPath, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(mTmp.toPath, manifestFile(root, next).toPath,
      StandardCopyOption.ATOMIC_MOVE)

    // 3. flip CURRENT atomically
    val cTmp = new File(snapDir(root), "CURRENT.tmp")
    Files.write(cTmp.toPath, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(cTmp.toPath, new File(snapDir(root), "CURRENT").toPath,
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Pinned read of snapshot `v`: the manifest's explicit file list goes
    * straight to the parquet source — later snapshots' files are invisible
    * regardless of what lands in `data/` concurrently.
    */
  def read(spark: SparkSession, root: String, v: Int): DataFrame = {
    val paths = manifest(root, v)
      .map(n => new File(dataDir(root), n).getAbsolutePath)
    require(paths.nonEmpty, s"snapshot v$v is empty")
    spark.read.parquet(paths: _*)
  }

  /** Read whatever CURRENT points to (resolved once, then pinned). */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty snapshot table at $root"))
    read(spark, root, v)
  }

}
