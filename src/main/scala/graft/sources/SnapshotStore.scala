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
  def commit(df: DataFrame, root: String): Int =
    commitVersion(df, root, carryPrior = true)

  /** Compaction commit: rewrite CURRENT's rows as fresh files and commit a
    * manifest referencing ONLY them. Logically a no-op (same content),
    * physically the maintenance step (small-file compaction, re-cluster)
    * that makes history EXPIRABLE: `commit` manifests carry every prior
    * file forward, so nothing ever becomes unreferenced until a rewrite
    * breaks the chain. Readers pinned to prior versions are untouched —
    * their manifests still name the old files, which stay on disk until
    * [[expire]]'s retention allows deletion. The same snapshot-isolation
    * argument applies at 100 TB: the rewrite lands as invisible new files
    * + one manifest rename, and CURRENT flips atomically.
    */
  def rewrite(spark: SparkSession, root: String): Int = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalArgumentException(s"empty snapshot table at $root"))
    commitVersion(read(spark, root, v), root, carryPrior = false)
  }

  /** Replace commit — the artifact-release shape: the next version's
    * manifest references ONLY the new files, superseding (not appending
    * to) the prior content. This is how a versioned model/index artifact
    * ships: each release is complete, readers pin a version, and
    * [[expire]] reclaims superseded releases once retention allows.
    * (`commit` = append-only data releases; `rewrite` = same-content
    * compaction; `replace` = new-content supersession.)
    */
  def replace(df: DataFrame, root: String): Int =
    commitVersion(df, root, carryPrior = false)

  private def commitVersion(df: DataFrame, root: String, carryPrior: Boolean): Int = {
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
    val files =
      (if (carryPrior) prior.map(manifest(root, _)).getOrElse(Nil) else Nil) ++ moved
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

  /** Snapshot expiry (the GC half of the Iceberg discipline): drop every
    * manifest older than the newest `keep` versions, then delete data
    * files no RETAINED manifest references. Returns the deleted file
    * names, sorted.
    *
    * Crash-safety ordering: expired manifests are removed FIRST, so no
    * reader can pin a version whose files are about to vanish; a crash
    * between the two phases strands orphan files (re-run to collect),
    * never a manifest naming deleted data. Retention is the caller's
    * contract with its slowest reader — `keep` must cover every pinned
    * read still in flight, exactly Iceberg's `expire_snapshots` rule.
    */
  def expire(root: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"must retain at least one snapshot, got keep=$keep")
    val cur = currentVersion(root).getOrElse(
      throw new IllegalArgumentException(s"empty snapshot table at $root"))
    val all = (1 to cur).filter(v => manifestFile(root, v).isFile)
    val retained = all.takeRight(keep)
    val expired = all.dropRight(keep)
    expired.foreach(v => manifestFile(root, v).delete())
    val live = retained.flatMap(manifest(root, _)).toSet
    val orphans = Option(dataDir(root).listFiles((_, n) => n.endsWith(".parquet")))
      .map(_.toSeq).getOrElse(Nil)
      .map(_.getName).filterNot(live)
    orphans.foreach(n => { new File(dataDir(root), n).delete(); () })
    orphans.sorted
  }

  /** Data-file names currently on disk (the GC audit view — compare with
    * the retained manifests' union after [[expire]]).
    */
  def dataFiles(root: String): Seq[String] =
    Option(dataDir(root).listFiles((_, n) => n.endsWith(".parquet")))
      .map(_.toSeq).getOrElse(Nil).map(_.getName).sorted

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
