package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, StandardCopyOption}
import java.util.ConcurrentModificationException

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot / time-travel table layout — the Iceberg/Delta commit
  * discipline distilled to what a daily-crawl corpus needs: read release
  * N, byte-stable, while release N+1 lands.
  *
  * ```
  * <root>/data/v<N>_part-*.parquet    immutable, append-only data files
  * <root>/_snapshots/v<N>.manifest    complete file list of snapshot N
  * <root>/_snapshots/CURRENT          advisory hint to the latest N
  * ```
  *
  * The commit protocol gives readers snapshot isolation AND writers
  * optimistic concurrency without any external coordinator:
  *  1. data files are written to a scratch dir, then MOVED into `data/`
  *     under unique names — a reader never observes a partial file,
  *     because nothing references it yet;
  *  2. the version manifest (prior version's file list + the new files)
  *     is written complete to a temp name and CLAIMED into place with an
  *     atomic create-if-absent (a hard link, which fails if `v<N>.manifest`
  *     already exists) — the claim is both the commit point for that
  *     version and the compare-and-swap between racing writers: exactly
  *     one writer owns each version number;
  *  3. a LOSING writer re-reads the table state, re-carries the new
  *     prior's file list, renames its already-landed (still unreferenced)
  *     data files to the next version prefix, and retries — append
  *     commits are commutative, so retry is always safe. Supersession
  *     commits ([[rewrite]]) are NOT commutative: they abort with
  *     [[ConcurrentModificationException]] when the table advanced under
  *     them, instead of silently dropping the interleaved release.
  *
  * The authoritative version is the highest committed manifest (one
  * listing of the small `_snapshots` dir — the exact Iceberg
  * HadoopTableOperations pattern: `CURRENT` is only a hint, because a
  * plain file rename is last-writer-wins and cannot arbitrate racing
  * commits; the create-if-absent manifest claim can). On a local or HDFS
  * filesystem the claim is atomic; an object-store deployment swaps this
  * one primitive for a catalog conditional-put, nothing else changes.
  *
  * A pinned read resolves a manifest ONCE and hands Spark the explicit
  * file list — no data-directory listing, so files added by N+1 (or a
  * concurrent compaction writing new files) are invisible to it. At
  * 100 TB the manifest is one small file per release and the read plan
  * is a plain pruned parquet scan of the pinned files.
  */
object SnapshotStore {

  private def snapDir(root: String) = new File(root, "_snapshots")
  private def dataDir(root: String) = new File(root, "data")
  private def manifestFile(root: String, v: Int) = new File(snapDir(root), s"v$v.manifest")

  private val ManifestName = """v(\d+)\.manifest""".r

  /** Commit attempts before a writer declares livelock. Each failed
    * attempt means a DIFFERENT writer committed a version — 64 straight
    * losses is not contention, it is a stuck clock or a runaway loop.
    */
  private val MaxCommitAttempts = 64

  /** In-flight-commit protection for [[expire]]: an unreferenced data
    * file younger than this is presumed to be a concurrent commit's
    * phase-1 landing (files move into `data/` BEFORE their manifest
    * exists) and is skipped. Ten minutes bounds any real commit's
    * phase-1→phase-2 gap; Iceberg's orphan-file removal applies the
    * same rule with a much longer default.
    */
  val DefaultExpireGraceMs: Long = 10 * 60 * 1000L

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

  /** Latest committed version, or None for an empty table. Authoritative:
    * the highest `v<N>.manifest` present (commits claim manifests
    * atomically, so the listing is exact); `CURRENT` is a hint only.
    */
  def currentVersion(root: String): Option[Int] = {
    val vs = Option(snapDir(root).list()).map(_.toSeq).getOrElse(Nil).collect {
      case ManifestName(n) => n.toInt
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The pinned file list of snapshot `v` (relative to root/data). */
  def manifest(root: String, v: Int): Seq[String] = {
    val f = manifestFile(root, v)
    require(f.isFile, s"no snapshot v$v at $root")
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Append `df` as the next snapshot; returns the committed version.
    * Safe under concurrent writers: a lost race retries at the advanced
    * version (appends commute), so two racing commits land as N+1 and
    * N+2 with both datasets readable.
    */
  def commit(df: DataFrame, root: String): Int =
    commitVersion(df, root, carryPrior = true, expectedPrior = None)

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
    *
    * Concurrency: a rewrite is a supersession of the exact version it
    * read — if another writer commits while the rewrite is in flight,
    * retrying would silently drop that writer's release, so the rewrite
    * ABORTS with [[ConcurrentModificationException]] (its staged files
    * are removed; nothing referenced them). The caller re-runs the
    * compaction against the new CURRENT, exactly Iceberg's rewrite
    * conflict behavior.
    */
  def rewrite(spark: SparkSession, root: String): Int = {
    val v = currentVersion(root).getOrElse(
      throw new IllegalArgumentException(s"empty snapshot table at $root"))
    replaceExpecting(read(spark, root, v), root, expectedPrior = v)
  }

  /** Replace commit — the artifact-release shape: the next version's
    * manifest references ONLY the new files, superseding (not appending
    * to) the prior content. This is how a versioned model/index artifact
    * ships: each release is complete, readers pin a version, and
    * [[expire]] reclaims superseded releases once retention allows.
    * (`commit` = append-only data releases; `rewrite` = same-content
    * compaction; `replace` = new-content supersession.) Each replace is
    * self-contained, so racing replaces serialize by retry and the last
    * committed version wins — the standard artifact-registry semantics.
    */
  def replace(df: DataFrame, root: String): Int =
    commitVersion(df, root, carryPrior = false, expectedPrior = None)

  /** Supersession of exactly `expectedPrior` — the guarded form [[rewrite]]
    * uses: commits `df` as `expectedPrior + 1` referencing only its own
    * files, and ABORTS with [[ConcurrentModificationException]] (staged
    * files removed) if any other writer advanced the table first. Use when
    * the new content was DERIVED from version `expectedPrior` and blindly
    * superseding a later release would lose its data.
    */
  def replaceExpecting(df: DataFrame, root: String, expectedPrior: Int): Int =
    commitVersion(df, root, carryPrior = false, expectedPrior = Some(expectedPrior))

  /** Phase 1 alone, exposed for conflict certification and external
    * commit orchestration: land `df`'s rows in `data/` as immutable
    * files under writer-unique names that NO manifest references yet.
    * Pair with [[tryCommitAt]] to complete (or lose) the commit.
    */
  def stageData(df: DataFrame, root: String): Seq[String] = {
    snapDir(root).mkdirs()
    dataDir(root).mkdirs()
    val wid = java.util.UUID.randomUUID().toString.take(8)
    val scratch = new File(root, s"_tmp_$wid")
    df.write.mode("overwrite").parquet(scratch.getAbsolutePath)
    val moved = scratch.listFiles((_, n) => n.endsWith(".parquet")).toSeq
      .sortBy(_.getName)
      .map { f =>
        val name = s"w${wid}_${f.getName}"
        Files.move(f.toPath, new File(dataDir(root), name).toPath,
          StandardCopyOption.ATOMIC_MOVE)
        name
      }
    scratch.listFiles().foreach(_.delete()); scratch.delete()
    moved
  }

  /** The commit CAS, exposed: atomically claim exactly `version` with the
    * complete file list `files`. Returns true iff THIS writer created the
    * manifest; false means a competing writer already owns `version`
    * (the caller re-reads table state and retries at a higher version —
    * see [[commit]] for the append retry rule). The claim is a hard-link
    * create-if-absent: readers observe the manifest appear atomically
    * with its full content.
    */
  def tryCommitAt(root: String, version: Int, files: Seq[String]): Boolean = {
    require(version >= 1, s"versions start at 1, got $version")
    snapDir(root).mkdirs()
    val tmp = new File(snapDir(root),
      s"v$version.manifest.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp.toPath, files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    try {
      Files.createLink(manifestFile(root, version).toPath, tmp.toPath)
      tmp.delete()
      advanceCurrentHint(root, version)
      true
    } catch {
      case _: FileAlreadyExistsException =>
        tmp.delete()
        false
    }
  }

  /** Best-effort monotonic CURRENT hint (never authoritative — see
    * [[currentVersion]]): only advances, so a reader following the hint
    * may briefly lag the true latest but never regresses past a version
    * it already saw.
    */
  private def advanceCurrentHint(root: String, v: Int): Unit = {
    val cur = new File(snapDir(root), "CURRENT")
    val seen =
      if (cur.isFile)
        scala.util.Try(new String(Files.readAllBytes(cur.toPath),
          StandardCharsets.UTF_8).trim.toInt).toOption
      else None
    if (seen.forall(_ < v)) {
      val cTmp = new File(snapDir(root),
        s"CURRENT.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      Files.write(cTmp.toPath, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(cTmp.toPath, cur.toPath, StandardCopyOption.ATOMIC_MOVE)
    }
    ()
  }

  private def commitVersion(df: DataFrame, root: String, carryPrior: Boolean,
      expectedPrior: Option[Int]): Int = {
    // Phase 1 once: the data files land under the claimed-version prefix
    // and are renamed (still unreferenced, so renames are invisible to
    // every reader) if the claim loses and moves to a higher version.
    snapDir(root).mkdirs()
    dataDir(root).mkdirs()
    val staged = stageData(df, root)
    var next = currentVersion(root).getOrElse(0) + 1
    var moved = staged.map { n =>
      val named = s"v${next}_${n.stripPrefix("w").dropWhile(_ != '_').drop(1)}"
      Files.move(new File(dataDir(root), n).toPath,
        new File(dataDir(root), named).toPath, StandardCopyOption.ATOMIC_MOVE)
      named
    }
    var attempts = 0
    while (true) {
      val prior = currentVersion(root)
      expectedPrior.foreach { exp =>
        if (prior != Some(exp)) {
          // Supersession conflict: the table advanced under a rewrite.
          // Nothing references the staged files — remove them and abort.
          moved.foreach(n => { new File(dataDir(root), n).delete(); () })
          throw new ConcurrentModificationException(
            s"snapshot table at $root advanced to v${prior.getOrElse(0)} " +
              s"while a supersession of v$exp was in flight")
        }
      }
      val want = prior.getOrElse(0) + 1
      if (want != next) {
        moved = moved.map { n =>
          val renamed = s"v${want}_${n.stripPrefix(s"v${next}_")}"
          Files.move(new File(dataDir(root), n).toPath,
            new File(dataDir(root), renamed).toPath, StandardCopyOption.ATOMIC_MOVE)
          renamed
        }
        next = want
      }
      val files =
        (if (carryPrior) prior.map(manifest(root, _)).getOrElse(Nil) else Nil) ++ moved
      if (tryCommitAt(root, next, files)) return next
      attempts += 1
      if (attempts >= MaxCommitAttempts)
        throw new ConcurrentModificationException(
          s"lost $attempts consecutive commit races at $root — aborting")
    }
    -1 // unreachable
  }

  /** Snapshot expiry (the GC half of the Iceberg discipline): drop every
    * manifest older than the newest `keep` versions, then delete data
    * files no RETAINED manifest references. Returns the deleted file
    * names, sorted.
    *
    * Crash-safety ordering: expired manifests are removed FIRST, so no
    * reader can pin a version whose files are about to vanish; a crash
    * between the two phases strands orphan files (re-run to collect),
    * never a manifest naming deleted data. Concurrent-commit safety:
    * a racing commit's phase-1 files land in `data/` BEFORE its manifest
    * exists, so an unreferenced file younger than `graceMs` is presumed
    * in-flight and skipped ([[DefaultExpireGraceMs]]); fixtures that GC
    * freshly written history pass 0 explicitly. Retention is the
    * caller's contract with its slowest reader — `keep` must cover every
    * pinned read still in flight, exactly Iceberg's `expire_snapshots`
    * rule.
    */
  def expire(root: String, keep: Int,
      graceMs: Long = DefaultExpireGraceMs): Seq[String] = {
    require(keep >= 1, s"must retain at least one snapshot, got keep=$keep")
    val cur = currentVersion(root).getOrElse(
      throw new IllegalArgumentException(s"empty snapshot table at $root"))
    val all = (1 to cur).filter(v => manifestFile(root, v).isFile)
    val retained = all.takeRight(keep)
    val expired = all.dropRight(keep)
    expired.foreach(v => manifestFile(root, v).delete())
    val live = retained.flatMap(manifest(root, _)).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val orphans = Option(dataDir(root).listFiles((_, n) => n.endsWith(".parquet")))
      .map(_.toSeq).getOrElse(Nil)
      .filter(f => !live(f.getName) && f.lastModified() <= cutoff)
      .map(_.getName)
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

  /** Read whatever the latest committed version is (resolved once, then
    * pinned).
    */
  def readCurrent(spark: SparkSession, root: String): DataFrame = {
    val v = currentVersion(root)
      .getOrElse(throw new IllegalArgumentException(s"empty snapshot table at $root"))
    read(spark, root, v)
  }

}
