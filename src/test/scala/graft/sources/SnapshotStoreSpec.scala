package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Snapshot store: append-only commits, pinned reads that stay
  * byte-stable while later releases (and stray unreferenced files) land,
  * and the atomic CURRENT pointer.
  */
class SnapshotStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("snapstore").toFile
    d.deleteOnExit()
    new File(d, "tbl").getAbsolutePath
  }

  test("two releases: v1 read is identical before and after v2 commits") {
    val root = freshRoot()
    val r1 = (1 to 50).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val r2 = (51 to 80).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val v1 = SnapshotStore.commit(r1, root)
    assert(v1 == 1 && SnapshotStore.currentVersion(root).contains(1))
    val before = SnapshotStore.read(spark, root, v1)
      .orderBy("id").as[(Long, String)].collect().toSeq

    val v2 = SnapshotStore.commit(r2, root)
    assert(v2 == 2 && SnapshotStore.currentVersion(root).contains(2))
    val after = SnapshotStore.read(spark, root, v1)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(before == after, "pinned v1 read must be byte-stable across v2")
    assert(after.map(_._1) == (1L to 50L))

    val cur = SnapshotStore.readCurrent(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(cur.map(_._1) == (1L to 80L), "current read sees both releases")
    // v2's manifest embeds v1's files — append semantics, nothing rewritten
    val m1 = SnapshotStore.manifest(root, 1).toSet
    val m2 = SnapshotStore.manifest(root, 2).toSet
    assert(m1.subsetOf(m2) && m2.size > m1.size)
  }

  test("pinned read ignores unreferenced files dropped into data/ (no directory listing)") {
    val root = freshRoot()
    val v1 = SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    // simulate a concurrent writer's half-landed file: parquet bytes in
    // data/ that no manifest references
    val stray = Seq((999L, "stray")).toDF("id", "text")
    val tmp = Files.createTempDirectory("stray").toFile
    stray.write.mode("overwrite").parquet(new File(tmp, "p").getAbsolutePath)
    val part = new File(tmp, "p").listFiles((_, n) => n.endsWith(".parquet")).head
    Files.copy(part.toPath,
      new File(new File(root, "data"), "v9_stray.parquet").toPath)
    val got = SnapshotStore.read(spark, root, v1)
      .select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(1L), "manifest-pinned read must not see the stray file")
  }

  test("rewrite compacts to fresh files; expire deletes exactly the unreferenced ones") {
    val root = freshRoot()
    val r1 = (1 to 40).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    val r2 = (41 to 60).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    SnapshotStore.commit(r1, root)
    SnapshotStore.commit(r2, root)
    val v3 = SnapshotStore.rewrite(spark, root)
    assert(v3 == 3 && SnapshotStore.currentVersion(root).contains(3))
    // the rewrite manifest references ONLY v3-prefixed files (chain broken)
    val m3 = SnapshotStore.manifest(root, 3)
    assert(m3.nonEmpty && m3.forall(_.startsWith("v3_")))
    val before = SnapshotStore.readCurrent(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(before.map(_._1) == (1L to 60L), "rewrite is logically a no-op")

    // graceMs = 0 throughout the GC fixtures: every file here was written
    // moments ago, and the in-flight-commit grace window would (correctly)
    // refuse to treat it as garbage — the window under test is the manifest
    // arithmetic, not the race protection.
    val deleted = SnapshotStore.expire(root, keep = 1, graceMs = 0L)
    assert(deleted.nonEmpty, "v1/v2-only files must actually be deleted")
    assert(deleted.forall(n => n.startsWith("v1_") || n.startsWith("v2_")))
    // current read byte-stable across the GC
    val after = SnapshotStore.readCurrent(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(before == after, "GC must not change the retained snapshot")
    // expired versions are unreadable; disk holds exactly the live set
    assert(intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, root, 1)
    }.getMessage.contains("no snapshot"))
    assert(SnapshotStore.dataFiles(root) == m3.sorted)
    // a second expire is a no-op (idempotent GC)
    assert(SnapshotStore.expire(root, keep = 1, graceMs = 0L).isEmpty)
  }

  test("replace supersedes: current reads only new content, pinned v1 intact, v1 expirable") {
    val root = freshRoot()
    val v1 = SnapshotStore.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "text"), root)
    val v2 = SnapshotStore.replace(Seq((10L, "x")).toDF("id", "text"), root)
    assert(SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq == Seq(10L))
    assert(SnapshotStore.read(spark, root, v1)
      .select(col("id")).as[Long].collect().toSeq.sorted == Seq(1L, 2L))
    assert(SnapshotStore.manifest(root, v2).forall(_.startsWith("v2_")))
    val deleted = SnapshotStore.expire(root, keep = 1, graceMs = 0L)
    assert(deleted.nonEmpty && deleted.forall(_.startsWith("v1_")))
  }

  test("expire without a rewrite deletes nothing (append manifests carry history)") {
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "text"), root)
    val deleted = SnapshotStore.expire(root, keep = 1, graceMs = 0L)
    assert(deleted.isEmpty, "v2's manifest still references v1's files")
    val cur = SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq.sorted
    assert(cur == Seq(1L, 2L))
  }

  test("expire guards: keep >= 1, empty table is an error") {
    val root = freshRoot()
    intercept[IllegalArgumentException] { SnapshotStore.expire(root, keep = 1) }
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    intercept[IllegalArgumentException] { SnapshotStore.expire(root, keep = 0) }
  }

  test("interleaved writers: loser's stale claim fails, retry lands as the next version") {
    val root = freshRoot()
    SnapshotStore.commit((1 to 10).map(i => (i.toLong, "base")).toDF("id", "text"), root)
    // Both writers observe v1 and stage their data (phase 1 — files land,
    // nothing references them yet).
    val carried = SnapshotStore.manifest(root, 1)
    val filesA = SnapshotStore.stageData(Seq((100L, "a")).toDF("id", "text"), root)
    val filesB = SnapshotStore.stageData(Seq((200L, "b")).toDF("id", "text"), root)
    // A claims v2 first and wins; B's claim of the SAME version must fail
    // atomically (this is the conflict the CAS exists to catch).
    assert(SnapshotStore.tryCommitAt(root, 2, carried ++ filesA))
    assert(!SnapshotStore.tryCommitAt(root, 2, carried ++ filesB),
      "second claim of v2 must lose")
    // v2 is exactly A's commit — B's failed claim left no trace on it
    assert(SnapshotStore.manifest(root, 2).toSet == (carried ++ filesA).toSet)
    // B re-reads (now v2), re-carries, retries at v3 — appends commute
    assert(SnapshotStore.currentVersion(root).contains(2))
    assert(SnapshotStore.tryCommitAt(root, 3,
      SnapshotStore.manifest(root, 2) ++ filesB))
    val ids = SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq.sorted
    assert(ids == ((1L to 10L) ++ Seq(100L, 200L)),
      "both racing datasets readable after the retry")
    // pinned v2 still excludes B's rows
    assert(!SnapshotStore.read(spark, root, 2)
      .select(col("id")).as[Long].collect().contains(200L))
  }

  test("threaded commit race: every commit lands, versions are dense, nothing lost") {
    val root = freshRoot()
    SnapshotStore.commit(Seq((0L, "base")).toDF("id", "text"), root)
    val perWriter = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = (1 to 3).map { w =>
      Future {
        (1 to perWriter).map { i =>
          val id = (w * 1000 + i).toLong
          SnapshotStore.commit(Seq((id, s"w$w")).toDF("id", "text"), root)
        }
      }
    }
    val versions = Await.result(Future.sequence(writers), 120.seconds).flatten
    // 1 base + 12 racing commits = versions exactly 2..13, each owned once
    assert(versions.sorted == (2 to 13), s"got $versions")
    assert(SnapshotStore.currentVersion(root).contains(13))
    val ids = SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq.sorted
    val expected = 0L +: (for (w <- 1 to 3; i <- 1 to perWriter)
      yield (w * 1000 + i).toLong).sorted
    assert(ids == expected, "every writer's every row survived the race")
  }

  test("rewrite aborts on a concurrent commit instead of dropping it") {
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    val pinnedV1 = SnapshotStore.read(spark, root, 1)
    // another writer lands v2 while the compaction of v1 is "in flight"
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "text"), root)
    val filesBefore = SnapshotStore.dataFiles(root)
    intercept[java.util.ConcurrentModificationException] {
      // the rewrite path with the stale expectation: supersession of v1
      // must refuse once the table advanced (retrying would erase row 2)
      graft.sources.SnapshotStore.replaceExpecting(pinnedV1, root, expectedPrior = 1)
    }
    // the aborted writer's staged files were removed — no orphan debris
    assert(SnapshotStore.dataFiles(root) == filesBefore)
    assert(SnapshotStore.currentVersion(root).contains(2))
    val ids = SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L), "the interleaved commit survived")
  }

  test("expire grace window spares unreferenced files young enough to be an in-flight commit") {
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "text"), root)
    SnapshotStore.rewrite(spark, root)
    // a concurrent writer's phase-1 landing: staged files, no manifest yet
    val staged = SnapshotStore.stageData(Seq((3L, "c")).toDF("id", "text"), root)
    // default grace: the fresh v1/v2 files AND the staged files all look
    // in-flight, so nothing is deleted
    assert(SnapshotStore.expire(root, keep = 1).isEmpty)
    assert(staged.forall(SnapshotStore.dataFiles(root).contains(_)))
    // grace 0 (fixture mode): v1/v2 history AND the staged files go — the
    // caller asserted no commit is in flight
    val deleted = SnapshotStore.expire(root, keep = 1, graceMs = 0L)
    assert(deleted.nonEmpty && staged.forall(deleted.contains(_)))
  }

  test("destroy resets the table so commits restart at v1") {
    val root = freshRoot()
    SnapshotStore.commit(Seq((1L, "a")).toDF("id", "text"), root)
    SnapshotStore.commit(Seq((2L, "b")).toDF("id", "text"), root)
    SnapshotStore.destroy(root)
    assert(SnapshotStore.currentVersion(root).isEmpty)
    val v = SnapshotStore.commit(Seq((3L, "c")).toDF("id", "text"), root)
    assert(v == 1)
    val got = SnapshotStore.readCurrent(spark, root)
      .select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(3L))
  }
}
