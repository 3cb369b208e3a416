package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class LayoutWriterSpec extends SparkTestBase {
  import spark.implicits._

  test("partitioned sorted write round-trips and prunes partition reads") {
    val dir = Files.createTempDirectory("graft-layout").toFile.getAbsolutePath
    val df = (1 to 1000).map(i => (i.toLong, if (i % 3 == 0) "A" else "B", i * 2.0))
      .toDF("id", "flag", "v")
    LayoutWriter.write(df, dir, partCols = Seq("flag"), sortCols = Seq("id"))

    val (back, pruned) = LayoutWriter.prunedRead(spark, dir, "flag", "A")
    assert(pruned, "scan touched files outside flag=A")
    assert(back.count() == 333)
    // values survive the round trip (partition column re-attached by reader)
    val total = spark.read.parquet(dir)
    assert(total.count() == 1000)
    assert(total.agg(sum($"v")).head().getDouble(0) == (1 to 1000).map(_ * 2.0).sum)
  }

  test("co-bucketed tables join without a shuffle") {
    val a = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong % 100, i * 2.0)).toDF("k", "vb")
    LayoutWriter.writeBucketed(a, "graft_lw_a", "k", numBuckets = 8, sortCol = Some("k"))
    LayoutWriter.writeBucketed(b, "graft_lw_b", "k", numBuckets = 8, sortCol = Some("k"))
    val joined = spark.table("graft_lw_a").join(spark.table("graft_lw_b"), "k")
      .hint("merge")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 2000L * 10) // 20 a-rows × 10 b-rows per key / 100 keys
  }

  test("ensureBucketed: writes once, re-registers surviving files, rebuilds on changed fingerprint") {
    val loc = Files.createTempDirectory("graft-ensure-bk").toFile.getAbsolutePath + "/t"
    val a = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "va")
    def publish(fp: String) = LayoutWriter.ensureBucketed(
      a, "graft_eb_a", "k", numBuckets = 8, sortCol = Some("k"), loc, fp)

    assert(publish("fp1"), "first publish must write")
    assert(!publish("fp1"), "same spec+fingerprint must be a no-op")

    // Fresh-JVM analog: the catalog entry is gone but the files survive —
    // the publish must re-register WITHOUT rewriting (same file mtimes).
    def mtimes = new java.io.File(loc).listFiles().filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    val before = mtimes
    spark.sql("DROP TABLE graft_eb_a")
    assert(!publish("fp1"), "surviving files must be re-registered, not rewritten")
    assert(mtimes == before, "re-registration must not touch the data files")

    // the re-registered table still carries the bucket spec: co-bucketed
    // join against a matching table runs without an exchange
    val b = (1 to 1000).map(i => (i.toLong % 100, i * 2.0)).toDF("k", "vb")
    val locB = Files.createTempDirectory("graft-ensure-bk").toFile.getAbsolutePath + "/u"
    LayoutWriter.ensureBucketed(b, "graft_eb_b", "k", 8, Some("k"), locB, "fp1")
    val joined = spark.table("graft_eb_a").join(spark.table("graft_eb_b"), "k").hint("merge")
    assert(!joined.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    assert(joined.count() == 2000L * 10)

    // a changed source fingerprint invalidates the published copy
    assert(publish("fp2"), "changed fingerprint must rebuild")
    assert(spark.table("graft_eb_a").count() == 2000)

    // an IMPOSTOR catalog entry — same name, different location/spec — must
    // not be trusted: the publish re-registers it against the marker's
    // location (no data rewrite) rather than serving the impostor's files
    spark.sql("DROP TABLE graft_eb_a")
    val impostor = Files.createTempDirectory("graft-ensure-bk").toFile.getAbsolutePath + "/x"
    (1 to 7).map(i => (i.toLong, i.toLong)).toDF("k", "va")
      .write.option("path", impostor).saveAsTable("graft_eb_a")
    val beforeFix = mtimes
    assert(!publish("fp2"), "re-registration, not a rewrite")
    assert(mtimes == beforeFix, "data files untouched")
    assert(spark.table("graft_eb_a").count() == 2000,
      "the catalog entry must point back at the published location")
  }

  test("globally-sorted write: disjoint per-file ranges forming a total order") {
    val dir = Files.createTempDirectory("graft-gsort").toFile.getAbsolutePath + "/t"
    val df = (1 to 5000).reverse.map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    LayoutWriter.writeGloballySorted(df, dir, Seq("id"), numFiles = 8)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"id").as("lo"), max($"id").as("hi"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    assert(ranges.map(_._4).sum == 5000)
    // ranges are disjoint and ordered: each file's max < next file's min
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"overlapping file ranges: $a vs $b")
    }
  }

  test("pruning proof matches full path segments: id=1 never passes via id=10") {
    val dir = Files.createTempDirectory("graft-seg").toFile.getAbsolutePath + "/t"
    // ONLY id=10 exists: a filter on id=1 reads zero rows (vacuously pruned),
    // while a substring check against id=10's path would also have claimed
    // "pruned" for rows it scanned. Write id=1 rows labelled under id=10 is
    // not constructible via partitionBy, so pin the segment logic directly:
    val df = Seq((10L, "a"), (1L, "b")).toDF("id", "s")
    LayoutWriter.write(df, dir, partCols = Seq("id"), sortCols = Seq("s"))
    val (one, prunedOne) = LayoutWriter.prunedRead(spark, dir, "id", "1")
    assert(prunedOne && one.count() == 1)
    // the id=1 scan's file path must contain the exact segment, not id=10's
    val f = one.select(input_file_name()).as[String].head()
    assert(f.contains("/id=1/") && !f.contains("/id=10/"))
  }

  test("compact refuses a hive-partitioned directory") {
    val dir = Files.createTempDirectory("graft-cref").toFile.getAbsolutePath + "/t"
    Seq((1L, "A"), (2L, "B")).toDF("id", "flag")
      .write.partitionBy("flag").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      LayoutWriter.compact(spark, dir, targetFiles = 1)
    }
    assert(e.getMessage.contains("hive-partitioned"))
    // per-partition compaction works
    LayoutWriter.compact(spark, dir + "/flag=A", targetFiles = 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("compaction rewrites many small files into few, preserving rows") {
    val dir = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath + "/t"
    (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .repartition(50).write.parquet(dir)
    def nFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(nFiles == 50)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    LayoutWriter.compact(spark, dir, targetFiles = 4)
    assert(nFiles == 4)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == before)
  }

  test("in-file ordering: each file's id column is sorted") {
    val dir = Files.createTempDirectory("graft-layout2").toFile.getAbsolutePath
    val df = (1 to 500).reverse.map(i => (i.toLong, (i % 2).toString)).toDF("id", "g")
    LayoutWriter.write(df, dir, Seq("g"), Seq("id"))
    val files = spark.read.parquet(dir)
      .select(input_file_name().as("f")).distinct().as[String].collect()
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select($"id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"$f is not sorted by id")
    }
  }
}
