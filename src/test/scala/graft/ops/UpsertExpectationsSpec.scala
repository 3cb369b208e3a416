package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UpsertExpectationsSpec extends SparkTestBase {
  import spark.implicits._

  test("merged: updates win on collision, unmatched target rows survive") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val updates = Seq((2L, "b2", 22.0), (4L, "d", 40.0)).toDF("id", "tag", "v")
    val out = Upsert.merged(target, updates, "id")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("overwritePartitions rewrites only the batch's partitions") {
    val dir = Files.createTempDirectory("graft-upsert").toFile.getAbsolutePath + "/t"
    Seq((1L, "p1", 1.0), (2L, "p2", 2.0), (3L, "p3", 3.0)).toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    Upsert.overwritePartitions(
      Seq((20L, "p2", 22.0)).toDF("id", "part", "v"), dir, "part")
    val back = spark.read.parquet(dir).as[(Long, Double, String)].collect().toSet
    // p1/p3 untouched; p2 fully replaced by the batch
    assert(back.map(r => (r._1, r._3)) == Set((1L, "p1"), (20L, "p2"), (3L, "p3")))
  }

  test("expectations report counts violations per rule in one pass; nulls violate") {
    val df = Seq(
      (Some(1.0), "a@x.io"), (Some(-2.0), "nope"), (None, "b@y.org")
    ).toDF("v", "email")
    val rep = Expectations.report(df, Seq(
        Expectations.notNull("v"),
        Expectations.nonNegative("v"),
        Expectations.matches("email", "^[^@]+@[^@]+$")))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(rep("not_null_v") == 1L)
    assert(rep("non_negative_v") == 2L) // -2 violates; NULL >= 0 is null → violates
    assert(rep("matches_email") == 1L)
  }

  test("empty batch reports zero violations and passes the gate") {
    val empty = Seq.empty[Double].toDF("v")
    val rep = Expectations.report(empty, Seq(Expectations.nonNegative("v")))
      .as[(String, Long, Boolean)].collect()
    assert(rep.toSeq == Seq(("non_negative_v", 0L, true)))
    assert(Expectations.enforce(empty, Seq(Expectations.nonNegative("v"))).count() == 0)
  }

  test("enforce throws naming every failed rule, passes a clean frame through") {
    val bad = Seq((-1.0)).toDF("v")
    val e = intercept[Expectations.Violation] {
      Expectations.enforce(bad, Seq(Expectations.nonNegative("v")))
    }
    assert(e.getMessage.contains("non_negative_v"))
    val ok = Seq((1.0)).toDF("v")
    assert(Expectations.enforce(ok, Seq(Expectations.nonNegative("v"))).count() == 1)
  }
}
