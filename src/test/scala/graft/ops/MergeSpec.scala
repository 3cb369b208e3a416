package graft.ops

import graft.SparkTestBase

/** U1 — multi-file merge with strict schema check (ref file_merge.py:9-54). */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("merge concatenates positionally after validation") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((3L, "z")).toDF("id", "v")
    val m = Merge.merge(Seq(a, b)).as[(Long, String)].collect().toSet
    assert(m == Set((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("fewer than two inputs is an error (ref file_merge.py:15-16)") {
    intercept[IllegalArgumentException](Merge.merge(Seq(Seq((1L, "x")).toDF("id", "v"))))
  }

  test("column-name mismatch (including order) raises with the file index") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq(("x", 1L)).toDF("v", "id")
    val e = intercept[IllegalArgumentException](Merge.merge(Seq(a, b)))
    assert(e.getMessage.contains("Column mismatch in file 1"))
  }

  test("dtype mismatch raises naming the column (ref file_merge.py:36-43)") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((1, "x")).toDF("id", "v") // id is Int here
    val e = intercept[IllegalArgumentException](Merge.merge(Seq(a, b)))
    assert(e.getMessage.contains("id"))
  }
}
