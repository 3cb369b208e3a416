package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** As-of join (union+window form) and salted skew join: semantics pinned
  * against brute-force / plain-join references.
  */
class JoinOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val samples = Seq(
    // (id, key, ts, x)
    (1L, "a", ts("2024-01-01 00:00:10"), 1.0),
    (2L, "a", ts("2024-01-01 00:00:20"), 2.0),
    (3L, "a", ts("2024-01-01 00:00:05"), 3.0), // before any calibration → dropped
    (4L, "b", ts("2024-01-01 00:00:30"), 4.0),
    (5L, "b", ts("2024-01-01 00:00:15"), 5.0)  // equal to b's calibration ts → matches it
  ).toDF("id", "key", "ts", "x")

  private val cals = Seq(
    // (key, ts, gain, note)
    ("a", ts("2024-01-01 00:00:08"), 10.0, "a1"),
    ("a", ts("2024-01-01 00:00:15"), 20.0, "a2"),
    ("b", ts("2024-01-01 00:00:15"), 30.0, "b1")
  ).toDF("key", "ts", "gain", "note")

  test("asof join attaches the latest right row at or before each left ts, per key") {
    val out = AsofJoin.asof(samples, cals, Seq("key"), "ts", "ts", Seq("gain", "note"))
      .select($"id", $"asof_gain", $"asof_note").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((10.0, "a1")), // 00:10 → cal at 00:08
      2L -> ((20.0, "a2")), // 00:20 → cal at 00:15
      4L -> ((30.0, "b1")), // 00:30 → b cal at 00:15
      5L -> ((30.0, "b1"))  // equal ts: >= semantics include it
    )) // id 3 dropped: no calibration at or before 00:05
  }

  test("asof join keeps matched right columns row-consistent when a value is null") {
    // The later calibration has a NULL note: a per-column last(ignoreNulls)
    // would take gain from cal2 but note from cal1 — the struct form must
    // surface cal2's (gain, NULL note) together.
    val calsWithNull = Seq(
      ("a", ts("2024-01-01 00:00:01"), Option(1.0), Option("first")),
      ("a", ts("2024-01-01 00:00:09"), Option(2.0), Option.empty[String])
    ).toDF("key", "ts", "gain", "note")
    val out = AsofJoin.asof(
        samples.filter($"id" === 1L), calsWithNull, Seq("key"), "ts", "ts", Seq("gain", "note"))
      .select($"asof_gain", $"asof_note").collect().head
    assert(out.getDouble(0) == 2.0 && out.isNullAt(1))
  }

  test("asof join matches a brute-force reference on a random-ish fixture") {
    val left = (1 to 200).map(i =>
      (i.toLong, s"k${i % 7}", ts(f"2024-01-01 00:${(i * 13) % 60}%02d:${(i * 7) % 60}%02d"), i * 0.5))
      .toDF("id", "key", "ts", "x")
    val right = (1 to 60).map(j =>
      (s"k${j % 7}", ts(f"2024-01-01 00:${(j * 11) % 60}%02d:${(j * 29) % 60}%02d"), j * 1.0))
      .toDF("key", "ts", "gain")
      .groupBy($"key", $"ts").agg(max($"gain").as("gain")) // unique per (key, ts)
    val got = AsofJoin.asof(left, right, Seq("key"), "ts", "ts", Seq("gain"))
      .select($"id", $"asof_gain").as[(Long, Double)].collect().toMap
    val rightRows = right.as[(String, Timestamp, Double)].collect()
    val exp = left.as[(Long, String, Timestamp, Double)].collect().flatMap { case (id, k, t, _) =>
      val prior = rightRows.filter(r => r._1 == k && !r._2.after(t))
      if (prior.isEmpty) None else Some(id -> prior.maxBy(_._2.getTime)._3)
    }.toMap
    assert(got == exp)
  }

  test("asof join never matches a right row whose timestamp is null") {
    // A null right ts sorts first (nulls-first ascending) and would become
    // the running last() for every left row; a range join would never match
    // it. Such rows must be dropped before the union.
    val calsWithNullTs = Seq(
      ("a", Option.empty[Timestamp], 99.0, "ghost"),
      ("a", Option(ts("2024-01-01 00:00:08")), 10.0, "a1")
    ).toDF("key", "ts", "gain", "note")
    val out = AsofJoin.asof(samples, calsWithNullTs, Seq("key"), "ts", "ts", Seq("gain", "note"))
      .select($"id", $"asof_gain", $"asof_note").as[(Long, Double, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // id 3 (00:05, before the only real cal) must be dropped, not matched to
    // the ghost; ids 1 and 2 match the real 00:08 cal.
    assert(out == Map(1L -> ((10.0, "a1")), 2L -> ((10.0, "a1"))))
  }

  test("salted equi-join keeps rows whose salt source is null (bucket 0)") {
    val big = Seq((Some(1L), 3L, 1.0), (None, 3L, 2.0), (Some(2L), 4L, 3.0))
      .toDF("id", "k", "v")
    val dim = Seq((3L, "x"), (4L, "y")).toDF("k", "attr")
    val salted = SkewJoin.saltedEquiJoin(big, dim, "k", salts = 4, saltSrc = xxhash64($"id"))
      .select($"k", $"v", $"attr").as[(Long, Double, String)].collect().sortBy(_._2)
    assert(salted.toSeq == Seq((3L, 1.0, "x"), (3L, 2.0, "x"), (4L, 3.0, "y")))
  }

  test("salted equi-join returns exactly the plain equi-join, skew and misses included") {
    // key 0 is hot (80% of rows); key 9 has no dim row (inner-join dropped).
    val big = (1 to 500).map(i => (i.toLong, if (i % 5 == 0) (i % 10).toLong else 0L, i * 1.0))
      .toDF("id", "k", "v")
    val dim = (0 to 8).map(k => (k.toLong, s"attr$k")).toDF("k", "attr")
    val salted = SkewJoin.saltedEquiJoin(big, dim, "k", salts = 8, saltSrc = xxhash64($"id"))
      .select($"id", $"k", $"v", $"attr").as[(Long, Long, Double, String)].collect().sortBy(_._1)
    val plain = big.join(dim, Seq("k"))
      .select($"id", $"k", $"v", $"attr").as[(Long, Long, Double, String)].collect().sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }
}
