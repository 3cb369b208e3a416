package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Property checks for the scale operators: each must equal its
  * brute-force / plain-plan reference on ARBITRARY inputs, not just the
  * crafted fixtures (the correctness contracts the registry oracles
  * certify on one dataset, checked here across many).
  */
class ScaleOpsPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAllSampled[A](g: Gen[A], n: Int = 12)(f: A => Unit): Unit = {
    var seed = Seed(1234L)
    (0 until n).foreach { _ =>
      f(g.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  test("bloom-pruned join == plain join on random key sets") {
    val gen = for {
      bigKeys <- Gen.listOfN(200, Gen.choose(0L, 40L))
      dimKeys <- Gen.listOfN(12, Gen.choose(0L, 60L))
    } yield (bigKeys, dimKeys.distinct)
    forAllSampled(gen) { case (bigKeys, dimKeys) =>
      val big = bigKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      val dim = dimKeys.map(k => (k, s"d$k")).toDF("k", "attr")
      val plain = big.join(dim, "k").select($"id", $"attr")
        .as[(Long, String)].collect().toSet
      val pruned = BloomPrune.prunedJoin(big, dim, "k", "k", expectedItems = 64)
        .select($"id", $"attr").as[(Long, String)].collect().toSet
      assert(pruned == plain)
    }
  }

  test("bucketized range join == naive non-equi join on random intervals") {
    val gen = for {
      pts <- Gen.listOfN(120, Gen.choose(-50.0, 50.0))
      ivs <- Gen.listOfN(15, Gen.zip(Gen.choose(-60.0, 60.0), Gen.choose(0.0, 25.0)))
      w <- Gen.oneOf(1.0, 3.7, 10.0)
    } yield (pts, ivs, w)
    forAllSampled(gen) { case (pts, ivs, w) =>
      val points = pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val intervals = ivs.zipWithIndex.map { case ((lo, span), i) =>
        (i.toLong, lo, lo + span - 5.0) // span-5 can go negative → degenerate
      }.toDF("iid", "lo", "hi")
      val naive = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val bucketized = RangeJoin.pointInInterval(points, col("x"), intervals,
          col("lo"), col("hi"), bucketWidth = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(bucketized == naive, s"width $w")
    }
  }

  test("hash-sample split is a partition: disjoint, covering, rate-monotone") {
    val gen = Gen.zip(Gen.choose(1L, 9L), Gen.choose(50, 400))
    forAllSampled(gen) { case (num, n) =>
      val df = (1 to n).map(i => i.toLong * 7 + 3).toDF("id")
      val (tr, ho) = Sampling.split(df, col("id"), num, 10)
      val t = tr.select($"id").as[Long].collect().toSet
      val h = ho.select($"id").as[Long].collect().toSet
      assert((t & h).isEmpty && (t | h).size == n)
      // larger num never shrinks the holdout
      val (_, ho2) = Sampling.split(df, col("id"), num + 1, 10)
      assert(h.subsetOf(ho2.select($"id").as[Long].collect().toSet))
    }
  }

  test("upsert merge: every update key has the update row, others unchanged") {
    val gen = for {
      tKeys <- Gen.listOfN(60, Gen.choose(0L, 30L))
      uKeys <- Gen.listOfN(10, Gen.choose(0L, 40L))
    } yield (tKeys.distinct, uKeys.distinct)
    forAllSampled(gen) { case (tKeys, uKeys) =>
      val target = tKeys.map(k => (k, s"t$k")).toDF("k", "v")
      val updates = uKeys.map(k => (k, s"u$k")).toDF("k", "v")
      val out = Upsert.merged(target, updates, "k")
        .as[(Long, String)].collect().toMap
      assert(out.keySet == (tKeys.toSet | uKeys.toSet))
      uKeys.foreach(k => assert(out(k) == s"u$k"))
      (tKeys.toSet -- uKeys).foreach(k => assert(out(k) == s"t$k"))
    }
  }

  test("heavy hitters == filtered exact counts at any threshold") {
    val gen = Gen.zip(Gen.listOfN(300, Gen.choose(0, 12)), Gen.choose(0.01, 0.2))
    forAllSampled(gen, n = 8) { case (vals, share) =>
      val df = vals.toDF("v")
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= math.ceil(vals.size * share))
      val got = Profiling.heavyHitters(df, "v", share)
        .as[(Int, Long)].collect().toMap
      assert(got == exact)
    }
  }
}
