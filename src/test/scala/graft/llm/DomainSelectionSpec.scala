package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins DSIR semantics: weights match an exact scala reference on a
  * hand-built corpus, domain-matching docs outrank off-domain ones,
  * resampling is deterministic with correct bounds, and degenerate inputs
  * (single-token docs — no bigrams) survive.
  */
class DomainSelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val raw = Seq(
    (1L, "spark shuffle partition"),
    (2L, "spark shuffle"),
    (3L, "cooking pasta recipe"),
    (4L, "pasta recipe"),
    (5L, "spark")
  ).toDF("doc_id", "text")

  private val target = Seq(
    (100L, "spark shuffle partition"),
    (101L, "spark shuffle broadcast")
  ).toDF("doc_id", "text")

  private def fp(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 1000000007L)

  test("weights match an exact scala reference implementation") {
    val nB = 64
    def feats(text: String): Seq[Long] = {
      val ts = text.toLowerCase.trim.split("\\s+", -1).toSeq
      val uni = ts.map(t => math.floorMod(fp(t), nB.toLong))
      val bi = if (ts.length < 2) Seq.empty
        else ts.sliding(2).map(p => math.floorMod(fp(p(0) + " " + p(1)), nB.toLong)).toSeq
      uni ++ bi
    }
    val rawDocs = Map(1L -> "spark shuffle partition", 2L -> "spark shuffle",
      3L -> "cooking pasta recipe", 4L -> "pasta recipe", 5L -> "spark")
    val tgtDocs = Seq("spark shuffle partition", "spark shuffle broadcast")
    val tcounts = tgtDocs.flatMap(feats).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val scounts = rawDocs.values.flatMap(feats).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = tgtDocs.map(feats(_).size).sum.toLong
    val ns = rawDocs.values.map(feats(_).size).sum.toLong
    // The reference runs the SAME fixed-point integer log as the engine —
    // per finding 37 there is no "true double" to compare against, the
    // shared integer algorithm IS the contract.
    import graft.functions.FixedPointLog.{lnNanoRef, microOfNanoRef}
    def want(text: String): (Long, Long) = {
      val fs = feats(text)
      val lw = fs.map { b =>
        microOfNanoRef(lnNanoRef(tcounts.getOrElse(b, 0L) + 1L, nt + nB)) -
        microOfNanoRef(lnNanoRef(scounts.getOrElse(b, 0L) + 1L, ns + nB))
      }.sum
      (fs.size.toLong, lw)
    }
    val got = DomainSelection.importanceWeights(raw, target, nBuckets = nB)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    rawDocs.foreach { case (id, text) =>
      assert(got(id) === want(text), s"doc $id")
    }
  }

  test("domain-matching docs outweigh off-domain docs") {
    val w = DomainSelection.importanceWeights(raw, target, nBuckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // per-feature normalization is not applied (paper's raw log-weight):
    // compare per-feature means to remove length effects
    val n = DomainSelection.importanceWeights(raw, target, nBuckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    def mean(id: Long): Double = w(id).toDouble / n(id)
    assert(mean(1L) > mean(3L) && mean(2L) > mean(4L),
      s"spark docs should outrank cooking docs: $w")
  }

  test("resampleTopK: deterministic, bounded, keys sorted") {
    val a = DomainSelection.resampleTopK(raw, target, k = 3, nBuckets = 64)
      .as[(Long, Long, Long)].collect().toSeq
    val b = DomainSelection.resampleTopK(raw, target, k = 3, nBuckets = 64)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a === b, "identical plan must resample identically")
    assert(a.size === 3)
    assert(a.map(_._3) === a.map(_._3).sorted.reverse, "keys descending")
    // k >= corpus: everything selected
    val all = DomainSelection.resampleTopK(raw, target, k = 100, nBuckets = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(all === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("doremiStep: clipped excess, exact exp-round-lift weights, smoothing floor") {
    // Domain A: excesses [200000, −50000 → clip 0] → mean 100000.
    // Domain B: both proxy ≤ ref → excess 0.
    // f_A = round6(exp(0.1)) = 1.105171 → wraw 1105171; f_B = 1 → 1000000.
    // tot = 2105171; weight = wraw·900000 div tot + 100000 div 2.
    val df = Seq(
      ("A", 500000L, 300000L), ("A", 100000L, 150000L),
      ("B", 200000L, 200000L), ("B", 100000L, 400000L))
      .toDF("domain", "proxy", "ref")
    val got = DomainSelection.doremiStep(df, "domain", "proxy", "ref",
        etaMicro = 1000000L, smoothMicro = 100000L)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 2L, 100000L, 522481L)))
    assert(got("B") == (("B", 2L, 0L, 477518L)))
  }

  test("doremiStep: all-solved domains return to (smoothed) uniform") {
    val df = Seq(("A", 1L, 5L), ("B", 2L, 9L), ("C", 3L, 3L))
      .toDF("domain", "proxy", "ref")
    val got = DomainSelection.doremiStep(df, "domain", "proxy", "ref")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    // wraw all 10⁶, tot 3·10⁶: 10⁶·9·10⁵ div 3·10⁶ + 10⁵ div 3 = 333333
    assert(got == Map("A" -> 333333L, "B" -> 333333L, "C" -> 333333L))
  }

  test("single-token and empty-ish docs emit no bigrams and survive") {
    val tiny = Seq((10L, "one"), (11L, "two words")).toDF("doc_id", "text")
    val w = DomainSelection.importanceWeights(tiny, target, nBuckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(w(10L) === 1L) // one unigram, no bigram
    assert(w(11L) === 3L) // two unigrams + one bigram
  }
}
