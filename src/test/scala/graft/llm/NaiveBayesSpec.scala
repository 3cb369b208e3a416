package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed weights on a two-class corpus") {
    // train: class a = "x x y", class b = "z". Vocab {x, y, z}, V = 3.
    // t_a = 3, t_b = 1.
    // wt(a,x) = ln(3/6), wt(a,y) = ln(2/6), wt(a,z) = ln(1/6)
    // wt(b,x) = ln(1/4), wt(b,y) = ln(1/4), wt(b,z) = ln(2/4)
    val train = Seq(("a", "x x y"), ("b", "z")).toDF("label", "text")
    val m = NaiveBayes.trainModel(train, "label", "text")
    val wts = m.model.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    def micro(x: Double) = math.round(math.log(x) * 1e6)
    assert(wts(("a", "x")) === micro(3.0 / 6))
    assert(wts(("a", "y")) === micro(2.0 / 6))
    assert(wts(("a", "z")) === micro(1.0 / 6))
    assert(wts(("b", "z")) === micro(2.0 / 4))
    val cls = m.classes.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(cls("a")._1 === micro(0.5)) // priors: 1 doc each
    assert(cls("a")._2 === micro(1.0 / 6)) // unseen_a = ln(1/(3+3))
    assert(cls("b")._2 === micro(1.0 / 4))
  }

  test("separable classes predict perfectly; OOV-only doc falls to prior+unseen") {
    val train = Seq(
      ("sport", "goal match team goal"), ("sport", "team match win"),
      ("tech", "code spark bug"), ("tech", "bug code deploy code"))
      .toDF("label", "text")
    val m = NaiveBayes.trainModel(train, "label", "text")
    val test = Seq(
      (1L, "goal team"), (2L, "code bug"), (3L, "qqq www")).toDF("id", "text")
    val got = NaiveBayes.classify(test, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "sport")
    assert(got(2L) === "tech")
    // OOV-only: scores = prior + 2·unseen per class; both priors equal
    // (2 docs each), unseen_sport = ln(1/(7+V)) vs unseen_tech =
    // ln(1/(7+V)) — t_sport = t_tech = 7, so a TIE → smallest label.
    assert(got(3L) === "sport")
  }

  test("an empty document still predicts: one OOV token -> prior + unseen") {
    // tokensWs("") == [""] (the DuckDB string_split_regex contract too),
    // so an empty doc scores one unseen token per class. Here both
    // classes have equal priors and totals → exact tie → smallest label.
    val train = Seq(("a", "x"), ("b", "y")).toDF("label", "text")
    val m = NaiveBayes.trainModel(train, "label", "text")
    val test = Seq((1L, "x"), (2L, "")).toDF("id", "text")
    val got = NaiveBayes.classify(test, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "a")
    assert(got(2L) === "a")
  }

  test("scores are exact integer sums: repartitioning never changes output") {
    val train = Seq(("a", "x x y z w"), ("b", "z w q x"), ("a", "y y x"))
      .toDF("label", "text")
    val m = NaiveBayes.trainModel(train, "label", "text")
    val test = (0L until 50L).map(i => (i, s"x y z w q unseen$i")).toDF("id", "text")
    val r1 = NaiveBayes.classify(test, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val r2 = NaiveBayes.classify(test.repartition(7), "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(r1 === r2)
  }
}
