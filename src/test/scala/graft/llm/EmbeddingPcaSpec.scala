package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PCA: Jacobi eigensolver against closed forms, fitted components on a
  * known-covariance fixture, projection kernel values, artifact
  * round-trip.
  */
class EmbeddingPcaSpec extends SparkTestBase {

  test("jacobi solves a hand-computable symmetric matrix") {
    // [[2,1],[1,2]] → eigenvalues 3 (along (1,1)/√2) and 1 (along (1,-1)/√2)
    val (evals, evecs) = EmbeddingPca.jacobi(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = (0 until 2).sortBy(i => -evals(i))
    assert(math.abs(evals(order(0)) - 3.0) < 1e-12)
    assert(math.abs(evals(order(1)) - 1.0) < 1e-12)
    val v0 = evecs(order(0))
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12) // (1,1) direction
  }

  test("fit recovers the dominant axis; components orthonormal; variances sorted") {
    val s = spark; import s.implicits._
    // Variance 5 along e1, 0.5 along e2, zero elsewhere; zero mean.
    val rows = Seq(
      Array(3f, 1f, 0f, 0f), Array(3f, -1f, 0f, 0f),
      Array(-3f, 1f, 0f, 0f), Array(-3f, -1f, 0f, 0f),
      Array(1f, 0f, 0f, 0f), Array(-1f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f), Array(0f, 0f, 0f, 0f))
    val df = rows.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("vec_id", "embedding")
    val m = EmbeddingPca.fit(df, dims = 2)
    assert(m.mean.forall(v => math.abs(v) < 1e-12))
    // top component = ±e1 normalized to +: (1,0,0,0)
    assert(math.abs(m.components(0)(0) - 1.0) < 1e-9, s"${m.components(0)}")
    assert(m.components(0).drop(1).forall(v => math.abs(v) < 1e-9))
    assert(math.abs(m.components(1)(1) - 1.0) < 1e-9)
    // variances: e1 var = mean(x²) = (9·4 + 1·2)/8 = 4.75; e2 = 4/8 = 0.5
    assert(math.abs(m.variances(0) - 4.75) < 1e-9)
    assert(math.abs(m.variances(1) - 0.5) < 1e-9)
    assert(m.variances(0) >= m.variances(1))
    // orthonormal rows
    val dot = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-9)
  }

  test("transform projects through the kernel; identical inputs stay identical") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array(2f, 3f, 0f, 0f)),
      (2L, Array(2f, 3f, 0f, 0f)),  // identical copy
      (3L, Array(-1f, 5f, 0f, 0f))).toDF("vec_id", "embedding")
    val m = EmbeddingPca.Model(
      mean = Seq(1.0, 1.0, 0.0, 0.0),
      components = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0)),
      variances = Seq(2.0, 1.0))
    val got = df.select($"vec_id",
        EmbeddingPca.transform($"embedding", m).as("p"))
      .as[(Long, Seq[Float])].collect().map(r => r._1 -> r._2).toMap
    assert(got(1L) == Seq(1f, 2f)) // (2-1, 3-1)
    assert(got(3L) == Seq(-2f, 4f))
    assert(got(1L) == got(2L))
  }

  test("topKMulti: planted twin always surfaces; ranks dense from 1") {
    val s = spark; import s.implicits._
    // 40 deterministic 8-dim vectors; query = vector 5 exactly → its twin
    // must be rank 1 with cosine ~1 even through a 3-dim projection.
    val df = (0 until 40).map(i =>
        (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val m = EmbeddingPca.fit(df, dims = 3)
    val q5 = Array.tabulate(8)(j => ((5 * 7 + j * 3) % 11 - 5).toDouble)
    val out = EmbeddingPca.topKMulti(df, Seq((5L, q5)), m, k = 5, shortlist = 15)
      .orderBy($"rank").select($"vec_id", $"cosine", $"rank")
      .as[(Long, Double, Int)].collect()
    assert(out.length == 5)
    assert(out.head._1 == 5L && math.abs(out.head._2 - 1.0) < 1e-12)
    assert(out.map(_._3).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("save/load round-trips the model exactly") {
    val s = spark; import s.implicits._
    val df = (0 until 32).map(i =>
        (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
      .toDF("vec_id", "embedding")
    val m = EmbeddingPca.fit(df, dims = 3)
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    EmbeddingPca.save(spark, m, s"$dir/model")
    val loaded = EmbeddingPca.load(spark, s"$dir/model")
    assert(loaded == m)
  }
}
