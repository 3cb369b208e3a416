package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 16-dim corpus with cluster structure: 4 base directions + per-row jitter.
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    (0 until 200).map { i =>
      val b = bases(i % 4)
      (i.toLong, b.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pq codes are m indices within the codebook range and deterministic") {
    val books = Similarity.trainPqCodebooks(corpus, m = 4, k = 8, sampleN = 128)
    assert(books.length == 4 && books.forall(_.length == 8) && books.forall(_.forall(_.length == 4)))
    val coded = Similarity.withPqCode(corpus, books)
    val codes = coded.select($"pq_code").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(i => i >= 0 && i < 8)))
    val codes2 = Similarity.withPqCode(corpus.repartition(5), books)
      .select($"vec_id", $"pq_code").as[(Long, Seq[Int])].collect().toMap
    val codes1 = coded.select($"vec_id", $"pq_code").as[(Long, Seq[Int])].collect().toMap
    assert(codes1 == codes2)
  }

  test("refined pq top-k surfaces an exact corpus vector as its own best match") {
    val books = Similarity.trainPqCodebooks(corpus, m = 4, k = 8, sampleN = 128)
    val coded = Similarity.withPqCode(corpus, books)
    val q = corpus.filter($"vec_id" === 42L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head().toArray
    val top = Similarity.pqTopKRefined(coded, q, books, k = 5, shortlist = 40)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 42L, s"self-match not first: ${top.toSeq}")
    assert(math.abs(top.head._2 - 1.0) < 1e-9)
  }

  test("ivf-pq: pruning + compression still surfaces the planted source") {
    val books = Similarity.trainPqCodebooks(corpus, m = 4, k = 8, sampleN = 128)
    val cents = Similarity.trainIvfCentroids(corpus, k = 4, sampleN = 128)
    val prepared = Similarity.withPqCode(
      Similarity.withIvfCell(corpus, cents), books).localCheckpoint()
    val qs = Similarity.perturbedQueries(corpus, n = 5)
    val multi = Similarity.ivfPqTopKMulti(prepared, qs, cents, books,
        k = 5, nprobe = 2, shortlist = 40)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    qs.foreach { case (qid, v) =>
      assert(multi(qid).head == qid, s"qid $qid missing its planted source")
      val single = Similarity.ivfPqTopK(prepared, v, cents, books,
          k = 5, nprobe = 2, shortlist = 40)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(multi(qid) == single)
    }
  }

  test("batched multi-query pq matches the single-query form") {
    val books = Similarity.trainPqCodebooks(corpus, m = 4, k = 8, sampleN = 128)
    val coded = Similarity.withPqCode(corpus, books).localCheckpoint()
    val qs = Similarity.perturbedQueries(corpus, n = 3)
    val multi = Similarity.pqTopKMulti(coded, qs, books, k = 5, shortlist = 40)
      .select($"qid", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._3).map(_._2).toSeq }
    qs.foreach { case (qid, v) =>
      val single = Similarity.pqTopKRefined(coded, v, books, k = 5, shortlist = 40)
        .as[(Long, Double)].collect().map(_._1).toSeq
      assert(multi(qid) == single, s"qid $qid: ${multi(qid)} vs $single")
    }
    // every perturbed query finds its planted source at rank 1
    qs.foreach { case (qid, _) => assert(multi(qid).head == qid) }
  }
}
