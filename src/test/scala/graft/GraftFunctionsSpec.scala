package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.SigKernels

/** SQL-surface registration: the runtime path (existing session) and the
  * extensions path (new session over the shared SparkContext) expose the
  * same kernels, with values identical to the Column API.
  */
class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("runtime registration exposes kernels to spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_l2distsq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2, " +
        "word_ngram_count('a b c d', 2) AS n2, " +
        "graft_fingerprint('abc') AS fp, " +
        "word_ngram_fps('a b c', 2) AS fps, " +
        "luhn_valid('4539 1488 0343 6467') AS card_ok, " +
        "luhn_valid('1234 5678 9012 3456') AS card_bad").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 3)
    assert(r.getSeq[Long](4).length == 2, "two 2-grams of a 3-token text")
    assert(r.getBoolean(5) && !r.getBoolean(6))
    val web = spark.sql(
      "SELECT html_to_text('<p>a &amp; b</p><script>x</script>') AS t, " +
        "url_scheme('HTTP://Ex.COM/p') AS sch, url_host('HTTP://Ex.COM:8080/p') AS h, " +
        "url_port('HTTP://Ex.COM:8080/p') AS p, url_path('http://e.co') AS pa, " +
        "url_query('http://e.co/x?a=1#f') AS q, " +
        "url_normalize('HTTP://Ex.COM:80/p#f') AS n, " +
        "registered_domain('a.b.news.co.uk') AS rd").head()
    assert(web.getString(0) == "a & b")
    assert(web.getString(1) == "http" && web.getString(2) == "ex.com")
    assert(web.getLong(3) == 8080L && web.getString(4) == "/")
    assert(web.getString(5) == "a=1")
    assert(web.getString(6) == "http://ex.com/p")
    assert(web.getString(7) == "news.co.uk")
    // fingerprint matches the Column-API kernel
    val viaCol = Seq("abc").toDF("t")
      .select(graft.functions.TextKernels.polyFingerprint($"t")).as[Long].head()
    assert(r.getLong(3) == viaCol)
  }

  test("SQL minhash signature equals the Column-API signature") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    df.createOrReplaceTempView("gfs_docs")
    val viaSql = spark.sql(
      "SELECT minhash_murmur_sig(text, 3, 64) AS sig FROM gfs_docs")
      .as[Seq[Int]].head()
    val viaApi = df.select(SigKernels.minhashMurmur($"text").as("sig"))
      .as[Seq[Int]].head()
    assert(viaSql == viaApi)
  }

  test("non-literal int parameters fail at analysis, not execution") {
    GraftFunctions.register(spark)
    Seq((1, "x")).toDF("n", "text").createOrReplaceTempView("gfs_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngram_count(text, n) FROM gfs_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("spark.sql.extensions route registers the same set on a new session") {
    // A second session over the SAME SparkContext: clear the default so the
    // builder constructs a fresh session with extensions applied, then
    // restore. Never stop s2 — it shares the context with every other spec.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT vec_dot(array(2.0d), array(3.0d)) AS d").head().getDouble(0)
      assert(d == 6.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
