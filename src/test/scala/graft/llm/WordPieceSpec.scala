package graft.llm

import graft.SparkTestBase
import graft.functions.{WordPieceImpl, WordPieceKernels}
import org.apache.spark.sql.functions._

/** WordPiece: greedy applier vs a brute-force reference, trainer vs a
  * from-scratch recount reference (the incremental updates must never
  * drift), UNK semantics, artifact round trip, kernel == impl on a
  * DataFrame.
  */
class WordPieceSpec extends SparkTestBase {

  // ---- apply ----

  /** Brute-force greedy reference: longest prefix by trying every length
    * explicitly against the vocab set.
    */
  private def refSegment(word: String, vocab: Set[String], unk: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val cps = word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < cps.length) {
      var found: Option[(String, Int)] = None
      var e = cps.length
      while (found.isEmpty && e > i) {
        val body = cps.slice(i, e).mkString
        val cand = if (i == 0) body else "##" + body
        if (vocab.contains(cand)) found = Some((cand, e))
        e -= 1
      }
      found match {
        case None => return Seq(unk)
        case Some((p, end)) => out += p; i = end
      }
    }
    out.toSeq
  }

  private def table(vocab: Seq[String]) = WordPieceImpl.tableOf(vocab, "[UNK]")

  test("greedy longest-match: textbook BERT example shape") {
    val v = Seq("un", "##aff", "##able", "##ab", "##le", "a", "##f", "u", "##n")
    assert(WordPieceImpl.segment("unaffable", table(v)).toSeq ===
      Seq("un", "##aff", "##able"))
  }

  test("whole word collapses to [UNK] when any position is uncoverable") {
    val v = Seq("a", "##b")
    assert(WordPieceImpl.segment("abz", table(v)).toSeq === Seq("[UNK]"))
    assert(WordPieceImpl.segment("zab", table(v)).toSeq === Seq("[UNK]"))
    assert(WordPieceImpl.segment("ab", table(v)).toSeq === Seq("a", "##b"))
  }

  test("fuzz: kernel segment == brute-force reference on random vocab/words") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 0 until 500) {
      val alphabet = "abc"
      def piece(n: Int) = (0 until n).map(_ => alphabet.charAt(rnd.nextInt(3))).mkString
      val plain = (0 until rnd.nextInt(6)).map(_ => piece(1 + rnd.nextInt(3)))
      val cont = (0 until rnd.nextInt(6)).map(_ => "##" + piece(1 + rnd.nextInt(3)))
      val singles = (0 until rnd.nextInt(4)).flatMap(_ => {
        val c = piece(1); Seq(c, "##" + c)
      })
      val vocab = (plain ++ cont ++ singles).distinct
      if (vocab.nonEmpty) {
        val word = piece(rnd.nextInt(10))
        val got = WordPieceImpl.segment(word, table(vocab)).toSeq
        val want = refSegment(word, vocab.toSet, "[UNK]")
        assert(got === want, s"word=[$word] vocab=${vocab.mkString("|")}")
      }
    }
  }

  test("surrogate pairs never split: supplementary chars as pieces") {
    val emoji = new String(Character.toChars(0x1F600)) // 2 chars, 1 cp
    val v = Seq(emoji, "##" + emoji, "a", "##a")
    assert(WordPieceImpl.segment(s"a$emoji", table(v)).toSeq ===
      Seq("a", "##" + emoji))
    assert(WordPieceImpl.segment(s"$emoji$emoji", table(v)).toSeq ===
      Seq(emoji, "##" + emoji))
  }

  // ---- train ----

  /** From-scratch reference trainer: re-derives segmentations, pair and
    * symbol counts every round (no incremental state), exact BigInt
    * argmax. The incremental trainer must match it merge for merge.
    */
  private def refTrain(vocab: Array[(String, Long)], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    def syms(w: String, merges: Seq[(String, String)]): Array[String] = {
      var s = w.codePoints().toArray.zipWithIndex.map { case (cp, i) =>
        val c = new String(Character.toChars(cp))
        if (i == 0) c else "##" + c
      }
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
            out += (a + (if (b.startsWith("##")) b.substring(2) else b)); j += 2
          } else { out += s(j); j += 1 }
        }
        s = out.toArray
      }
      s
    }
    var merges = Vector.empty[(String, String)]
    var stop = false
    while (merges.size < numMerges && !stop) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val sc = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (w, n) =>
        val s = syms(w, merges)
        s.foreach(x => sc.update(x, sc.getOrElse(x, 0L) + n))
        (0 until s.length - 1).foreach { i =>
          val k = (s(i), s(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + n)
        }
      }
      val live = pc.filter(_._2 >= minCount).toSeq
      if (live.isEmpty) stop = true
      else {
        val best = live.reduceLeft { (x, y) =>
          val sx = BigInt(x._2) * BigInt(sc(y._1._1)) * BigInt(sc(y._1._2))
          val sy = BigInt(y._2) * BigInt(sc(x._1._1)) * BigInt(sc(x._1._2))
          val c = sx.compare(sy)
          if (c > 0) x
          else if (c < 0) y
          else if ((x._1._1 + " " + x._1._2).compareTo(y._1._1 + " " + y._1._2) <= 0) x
          else y
        }
        merges = merges :+ best._1
      }
    }
    merges
  }

  test("trainer picks likelihood gain, not raw frequency") {
    // "ab" occurs 10× but a,b are very common (also appear alone);
    // "xy" occurs 4× and x,y occur nowhere else — score favors xy:
    //   score(ab) = 10/(c_a·c_b) with c_a,c_b ≥ 14; score(xy) = 4/(4·4).
    val vocab = Array(("ab", 10L), ("a", 30L), ("b", 30L), ("xy", 4L))
    val m = WordPiece.trainInMemory(vocab, 1, 2L)
    assert(m === Seq(("x", "##y")))
  }

  test("incremental trainer == from-scratch reference on random corpora") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 0 until 30) {
      val nWords = 3 + rnd.nextInt(10)
      val vocab = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(5)
        val w = (0 until len).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString
        (w, (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray.sortBy(_._1)
      val merges = 1 + rnd.nextInt(6)
      val got = WordPiece.trainInMemory(vocab, merges, 2L)
      val want = refTrain(vocab, merges, 2L)
      assert(got === want, s"trial=$trial vocab=${vocab.mkString(",")}")
    }
  }

  test("distributed word counts → trained merges → vocab applies end to end") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(8)("the then there era on onto").toDF("text")
    val merges = WordPiece.train(df, numMerges = 4, minCount = 2)
    assert(merges.size === 4)
    val alphabet = "theonra".map(_.toString).distinct
    val vocab = WordPiece.vocabOf(merges, alphabet)
    // Every corpus word must segment without UNK (full alphabet coverage).
    val counts = df.select(WordPiece.tokenCount(col("text"), vocab).as("n"))
      .as[Int].collect()
    assert(counts.forall(_ > 0))
    val toks = df.limit(1)
      .select(WordPiece.tokens(col("text"), vocab)).as[Seq[String]].head()
    assert(!toks.contains("[UNK]"))
  }

  test("decode inverts tokens up to whitespace normalization (corpus round trip)") {
    val s = spark
    import s.implicits._
    val vocab = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)) ++
      Seq("th", "##th", "er", "##er", "on", "##on")
    val texts = Seq("the quick brown fox", "  padded   spacing\tacross words ",
      "thththerer on on", "x")
    val got = texts.toDF("text")
      .select(col("text"),
        WordPiece.decode(WordPiece.tokens(col("text"), vocab)).as("rt"))
      .as[(String, String)].collect().toMap
    texts.foreach { t =>
      val want = t.trim.split("\\s+").mkString(" ")
      assert(got(t) === want, s"text=[$t]")
    }
  }

  test("decode leaves [UNK] tokens visible (a lossy word stays flagged)") {
    val s = spark
    import s.implicits._
    val vocab = Seq("a", "##a", "b", "##b")
    val got = Seq("ab zq ab").toDF("text")
      .select(WordPiece.decode(WordPiece.tokens(col("text"), vocab)))
      .as[String].head()
    assert(got === "ab [UNK] ab")
  }

  test("vocab artifact round trip") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    val vocab = Seq("a", "##a", "ab", "##ab", "b", "##b")
    WordPiece.saveVocab(s, vocab, s"$dir/v.parquet")
    assert(WordPiece.loadVocab(s, s"$dir/v.parquet") === vocab)
  }

  test("Column kernels run over a DataFrame inside codegen") {
    val s = spark
    import s.implicits._
    val vocab = ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)) ++
      Seq("th", "##th", "er", "##er", "on", "##on")
    val df = Seq((1L, "the zther on"), (2L, "")).toDF("id", "text")
    val got = df.select($"id",
        WordPieceKernels.wordpieceTokenCount($"text", vocab).as("n"),
        array_join(WordPieceKernels.wordpieceTokens($"text", vocab), " ").as("t"))
      .orderBy($"id").collect()
    // "the" → th ##e (2), "zther" → z ##th ##er (3), "on" → on (1)
    assert(got(0).getInt(1) === 6)
    assert(got(0).getString(2) === "th ##e z ##th ##er on")
    assert(got(1).getInt(1) === 0)
  }
}
