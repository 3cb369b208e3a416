package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Multimodal plumbing: decode / feature-extract / resize / frame-sample.
  * Codecs are deterministic stubs (absent in this environment); what these
  * tests pin is the Spark-side contract — schemas, batch shape, fixed
  * output sizes, 1→N frame explosion, truncated-final-frame handling,
  * null payloads.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def payload(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)

  test("decode kernel: stable features, checksum, byte length; null payload safe") {
    val df = Seq(
      (1L, "image", payload(100)),
      (2L, "audio", payload(10)),
      (3L, "image", null.asInstanceOf[Array[Byte]])
    ).toDF("id", "media_type", "payload")
    val out = Multimodal.decodeKernel(df).collect().map(f => f.id -> f).toMap
    assert(out(1L).byteLen == 100 && out(1L).featureDim == 8 && out(1L).features.length == 8)
    assert(out(1L).checksum == Multimodal.checksum64(payload(100)))
    assert(out(3L).byteLen == 0L && out(3L).features.forall(_ == 0f))
    // determinism across partitionings
    val again = Multimodal.decodeKernel(df.repartition(3)).collect().map(f => f.id -> f.checksum).toMap
    assert(again == out.view.mapValues(_.checksum).toMap)
  }

  test("real image path: PNG round-trip, NN resample, channel means, corrupt bytes dropped") {
    // hand-computed reference: decode must reproduce the generator's pixels
    // exactly (PNG is lossless) and the 8x8 NN resample picks source pixel
    // (x*w/8, y*h/8)
    def expected(id: Long, w: Int, h: Int): (Double, Double, Double) = {
      var r = 0L; var g = 0L; var b = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val sx = x * w / 8; val sy = y * h / 8
        r += (id * 31 + sx * 7 + sy * 13) % 256
        g += (id * 17 + sx * 3 + sy * 5) % 256
        b += (id * 7 + sx * 11 + sy * 3) % 256
      }
      (r.toDouble / 64, g.toDouble / 64, b.toDouble / 64)
    }
    val df = Seq(
      (7L, Multimodal.syntheticPng(7L, 19, 17)),
      (8L, Multimodal.syntheticPng(8L, 16, 16)),
      (9L, "not a png at all".getBytes("UTF-8")),
      (10L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val out = Multimodal.imageFeatureKernel(df, targetW = 8, targetH = 8)
      .collect().map(f => f.id -> f).toMap
    assert(out.keySet == Set(7L, 8L), "undecodable/null payloads must be dropped")
    assert(out(7L).width == 19 && out(7L).height == 17)
    val (er, eg, eb) = expected(7L, 19, 17)
    assert(out(7L).r_mean == er && out(7L).g_mean == eg && out(7L).b_mean == eb)
    val (er8, eg8, eb8) = expected(8L, 16, 16)
    assert(out(8L).r_mean == er8 && out(8L).g_mean == eg8 && out(8L).b_mean == eb8)
  }

  test("resize kernel: fixed output dims regardless of input size") {
    val df = Seq((1L, payload(1000)), (2L, payload(7)), (3L, payload(0)))
      .toDF("id", "payload")
    val out = Multimodal.resizeKernel(df, targetW = 4, targetH = 3).collect()
      .map(r => r.id -> r).toMap
    assert(out.values.forall(r => r.pixels.length == 12 && r.width == 4 && r.height == 3))
    // nearest-neighbor stub is deterministic and length-sensitive
    assert(out(1L).checksum != out(2L).checksum)
    assert(out(3L).pixels.forall(_ == 0))
  }

  test("frame sampler: every k-th fixed-size frame, truncated tail, 1→N rows") {
    val df = Seq((1L, payload(200)), (2L, payload(64)), (3L, payload(0)))
      .toDF("id", "payload")
    val frames = Multimodal.frameSampleKernel(df, frameSize = 64, every = 3)
      .collect().groupBy(_.id)
    // 200 bytes → frames 0..3 (lens 64,64,64,8); sampled idx 0 and 3
    assert(frames(1L).map(f => (f.frameIdx, f.frameLen)).sortBy(_._1).toSeq ==
      Seq((0L, 64L), (3L, 8L)))
    assert(frames(2L).map(f => (f.frameIdx, f.frameLen)).toSeq == Seq((0L, 64L)))
    assert(!frames.contains(3L)) // empty payload → no frames
    // sampled frame checksum matches the direct slice checksum
    val direct = Multimodal.checksum64(payload(200).slice(192, 200))
    assert(frames(1L).find(_.frameIdx == 3L).get.frameChecksum == direct)
  }

  test("real audio path: WAV round-trip, JDK cross-check, corrupt bytes dropped") {
    val wav = Multimodal.syntheticWav(id = 5L, nFrames = 120, sampleRate = 16000, channels = 2)
    // cross-check the hand parser against the JDK's own WAV reader
    val jdk = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(wav))
    assert(jdk.getFormat.getChannels == 2 && jdk.getFormat.getSampleRate == 16000f)
    assert(jdk.getFrameLength == 120)
    val f = Multimodal.decodeWav(wav).get
    assert(f.channels == 2 && f.sample_rate == 16000 && f.n_frames == 120L)
    assert(f.duration_micros == 120L * 1000000L / 16000L)
    // independent feature recomputation from the closed-form sample formula
    val samples = for (i <- 0 until 120; c <- 0 until 2)
      yield math.abs(((5L * 31 + i * 7 + c * 13) % 2003 - 1001).toInt)
    assert(f.abs_sum == samples.map(_.toLong).sum && f.peak == samples.max)
    // rejection contract: truncated, non-RIFF, and null payloads drop
    assert(Multimodal.decodeWav(wav.take(40)).isEmpty)
    assert(Multimodal.decodeWav("not a wav at all, just text bytes....".getBytes).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    // kernel shape: undecodable rows silently dropped, good rows decoded
    val df = Seq((1L, Multimodal.syntheticWav(1L, 50, 8000, 1)),
      (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val out = Multimodal.audioFeatureKernel(df).collect()
    assert(out.length == 1 && out.head.id == 1L && out.head.n_frames == 50L)
  }

  test("real video path: uncompressed AVI round-trip, frame sampling, corrupt drops") {
    // odd width (5) exercises the 4-byte DIB row padding: stride 16, not 15
    val avi = Multimodal.syntheticAvi(id = 9L, frames = 7, w = 5, h = 4)
    val got = Multimodal.decodeAvi(avi, every = 2).get
    assert(got.map(_.frame_idx) == Seq(0L, 2L, 4L, 6L))
    assert(got.forall(f => f.width == 5 && f.height == 4 && f.n_frames == 7L))
    // independent recomputation from the closed-form pixel formula
    got.foreach { fr =>
      val f = fr.frame_idx
      def sum(c7: Long, c19: Long, cx: Long, cy: Long) =
        (for (x <- 0 until 5; y <- 0 until 4)
          yield (9L * c7 + f * c19 + x * cx + y * cy) % 256).sum
      assert(fr.b_sum == sum(7, 19, 11, 3), s"frame $f b")
      assert(fr.g_sum == sum(13, 5, 3, 7), s"frame $f g")
      assert(fr.r_sum == sum(31, 3, 7, 13), s"frame $f r")
    }
    // rejection contract: truncated, non-AVI, and frame-count-mismatched drop
    assert(Multimodal.decodeAvi(avi.take(60), every = 1).isEmpty)
    assert(Multimodal.decodeAvi("RIFFxxxxWAVE not an avi".getBytes, every = 1).isEmpty)
    assert(Multimodal.decodeAvi(null, every = 1).isEmpty)
    // kernel: 1 → N rows per payload, bad payload dropped
    val df = Seq((1L, Multimodal.syntheticAvi(1L, 6, 4, 4)),
      (2L, Array[Byte](82, 73))).toDF("id", "payload")
    val rows = Multimodal.videoFrameFeatureKernel(df, every = 3).collect()
    assert(rows.map(r => (r.id, r.frame_idx)).sorted.toSeq == Seq((1L, 0L), (1L, 3L)))
  }

  test("real compressed-video path: MJPEG AVI decodes within JPEG tolerance") {
    val (w, h) = (16, 8)
    val avi = Multimodal.syntheticMjpegAvi(id = 9L, frames = 7, w = w, h = h)
    val got = Multimodal.decodeMjpegAvi(avi, every = 2).get
    assert(got.map(_.frame_idx) == Seq(0L, 2L, 4L, 6L))
    assert(got.forall(f => f.width == w && f.height == h && f.n_frames == 7L))
    // lossy-codec contract: per-channel MEAN within quantization tolerance
    // of the solid fixture color (structure above is exact)
    val n = w * h
    got.foreach { fr =>
      val f = fr.frame_idx
      def near(sum: Long, want: Long) = math.abs(sum.toDouble / n - want) <= 6.0
      assert(near(fr.r_sum, (9L * 31 + f * 3) % 256), s"frame $f r")
      assert(near(fr.g_sum, (9L * 13 + f * 5) % 256), s"frame $f g")
      assert(near(fr.b_sum, (9L * 7 + f * 19) % 256), s"frame $f b")
    }
    // codec cross-rejection: DIB frames are not MJPEG and vice versa
    val dib = Multimodal.syntheticAvi(1L, 3, 4, 4)
    assert(Multimodal.decodeMjpegAviDetail(dib, 1) == Left("not_mjpeg"))
    assert(Multimodal.decodeAviDetail(avi, 1) == Left("not_uncompressed_24bit"))
    // a frame that starts like a JPEG but is cut off quarantines
    val wholeJpeg = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val cutAvi = Multimodal.buildAvi(
      Seq(java.util.Arrays.copyOf(wholeJpeg, 24)), 4, 4, "00dc")
    assert(Multimodal.decodeMjpegAviDetail(cutAvi, 1) == Left("jpeg_undecodable"))
    // kernel: 1 → N rows, id threaded through
    val df = Seq((5L, Multimodal.syntheticMjpegAvi(5L, 6, 8, 8))).toDF("id", "payload")
    val rows = Multimodal.mjpegFrameFeatureKernel(df, every = 3).collect()
    assert(rows.map(r => (r.id, r.frame_idx)).sorted.toSeq == Seq((5L, 0L), (5L, 3L)))
  }

  test("audio quarantine: every payload is decoded or accounted for with a reason") {
    val valid = Multimodal.syntheticWav(1L, 50, 8000, 1)
    val truncated = java.util.Arrays.copyOf(valid, 30)
    val nonPcm = Multimodal.syntheticWav(3L, 50, 8000, 1).clone()
    nonPcm(20) = 2 // audioFormat := 2 — the compressed stand-in
    val junk = ("MP3 compressed bytes here " * 3).getBytes("US-ASCII") // >= 44 bytes, no RIFF tag
    val df = Seq(
      (1L, valid), (2L, truncated), (3L, nonPcm), (4L, junk), (5L, null)
    ).toDF("id", "payload")
    val (good, bad) = Multimodal.audioFeatureKernelWithQuarantine(df)
    assert(good.collect().map(_.id).toSeq == Seq(1L))
    val q = bad.collect().map(r => r.id -> r).toMap
    assert(q.keySet == Set(2L, 3L, 4L, 5L), "good + quarantined partition the input")
    assert(q(2L).reason == "too_short" && q(2L).byte_len == 30L)
    assert(q(3L).reason == "not_pcm16")
    assert(q(4L).reason == "not_riff")
    assert(q(5L).reason == "null_payload" && q(5L).byte_len == 0L)
    // checksum kept for replay accounting
    assert(q(2L).checksum == Multimodal.checksum64(truncated))
  }

  test("image quarantine: corrupt bytes carry a reason instead of vanishing") {
    val png = Multimodal.syntheticPng(7L, 4, 4)
    val df = Seq(
      (1L, png), (2L, Array[Byte](1, 2, 3)), (3L, null)
    ).toDF("id", "payload")
    val (good, bad) = Multimodal.imageFeatureKernelWithQuarantine(df, 4, 4)
    assert(good.collect().map(_.id).toSeq == Seq(1L))
    val q = bad.collect().map(r => r.id -> r.reason).toMap
    assert(q == Map(2L -> "undecodable", 3L -> "null_payload"))
  }

  test("video quarantine: compressed/truncated streams quarantine, frames still explode") {
    val avi = Multimodal.syntheticAvi(1L, 5, 4, 4)
    // fake a compressed stream: halve a frame's declared size field so the
    // DIB size check fails (what JPEG-in-AVI looks like to this parser)
    val compressed = Multimodal.syntheticAvi(2L, 2, 4, 4).clone()
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 2)
    val df = Seq(
      (1L, avi), (2L, truncated), (3L, "notaviatall".getBytes("US-ASCII"))
    ).toDF("id", "payload")
    val (good, bad) = Multimodal.videoFrameFeatureKernelWithQuarantine(df, every = 3)
    assert(good.collect().map(r => (r.id, r.frame_idx)).sorted.toSeq ==
      Seq((1L, 0L), (1L, 3L)), "good side still 1→N frame rows")
    val q = bad.collect().map(r => r.id -> r.reason).toMap
    assert(q(2L) == "truncated" && q(3L) == "too_short")
    // values agree with the drop-variant kernels
    assert(Multimodal.decodeAviDetail(compressed, 3).isRight)
  }

  test("dHash: brightness-shifted near-dup lands within threshold, strangers far apart") {
    val base = Multimodal.syntheticPngTextured(42L, 18, 17, 0)
    val bright = Multimodal.syntheticPngTextured(42L, 18, 17, 4)
    val other = Multimodal.syntheticPngTextured(43L, 18, 17, 0)
    val Right((w, h, hiA, loA)) = Multimodal.dHashDetail(base)
    val Right((_, _, hiB, loB)) = Multimodal.dHashDetail(bright)
    val Right((_, _, hiC, loC)) = Multimodal.dHashDetail(other)
    assert(w == 18 && h == 17)
    // halves stay unsigned 32-bit (the BIGINT-safe contract)
    Seq(hiA, loA, hiB, loB, hiC, loC).foreach(v => assert(v >= 0L && v < (1L << 32)))
    def ham(h1: Long, l1: Long, h2: Long, l2: Long) =
      java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(ham(hiA, loA, hiB, loB) <= 10, "brightness shift must keep gradient signs")
    assert(ham(hiA, loA, hiC, loC) > 16, "different image must hash far away")
    // corrupt bytes fail loudly, not silently
    assert(Multimodal.dHashDetail("notapng".getBytes("US-ASCII")) == Left("undecodable"))
  }

  test("audio fingerprint: amplitude-scaled re-rip lands near, strangers far, short clips reject") {
    val base = Multimodal.syntheticWavTextured(42L, 120, 8000, 2)
    val scaled = Multimodal.syntheticWavTextured(42L, 120, 8000, 2, scaleNum = 7, scaleDen = 8)
    val other = Multimodal.syntheticWavTextured(43L, 120, 8000, 2)
    val Right((ch, nf, hiA, loA)) = Multimodal.wavFingerprintDetail(base)
    val Right((_, _, hiB, loB)) = Multimodal.wavFingerprintDetail(scaled)
    val Right((_, _, hiC, loC)) = Multimodal.wavFingerprintDetail(other)
    assert(ch == 2 && nf == 120L)
    Seq(hiA, loA, hiB, loB, hiC, loC).foreach(v => assert(v >= 0L && v < (1L << 32)))
    def ham(h1: Long, l1: Long, h2: Long, l2: Long) =
      java.lang.Long.bitCount(h1 ^ h2) + java.lang.Long.bitCount(l1 ^ l2)
    assert(ham(hiA, loA, hiB, loB) <= 10, "amplitude scale must keep energy order")
    assert(ham(hiA, loA, hiC, loC) > 16, "different clip must fingerprint far away")
    assert(Multimodal.wavFingerprintDetail(
      Multimodal.syntheticWavTextured(1L, 40, 8000, 1)) == Left("too_few_frames"))
    assert(Multimodal.wavFingerprintDetail("junk".getBytes("US-ASCII")) == Left("too_short"))
  }

  test("audio silence profile: matches an independent sample-level reference") {
    // Independent reference: regenerate the samples from the closed form
    // and count silent windows directly — certifies the kernel's chunk
    // walk, window rule and cross-multiplied threshold in one shot.
    def refSilent(id: Long, nf: Int, ch: Int, ksil: Int, nw: Int, thr: Int): Int = {
      val q = id / 2003
      val energy = new Array[Long](nw); val sizes = new Array[Long](nw)
      for (i <- 0 until nf; c <- 0 until ch) {
        val w = (i.toLong * nw / nf).toInt
        sizes(w) += 1
        val silent = (i.toLong * 50 / nf).toInt < ksil
        if (!silent) {
          val raw = (((id * 2 + 1) * (i.toLong * i * 5 + i * 3 + c * 17 + 7) +
            q * (i.toLong * i * 3 + i * 11 + 1)) % 2003).toInt
          energy(w) += math.abs(raw - 1001)
        }
      }
      (0 until nw).count(w => energy(w) < thr.toLong * sizes(w))
    }
    for ((id, nf, ch, ksil) <- Seq((7L, 123, 2, 15), (8L, 100, 1, 0),
        (9L, 149, 2, 50), (2040L, 137, 1, 20))) {
      val wav = Multimodal.syntheticWavSilence(id, nf, 8000, ch, ksil)
      val Right((gotCh, gotNf, nw, ns)) = Multimodal.wavSilenceDetail(wav)
      assert(gotCh == ch && gotNf == nf.toLong && nw == 50)
      assert(ns == refSilent(id, nf, ch, ksil, 50, 10), s"id=$id")
    }
    // all-silent clip: every window silent
    val Right((_, _, _, all)) = Multimodal.wavSilenceDetail(
      Multimodal.syntheticWavSilence(3L, 100, 8000, 1, 50))
    assert(all == 50)
    // fewer frames than windows → quarantine
    assert(Multimodal.wavSilenceDetail(
      Multimodal.syntheticWavSilence(3L, 40, 8000, 1, 0)) == Left("too_few_frames"))
  }

  test("audio silence kernel is a stateless stream stage: stream rows == batch rows") {
    // mapPartitions with no state — the kernel must run unchanged on a
    // live ingest stream (the upload-screening shape).
    implicit val sqlCtx = spark.sqlContext
    val clips = Seq(
      (1L, Multimodal.syntheticWavSilence(1L, 100, 8000, 1, 10)),
      (2L, Multimodal.syntheticWavSilence(2L, 120, 8000, 2, 45)),  // mostly silent
      (3L, "not a wav".getBytes("US-ASCII")))                      // quarantined
    val batch = Multimodal.audioSilenceKernel(clips.toDF("id", "payload"))
      .collect().toSet
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.audioSilenceKernel(input.toDS().toDF("id", "payload"))
      .writeStream.format("memory").queryName("ssilence").outputMode("append").start()
    try {
      input.addData(clips: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssilence")
        .as[Multimodal.AudioSilence].collect().toSet
      assert(streamed == batch && batch.map(_.id) == Set(1L, 2L))
    } finally q.stop()
  }

  test("audio fingerprint pairs: the image-path banded join serves audio unchanged") {
    val rows = (0L until 20L).map(i =>
      (i, Multimodal.syntheticWavTextured(i, 100 + (i % 7).toInt, 8000, 1))) :+
      ((100L, Multimodal.syntheticWavTextured(3L, 103, 8000, 1, 7, 8)))
    val df = rows.toDF("id", "payload")
    val fps = Multimodal.audioFingerprintKernel(df).toDF()
      .select($"id", $"dhash_hi", $"dhash_lo")
    val pairs = Multimodal.dHashNearDupPairs(fps, maxHamming = 10)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).contains((3L, 100L)), s"planted pair missing: ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 10))
  }

  test("video fingerprint: brightness-shifted re-encode pairs with its source relationally") {
    val rows = (0L until 12L).map(i =>
      (i, Multimodal.syntheticAviTextured(i, 65, 4, 4, 0))) :+
      ((100L, Multimodal.syntheticAviTextured(5L, 65, 4, 4, 4)))
    val df = rows.toDF("id", "payload")
    val frames = Multimodal.videoFrameFeatureKernel(df, every = 1).toDF()
      .select($"id", $"frame_idx", ($"r_sum" + $"g_sum" + $"b_sum").as("gray"))
    val fps = Multimodal.temporalFingerprint(frames, "id", "frame_idx", "gray")
    // halves honor the unsigned-32-bit BIGINT-safe contract
    fps.as[(Long, Long, Long)].collect().foreach { case (_, hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
    val pairs = Multimodal.dHashNearDupPairs(fps, maxHamming = 10)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).contains((5L, 100L)), s"planted pair missing: ${pairs.toSeq}")
  }

  test("dHash near-dup pairs: banded join surfaces exactly the planted pair") {
    val gen = (gid: Long, w: Int, h: Int, br: Int) => Multimodal.syntheticPngTextured(gid, w, h, br)
    // 20 distinct images plus one brightness-shifted copy of id 3 as id 100.
    val rows = (0L until 20L).map(i => (i, gen(i, 16 + (i % 5).toInt, 16, 0))) :+
      ((100L, gen(3L, 19, 16, 4)))
    val df = rows.toDF("id", "payload")
    val hashes = Multimodal.imageDHashKernel(df).toDF()
    val pairs = Multimodal.dHashNearDupPairs(hashes, maxHamming = 10)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2))
    assert(pairs.map(p => (p._1, p._2)).contains((3L, 100L)), s"planted pair missing: ${pairs.toSeq}")
    // threshold respected on every returned pair
    assert(pairs.forall(_._3 <= 10))
  }
}
