package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TokenShardsSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = Seq(
    (0L, 0L, Array(1, 2, 3)),
    (0L, 1L, Array(4, 5)),
    (1L, 0L, Array(7)),
    (2L, 0L, Array.empty[Int]),
    (2L, 1L, Array(9, 10, 11, 12))
  ).toDF("shard", "chunk", "tokens")

  test("write + read round-trips shards, order and token values exactly") {
    val dir = Files.createTempDirectory("graft-gtok").toFile.getAbsolutePath
    val manifest = TokenShards.write(fixture, dir)
      .select(col("shard").cast("long"), col("path"), col("n_sequences"),
        col("n_tokens"), col("crc32"))
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(manifest === Map(0L -> ((2L, 5L)), 1L -> ((1L, 1L)), 2L -> ((2L, 4L))))

    val back = TokenShards.read(spark, dir)
      .select(col("shard").cast("long"), col("seq_idx"), col("tokens"))
      .as[(Long, Long, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(back === Map(
      (0L, 0L) -> Seq(1, 2, 3), (0L, 1L) -> Seq(4, 5),
      (1L, 0L) -> Seq(7),
      (2L, 0L) -> Seq.empty, (2L, 1L) -> Seq(9, 10, 11, 12)))
  }

  test("seq_idx follows the orderCols sort, not input order") {
    val dir = Files.createTempDirectory("graft-gtok").toFile.getAbsolutePath
    val scrambled = Seq(
      (0L, 2L, Array(30)), (0L, 0L, Array(10)), (0L, 1L, Array(20))
    ).toDF("shard", "chunk", "tokens")
    TokenShards.write(scrambled, dir)
    val back = TokenShards.read(spark, dir)
      .select(col("seq_idx"), col("tokens")(0).as("t0"))
      .as[(Long, Int)].collect().toMap
    assert(back === Map(0L -> 10, 1L -> 20, 2L -> 30))
  }

  test("a flipped payload byte fails the trailer checksum in decode") {
    // decode() exercised directly: through the Spark read path the local
    // filesystem's own .crc sidecar fires first (defense in depth — on a
    // checksum-free store like s3a, the trailer is the only guard).
    val dir = Files.createTempDirectory("graft-gtok").toFile.getAbsolutePath
    TokenShards.write(fixture.filter(col("shard") === 0), dir)
    val bytes = Files.readAllBytes(Paths.get(dir, "shard_0.gtok"))
    bytes(bytes.length - 30) = (bytes(bytes.length - 30) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      val (_, seqs) = TokenShards.decode(bytes); seqs.length
    }
    assert(e.getMessage.contains("checksum mismatch"))
  }

  test("a truncated file fails loudly, not with fabricated rows") {
    val dir = Files.createTempDirectory("graft-gtok").toFile.getAbsolutePath
    TokenShards.write(fixture.filter(col("shard") === 0), dir)
    val bytes = Files.readAllBytes(Paths.get(dir, "shard_0.gtok"))
    val e = intercept[IllegalStateException] {
      val (_, seqs) = TokenShards.decode(bytes.take(bytes.length - 25)); seqs.length
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("null shard keys are rejected up front") {
    val df = Seq((Some(0L), 0L, Array(1)), (None, 1L, Array(2)))
      .toDF("shard", "chunk", "tokens")
    val dir = Files.createTempDirectory("graft-gtok").toFile.getAbsolutePath
    val e = intercept[IllegalArgumentException] {
      TokenShards.write(df, dir)
    }
    assert(e.getMessage.contains("null"))
  }
}
