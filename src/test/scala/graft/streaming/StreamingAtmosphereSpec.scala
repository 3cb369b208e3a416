package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.AtmosphereKernels

/** Stream-batch agreement for the atmosphere correction kernel (VERDICT
  * r12 stretch item): [[AtmosphereKernels.AtmValueMicro]] is a stateless
  * per-(row, channel) expression, so the SAME projection must produce the
  * SAME value_micro rows on a live observation stream as on the batch
  * backfill — the property the C4/Gopher/badwords gates already certify.
  * Inputs mirror q_pipeline_atmosphere's staging (per-channel explode,
  * rho/rp/rt/sinel derivation), values span the long fast path of the
  * kernel's integer tail.
  */
class StreamingAtmosphereSpec extends SparkTestBase {
  import spark.implicits._

  // (obs_id, press_hPa, hum_pct, temp_K, sin_elev, data: 4 channels)
  private val obsSeq = Seq(
    (1L, 950.0, 35.0, 288.15, 0.71, Seq(12.5, 11.0, 10.25, 9.5)),
    (2L, 1013.0, 60.0, 296.65, 0.33, Seq(4.0, 3.5, 3.0, 2.5)),
    (3L, 900.0, 80.0, 278.15, 0.94, Seq(50.0, 49.0, 48.0, 47.0))
  )

  private def corrected(df: org.apache.spark.sql.DataFrame) = {
    // Same derivation as q_pipeline_atmosphere: Buck vapor density from
    // (temp, humidity), pressure/temperature ratios, per-channel explode
    // over the 4 frequency channels, one AtmValueMicro call per pair.
    val es = (lit(1.0007 + 3.46e-6) * lit(6.1121)) *
      exp(lit(17.502) * (col("temp_k") - lit(273.15)) /
        (col("temp_k") - lit(273.15) + lit(240.97)))
    df.withColumn("rho", lit(216.7) * ((col("hum") / lit(100.0)) * es) / col("temp_k"))
      .withColumn("rp", col("press") / lit(1013.0))
      .withColumn("rt", lit(288.0) / col("temp_k"))
      .select(col("obs_id"), col("rho"), col("rp"), col("rt"), col("sinel"),
        col("data"), posexplode(typedLit(Seq(1.5, 1.25, 1.0, 0.75))).as(Seq("chan", "fr")))
      .select(col("obs_id"), col("chan"),
        AtmosphereKernels.atmValueMicroCol(
          element_at(col("data"), col("chan") + 1),
          col("rho"), col("rp"), col("rt"), col("sinel"), col("fr")).as("value_micro"))
  }

  test("atmosphere kernel: stream rows == batch rows over a MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Double, Double, Double, Seq[Double])]
    val cols = Seq("obs_id", "press", "hum", "temp_k", "sinel", "data")
    val q = corrected(input.toDS().toDF(cols: _*))
      .writeStream.format("memory").queryName("atmstream").outputMode("append").start()
    try {
      input.addData(obsSeq.take(2): _*)
      q.processAllAvailable()
      input.addData(obsSeq.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("atmstream")
        .as[(Long, Int, Long)].collect().toSet
      val batch = corrected(obsSeq.toDF(cols: _*))
        .as[(Long, Int, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.size == obsSeq.size * 4, "one row per (obs, channel)")
      // Correction only ever scales UP (transmission ≤ 1): every corrected
      // micro value is at least its input's micro value.
      val inputMicro = obsSeq.flatMap { case (id, _, _, _, _, d) =>
        d.zipWithIndex.map { case (v, i) => (id, i) -> Math.round(v * 1e6) } }.toMap
      streamed.foreach { case (id, chan, vm) =>
        assert(vm >= inputMicro((id, chan)), s"obs $id chan $chan shrank: $vm")
      }
    } finally q.stop()
  }
}
