package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.ArrayOps

/** C5–C8 (ref atmosphere_correction.py:25-86). */
class AtmosphereSpec extends SparkTestBase {
  import spark.implicits._

  test("C5 Buck vapor density matches a hand-computed value") {
    // T=293.15K (20C), RH=50%: e_s = 1.00070346*6.1121*exp(17.502*20/260.97)
    val expected = {
      val es = (1.0007 + 3.46e-6) * 6.1121 * math.exp(17.502 * 20.0 / (20.0 + 240.97))
      216.7 * (0.5 * es) / 293.15
    }
    val got = Seq((293.15, 50.0)).toDF("t", "rh")
      .select(Atmosphere.waterVaporDensity($"t", $"rh")).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
    assert(got > 8.0 && got < 9.0) // ~8.6 g/m3: physically sensible
  }

  test("C6 attenuation at 1.4 GHz is small, positive, and grows toward the horizon") {
    def atten(elev: Double): Double =
      Seq(1).toDF("x").select(Atmosphere.gaseousAttenuationDb(
        lit(1.4), lit(elev), lit(7.5), lit(1013.0), lit(288.0))).as[Double].head()
    val zenith = atten(90.0)
    val low = atten(10.0)
    assert(zenith > 0.0 && zenith < 0.5) // clear-sky L-band: a few hundredths of a dB
    assert(low > zenith)                  // longer slant path attenuates more
  }

  test("C7 dB to transmission: 10 dB -> 0.1, 0 dB -> 1.0") {
    val out = Seq((10.0, 0.0)).toDF("a", "b")
      .select(Atmosphere.dbToTransmission($"a"), Atmosphere.dbToTransmission($"b"))
      .as[(Double, Double)].head()
    assert(out == ((0.1, 1.0)))
  }

  test("C8 correction divides each channel by its transmission") {
    val df = Seq((Seq(1.0, 2.0), 290.0, 50.0, 1000.0, 45.0))
      .toDF("DATA", "TAMBIENT_K", "HUMIDITY", "PRESSURE", "ELEVATIO")
      .withColumn("TAMBIENT", $"TAMBIENT_K" - 273.15)
    val out = Atmosphere.correct(df, Array(1.4, 1.42)).select($"DATA")
      .as[Seq[Double]].head()
    // transmission < 1 → corrected intensities exceed the measured ones
    assert(out.length == 2 && out(0) > 1.0 && out(1) > 2.0)
    assert(out(0) < 1.05 && out(1) < 2.1) // but only ~1% at L-band
  }

  test("ItuCorrect kernel matches the Column formulation on a wide axis (<= 1 ulp)") {
    val axis = graft.functions.ArrayOps.freqAxis(1.5, 0.75, 64)
    val rows = (0 until 50).map { i =>
      (Seq.tabulate(64)(c => 1.0 + 0.01 * c + 0.1 * i),
        10.0 + i % 20, 30.0 + i % 50, 950.0 + i % 100, 10.0 + i % 75)
    }
    val df = rows.toDF("DATA", "TAMBIENT", "HUMIDITY", "PRESSURE", "ELEVATIO")
    val kernel = Atmosphere.correct(df, axis).select($"DATA").as[Seq[Double]].collect()
    // reference: the per-channel Column expression chain, unrolled
    val tempK = $"TAMBIENT" + lit(273.15)
    val rho = Atmosphere.waterVaporDensity(tempK, $"HUMIDITY")
    val columns = df.select(array(axis.zipWithIndex.map { case (f, i) =>
        element_at($"DATA", i + 1) / Atmosphere.dbToTransmission(
          Atmosphere.gaseousAttenuationDb(lit(f), $"ELEVATIO", rho, $"PRESSURE", tempK))
      }.toIndexedSeq: _*).as("DATA")).as[Seq[Double]].collect()
    // Same op order, but Math.pow's JIT intrinsic may legally differ in the
    // last bit between call sites — compare to <= 1 ulp, not bit equality
    // (the oracle's 6-decimal rounding absorbs this).
    kernel.zip(columns).zipWithIndex.foreach { case ((k, c), r) =>
      k.zip(c).foreach { case (kv, cv) =>
        assert(kv == cv || math.abs(kv - cv) <= math.ulp(cv),
          s"row $r: kernel $kv vs Column $cv beyond 1 ulp")
      }
    }
    // null DATA element propagates; null weather nulls the whole row's elems
    val edge = Seq((Seq(Some(1.0), None), Some(15.0)), (Seq(Some(1.0), Some(2.0)), None))
      .toDF("DATA", "TAMBIENT")
      .withColumn("HUMIDITY", lit(50.0)).withColumn("PRESSURE", lit(1000.0))
      .withColumn("ELEVATIO", lit(45.0))
    val eo = Atmosphere.correct(edge, Array(1.4, 1.42))
      .select($"DATA").as[Seq[Option[Double]]].collect()
    assert(eo(0)(0).isDefined && eo(0)(1).isEmpty)
    assert(eo(1).forall(_.isEmpty))
  }
}
