package graft.pipeline

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.model.HeaderRecord

/** The multi-file spectrum path must reproduce the single-file pipeline
  * file-by-file, including the no-off-transition fallback.
  */
class SpectrumAllSpec extends SparkTestBase {
  import spark.implicits._

  private val header = HeaderRecord.Header(
    java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "onoff", 1400.0, 80.0,
    HeaderRecord.parseHistory(Seq(
      "DATAMODE HIRES", "START,STOP channels 0_3", "HIRES bands  1355, 1435")))

  /** Science-only rows, integer-valued DATA (exact sums); the off transition
    * lands at a different row per file, and file 2 never transitions —
    * exercising the falsy-off fallback (total sum, no diff).
    */
  private def obs(nFiles: Int, rowsPerFile: Int = 30): DataFrame = {
    val rows = for (f <- 0 until nFiles; i <- 0 until rowsPerFile) yield {
      val off = 10 + 5 * f
      (f.toString, i.toLong,
        java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(i % 60)}"),
        Seq(1.0 * (f + 1), 2.0 * (i % 3), 3.0, 1.0 * ((f + i) % 5)),
        0, 1, 0, 0,
        if (f == 2) "onoff:on" else if (i >= off) "onoff:off" else "onoff:on")
    }
    rows.toDF("FILE_ID", "ROWIDX", "DATE_OBS", "DATA", "IFNUM", "PLNUM",
      "CALSTATE", "SWPVALID", "OBSMODE")
  }

  test("runAll reproduces run() file-by-file, including the no-off fallback") {
    val df = obs(4)
    val all = Spectrum.runAll(df, header, Spectrum.Params(0, 1))
      .as[(String, Int, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).toSeq).toMap
    for (f <- 0 until 4) {
      val single = Spectrum.run(df.filter($"FILE_ID" === f.toString), header,
        Spectrum.Params(0, 1)).as[(Int, Double, Double)].collect().toSeq
      assert(all(f.toString) == single, s"file $f diverged")
    }
    assert(all.keySet == Set("0", "1", "2", "3"))
  }
}
