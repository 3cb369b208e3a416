package graft.model

import org.scalatest.funsuite.AnyFunSuite
import graft.model.HeaderRecord._

/** C1/C2/C11 — HISTORY parsing coercions (ref utils.py:9-56), frequency
  * range derivation (ref utils.py:58-103), staged naming (ref utils.py:222-224).
  */
class HeaderRecordSpec extends AnyFunSuite {

  test("coercions: pair, list, scalar, string, comment strip, extras") {
    val h = parseHistory(Seq(
      "DATAMODE HIRES / comment stripped",
      "START,STOP channels 100_611",
      "HIRES bands  1355, 1435",
      "EXPOSURE 0.25",
      "!!! not a card"))
    assert(h("DATAMODE") == HStr("HIRES"))
    assert(h("START,STOP channels") == HPair(100.0, 611.0))
    assert(h("HIRES bands") == HNums(Vector(1355.0, 1435.0)))
    assert(h("EXPOSURE") == HNum(0.25))
    assert(h.extra == Vector("!!! not a card"))
  }

  test("single-space multi-word value: greedy key swallows all but the last word (regex quirk)") {
    // Same regex as the reference — the key group is greedy, so only
    // double-space separation yields multi-word values.
    val h = parseHistory(Seq("NOTES first light", "HIRES bands 1355, 1435"))
    assert(h("NOTES first") == HStr("light"))
    assert(h("HIRES bands 1355,") == HNum(1435.0))
  }

  private def header(cards: String*): Header =
    Header(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "onoff", 1400.0, 80.0,
      parseHistory(cards))

  test("HIRES: center from bands[ifnum], width = OBSBW") {
    val h = header("DATAMODE HIRES", "START,STOP channels 100_611", "HIRES bands  1355, 1435")
    assert(frequencyRange(h, 0) == FreqRange(1315.0, 1395.0, 512))
    assert(frequencyRange(h, 1) == FreqRange(1395.0, 1475.0, 512))
  }

  test("LOWRES: edges straight from RFFILTER") {
    val h = header("DATAMODE LOWRES", "START,STOP channels 0_7", "RFFILTER  1350 1450")
    assert(frequencyRange(h, 0) == FreqRange(1350.0, 1450.0, 8))
  }

  test("unknown DATAMODE raises (ref utils.py:100-103)") {
    val h = header("DATAMODE WAT", "START,STOP channels 0_7")
    intercept[IllegalArgumentException](frequencyRange(h, 0))
  }

  test("staged path naming (C11)") {
    assert(stagedPath("/a/b/obs.fits", "validated") == "/a/b/obs_validated.fits")
    assert(stagedPath("obs", "corrupted") == "obs_corrupted")
    assert(stagedPath("/d.ir/obs", "x") == "/d.ir/obs_x")
  }
}
