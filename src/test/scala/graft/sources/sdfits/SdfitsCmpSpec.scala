package graft.sources.sdfits

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Pushed-predicate comparison semantics must be SPARK's, not Java's
  * (ADVICE r15): Spark orders strings by UTF-8 bytes (code-point order),
  * while java.lang.String.compareTo orders UTF-16 code units — the two
  * disagree exactly where a BMP private-use char (U+E000..U+FFFF) meets a
  * supplementary character (surrogate pair, code point > U+FFFF). FITS
  * cells are US-ASCII in practice, but the gate must match Spark on any
  * input it is handed.
  */
class SdfitsCmpSpec extends AnyFunSuite {

  test("string cmp follows UTF-8 code-point order, not UTF-16 code units") {
    val pua = "p"        // U+E000 (private use, BMP)
    val emoji = "p\uD83D\uDE00" // U+1F600 (supplementary)
    // Java inverts the pair; Spark (UTF8String) does not.
    assert(pua.compareTo(emoji) > 0, "fixture: UTF-16 order must invert")
    assert(UTF8String.fromString(pua).compareTo(UTF8String.fromString(emoji)) < 0)
    assert(SdfitsPushdown.cmp(pua, emoji) < 0, "cmp must side with Spark")
    assert(SdfitsPushdown.cmp(emoji, pua) > 0)
    assert(SdfitsPushdown.cmp("onoff:on", "onoff:on") == 0)
    assert(SdfitsPushdown.cmp("a", "b") < 0)
  }

  test("numeric cmp keeps Spark's NaN-above-everything total order") {
    assert(SdfitsPushdown.cmp(Double.NaN, Double.MaxValue) > 0)
    assert(SdfitsPushdown.cmp(Float.NaN, 1.0f) > 0)
    assert(SdfitsPushdown.cmp(1, 2L) < 0)
    assert(SdfitsPushdown.cmp(3L, 3) == 0)
  }
}
