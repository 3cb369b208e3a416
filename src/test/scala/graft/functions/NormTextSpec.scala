package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Stage-zero text normalization kernel: NFC composition, control strip,
  * space/tab collapse, end trim — each step pinned on hand-derived
  * expectations through the Column API (codegen path).
  */
class NormTextSpec extends SparkTestBase {
  import spark.implicits._

  private def run(raw: String*): Seq[String] =
    raw.toDF("t").select(TextKernels.normText(col("t")).as("n"))
      .as[String].collect().toSeq

  test("NFC composes combining sequences; composed text is untouched") {
    assert(run("cafe\u0301") == Seq("café"))
    assert(run("A\u030angstro\u0308m") == Seq("Ångström"))
    assert(run("café plain ascii") == Seq("café plain ascii"))
  }

  test("controls drop (CRLF becomes newline); newline survives") {
    assert(run("ab\u0007c") == Seq("abc"))
    assert(run("line1\r\nline2\r\n") == Seq("line1\nline2\n"))
    assert(run("de\u007flete\u0000") == Seq("delete"))
  }

  test("space/tab runs collapse; ends trim spaces but not newlines") {
    assert(run("a \t  b\tc") == Seq("a b c"))
    assert(run("  padded  ") == Seq("padded"))
    assert(run("x  \n  y") == Seq("x \n y")) // collapse around preserved \n
    assert(run("trail\n") == Seq("trail\n")) // newline is not trimmed
    assert(run(" \t ") == Seq(""))
  }

  test("idempotence: normalizing twice is a no-op") {
    val raws = Seq("cafe\u0301  x\t y ", "a\r\nb", "  é  ", "A\u030a")
    val once = run(raws: _*)
    assert(run(once: _*) == once)
  }
}
