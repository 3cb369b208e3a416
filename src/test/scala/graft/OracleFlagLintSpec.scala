package graft

import java.nio.file.Files
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide stated-flag certificate lint (VERDICT r14 item 3).
  *
  * A `SELECT true AS x` oracle can only restate what Spark computed — a
  * Spark-side expression bug that pins the flag true is invisible to the
  * driver's hash compare. The r15 sweep put, beside every stated flag,
  * at least one column the oracle DERIVES from a corpus table plus an
  * exact stated integer tripwire where the construction is deterministic
  * (hit counts, agreement counts, sketch estimates, exact ranks).
  *
  * This spec dumps the full `SparkEntry.oracleSql` registry through
  * `tools/lint_oracle_flags.py`, which enforces (1) no flag-only
  * certificates — every flagged oracle references a corpus table — and
  * (2) every stated flag column sits in the lint's justified residue
  * list, each entry documenting why DuckDB cannot state it as a value.
  */
class OracleFlagLintSpec extends AnyFunSuite {

  private def havePython: Boolean =
    try Seq("python3", "-c", "import json").! == 0
    catch { case _: Exception => false }

  test("every stated-flag oracle has a derivable companion and a justified residue entry") {
    assume(havePython, "python3 not available on this host")
    val dump = Files.createTempFile("oracle_sql", ".json")
    val (code, out) =
      try {
        Files.writeString(dump, Verify.oracleJson)
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val c = Seq("python3", "tools/lint_oracle_flags.py", dump.toString)
          .!(ProcessLogger(lines.add(_)))
        (c, String.join("\n", lines))
      } finally Files.delete(dump)
    assert(code == 0, s"stated-flag lint violations:\n$out")
    assert(out.contains(s"${SparkEntry.oracleSql.size} oracles"),
      s"lint did not cover the full registry:\n$out")
  }
}
