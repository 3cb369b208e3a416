package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide oracle output-type lint (PLANS.md finding 48).
  *
  * The driver hashes TYPED values: DuckDB silently widens uncast integer
  * aggregates (sum(BIGINT) → HUGEINT; `//` of such stays HUGEINT), so an
  * oracle whose final SELECT leaves one uncast hash-FAILs against a
  * bit-equal Spark BIGINT column — exactly how q_text_qmodel_calibration
  * stayed red for rounds 10-12 while every value-level replay passed.
  *
  * This spec dumps the full `SparkEntry.oracleSql` registry and runs DuckDB
  * `DESCRIBE` (no execution) over every query via
  * `tools/lint_oracle_types.py`, asserting each output column resolves to a
  * type in the closed allowed set (BIGINT/INTEGER/DOUBLE/VARCHAR/BOOLEAN/
  * DATE/TIMESTAMP + list forms). DuckDB itself is the only authority on how
  * it types an expression — a regex lint over SQL text cannot see through
  * CTEs — hence the shell-out; the spec cancels (not fails) on hosts
  * without python3+duckdb so `sbt test` stays self-contained elsewhere.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  test("every oracle's DESCRIBE types are in the allowed set (no HUGEINT/DECIMAL widening)") {
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val sf = sys.env.getOrElse("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    assume(Files.exists(Paths.get(sf, "lineitem.parquet")), s"testdata missing at $sf")
    val dump = Files.createTempFile("oracle_sql", ".json")
    val (code, out) =
      try {
        Files.writeString(dump, Verify.oracleJson)
        // stdout/stderr pump on separate threads — collect synchronized.
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val c = Seq("python3", "tools/lint_oracle_types.py", dump.toString, sf)
          .!(ProcessLogger(lines.add(_)))
        (c, String.join("\n", lines))
      } finally Files.delete(dump)
    assert(code == 0, s"oracle type lint violations:\n$out")
    // Belt and braces: the summary line must cover the whole registry.
    assert(out.contains(s"${SparkEntry.oracleSql.size} oracles"),
      s"lint did not cover the full registry:\n$out")
  }
}
