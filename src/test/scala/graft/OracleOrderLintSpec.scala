package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide oracle row-order-determinism lint (the sort-tie bug
  * class — same "passes today is not passes by construction" family as
  * the typed HUGEINT widening, PLANS.md finding 48).
  *
  * The driver's comparator zips rows IN ORDER, and both engines order
  * sort-key ties arbitrarily (Spark's tie order even varies with
  * partitioning/AQE run to run), so an outer ORDER BY whose key admits
  * ties over NON-identical rows is a latent, nondeterministic hash FAIL
  * — q_sdfits_roundtrip carried exactly this for rounds (rowkey is not
  * unique: the synthetic lineitem holds duplicate (l_orderkey,
  * l_linenumber) pairs) and passed only while both engines happened to
  * break ties identically.
  *
  * This spec dumps the full `SparkEntry.oracleSql` registry and runs
  * `tools/lint_order_ties.py` over it, which per oracle (a) locates the
  * outermost ORDER BY, (b) flags a missing one unless the result is a
  * single row, and (c) executes a group-by probe asserting no sort-key
  * group holds more than one DISTINCT full row (ties over byte-identical
  * rows are permutation-invariant and pass). Keys that reference hidden
  * source columns sit on a hand-audited allowlist inside the lint, which
  * the lint only honors after re-verifying the lineitem 4-key uniqueness
  * invariant those audits stand on.
  *
  * Runs at sf0.01 — the scale the driver actually hashes (the 4-key has
  * a collision at sf0.001, where the lint rightly disables the
  * allowlist).
  */
class OracleOrderLintSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Exception => false }

  test("every oracle's row order is deterministic at the driver's hashed scale") {
    assume(haveDuckdb, "python3+duckdb not available on this host")
    val sf = sys.env.getOrElse("SPARK_GRAFT_ORDER_LINT_SF", "/root/testdata/sf0.01")
    assume(Files.exists(Paths.get(sf, "lineitem.parquet")), s"testdata missing at $sf")
    val dump = Files.createTempFile("oracle_sql", ".json")
    val (code, out) =
      try {
        Files.writeString(dump, Verify.oracleJson)
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val c = Seq("python3", "tools/lint_order_ties.py", dump.toString, sf)
          .!(ProcessLogger(lines.add(_)))
        (c, String.join("\n", lines))
      } finally Files.delete(dump)
    assert(code == 0, s"oracle order-determinism violations:\n$out")
    assert(out.contains(s"${SparkEntry.oracleSql.size} oracles"),
      s"lint did not cover the full registry:\n$out")
  }
}
