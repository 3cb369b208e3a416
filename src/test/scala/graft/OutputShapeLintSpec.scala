package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide OUTPUT-SHAPE lint (VERDICT r15 item 3).
  *
  * The driver's comparator loads both the Spark dump and the DuckDB oracle
  * result into pandas and row-sorts over all columns; a top-level
  * array/map/struct cell crashes its sort (`TypeError: unhashable type:
  * 'numpy.ndarray'`) — round 15's one red row, `q_profile_quantiles`,
  * which emitted an `array<bigint>` ranks column. The oracle-side twin
  * lives in `tools/lint_oracle_types.py` (list types removed from its
  * ALLOWED set); this spec lints the SPARK side, which also covers any
  * future query that ships without an oracle (rows-only check) and so
  * never passes through the DuckDB DESCRIBE lint.
  *
  * Building the registry's DataFrames at sf0.001 is cheap: plans are lazy,
  * so only queries with eager driver-side steps (calibration heads,
  * index builds) execute anything, and those are sized for sf0.001.
  */
class OutputShapeLintSpec extends SparkTestBase {

  /** Column names whose type the driver comparator cannot row-sort. */
  private[graft] def hostileColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType]
             || f.dataType.isInstanceOf[MapType]
             || f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("the hostile-shape detector catches a deliberately-arrayed output") {
    import org.apache.spark.sql.functions._
    val bad = spark.range(3).select(
      col("id"), array(col("id"), col("id") + 1).as("pair"),
      map(col("id"), col("id")).as("m"))
    assert(hostileColumns(bad) ==
      Seq("pair: array<bigint>", "m: map<bigint,bigint>"))
    assert(hostileColumns(spark.range(3).toDF("id")).isEmpty)
  }

  test("no registry query emits a top-level array/map/struct column") {
    val sf = sys.env.getOrElse("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    assume(Files.exists(Paths.get(sf, "lineitem.parquet")), s"testdata missing at $sf")
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cols =
          try hostileColumns(fn(spark, sf))
          // NonFatal, not Throwable: an OOM must abort the suite, not be
          // swallowed into an assertion string. A build failure here is
          // NOT a shape violation — it is surfaced distinctly so triage
          // goes to the query, not the comparator.
          catch { case scala.util.control.NonFatal(e) =>
            Seq("<NOT a shape violation — query failed to BUILD at the " +
              s"lint's fixture: ${e.getClass.getSimpleName}: ${e.getMessage}>")
          }
        cols.map(c => s"$name -> $c")
    }
    assert(violations.isEmpty,
      s"comparator-hostile output shapes:\n${violations.mkString("\n")}")
  }
}
