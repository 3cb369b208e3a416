package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.{CrawlQueries, LlmQueries, QueryUtil, RadioQueries, ScaleQueries, SdfitsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * families) is registered in [[queries]]; SQL-expressible ones carry a
  * DuckDB oracle in [[oracleSql]] (hash-compared by the driver at sf0.01);
  * the rest (driver-side iterative fits, hash-function-specific candidate
  * generation, LSH constructs) get the weaker rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the §7.3 minimum slice — A1 frequency-axis integration (continuum) of a
    * 4-channel DATA cube with relative timestamps.
    */
  def entry(spark: SparkSession): DataFrame =
    RadioQueries.queries("q_a1_continuum")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RadioQueries.queries ++ LlmQueries.queries ++ ScaleQueries.queries ++
      SdfitsQueries.queries ++ CrawlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RadioQueries.oracleSql ++ LlmQueries.oracleSql ++ ScaleQueries.oracleSql ++
      SdfitsQueries.oracleSql ++ CrawlQueries.oracleSql
}
