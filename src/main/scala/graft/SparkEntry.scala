package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query over
  * the driver's synthetic tables, paired with DuckDB-equivalent ANSI SQL in
  * [[oracleSql]]. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing). Queries live in
  * per-area objects under `graft.queries`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_trade_batch_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MarketQueries.queries ++ JoinQueries.queries ++
      AnalyticsQueries.queries ++ ScalarQueries.queries ++
      TextQueries.queries ++ VectorQueries.queries ++
      MicrostructureQueries.queries ++ MultimodalQueries.queries ++
      GoldQueries.queries ++ CorpusQueries.queries ++ AvroQueries.queries ++
      RestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    MarketQueries.oracle ++ JoinQueries.oracle ++
      AnalyticsQueries.oracle ++ ScalarQueries.oracle ++
      TextQueries.oracle ++ VectorQueries.oracle ++
      MicrostructureQueries.oracle ++ MultimodalQueries.oracle ++
      GoldQueries.oracle ++ CorpusQueries.oracle ++ AvroQueries.oracle ++
      RestQueries.oracle
}
