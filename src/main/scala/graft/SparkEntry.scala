package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every implemented operator from SURVEY §2 is exposed as a named query over
  * the driver's synthetic tables, paired with DuckDB-equivalent ANSI SQL in
  * [[oracleSql]]. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_trade_batch_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A1: trade-batch aggregate (feature_builder.py:88-185) ─────────────
    "a1_trade_batch_stats" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      TradeAggregates.tradeBatchStats(
        li,
        keys = Seq(col("l_returnflag"), col("l_linestatus")),
        price = col("l_extendedprice"),
        qty = col("l_quantity"),
        isSell = col("l_returnflag") === "R",
        tsMs = graft.functions.TimeUnits.asMillis(col("l_shipdate")),
        tieBreak = struct(col("l_orderkey"), col("l_linenumber")))
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_trade_batch_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS trade_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE) AS total_volume,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(27,10))) AS DOUBLE)
        |        / CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE), 4) AS vwap,
        |  round(stddev_samp(l_extendedprice), 4) AS price_std,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_quantity END AS DECIMAL(27,8))) AS DOUBLE) AS buy_volume,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END AS DECIMAL(27,8))) AS DOUBLE) AS sell_volume,
        |  first(l_extendedprice ORDER BY l_shipdate, l_orderkey, l_linenumber) AS first_price,
        |  last(l_extendedprice ORDER BY l_shipdate, l_orderkey, l_linenumber) AS last_price,
        |  round((buy_volume - sell_volume) / total_volume, 6) AS volume_imbalance,
        |  round(last_price - first_price, 8) AS price_change,
        |  round((last_price - first_price) / first_price * 100, 6) AS price_change_pct
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
