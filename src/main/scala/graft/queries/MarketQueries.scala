package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TimeUnits
import graft.operators._

/** Market-data operator queries (SURVEY §2.4/§2.5/§2.6) bound to the driver's
  * synthetic tables, each paired with DuckDB oracle SQL.
  */
object MarketQueries {
  private val T = Tables.tradesOracleCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — trade-batch aggregate (feature_builder.py:88-185) on lineitem.
    // ScanFill (r17 opt): the struct-ordered min_by/max_by plans as a
    // SortAggregate whose partial phase runs inside the scan stage — one
    // task on the single-row-group bench file (diag: 1.8 s task CPU at
    // ~0.9-way on 32 cores). Fill keys are the line's primary key.
    "a1_trade_batch_stats" -> { (s, dir) =>
      val li = ScanFill.fill(
        Tables.lineitem(s, dir), col("l_orderkey"), col("l_linenumber"))
      TradeAggregates.tradeBatchStats(
        li,
        keys = Seq(col("l_returnflag"), col("l_linestatus")),
        price = col("l_extendedprice"),
        qty = col("l_quantity"),
        isSell = col("l_returnflag") === "R",
        tsMs = TimeUnits.asMillis(col("l_shipdate")),
        tieBreak = struct(col("l_orderkey"), col("l_linenumber")))
    },
    // A1b — the same trade-batch aggregate through the packed-long ordering
    // fast path (SCALE.md "known limits"): open/close picks hash-aggregate
    // instead of sort-aggregating. trade_id < 2^21 on this table, asserted
    // by the shared oracle being hash-exact.
    "a1b_trade_stats_packed" -> { (s, dir) =>
      TradeAggregates.tradeBatchStatsPacked(
        Tables.trades(s, dir),
        keys = Seq(col("symbol")),
        price = col("price"),
        qty = col("qty"),
        isSell = col("qty") > 50,
        tsMs = col("ts_ms"),
        tieBreak = col("trade_id"))
    },
    // A4 — 1-minute OHLCV+VWAP bars (S3_SCHEMA.md:316-392), the minimum slice.
    "a4_bars_1m" -> { (s, dir) =>
      Bars.ohlcv(
        Tables.trades(s, dir),
        symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
        qty = col("qty"), tieBreak = col("trade_id"), barMs = 60000L)
    },
    // A16 — regular-grid bar fill + interpolation (extension op,
    // Resample.fillGrid): the 5-minute close series per symbol completed to
    // EVERY grid step between the symbol's first and last bar — gaps
    // flagged, close forward-filled (LOCF) and linearly interpolated
    // between the neighboring observations. The repair pass between bar
    // aggregation and rolling features (a silent interval otherwise reads
    // as an instant jump downstream).
    "a16_bar_fill" -> { (s, dir) =>
      val bars = Bars.ohlcv(
          Tables.trades(s, dir).filter(col("trade_id") < 2000),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          qty = col("qty"), tieBreak = col("trade_id"), barMs = 300000L)
        .select(col("symbol"), col("open_time_ms"), col("close_price"))
      Resample
        .fillGrid(bars, col("symbol"), col("open_time_ms"), col("close_price"), 300000L)
        .select(
          col("key").as("symbol"), col("ts_ms").as("open_time_ms"),
          col("v").as("close_price"), col("is_gap"),
          col("v_ffill").as("close_ffill"), col("v_interp").as("close_interp"))
    },
    // A4b — silver-bar quality fields (FIXTURES.md §5 / S3_SCHEMA.md:316-392):
    // completeness_score vs nominal cadence and gap_seconds (largest silence
    // ending inside the bar).
    "a4b_bars_quality" -> { (s, dir) =>
      val t = Tables.trades(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("ts_ms"), col("trade_id"))
      t.withColumn("ia_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
        .groupBy(
          col("symbol"),
          TimeUnits.bucketStartMs(col("ts_ms"), 3600000L).as("open_time_ms"))
        .agg(
          count(lit(1)).as("trade_count"),
          max(col("ia_ms")).as("max_gap_ms"))
        .withColumn("gap_seconds", col("max_gap_ms") / 1000.0)
        .withColumn(
          "completeness_score",
          least(lit(1.0), col("trade_count").cast("double") / 5.0))
    },
    // A5 — trailing range-frame trade stats (DATA_PIPELINE.md:109-157); the
    // events table is sparse, so the "5 s" window is scaled to 5 min.
    "a5_rolling_stats" -> { (s, dir) =>
      Rolling
        .trailingStats(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          qty = col("qty"), tieBreak = col("trade_id"), windowMs = 300000L)
        .select(
          "symbol", "ts_ms", "trade_id", "price", "n_w", "vol_w", "vwap_w",
          "price_std_w", "price_range_w", "interarrival_ms",
          "interarrival_mean_s_w", "interarrival_var_s_w", "trade_intensity_w")
    },
    // A5b — the same trailing stats with (symbol, time-chunk) bucketing and
    // boundary stitching (SCALE.md): bit-identical output (same oracle as
    // a5), parallelism = symbols × chunks instead of collapsing to the
    // symbol cardinality. 5-min window / 1-h chunks on the sparse table.
    "a5b_rolling_stats_bucketed" -> { (s, dir) =>
      Rolling
        .trailingStatsBucketed(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          qty = col("qty"), tieBreak = col("trade_id"), windowMs = 300000L,
          chunkMs = 3600000L)
        .select(
          "symbol", "ts_ms", "trade_id", "price", "n_w", "vol_w", "vwap_w",
          "price_std_w", "price_range_w", "interarrival_ms",
          "interarrival_mean_s_w", "interarrival_var_s_w", "trade_intensity_w")
    },
    // A6 — daily trading summary (RDS_SCHEMA.md:446-497).
    "a6_daily_summary" -> { (s, dir) =>
      Bars.dailySummary(
        Tables.trades(s, dir),
        symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
        qty = col("qty"), tieBreak = col("trade_id"))
    },
    // W1 — lag-derived deltas per key (transformer.py:262-291).
    "w1_lag_features" -> { (s, dir) =>
      Windows
        .lagFeatures(
          Tables.trades(s, dir),
          key = col("user_id"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"))
        .select("user_id", "trade_id", "ts_ms", "price", "prev_price",
          "price_change", "price_change_pct")
    },
    // W8 — the full rank-function family over (symbol, time): rank /
    // dense_rank / percent_rank / cume_dist / ntile. Ordered by the TOTAL
    // (ts_ms, trade_id) key: ntile splits peer groups by row position, so
    // any tie in the ordering would make the quartile assignment
    // partitioning-dependent.
    "w8_rank_family" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("symbol")).orderBy(col("ts_ms"), col("trade_id"))
      Tables.trades(s, dir).filter(col("trade_id") < 2000)
        .select(
          col("symbol"), col("ts_ms"), col("trade_id"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
    },
    // W4 — sequence-gap detection (gap_detector/README.md:24-38).
    "w4_sequence_gaps" -> { (s, dir) =>
      Windows
        .sequenceGaps(
          Tables.trades(s, dir),
          key = col("user_id"), tsMs = col("ts_ms"), seq = col("trade_id"),
          tolerance = 50L)
        .select("user_id", "trade_id", "ts_ms", "prev_seq", "gap", "kind")
    },
    // W5 — forward path stats for the 10 s-ahead label window
    // (S3_SCHEMA.md:648-653); horizon scaled to 10 min for the sparse table.
    "w5_path_stats" -> { (s, dir) =>
      Rolling
        .forwardPathStats(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          qty = col("qty"), horizonMs = 600000L)
        .select("symbol", "ts_ms", "trade_id", "price", "path_max", "path_min",
          "path_range", "path_volume", "path_trades")
    },
    // W5b — the same forward path stats with (symbol, time-chunk) bucketing
    // (SCALE.md): bit-identical output (same oracle as w5), parallelism =
    // symbols × chunks instead of collapsing to the symbol cardinality.
    "w5b_path_stats_bucketed" -> { (s, dir) =>
      Rolling
        .forwardPathStatsBucketed(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          qty = col("qty"), horizonMs = 600000L, chunkMs = 3600000L)
        .select("symbol", "ts_ms", "trade_id", "price", "path_max", "path_min",
          "path_range", "path_volume", "path_trades")
    },
    // W6 — momentum / acceleration (S3_SCHEMA.md:569-578).
    "w6_momentum" -> { (s, dir) =>
      Rolling
        .momentum(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"), windowMs = 300000L)
        .select("symbol", "ts_ms", "trade_id", "ma_w", "momentum", "acceleration")
    },
    // W6b — bucketed momentum: boundary-band ma stitch + per-chunk tail lag
    // stitch (SCALE.md); bit-identical to w6 (same oracle).
    "w6b_momentum_bucketed" -> { (s, dir) =>
      Rolling
        .momentumBucketed(
          // project FIRST: the materialized shared stage carries every input
          // column (checkpoint blocks pruning), so 4 columns in, not 11
          Tables.trades(s, dir).select("symbol", "ts_ms", "trade_id", "price"),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"), windowMs = 300000L, chunkMs = 3600000L)
        .select("symbol", "ts_ms", "trade_id", "ma_w", "momentum", "acceleration")
    },
    // W9 — bounded-lookback EWMA / MACD features (extension op,
    // Rolling.ewmaFeatures): the online exponential smoothing next to w6's
    // plain moving averages. Frame materialized by an ordered collect_list
    // and folded left with the `aggregate` HOF — the identical IEEE double
    // sequence DuckDB's list_reduce executes, so the unrounded folds are
    // bit-equal cross-engine (alphas 1/4 and 1/16 chosen with exactly
    // representable complements).
    "w9_ewma_macd" -> { (s, dir) =>
      Rolling
        .ewmaFeatures(
          Tables.trades(s, dir),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"))
        .select("symbol", "ts_ms", "trade_id", "price", "ewma_fast",
          "ewma_slow", "macd")
    },
    // W9b — bucketed EWMA: per-chunk tail-context stitch (a ROW frame is not
    // time-bounded, so no boundary band applies — see Rolling scaladoc);
    // bit-identical to w9 (same oracle).
    "w9b_ewma_macd_bucketed" -> { (s, dir) =>
      Rolling
        .ewmaFeaturesBucketed(
          // project FIRST: the materialized shared stage carries every input
          // column (checkpoint blocks pruning), so 4 columns in, not 11
          Tables.trades(s, dir).select("symbol", "ts_ms", "trade_id", "price"),
          symbol = col("symbol"), tsMs = col("ts_ms"), price = col("price"),
          tieBreak = col("trade_id"), chunkMs = 3600000L)
        .select("symbol", "ts_ms", "trade_id", "price", "ewma_fast",
          "ewma_slow", "macd")
    },
    // W7 — gaps-and-islands sessionization: per-user activity sessions split
    // at 8 h inactivity (batch twin of session_window; same island pattern as
    // transformer.py's batch windows with a gap rule instead of a fixed grid).
    "w7_sessionization" -> { (s, dir) =>
      Sessionize.sessions(
        Tables.trades(s, dir),
        key = col("user_id"), tsMs = col("ts_ms"), tieBreak = col("trade_id"),
        value = col("price"), gapMs = 28800000L)
    },
    // J6 — point-in-interval (range) join via the chunk-bucketed equi-join
    // rewrite (operators/Interval.scala): trades matched to the session
    // interval containing them. Sessions partition each user's trades, so
    // every trade matches exactly one interval — the oracle's BETWEEN join
    // checks both the rewrite's completeness (no lost matches across cell
    // boundaries) and its precision (no phantom matches from replication).
    "j6_interval_join" -> { (s, dir) =>
      val t = Tables.trades(s, dir).filter(col("user_id") < 50)
      val sess = Sessionize.sessions(
        t, key = col("user_id"), tsMs = col("ts_ms"), tieBreak = col("trade_id"),
        value = col("price"), gapMs = 28800000L)
      Interval.pointInInterval(
        t.select(col("user_id"), col("ts_ms"), col("trade_id")),
        sess.select(
          col("key"), col("session_seq"), col("session_start"), col("session_end")),
        pointKey = col("user_id"), ts = col("ts_ms"),
        intervalKey = col("key"), start = col("session_start"),
        end = col("session_end"), chunkMs = 86400000L)
        .select(
          col("trade_id"), col("user_id"), col("session_seq"),
          col("session_start"), col("session_end"))
    },
    // A9/W2 — latest row per key (DISTINCT ON, RDS_SCHEMA.md:573-605).
    "a9_latest_per_key" -> { (s, dir) =>
      Windows
        .latestPerKey(
          Tables.trades(s, dir),
          key = col("user_id"), tsMs = col("ts_ms"), tieBreak = col("trade_id"))
        .select("user_id", "trade_id", "ts_ms", "symbol", "price")
    },
    // Skew — salted two-phase aggregation (SCALE.md): must equal the direct
    // groupBy, which is exactly what the oracle runs.
    "d2_salted_agg_stats" -> { (s, dir) =>
      Skew.saltedBasicStats(
        Tables.trades(s, dir),
        keys = Seq(col("symbol")), value = col("qty"), tieBreak = col("trade_id"),
        buckets = 16)
    },
    // O3 — recent-N global (redis_writer.py:158-200).
    "o3_recent_events" -> { (s, dir) =>
      Tables.trades(s, dir)
        .orderBy(col("ts_ms").desc, col("trade_id").desc)
        .limit(10)
        .select("trade_id", "ts_ms", "symbol", "price")
    },
    // O4 — top-N per group (DATA_PIPELINE.md:84-95).
    "o4_top5_per_group" -> { (s, dir) =>
      Windows
        .topNPerGroup(
          Tables.trades(s, dir),
          key = col("symbol"), ord = col("price"), tieBreak = col("trade_id"), n = 5)
        .select("symbol", "trade_id", "price", "rank_in_group")
    }
  )

  /** Shared by a5 and a5b — the bucketed variant must reproduce the
    * per-symbol window semantics exactly.
    */
  private val a5OracleSql: String =
    s"""WITH t AS ($T),
       |ia AS (
       |  SELECT *, ts_ms - lag(ts_ms, 1) OVER (PARTITION BY symbol ORDER BY ts_ms, trade_id) AS interarrival_ms
       |  FROM t)
       |SELECT symbol, ts_ms, trade_id, price,
       |  count(*) OVER wr AS n_w,
       |  CAST(sum(CAST(qty AS DECIMAL(27,8))) OVER wr AS DOUBLE) AS vol_w,
       |  CAST(sum(CAST(price * qty AS DECIMAL(27,10))) OVER wr AS DOUBLE)
       |    / nullif(CAST(sum(CAST(qty AS DECIMAL(27,8))) OVER wr AS DOUBLE), 0.0) AS vwap_w,
       |  round(stddev_samp(price) OVER wr, 4) AS price_std_w,
       |  round(max(price) OVER wr - min(price) OVER wr, 8) AS price_range_w,
       |  interarrival_ms,
       |  CAST(sum(interarrival_ms) OVER wr AS DOUBLE) / (count(interarrival_ms) OVER wr) / 1000.0 AS interarrival_mean_s_w,
       |  CASE WHEN count(interarrival_ms) OVER wr >= 2 THEN
       |    (CAST(sum(interarrival_ms * interarrival_ms) OVER wr AS DOUBLE)
       |     - CAST(sum(interarrival_ms) OVER wr AS DOUBLE) * CAST(sum(interarrival_ms) OVER wr AS DOUBLE) / (count(interarrival_ms) OVER wr))
       |    / (count(interarrival_ms) OVER wr - 1) / 1.0e6
       |  END AS interarrival_var_s_w,
       |  (count(*) OVER wr) / greatest((ts_ms - min(ts_ms) OVER wr) / 1000.0, 0.001) AS trade_intensity_w
       |FROM ia
       |WINDOW wr AS (PARTITION BY symbol ORDER BY ts_ms RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW),
       |       ws AS (PARTITION BY symbol ORDER BY ts_ms, trade_id)""".stripMargin

  /** Shared by w5 and w5b — same bit-identical-bucketing contract as a5/a5b. */
  private val w5OracleSql: String =
    s"""WITH t AS ($T)
       |SELECT symbol, ts_ms, trade_id, price,
       |  max(price) OVER w AS path_max,
       |  min(price) OVER w AS path_min,
       |  round(path_max - path_min, 8) AS path_range,
       |  CAST(sum(CAST(qty AS DECIMAL(27,8))) OVER w AS DOUBLE) AS path_volume,
       |  count(price) OVER w AS path_trades
       |FROM t
       |WINDOW w AS (PARTITION BY symbol ORDER BY ts_ms RANGE BETWEEN 1 FOLLOWING AND 600000 FOLLOWING)""".stripMargin

  /** Shared by w6 and w6b. */
  private val w6OracleSql: String =
    s"""WITH t AS ($T),
       |m AS (
       |  SELECT symbol, ts_ms, trade_id,
       |    CAST(sum(CAST(price AS DECIMAL(27,8))) OVER wr AS DOUBLE) / (count(*) OVER wr) AS ma_raw
       |  FROM t
       |  WINDOW wr AS (PARTITION BY symbol ORDER BY ts_ms RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW)),
       |d AS (
       |  SELECT symbol, ts_ms, trade_id, ma_raw,
       |    ma_raw - lag(ma_raw, 1) OVER ws AS momentum
       |  FROM m
       |  WINDOW ws AS (PARTITION BY symbol ORDER BY ts_ms, trade_id))
       |SELECT symbol, ts_ms, trade_id, ma_raw AS ma_w, momentum,
       |  momentum - lag(momentum, 1) OVER ws2 AS acceleration
       |FROM d
       |WINDOW ws2 AS (PARTITION BY symbol ORDER BY ts_ms, trade_id)""".stripMargin

  /** Shared by w9 and w9b. Frame size and alpha/complement literals are
    * DERIVED from [[Rolling]]'s shared constants (the duckBucket pattern) so
    * re-tuning fastAlpha/slowAlpha/lookback in the query wiring cannot
    * silently desync the oracle — the interpolation only stays faithful for
    * dyadic alphas, which `Rolling.requireExactAlphas` already enforces
    * (dyadic doubles print exactly: 0.25 → "0.25", 0.9375 → "0.9375").
    */
  private val w9OracleSql: String = {
    val fast = Rolling.EwmaFastAlpha
    val slow = Rolling.EwmaSlowAlpha
    s"""WITH t AS ($T),
       |l AS (
       |  SELECT symbol, ts_ms, trade_id, price,
       |    list(price) OVER (PARTITION BY symbol ORDER BY ts_ms, trade_id
       |      ROWS BETWEEN ${Rolling.EwmaLookback - 1} PRECEDING AND CURRENT ROW) AS xs
       |  FROM t)
       |SELECT symbol, ts_ms, trade_id, price,
       |  round(list_reduce(xs, (acc, x) -> acc * ${1.0 - fast} + x * $fast), 6) AS ewma_fast,
       |  round(list_reduce(xs, (acc, x) -> acc * ${1.0 - slow} + x * $slow), 6) AS ewma_slow,
       |  round(ewma_fast - ewma_slow, 6) AS macd
       |FROM l""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "a1_trade_batch_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS trade_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE) AS total_volume,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(27,10))) AS DOUBLE)
        |    / nullif(CAST(sum(CAST(l_quantity AS DECIMAL(27,8))) AS DOUBLE), 0.0), 6) AS vwap,
        |  round(stddev_samp(l_extendedprice), 4) AS price_std,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_quantity END AS DECIMAL(27,8))) AS DOUBLE) AS buy_volume,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END AS DECIMAL(27,8))) AS DOUBLE) AS sell_volume,
        |  first(l_extendedprice ORDER BY l_shipdate, l_orderkey, l_linenumber) AS first_price,
        |  last(l_extendedprice ORDER BY l_shipdate, l_orderkey, l_linenumber) AS last_price,
        |  (buy_volume - sell_volume) / nullif(total_volume, 0.0) AS volume_imbalance,
        |  round(last_price - first_price, 8) AS price_change,
        |  (last_price - first_price) / nullif(first_price, 0.0) * 100 AS price_change_pct
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "a1b_trade_stats_packed" ->
      s"""WITH t AS ($T)
         |SELECT symbol,
         |  count(*) AS trade_count,
         |  CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE) AS total_volume,
         |  min(price) AS min_price,
         |  max(price) AS max_price,
         |  round(avg(price), 4) AS avg_price,
         |  round(CAST(sum(CAST(price * qty AS DECIMAL(27,10))) AS DOUBLE)
         |    / nullif(CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE), 0.0), 6) AS vwap,
         |  round(stddev_samp(price), 4) AS price_std,
         |  CAST(sum(CAST(CASE WHEN qty > 50 THEN 0.0 ELSE qty END AS DECIMAL(27,8))) AS DOUBLE) AS buy_volume,
         |  CAST(sum(CAST(CASE WHEN qty > 50 THEN qty ELSE 0.0 END AS DECIMAL(27,8))) AS DOUBLE) AS sell_volume,
         |  first(price ORDER BY ts_ms, trade_id) AS first_price,
         |  last(price ORDER BY ts_ms, trade_id) AS last_price,
         |  (buy_volume - sell_volume) / nullif(total_volume, 0.0) AS volume_imbalance,
         |  round(last_price - first_price, 8) AS price_change,
         |  (last_price - first_price) / nullif(first_price, 0.0) * 100 AS price_change_pct
         |FROM t GROUP BY symbol""".stripMargin,
    "a4_bars_1m" ->
      s"""WITH t AS ($T)
         |SELECT symbol, (ts_ms // 60000) * 60000 AS open_time_ms,
         |  first(price ORDER BY ts_ms, trade_id) AS open_price,
         |  last(price ORDER BY ts_ms, trade_id) AS close_price,
         |  max(price) AS high_price,
         |  min(price) AS low_price,
         |  CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE) AS volume,
         |  CAST(sum(CAST(price * qty AS DECIMAL(27,10))) AS DOUBLE) AS notional,
         |  count(*) AS trade_count,
         |  notional / nullif(volume, 0.0) AS vwap,
         |  round(high_price - low_price, 8) AS price_range,
         |  round(close_price - open_price, 8) AS price_change
         |FROM t GROUP BY 1, 2""".stripMargin,
    "w8_rank_family" ->
      s"""WITH t AS ($T)
         |SELECT symbol, ts_ms, trade_id,
         |  CAST(rank() OVER w AS BIGINT) AS rnk,
         |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         |  percent_rank() OVER w AS prnk,
         |  cume_dist() OVER w AS cdist,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |FROM t WHERE trade_id < 2000
         |WINDOW w AS (PARTITION BY symbol ORDER BY ts_ms, trade_id)""".stripMargin,
    "a16_bar_fill" ->
      s"""WITH t AS ($T),
         |b AS (SELECT symbol, (ts_ms // 300000) * 300000 AS ts,
         |        last(price ORDER BY ts_ms, trade_id) AS v
         |      FROM t WHERE trade_id < 2000 GROUP BY 1, 2),
         |g AS (SELECT symbol, unnest(generate_series(mn, mx, 300000)) AS ts
         |      FROM (SELECT symbol, min(ts) AS mn, max(ts) AS mx
         |            FROM b GROUP BY symbol) x),
         |j AS (SELECT g.symbol, g.ts, b.v
         |      FROM g LEFT JOIN b ON b.symbol = g.symbol AND b.ts = g.ts),
         |f AS (SELECT symbol, ts, v,
         |    last_value(v IGNORE NULLS) OVER wb AS ffill,
         |    first_value(v IGNORE NULLS) OVER wf AS bfill,
         |    last_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wb AS pts,
         |    first_value(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS) OVER wf AS nts
         |  FROM j
         |  WINDOW wb AS (PARTITION BY symbol ORDER BY ts ROWS UNBOUNDED PRECEDING),
         |         wf AS (PARTITION BY symbol ORDER BY ts
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT symbol, ts AS open_time_ms, v AS close_price, v IS NULL AS is_gap,
         |  ffill AS close_ffill,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN ffill IS NULL THEN bfill
         |       WHEN bfill IS NULL THEN ffill
         |       ELSE floor((ffill + (bfill - ffill) * ((ts - pts) * 1.0 / (nts - pts))) * 1e6 + 0.5) / 1e6 + 0.0
         |  END AS close_interp
         |FROM f""".stripMargin,
    "a4b_bars_quality" ->
      s"""WITH t AS ($T),
         |ia AS (
         |  SELECT symbol, ts_ms,
         |    ts_ms - lag(ts_ms, 1) OVER (PARTITION BY symbol ORDER BY ts_ms, trade_id) AS ia_ms
         |  FROM t)
         |SELECT symbol, (ts_ms // 3600000) * 3600000 AS open_time_ms,
         |  count(*) AS trade_count,
         |  max(ia_ms) AS max_gap_ms,
         |  max(ia_ms) / 1000.0 AS gap_seconds,
         |  least(1.0, count(*) / 5.0) AS completeness_score
         |FROM ia GROUP BY 1, 2""".stripMargin,
    "a5_rolling_stats" -> a5OracleSql,
    // bucketed variant is output-identical by construction — same oracle
    "a5b_rolling_stats_bucketed" -> a5OracleSql,
    "a6_daily_summary" ->
      s"""WITH t AS ($T)
         |SELECT symbol, strftime(make_timestamp(ts_ms * 1000), '%Y-%m-%d') AS trading_date,
         |  first(price ORDER BY ts_ms, trade_id) AS open_price,
         |  last(price ORDER BY ts_ms, trade_id) AS close_price,
         |  max(price) AS high_price,
         |  min(price) AS low_price,
         |  count(*) AS total_trades,
         |  CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE) AS total_volume,
         |  max(qty) AS largest_trade,
         |  round(avg(qty), 6) AS avg_trade_size,
         |  round(stddev_samp(price), 4) AS volatility,
         |  round(CAST(sum(CAST(price * qty AS DECIMAL(27,10))) AS DOUBLE)
         |    / nullif(CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE), 0.0), 6) AS vwap,
         |  (close_price - open_price) / nullif(open_price, 0.0) * 100 AS daily_change_pct,
         |  round(high_price - low_price, 8) AS price_range
         |FROM t GROUP BY 1, 2""".stripMargin,
    "w1_lag_features" ->
      s"""WITH t AS ($T)
         |SELECT user_id, trade_id, ts_ms, price,
         |  lag(price, 1) OVER w AS prev_price,
         |  round(price - prev_price, 8) AS price_change,
         |  (price - prev_price) / nullif(prev_price, 0.0) * 100 AS price_change_pct
         |FROM t
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, trade_id)""".stripMargin,
    "w4_sequence_gaps" ->
      s"""WITH t AS ($T),
         |g AS (
         |  SELECT user_id, trade_id, ts_ms,
         |    max(trade_id) OVER (PARTITION BY user_id ORDER BY ts_ms, trade_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_seq,
         |    trade_id - prev_seq AS gap
         |  FROM t)
         |SELECT user_id, trade_id, ts_ms, prev_seq, gap,
         |  CASE WHEN gap > 50 THEN 'gap' ELSE 'regression' END AS kind
         |FROM g WHERE gap > 50 OR gap < 0""".stripMargin,
    "w5_path_stats" -> w5OracleSql,
    // bucketed variant is output-identical by construction — same oracle
    "w5b_path_stats_bucketed" -> w5OracleSql,
    "j6_interval_join" ->
      s"""WITH t AS ($T),
         |p AS (SELECT user_id, ts_ms, trade_id FROM t WHERE user_id < 50),
         |f AS (
         |  SELECT user_id AS key, ts_ms, trade_id,
         |    CASE WHEN lag(ts_ms) OVER w IS NULL
         |              OR ts_ms - lag(ts_ms) OVER w > 28800000 THEN 1 ELSE 0 END AS ns
         |  FROM p
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, trade_id)),
         |g AS (
         |  SELECT *, CAST(sum(ns) OVER (PARTITION BY key ORDER BY ts_ms, trade_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM f),
         |sess AS (
         |  SELECT key, session_seq,
         |    min(ts_ms) AS session_start, max(ts_ms) AS session_end
         |  FROM g GROUP BY 1, 2)
         |SELECT p.trade_id, p.user_id, s.session_seq, s.session_start, s.session_end
         |FROM p
         |JOIN sess s
         |  ON s.key = p.user_id
         | AND p.ts_ms BETWEEN s.session_start AND s.session_end""".stripMargin,
    "w7_sessionization" ->
      s"""WITH t AS ($T),
         |f AS (
         |  SELECT user_id AS key, ts_ms, trade_id, price,
         |    CASE WHEN lag(ts_ms) OVER w IS NULL
         |              OR ts_ms - lag(ts_ms) OVER w > 28800000 THEN 1 ELSE 0 END AS ns
         |  FROM t
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, trade_id)),
         |g AS (
         |  SELECT *, CAST(sum(ns) OVER (PARTITION BY key ORDER BY ts_ms, trade_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM f)
         |SELECT key, session_seq,
         |  min(ts_ms) AS session_start, max(ts_ms) AS session_end,
         |  count(*) AS n_events,
         |  max(ts_ms) - min(ts_ms) AS duration_ms,
         |  CAST(sum(CAST(price AS DECIMAL(27,8))) AS DOUBLE) AS total_value
         |FROM g GROUP BY 1, 2""".stripMargin,
    "w9_ewma_macd" -> w9OracleSql,
    // bucketed variant is output-identical by construction — same oracle
    "w9b_ewma_macd_bucketed" -> w9OracleSql,
    "w6_momentum" -> w6OracleSql,
    // bucketed variant is output-identical by construction — same oracle
    "w6b_momentum_bucketed" -> w6OracleSql,
    "a9_latest_per_key" ->
      s"""WITH t AS ($T),
         |r AS (
         |  SELECT user_id, trade_id, ts_ms, symbol, price,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, trade_id DESC) AS rn
         |  FROM t)
         |SELECT user_id, trade_id, ts_ms, symbol, price FROM r WHERE rn = 1""".stripMargin,
    "d2_salted_agg_stats" ->
      s"""WITH t AS ($T)
         |SELECT symbol, count(*) AS n,
         |  CAST(sum(CAST(qty AS DECIMAL(27,8))) AS DOUBLE) AS total,
         |  min(qty) AS min_value, max(qty) AS max_value
         |FROM t GROUP BY symbol""".stripMargin,
    "o3_recent_events" ->
      s"""WITH t AS ($T)
         |SELECT trade_id, ts_ms, symbol, price FROM t
         |ORDER BY ts_ms DESC, trade_id DESC LIMIT 10""".stripMargin,
    "o4_top5_per_group" ->
      s"""WITH t AS ($T),
         |r AS (
         |  SELECT symbol, trade_id, price,
         |    row_number() OVER (PARTITION BY symbol ORDER BY price DESC, trade_id) AS rank_in_group
         |  FROM t)
         |SELECT * FROM r WHERE rank_in_group <= 5""".stripMargin
  )
}
