package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num.nz
import graft.functions.TimeUnits

/** Scalar-function surface (SURVEY §2.8): math, date/time, string, array /
  * higher-order, JSON, hash. All row-level — whole-stage codegen keeps these
  * in one pass over the scan with no shuffle at all.
  */
object ScalarQueries {
  private val T = Tables.tradesOracleCte

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Math family: ln/sqrt/pow/abs/sign/round + cyclical time encodings
    // (S3_SCHEMA.md:583-586, RDS_SCHEMA.md:739-745).
    "f_math_scalars" -> { (s, dir) =>
      val hour = (TimeUnits.bucketIndex(col("ts_ms"), 3600000L) % 24).cast("double")
      Tables.trades(s, dir)
        .filter(col("trade_id") < 1000)
        .select(
          col("trade_id"),
          nz(round(log(col("price")), 6)).as("ln_price"),
          round(sqrt(col("price")), 6).as("sqrt_price"),
          round(pow(col("price"), 2.0), 4).as("price_sq"),
          abs(col("price") - 100.0).as("abs_dev"),
          when(col("price") > 100.0, 1).when(col("price") < 100.0, -1).otherwise(0).as("sign_dev"),
          nz(round(sin(hour * (2.0 * math.Pi) / 24.0), 6)).as("hour_sin"),
          nz(round(cos(hour * (2.0 * math.Pi) / 24.0), 6)).as("hour_cos"))
    },
    // Date/time family: hour/day extraction, partition-key derivation
    // (s3_writer.py:219-226), session flag (S3_SCHEMA.md:587-589).
    "f_datetime_scalars" -> { (s, dir) =>
      val ts = TimeUnits.millisToTimestamp(col("ts_ms"))
      Tables.trades(s, dir)
        .filter(col("trade_id") < 1000)
        .select(
          col("trade_id"),
          col("ts_ms"),
          hour(ts).cast("long").as("hour_of_day"),
          date_format(ts, "EEEE").as("day_name"),
          date_format(ts, "yyyy").as("yyyy"),
          date_format(ts, "MM").as("mm"),
          date_format(ts, "dd").as("dd"),
          date_format(ts, "HH").as("hh"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(1000L))).divide(1000L).cast("long").as("epoch_s"),
          hour(ts).between(13, 21).as("is_us_hours"))
    },
    // String family: upper/split/regexp_extract/substr (s3_reader.py:124-152).
    "f_string_scalars" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        upper(col("lang")).as("lang_uc"),
        regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_num"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        element_at(split(col("text"), " "), 1).as("first_token"),
        length(col("text")).cast("long").as("text_len"),
        substring(col("text"), 1, 16).as("prefix16"))
    },
    // K3 — Binance kline positional-array → named-struct normalization
    // (s3_writer.py:151-175) + derived vwap (transformer.py:134-135), and
    // P6 — fixed-8dp numeric formatting with trailing-zero strip
    // (binance_sbe.py:339-352).
    "k3_kline_normalize" -> { (s, dir) =>
      val t = Tables.trades(s, dir).filter(col("trade_id") < 2000)
      // build the 12-element kline-style array, then destructure positionally
      val arr = array(
        col("ts_ms").cast("double"), col("price") * 0.99, col("price") * 1.01,
        col("price") * 0.98, col("price"), col("qty"),
        (col("ts_ms") + 59999L).cast("double"), col("price") * col("qty"),
        lit(7.0), col("qty") * 0.4, col("price") * col("qty") * 0.4, lit(0.0))
      t.select(col("trade_id"), arr.as("k"))
        .select(
          col("trade_id"),
          element_at(col("k"), 1).cast("long").as("open_time"),
          element_at(col("k"), 2).as("open_price"),
          element_at(col("k"), 3).as("high_price"),
          element_at(col("k"), 4).as("low_price"),
          element_at(col("k"), 5).as("close_price"),
          element_at(col("k"), 6).as("volume"),
          element_at(col("k"), 7).cast("long").as("close_time"),
          element_at(col("k"), 8).as("quote_volume"),
          element_at(col("k"), 9).cast("int").as("trade_count"),
          (element_at(col("k"), 8) / nullif(element_at(col("k"), 6), lit(0.0))).as("vwap"),
          regexp_replace(
            regexp_replace(format_string("%.8f", element_at(col("k"), 5)), "0+$", ""),
            "\\.$", "").as("close_str"))
    },
    // Hash family: md5 of record content (kinesis_client.py:336-344), plus
    // the hex-prefix→int64 primitive the minhash dedup reuses.
    "f_hash_scalars" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long").as("hash_prefix"))
    },
    // Array / higher-order family: element access, slice, aggregate-fold
    // (feature_builder.py:311-331 top-5 depth sums).
    "f_array_scalars" -> { (s, dir) =>
      val asDouble = transform(col("embedding"), (x: org.apache.spark.sql.Column) => x.cast("double"))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        nz(round(element_at(col("embedding"), 1).cast("double"), 6)).as("first_elem"),
        nz(round(
          aggregate(slice(asDouble, 1, 5), lit(0.0), (acc, x) => acc + x), 6))
          .as("sum_first5"),
        round(
          sqrt(aggregate(asDouble, lit(0.0), (acc, x) => acc + x * x)), 6)
          .as("l2_norm"))
    }
  )

  val oracle: Map[String, String] = Map(
    "f_math_scalars" ->
      s"""WITH t AS ($T)
         |SELECT trade_id,
         |  round(ln(price), 6) + 0.0 AS ln_price,
         |  round(sqrt(price), 6) AS sqrt_price,
         |  round(pow(price, 2.0), 4) AS price_sq,
         |  abs(price - 100.0) AS abs_dev,
         |  CASE WHEN price > 100.0 THEN 1 WHEN price < 100.0 THEN -1 ELSE 0 END AS sign_dev,
         |  round(sin(((ts_ms // 3600000) % 24) * (2.0 * pi()) / 24.0), 6) + 0.0 AS hour_sin,
         |  round(cos(((ts_ms // 3600000) % 24) * (2.0 * pi()) / 24.0), 6) + 0.0 AS hour_cos
         |FROM t WHERE trade_id < 1000""".stripMargin,
    "f_datetime_scalars" ->
      s"""WITH t AS ($T)
         |SELECT trade_id, ts_ms,
         |  hour(make_timestamp(ts_ms * 1000)) AS hour_of_day,
         |  dayname(make_timestamp(ts_ms * 1000)) AS day_name,
         |  strftime(make_timestamp(ts_ms * 1000), '%Y') AS yyyy,
         |  strftime(make_timestamp(ts_ms * 1000), '%m') AS mm,
         |  strftime(make_timestamp(ts_ms * 1000), '%d') AS dd,
         |  strftime(make_timestamp(ts_ms * 1000), '%H') AS hh,
         |  ts_ms // 1000 AS epoch_s,
         |  hour(make_timestamp(ts_ms * 1000)) BETWEEN 13 AND 21 AS is_us_hours
         |FROM t WHERE trade_id < 1000""".stripMargin,
    "f_string_scalars" ->
      """SELECT doc_id,
        |  upper(lang) AS lang_uc,
        |  CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS src_num,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_token,
        |  length(text) AS text_len,
        |  substr(text, 1, 16) AS prefix16
        |FROM documents""".stripMargin,
    "k3_kline_normalize" ->
      s"""WITH t AS ($T),
         |k AS (
         |  SELECT trade_id,
         |    [CAST(ts_ms AS DOUBLE), price * 0.99, price * 1.01, price * 0.98,
         |     price, qty, CAST(ts_ms + 59999 AS DOUBLE), price * qty,
         |     7.0, qty * 0.4, price * qty * 0.4, 0.0] AS k
         |  FROM t WHERE trade_id < 2000)
         |SELECT trade_id,
         |  CAST(k[1] AS BIGINT) AS open_time,
         |  k[2] AS open_price,
         |  k[3] AS high_price,
         |  k[4] AS low_price,
         |  k[5] AS close_price,
         |  k[6] AS volume,
         |  CAST(k[7] AS BIGINT) AS close_time,
         |  k[8] AS quote_volume,
         |  CAST(k[9] AS INT) AS trade_count,
         |  k[8] / nullif(k[6], 0.0) AS vwap,
         |  regexp_replace(regexp_replace(printf('%.8f', k[5]), '0+$$', ''), '\\.$$', '') AS close_str
         |FROM k""".stripMargin,
    "f_hash_scalars" ->
      """SELECT doc_id,
        |  md5(text) AS text_md5,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS hash_prefix
        |FROM documents""".stripMargin,
    "f_array_scalars" ->
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_elem,
        |  round(list_sum(list_transform(embedding[1:5], x -> CAST(x AS DOUBLE))), 6) + 0.0 AS sum_first5,
        |  round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
        |FROM embeddings""".stripMargin
  )
}
