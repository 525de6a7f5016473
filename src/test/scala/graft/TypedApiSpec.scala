package graft

import org.apache.spark.sql.functions._

import graft.schemas.Schemas
import graft.schemas.Schemas._

class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("Dataset[Trade] typed pipeline: filter + groupByKey aggregation compiles and runs") {
    val ds = Schemas.trades(spark, sf)
    val perSymbol = ds
      .filter(t => t.price > 0 && t.qty >= 0)
      .groupByKey(_.symbol)
      .mapGroups { (sym, it) =>
        val xs = it.toSeq
        (sym, xs.length, xs.map(_.qty).sum)
      }
      .toDF("symbol", "n", "total_qty")
    assert(perSymbol.count() === 5)
    assert(perSymbol.agg(sum($"n")).as[Long].collect()(0) === 1000L)
  }

  test("typed Bar1m roundtrips through the bars operator") {
    val bars = operators.Bars
      .ohlcv(Tables.trades(spark, sf), $"symbol", $"ts_ms", $"price",
        coalesce($"qty", lit(0.0)), $"trade_id", 60000L)
      .select($"symbol", $"open_time_ms", $"open_price", $"high_price",
        $"low_price", $"close_price", $"volume", $"notional", $"trade_count",
        coalesce($"vwap", $"close_price").as("vwap"))
      .as[Bar1m]
    val b = bars.head()
    assert(b.high_price >= math.max(b.open_price, b.close_price))
  }

  test("SQL surface: registered sbe_decode_trade works in spark.sql") {
    GraftFunctions.register(spark)
    Seq((1704067200123456L, 7L, 12345L, -2, false, "BTCUSDT"))
      .toDF("us", "id", "m", "e", "mk", "s")
      .select(functions.Sbe.encodeTrade($"us", $"id", $"m", $"e", $"mk", $"s").as("frame"))
      .createOrReplaceTempView("frames")
    val out = spark.sql(
      "SELECT sbe_decode_trade(frame).trade_id AS tid, sbe_decode_trade(frame).price AS px FROM frames")
      .collect()(0)
    assert(out.getAs[Long]("tid") === 7L)
    assert(math.abs(out.getAs[Double]("px") - 123.45) < 1e-9)
  }

  test("SQL surface: registered text kernels match the Column API") {
    GraftFunctions.register(spark)
    Seq("the quick brown fox jumps").toDF("text").createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      """SELECT graft_rolling_hash(text, 131, 1000000007) AS rh,
        |       graft_simhash32(text) AS sh,
        |       size(graft_word_shingles(text, 3)) AS nw,
        |       size(graft_char_shingles(text, 5)) AS nc,
        |       size(graft_shingle_hashes(text, 3, 1000000007)) AS nh,
        |       graft_ngram_repetition(text, 2).n_distinct AS nd,
        |       graft_gram_dominance(text, 1).top_gram AS tg
        |FROM docs""".stripMargin).collect()(0)
    val viaCol = spark.table("docs")
      .select(
        functions.TextFunctions.rollingHash($"text").as("rh"),
        functions.TextFunctions.simhash32($"text").as("sh"),
        org.apache.spark.sql.functions.size(functions.TextFunctions.shingles($"text", 3)).as("nw"),
        org.apache.spark.sql.functions.size(functions.TextFunctions.charShingles($"text", 5)).as("nc"),
        org.apache.spark.sql.functions.size(functions.TextFunctions.shingleHashes($"text", 3)).as("nh"),
        functions.TextFunctions.ngramRepetition($"text", 2).getField("n_distinct").as("nd"),
        functions.TextFunctions.gramDominance($"text", 1).getField("top_gram").as("tg"))
      .collect()(0)
    assert(viaSql === viaCol)
  }

  test("SQL surface: graft_dot / graft_d2 match the Column API incl. null contract") {
    GraftFunctions.register(spark)
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(1.0, 2.0), Seq(4.0, 5.0, 6.0)) // length mismatch → null
    ).toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_d2(a, b) AS e FROM vecs ORDER BY id")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    val viaCol = spark.table("vecs").orderBy("id")
      .select(
        operators.VectorOps.dot($"a", $"b").as("d"),
        operators.VectorOps.d2($"a", $"b").as("e"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(viaSql === viaCol)
    assert(viaSql(0) === ((Some(32.0), Some(27.0))))
    assert(viaSql(1) === ((None, None)))
  }

  test("ngramRepetition kernel is bit-identical to the declarative sequence+slice form") {
    import org.apache.spark.sql.functions._
    // edge cases: empty, shorter than n, exact n, trailing spaces (Spark's
    // split keeps trailing empty tokens), repeats, unicode
    val edge = Seq(
      "", "a", "a b", "a b c", "a b c ", "  ", "a a a a a a",
      "x y z x y z x y z", "ü ber ü ber ü").toDF("text")
    val corpus = Tables.documents(spark, sf).select(col("text")).limit(200)
    for (df <- Seq(edge, corpus)) {
      val tk = split(col("text"), " ")
      val n = size(tk)
      val grams = when(
        n >= 3,
        transform(sequence(lit(1), n - 2), i => concat_ws(" ", slice(tk, i, lit(3)))))
        .otherwise(array().cast("array<string>"))
      val declarative = df.select(
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      val kernel = df.select(
        functions.TextFunctions.ngramRepetition(col("text"), 3).as("r"))
        .select(col("r.n_grams").as("n_grams"), col("r.n_distinct").as("n_distinct"))
      assert(kernel.exceptAll(declarative).isEmpty && declarative.exceptAll(kernel).isEmpty)
    }
  }

  test("gramDominance kernel matches a declarative explode+count, ties break low") {
    import org.apache.spark.sql.functions._
    val edge = Seq(
      "a", "a b", "b a b a", // tie at n=1 between a and b -> 'a' wins
      "a a b b c", "x y x y x", "ü ber ü ber ü", "a b c ").toDF("text")
    val corpus = Tables.documents(spark, sf).select(col("text")).limit(200)
    for (df <- Seq(edge, corpus)) {
      val base = df.withColumn("__id", monotonically_increasing_id())
      val declarative = base
        .select(col("__id"), explode(split(col("text"), " ", -1)).as("tok"))
        .groupBy("__id", "tok").count()
        .groupBy("__id")
        .agg(
          sum("count").as("n_grams"),
          max("count").as("max_count"),
          min_by(col("tok"), struct(negate(col("count")), col("tok"))).as("top_gram"))
        .select("__id", "n_grams", "max_count", "top_gram")
      val kernel = base
        .select(col("__id"), functions.TextFunctions.gramDominance(col("text"), 1).as("g"))
        .select(
          col("__id"), col("g.n_grams").as("n_grams"),
          col("g.max_count").as("max_count"), col("g.top_gram").as("top_gram"))
      assert(kernel.exceptAll(declarative).isEmpty && declarative.exceptAll(kernel).isEmpty)
    }
  }
}
