package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.BookState.Delta

/** Stateful streaming under REAL multi-JVM executors (r13, verdict item 1).
  *
  * Every prior streaming measurement ran in-process (`local[N]`), where
  * state encoders never serialize across a JVM boundary, the RocksDB
  * provider only ever instantiates in the driver, and streaming shuffles
  * never leave the process — the one remaining place a genuine
  * serialization/classpath bug could hide after `clusterverify.json`
  * covered the batch surface. This harness runs the four stateful
  * streambench paths (`hot_path`, `book_state`, `ewma`, `dedup`) under
  * BOTH state-store providers in two modes over IDENTICAL input (same
  * generators, same chunk boundaries, so the micro-batch sequence — and
  * with it watermark progression and state transitions — is the same):
  *
  *   - `local[4]` — the in-process baseline;
  *   - `local-cluster[2,4,…]` ([[GraftSession.withMultiJvm]]) — real
  *     executor processes: typed state encoders and streaming shuffles
  *     serialize, the state-store provider (incl. RocksDB's native lib)
  *     instantiates on remote executors, generated code recompiles per
  *     executor.
  *
  * Each run writes its streaming OUTPUT to parquet (not noop) and the
  * harness compares per-row fingerprints across modes: row count +
  * order-independent XOR and sum of `xxhash64` over every column — an
  * identity check in the EwmaStreamSpec batch-vs-stream mold, but across
  * JVM topologies. `hot_path` is fingerprinted with its float aggregates
  * rounded to 6 dp first: `sum(double)` merges partial aggregates in
  * partition order, and the two modes legitimately split MemoryStream
  * batches differently (defaultParallelism 4 vs 8), so the merge tree —
  * not the semantics — may differ in the last ULP. The per-key sequential
  * paths (`book_state`, `ewma` — explicit in-batch sort by update/trade
  * id) and the row-passthrough `dedup` are compared bit-exact.
  *
  * Emits one JSON line and writes `clusterstream.json`: per row, the
  * local and cluster rates, their ratio, the output row count, and
  * `identity: true/false`; a row that fails in either mode records
  * `completed:false` with [[StreamBench.whyOf]]'s walked root cause —
  * a serialization failure surfacing here is the finding, not a crash.
  */
object ClusterStream {

  private def num(v: Double, dp: Int): String =
    s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)

  private val Chunks = 20
  private val Symbols = 64

  /** (seconds, events) for one path run; output lands in `outDir`. */
  private def runPath(
      spark: SparkSession, path: String, n: Int, outDir: String): (Double, Long) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val perChunk = n / Chunks
    val fed = perChunk * Chunks
    val sec = path match {
      case "hot_path" =>
        val mem = MemoryStream[StreamBench.TradeEvent]
        val out = streaming.HotPath.windowedTradeStats(
          mem.toDF(), "ts", "symbol", "price", "qty",
          windowDuration = "1 second", watermark = "2 seconds")
        StreamBench.timeChunked(out, mem, StreamBench.primeTrades, Chunks,
          c => (0 until perChunk).map(i => StreamBench.eventFor(c.toLong * perChunk + i, Symbols)),
          format = "parquet", path = Some(outDir))._1
      case "book_state" =>
        val mem = MemoryStream[Delta]
        val out = streaming.BookState.maintain(mem.toDS(), depth = 10).toDF()
        StreamBench.timeChunked(out, mem, StreamBench.primeDeltas, Chunks,
          c => (0 until perChunk).map(i => StreamBench.bookDelta(c.toLong * perChunk + i, Symbols)),
          format = "parquet", path = Some(outDir))._1
      case "ewma" =>
        val mem = MemoryStream[streaming.EwmaStream.Px]
        val out = streaming.EwmaStream.features(mem.toDS()).toDF()
        val prime = (0 until 1000).map(i => streaming.EwmaStream.Px(
          s"PRIME${i % 8}", 1700000000000L, i.toLong, 100.0))
        StreamBench.timeChunked(out, mem, prime, Chunks,
          c => (0 until perChunk).map { i =>
            val id = c.toLong * perChunk + i
            streaming.EwmaStream.Px(
              s"SYM${id % Symbols}", 1700000000000L + (id / Symbols) * 50L,
              id, 100.0 + (id % 1000) * 0.01)
          },
          format = "parquet", path = Some(outDir))._1
      case "dedup" =>
        val mem = MemoryStream[StreamBench.TradeEvent]
        val out = streaming.HotPath.dedupStream(
          mem.toDF(), "ts", Seq("symbol", "trade_id"), watermark = "10 seconds")
        StreamBench.timeChunked(out, mem, StreamBench.primeTrades, Chunks,
          c => (0 until perChunk).map { i =>
            val id = c.toLong * perChunk + i
            StreamBench.eventFor(if (id % 10 == 9) id - 1 else id, Symbols)
          },
          format = "parquet", path = Some(outDir))._1
      case other => sys.error(s"unknown path $other")
    }
    (sec, fed.toLong)
  }

  /** Order-independent output fingerprint: (rows, xor, sum) of xxhash64
    * over every column — for `hot_path`, double aggregates rounded to 6 dp
    * first (see object doc). The sum runs in decimal(38,0): summing raw
    * Long hashes overflows almost surely past a few thousand rows, which
    * under Spark 4's default ANSI mode is an ARITHMETIC_OVERFLOW error,
    * not a wrap. Computed distributively; only the 3-number row is
    * collected.
    */
  private def fingerprint(spark: SparkSession, dir: String, path: String): (Long, Long, String) = {
    val raw = spark.read.parquet(dir)
    val df =
      if (path == "hot_path")
        raw.select(col("symbol"), col("open_time"), col("trade_count"),
          round(col("volume"), 6).as("volume"),
          col("min_price"), col("max_price"),
          round(col("vwap"), 6).as("vwap"))
      else raw
    val h = xxhash64(df.columns.toIndexedSeq.map(col): _*)
    val row = df.select(
      count(lit(1)).as("n"),
      coalesce(bit_xor(h), lit(0L)).as("x"),
      coalesce(sum(h.cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)")).as("s")).head()
    (row.getLong(0), row.getLong(1), row.getDecimal(2).toBigInteger.toString)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val clusterMaster = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]")
    val base = java.nio.file.Files.createTempDirectory("clusterstream")
    val paths = Seq("hot_path", "book_state", "ewma", "dedup")
    val rows = for (p <- paths; rocks <- Seq(false, true))
      yield (p, rocks, s"$p${if (rocks) "_rocksdb" else ""}")

    // (mode, rowName) -> Right((sec, events, fingerprint)) | Left(why)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), Either[String, (Double, Long, (Long, Long, String))]]

    for ((mode, master) <- Seq("local" -> s"local[$cpus]", "cluster" -> clusterMaster)) {
      val b0 = SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      val spark =
        (if (master.startsWith("local-cluster")) GraftSession.withMultiJvm(b0) else b0)
          .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val OnHeapProvider =
          "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
        for ((p, rocks, name) <- rows) {
          if (rocks) GraftSession.configureRocksDbState(spark)
          else spark.conf.set("spark.sql.streaming.stateStore.providerClass", OnHeapProvider)
          val outDir = s"$base/$mode/$name"
          try {
            val (sec, events) = runPath(spark, p, n, outDir)
            val fp = fingerprint(spark, outDir, p)
            require(fp._1 > 0, s"$name/$mode produced an EMPTY output — identity would be vacuous")
            results((mode, name)) = Right((sec, events, fp))
            System.err.println(s"[clusterstream] $mode/$name: ${num(events / sec, 0)} ev/s, " +
              s"rows=${fp._1} xor=${fp._2} sum=${fp._3}")
          } catch {
            case scala.util.control.NonFatal(e) =>
              results((mode, name)) = Left(StreamBench.whyOf(e))
              System.err.println(s"[clusterstream] $mode/$name FAILED: $e")
          }
        }
      } finally {
        spark.stop()
        // local-cluster leaves the static SparkContext slot dirty for ~a beat
        Thread.sleep(1000)
      }
    }
    StreamBench.deleteRecursively(base)

    val rowJson = rows.map { case (_, _, name) =>
      (results.get(("local", name)), results.get(("cluster", name))) match {
        case (Some(Right((lSec, ev, lFp))), Some(Right((cSec, _, cFp)))) =>
          val identity = lFp == cFp
          "\"" + name + "\":" +
            s"""{"completed":true,"identity":$identity,"rows":${lFp._1},""" +
            s""""rate_local":${num(ev / lSec, 0)},"rate_cluster":${num(ev / cSec, 0)},""" +
            s""""cluster_over_local":${num(cSec / lSec, 2)},""" +
            s""""fp_local":[${lFp._2},${lFp._3}],"fp_cluster":[${cFp._2},${cFp._3}]}"""
        case (l, c) =>
          def why(r: Option[Either[String, _]]) = r match {
            case Some(Left(w)) => "\"" + w + "\""
            case Some(Right(_)) => "null"
            case None => "\"not run\""
          }
          "\"" + name + "\":" +
            s"""{"completed":false,"why_local":${why(l)},"why_cluster":${why(c)}}"""
      }
    }
    val allIdentical = rows.forall { case (_, _, name) =>
      (results.get(("local", name)), results.get(("cluster", name))) match {
        case (Some(Right((_, _, l))), Some(Right((_, _, c)))) => l == c
        case _ => false
      }
    }
    val json =
      s"""{"metric":"stateful_streaming_multijvm_identity","unit":"events/sec",""" +
        s""""events_per_row":$n,"chunks":$Chunks,"symbols":$Symbols,"cpus":$cpus,""" +
        s""""cluster_master":"$clusterMaster","all_identical":$allIdentical,""" +
        rowJson.mkString("\"rows\":{", ",", "}}")
    java.nio.file.Files.write(
      Bench.recordPath("clusterstream",
        smoke = n != 200000 || cpus != "4" || sys.env.contains("SPARK_GRAFT_MASTER")),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    if (!allIdentical) sys.exit(2)
  }
}
