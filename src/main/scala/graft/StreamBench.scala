package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.BookState.Delta

/** Streaming / ingest throughput benchmark — the measured counterpart of the
  * reference's published service targets (BASELINE.md): SBE decode 1,000
  * events/s target / 5,000 peak, Kinesis 5,000 rec/s target / 25,000 peak
  * (`docs/architecture/ARCHITECTURE.md:251-253`). Those are the numbers a
  * user of the reference holds this engine to, so they get measured, not
  * argued.
  *
  * Five rows, each events-per-second of sustained processing on local[N]:
  *   - `sbe_decode`: the ingest-edge decode — SBE trade frames (binary)
  *     through the codegen [[graft.functions.Sbe.decodeTrade]] Expression,
  *     batch shape (the per-row kernel is identical under streaming; batch
  *     isolates decode from micro-batch accounting). Input pre-materialized,
  *     so the number is decode+project only.
  *   - `hot_path`: [[streaming.HotPath.windowedTradeStats]] — watermarked
  *     event-time 1 s bars per symbol through real micro-batches (MemoryStream,
  *     one `processAllAvailable` per chunk), the reference's
  *     aggregator hot path.
  *   - `book_state`: [[streaming.BookState.maintain]] — per-symbol order-book
  *     delta replay in `flatMapGroupsWithState` (typed state, update-id
  *     replay guard), the reference's depth-cache path.
  *   - `ewma`: [[streaming.EwmaStream.features]] — per-EVENT feature
  *     emission (one output row per input tick through
  *     `flatMapGroupsWithState`), the reference's per-tick feature path;
  *     unlike hot_path there is no window compaction to amortize into.
  *   - `dedup`: `dropDuplicatesWithinWatermark` over a 10%-duplicated trade
  *     stream — the reference's seen-set dedup (T3).
  *
  * Micro-batch count is fixed (`chunks`) so per-batch overhead — trigger
  * planning, state-store commit, offset log — is IN the measurement the way
  * it is in production; a single giant batch would overstate throughput.
  * Rates scale with events/batch: local\[4] sustains ~10^5–10^6 events/s,
  * 2–3 orders of magnitude above the reference's 5 k/s peak target, before
  * any multi-executor scale-out (state is keyed by symbol, so a cluster
  * multiplies these rates by executor count until the shuffle dominates).
  *
  * Emits ONE JSON line (same contract as [[Bench]]) and writes the full
  * record to `streambench.json`.
  */
object StreamBench {

  final case class TradeEvent(symbol: String, ts: java.sql.Timestamp, price: Double, qty: Double, trade_id: Long)

  private def num(v: Double, dp: Int): String =
    s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)

  /** JSON-safe bounded failure text (control chars / quotes / backslashes
    * stripped, hard length cap) — the ONE sanitizer for every sweep
    * failure record (whyOf, the capped-statesweep no-row fallback,
    * MemSweep's stderr tail). */
  private[graft] def jsonSafe(s: String, max: Int): String =
    s.replaceAll("[\\x00-\\x1f\"\\\\]", " ").take(max)

  /** Failure description for a sweep-point record: the top exception plus
    * the ROOT of its cause chain, JSON-safe. Streaming failures wrap the
    * interesting cause (e.g. an executor OutOfMemoryError) three levels
    * deep, and the r12 capped-heap sweep showed a 200-char top-message
    * cut truncates exactly before it — a record that says a point failed
    * must also say why. The top and root are truncated SEPARATELY: a
    * combined cap eats the root segment exactly when the wrapper message
    * is long, which is when the root matters most (the first r12
    * capped-heap record proved it — a 500-char StreamingQueryException
    * wrapper left no room for the root). The walk is cycle-guarded by
    * identity, not depth-capped: a depth cap would LABEL a mid-chain
    * wrapper as the root. */
  private[graft] def whyOf(e: Throwable): String = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Throwable, java.lang.Boolean]())
    var root = e
    while (root.getCause != null && seen.add(root)) root = root.getCause
    val top = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
    if (root eq e) jsonSafe(top, 500)
    else {
      val rootTxt =
        s"${root.getClass.getSimpleName}: ${Option(root.getMessage).getOrElse("")}"
      jsonSafe(top, 355) + " | root: " + jsonSafe(rootTxt, 136)
    }
  }

  /** Book delta for the `id`-th event over `syms` live symbols. Side and
    * price level derive from the symbol's own SEQUENCE number (id / syms),
    * NOT from id: with an even symbol count, id's parity fixes the side
    * per symbol (every book one-sided) and gcd(syms, 200) collapses the
    * price grid to a handful of residues — the first cut measured books
    * ~16x sparser and half-sided vs what it claimed. Within the sequence,
    * side comes from seq's parity and the level from (seq/2) % 200 — the
    * level counter advances once per side-pair, so BOTH sides walk all
    * 200 residues (level from seq % 200 would couple to the parity and
    * give each side only its 100 matching residues); qty 0 every 11th =
    * delete.
    */
  private[graft] def bookDelta(id: Long, syms: Int): Delta = {
    val seq = id / syms
    Delta(
      s"SYM${id % syms}", id, 1700000000000L + seq * 50L,
      if (seq % 2 == 0) "bid" else "ask",
      100.0 + ((seq / 2) % 200) * 0.05 * (if (seq % 2 == 0) -1 else 1),
      if (seq % 11 == 0) 0.0 else 1.0 + (seq % 5))
  }

  private[graft] def primeDeltas: Seq[Delta] = (0 until 1000).map(i =>
    Delta(s"PRIME${i % 8}", i.toLong, 1700000000000L, "bid", 100.0, 1.0))

  /** Deterministic trade event for the streaming rows: event time advances
    * ~50 ms per event per symbol so 1 s windows close steadily under the
    * watermark as chunks arrive.
    */
  private[graft] def eventFor(id: Long, symbols: Int): TradeEvent = TradeEvent(
    s"SYM${id % symbols}",
    new java.sql.Timestamp(1700000000000L + (id / symbols) * 50L),
    100.0 + (id % 1000) * 0.01,
    1.0 + (id % 7),
    id)

  /** Priming events on PRIME* keys at the stream's start timestamp:
    * state-store + sink init happens outside the timing WITHOUT feeding the
    * timed pass any already-seen events (a re-added prefix would be replay
    * no-ops for book_state, the only true duplicates for dedup, and
    * double-counted windows for hot_path — each row then measuring a subtly
    * different workload than labeled).
    */
  private[graft] def primeTrades: Seq[TradeEvent] = (0 until 1000).map { i =>
    TradeEvent(s"PRIME${i % 8}", new java.sql.Timestamp(1700000000000L),
      100.0, 1.0, i.toLong)
  }

  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(root)
    try walk.iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** THE chunked measurement: prime batch (state-store + sink spin-up,
    * untimed), then `chunks` data chunks with one `processAllAvailable`
    * barrier each — per-batch overhead (trigger planning, state commit,
    * offset log) is IN the measurement the way it is in production.
    * Returns (seconds, last state-operator progress, avg per-batch
    * durationMs phase breakdown over the timed batches). Single
    * implementation for all three benches (throughput rows, statesweep,
    * batch sweep) so the timing methodology cannot drift between them;
    * stops the query + deletes the checkpoint even on failure — a
    * survivor would contend with every subsequent run for the same
    * local[N] cores.
    */
  private[graft] def timeChunked[T](
      out: org.apache.spark.sql.DataFrame,
      mem: MemoryStream[T],
      prime: Seq[T],
      chunks: Int,
      data: Int => Seq[T],
      // sink override ([[ClusterStream]]): "parquet" + a path captures the
      // OUTPUT for identity checks; the default noop sink stays the
      // throughput-bench shape (no write cost in the measurement)
      format: String = "noop",
      path: Option[String] = None)
      : (Double, Option[org.apache.spark.sql.streaming.StateOperatorProgress],
         Map[String, Double]) = {
    val ckpt = java.nio.file.Files.createTempDirectory("sb_chunked")
    val w0 = out.writeStream.outputMode("append").format(format)
      .option("checkpointLocation", ckpt.toString)
    val q = path.fold(w0)(p => w0.option("path", p)).start()
    try {
      mem.addData(prime)
      q.processAllAvailable()
      // processAllAvailable can return after offsets commit but a beat
      // before the batch's progress is POSTED — poll until the progress list
      // is non-empty and its tail batchId is stable across two reads (a
      // fixed sleep was a timing bet on a loaded box), so the prime batch
      // cannot leak into the timed phase averages
      val lastPrimeBatch = {
        var prev = -2L
        var cur = q.recentProgress.lastOption.map(_.batchId).getOrElse(-1L)
        var waited = 0
        while ((cur != prev || cur < 0) && waited < 5000) {
          prev = cur
          Thread.sleep(100)
          waited += 100
          cur = q.recentProgress.lastOption.map(_.batchId).getOrElse(-1L)
        }
        // a stale/-1 id here means the prime batch (and any trailing no-data
        // batch) would be COUNTED as timed work — the phase averages and
        // _batches_observed of this row would be silently contaminated.
        // Fail loudly: every sweep row must be a clean measurement.
        require(cur >= 0 && cur == prev,
          s"prime batch progress not stable after ${waited} ms (batchId=$cur, prev=$prev) — " +
            "phase attribution would include the untimed prime batch; box too loaded to measure")
        cur
      }
      val t0 = System.nanoTime()
      (0 until chunks).foreach { c =>
        mem.addData(data(c))
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val so = Option(q.lastProgress).flatMap(p => p.stateOperators.headOption)
      // Per-batch phase attribution from the engine's own accounting
      // (durationMs: triggerExecution and its parts — queryPlanning,
      // walCommit, commitOffsets, addBatch, getBatch, latestOffset),
      // averaged over the TIMED batches still in the retained progress
      // window (prime-batch entries excluded BY BATCH ID — the window is a
      // last-100 slide, so a positional drop would cut timed entries once
      // batches exceed the retention).
      import scala.jdk.CollectionConverters._
      val progs = q.recentProgress.filter(_.batchId > lastPrimeBatch).toSeq
      val phases =
        if (progs.isEmpty) Map.empty[String, Double]
        else progs
          .flatMap(_.durationMs.asScala)
          .groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2.toDouble).sum / progs.size }
      (sec, so, phases + ("_batches_observed" -> progs.size.toDouble))
    } finally {
      q.stop()
      deleteRecursively(ckpt)
    }
  }

  /** One stateful throughput row, fully assembled: the MemoryStream, the
    * output DataFrame, the prime batch and the per-chunk data generator —
    * THE single definition of the four stateful workloads, consumed by
    * both [[throughputChild]] (noop sink, rates) and [[ClusterStream]]
    * (parquet sink, cross-topology identity). A window/watermark/
    * duplication-rate tweak in one harness cannot silently diverge from
    * the other — the identity check's "same generators, same chunk
    * boundaries" premise is enforced by construction, not by keeping two
    * copies in sync (r13 review). Build a FRESH instance per run: the
    * MemoryStream inside is stateful.
    */
  private[graft] final case class StatefulRow[T](
      mem: MemoryStream[T],
      out: org.apache.spark.sql.DataFrame,
      prime: Seq[T],
      chunkFn: (Int, Int) => Seq[T]) { // (chunkIdx, perChunk)
    def time(chunks: Int, perChunk: Int, format: String = "noop",
        path: Option[String] = None)
        : (Double, Option[org.apache.spark.sql.streaming.StateOperatorProgress],
           Map[String, Double]) =
      timeChunked(out, mem, prime, chunks, c => chunkFn(c, perChunk), format, path)
  }

  private[graft] val StatefulPaths: Seq[String] =
    Seq("hot_path", "book_state", "ewma", "dedup")

  private[graft] def statefulRow(
      spark: SparkSession, path: String, symbols: Int): StatefulRow[_] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    path match {
      case "hot_path" =>
        // watermarked event-time 1 s bars per symbol — the aggregator hot path
        val mem = MemoryStream[TradeEvent]
        StatefulRow(mem,
          streaming.HotPath.windowedTradeStats(
            mem.toDF(), "ts", "symbol", "price", "qty",
            windowDuration = "1 second", watermark = "2 seconds"),
          primeTrades,
          (c, per) => (0 until per).map(i => eventFor(c.toLong * per + i, symbols)))
      case "book_state" =>
        // per-symbol order-book delta replay in flatMapGroupsWithState
        val mem = MemoryStream[Delta]
        StatefulRow(mem,
          streaming.BookState.maintain(mem.toDS(), depth = 10).toDF(),
          primeDeltas,
          (c, per) => (0 until per).map(i => bookDelta(c.toLong * per + i, symbols)))
      case "ewma" =>
        // per-EVENT emission (one output row per input tick) — the per-tick
        // feature path, unlike hot_path's window-per-second compaction
        val mem = MemoryStream[streaming.EwmaStream.Px]
        StatefulRow(mem,
          streaming.EwmaStream.features(mem.toDS()).toDF(),
          (0 until 1000).map(i => streaming.EwmaStream.Px(
            s"PRIME${i % 8}", 1700000000000L, i.toLong, 100.0)),
          (c, per) => (0 until per).map { i =>
            val id = c.toLong * per + i
            streaming.EwmaStream.Px(
              s"SYM${id % symbols}", 1700000000000L + (id / symbols) * 50L,
              id, 100.0 + (id % 1000) * 0.01)
          })
      case "grid" =>
        // fixed-cadence LOCF tick emission — the hot path's actual 2 s
        // emission contract (T1/K4). NOT in StatefulPaths: the committed
        // streambench.json row set must not change under a carried record;
        // ClusterStream appends this path explicitly for the cross-topology
        // identity check (r15, verdict item 8). Emission is watermark-
        // finalized, so identical chunk boundaries give an identical tick
        // stream regardless of micro-batch split — the identity premise.
        val mem = MemoryStream[streaming.GridTicker.Obs]
        StatefulRow(mem,
          streaming.GridTicker.ticks(mem.toDS(), stepMs = 2000L).toDF(),
          (0 until 1000).map(i => streaming.GridTicker.Obs(
            s"PRIME${i % 8}", 1700000000000L + i.toLong * 10L, 100.0)),
          (c, per) => (0 until per).map { i =>
            val id = c.toLong * per + i
            streaming.GridTicker.Obs(
              s"SYM${id % symbols}", 1700000000000L + (id / symbols) * 50L,
              100.0 + (id % 1000) * 0.01)
          })
      case "dedup" =>
        // 10% duplicates: every 10th slot carries the WHOLE previous event
        // again — same (symbol, trade_id) key, a genuine collision the
        // dedup operator must drop (a single id->event constructor keeps
        // the duplicate's symbol identical, not just its id)
        val mem = MemoryStream[TradeEvent]
        StatefulRow(mem,
          streaming.HotPath.dedupStream(
            mem.toDF(), "ts", Seq("symbol", "trade_id"), watermark = "10 seconds"),
          primeTrades,
          (c, per) => (0 until per).map { i =>
            val id = c.toLong * per + i
            eventFor(if (id % 10 == 9) id - 1 else id, symbols)
          })
      case other => sys.error(s"unknown stateful path $other")
    }
  }

  def main(args: Array[String]): Unit =
    if (sys.env.get("SPARK_GRAFT_STATE_CAPPED").contains("1")) stateCappedParent()
    else if (sys.env.get("SPARK_GRAFT_STATE_SWEEP").contains("1")) stateSweep()
    else if (sys.env.get("SPARK_GRAFT_BATCH_SWEEP").contains("1")) batchSweep()
    else if (sys.env.get("SPARK_GRAFT_STREAM_CHILD").contains("1")) throughputChild()
    else throughputParent()

  /** Constrained-heap statesweep (r12, verdict item 6): the 262k- and
    * 1M-key configurations of [[stateSweep]] re-run one CAPPED child JVM
    * each (`-Xmx` from SPARK_GRAFT_STATE_XMX, default 2g) — the streaming
    * analog of [[MemSweep]]. The design claim under test: RocksDB keeps
    * state in native memory + SSTs, so a capped HEAP should not touch it,
    * while the on-heap provider holds every key's state as JVM objects and
    * may legitimately die — that trade-off is the documented reason for
    * [[GraftSession.withRocksDbStateStore]]. One child per point so an OOM
    * is an isolated verdict (recorded, nonfatal), exactly MemSweep's
    * semantics. Writes `statesweep_capped.json`.
    */
  private def stateCappedParent(): Unit = {
    import scala.jdk.CollectionConverters._
    val xmx = sys.env.getOrElse("SPARK_GRAFT_STATE_XMX", "2g")
    // pinned EXPLICITLY into each child's env (not just inherited): an
    // ambient SPARK_GRAFT_CPUS=32 export (the measurement script's global)
    // would silently shift the basis off the canonical local[4]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 524288 added r13 (verdict item 7): 262k passed and 1M OOM'd on-heap
    // at -Xmx2g — a 4x bracket, not a threshold. The midpoint turns the
    // "flip the provider past X keys" operating rule into a measured one.
    val points = sys.env.getOrElse(
      "SPARK_GRAFT_STATE_POINTS",
      "262144:heap,262144:rocks,524288:heap,524288:rocks,1048576:heap,1048576:rocks")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms")) :+ s"-Xmx$xmx"
    val cp = sys.props("java.class.path")
    val rows = points.map { point =>
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.StreamBench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_STATE_CAPPED", "0")
      pb.environment().put("SPARK_GRAFT_STATE_SWEEP", "1")
      pb.environment().put("SPARK_GRAFT_STATE_POINT", point)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      val p = pb.start()
      val cause = new java.util.concurrent.atomic.AtomicReference[String](null)
      val drainer = new Thread(() => {
        val r = new java.io.BufferedReader(new java.io.InputStreamReader(p.getErrorStream))
        var line = r.readLine()
        while (line != null) {
          System.err.println(line)
          if (line.contains("OutOfMemoryError") || line.contains("Not enough memory") ||
            line.contains("Killed")) cause.compareAndSet(null, line)
          line = r.readLine()
        }
      }, s"statecapped-$point-stderr")
      drainer.setDaemon(true)
      drainer.start()
      val deadlineMin = Bench.roundTimeoutMin(default = 30L)
      val watchdog = new Thread(() => {
        if (!p.waitFor(deadlineMin, java.util.concurrent.TimeUnit.MINUTES)) p.destroyForcibly()
      }, s"statecapped-$point-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
      var row: Option[(String, String)] = None
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("#GRAFT SROW ")) {
          val Array(n, json) = line.drop(12).split(" ", 2)
          row = Some((n, json))
        }
        line = reader.readLine()
      }
      p.waitFor(1, java.util.concurrent.TimeUnit.MINUTES)
      drainer.join(5000)
      val (name, json) = row.getOrElse {
        // jsonSafe at the whyOf budget, not a 200-char cut: this fallback
        // fires exactly when the child died hard (OOM kill, watchdog), and
        // a truncated cause line here is the same lost-root failure mode
        // whyOf exists to prevent.
        val why = jsonSafe(Option(cause.get).getOrElse("no row emitted"), 500)
        val nm = "book_" + point.replace(":rocks", "_rocksdb").replace(":heap", "")
        (nm, s"""{"completed":false,"exit":${if (p.isAlive) -1 else p.exitValue()},"why":"$why"}""")
      }
      System.err.println(s"[statecapped] $name -> $json")
      name -> json
    }
    val json =
      s"""{"metric":"book_state_capped_heap","unit":"events/sec","xmx":"$xmx","cpus":$cpus,""" +
        rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("\"runs\":{", ",", "}}")
    java.nio.file.Files.write(
      Bench.recordPath("statesweep_capped", smoke = xmx != "2g" || cpus != "4" ||
        sys.env.contains("SPARK_GRAFT_STATE_POINTS") || sys.env.contains("SPARK_GRAFT_STREAM_N")),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    val failed = rows.count(!_._2.contains("\"completed\":true"))
    if (failed == rows.size && rows.nonEmpty) sys.exit(2)
  }

  /** Key-cardinality sweep: the BookState path at 64 / 4k / 32k / 256k /
    * 1M live symbols under BOTH providers, recording events/s AND the state
    * store's own accounting (rows, bytes, bytes/key) from the query's
    * final progress — the measured version of the "RocksDB removes the
    * key-cardinality heap ceiling" claim: on-heap bytes/key prices what
    * every additional million keys costs the executor HEAP, the RocksDB
    * row prices the same state held in native memory + SSTs, and the
    * throughput column shows the swap's cost staying flat as keys grow.
    * Event count per point is max(n, 32·symbols) so high-cardinality books
    * hold a comparable number of levels per key (1M events over 262144
    * symbols would otherwise measure near-empty books); each run's actual
    * `events` is recorded in its row. Emits ONE JSON line and writes
    * `statesweep.json`.
    */
  private def stateSweep(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toInt).getOrElse(1000000)
    val chunks = 20
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    import scala.jdk.CollectionConverters._
    import spark.implicits._
    import graft.streaming.BookState

    val OnHeapProvider =
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // SPARK_GRAFT_STATE_POINT="262144:rocks" restricts to ONE (syms,
    // backend) point and emits it as a `#GRAFT SROW` line instead of the
    // sweep record — the capped-heap child contract of stateCappedParent.
    val point = sys.env.get("SPARK_GRAFT_STATE_POINT").map { p =>
      val Array(s, b) = p.split(":")
      (s.toInt, b == "rocks")
    }
    val sweepPoints = point match {
      case Some((s, r)) => Seq((s, r))
      case None =>
        for (s <- Seq(64, 4096, 32768, 262144, 1048576); r <- Seq(false, true)) yield (s, r)
    }
    for ((syms, rocks) <- sweepPoints) {
      val name = s"book_${syms}${if (rocks) "_rocksdb" else ""}"
      // per-POINT failure isolation: a slow progress post or state-store
      // hiccup at one point (e.g. the 1M-key row under load) must record
      // THAT row as failed, not abort the sweep after 30+ min with no
      // record written (the r12 code review's finding on the shared
      // timeChunked's loud prime-batch guard)
      try {
        val perChunk = math.max(n, 32 * syms) / chunks
        val fed = perChunk * chunks // events actually sent (may not divide)
        if (rocks) GraftSession.configureRocksDbState(spark)
        else spark.conf.set("spark.sql.streaming.stateStore.providerClass", OnHeapProvider)
        val mem = MemoryStream[Delta]
        val out = BookState.maintain(mem.toDS(), depth = 10).toDF()
        val (sec, soOpt, _) = timeChunked(out, mem, primeDeltas, chunks,
          c => (0 until perChunk).map(i => bookDelta(c.toLong * perChunk + i, syms)))
        val so = soOpt.getOrElse(
          sys.error(s"$name: no state operator in final progress — nothing was measured"))
        val custom = so.customMetrics.entrySet().asScala
          .filter { e =>
            val k = e.getKey.toLowerCase
            k.contains("memory") || k.contains("sstfilesize") || k.contains("pinned")
          }
          .map(e => s""""${e.getKey}":${e.getValue}""").mkString(",")
        rows(name) =
          s"""{"symbols":$syms,"events":$fed,"rate":${num(fed / sec, 0)},""" +
            s""""state_rows":${so.numRowsTotal},""" +
            s""""state_bytes":${so.memoryUsedBytes},""" +
            s""""bytes_per_key":${num(so.memoryUsedBytes.toDouble / math.max(so.numRowsTotal, 1), 1)}""" +
            (if (custom.nonEmpty) s",$custom}" else "}")
      } catch {
        case scala.util.control.NonFatal(e) =>
          rows(name) = s"""{"symbols":$syms,"completed":false,"why":"${whyOf(e)}"}"""
      }
      System.err.println(s"[sweep] $name: ${rows(name)}")
      if (point.isDefined) {
        val r = rows(name)
        val tagged =
          if (r.contains("\"completed\":false")) r
          else r.dropRight(1) + ",\"completed\":true}"
        println(s"#GRAFT SROW $name $tagged")
      }
    }
    if (point.isEmpty) {
      val json =
        s"""{"metric":"book_state_cardinality_sweep","unit":"events/sec","cpus":$cpus,""" +
          s""""base_events":$n,""" +
          rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("\"runs\":{", ",", "}}")
      java.nio.file.Files.write(
        Bench.recordPath("statesweep", smoke = n != 1000000 || cpus != "4"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(json)
    }
    spark.stop()
  }

  /** Events-per-micro-batch sweep over the hot path (watermarked 1 s bars):
    * same total event count at batch sizes 5k → 1M (the 1M point is ONE
    * batch — the `Trigger.AvailableNow`-shaped catch-up form). The
    * throughput row prices per-batch fixed cost (trigger planning,
    * state-store commit, offset log); `batch_seconds` is the matching
    * latency axis — a batch's results are not visible until it commits, so
    * events/batch ÷ rate is the freshness you pay for that throughput.
    * This is the measured basis for choosing trigger intervals: the
    * reference's 5 k/s peak target fits comfortably at every point, the
    * curve says what a bigger budget buys. Writes `batchsweep.json`.
    */
  private def batchSweep(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toInt).getOrElse(1000000)
    val symbols = 64
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // retain every batch's progress: _batches_observed must COUNT the
      // per-chunk batch amplification (each data chunk is followed by a
      // no-data watermark-advance batch), and the default 100-entry window
      // truncates the 200-chunk point
      .config("spark.sql.streaming.numRecentProgressUpdates", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Second dimension: no-data micro-batches ON (default; every data chunk
    // is followed by a watermark-advance batch that pays full trigger
    // overhead for zero rows — the r10 sweep unknowingly measured ~2
    // batches per chunk) vs OFF (eager emission deferred to the next DATA
    // batch — the steady-stream production shape, where triggers always
    // carry data and the empty batch is pure amplification).
    for (chunks <- Seq(200, 50, 20, 5, 1); noData <- Seq(true, false)) {
      val perChunk = n / chunks
      val name = s"batch_$perChunk${if (noData) "" else "_nodata_off"}"
      // per-point isolation, same rationale as stateSweep's
      try {
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData.toString)
        val fed = perChunk * chunks
        val mem = MemoryStream[TradeEvent]
        val out = streaming.HotPath.windowedTradeStats(
          mem.toDF(), "ts", "symbol", "price", "qty",
          windowDuration = "1 second", watermark = "2 seconds")
        val (sec, _, phases) = timeChunked(out, mem, primeTrades, chunks,
          c => (0 until perChunk).map(i => eventFor(c.toLong * perChunk + i, symbols)))
        // phase attribution (avg ms per observed batch, from durationMs)
        val phaseJson = phases.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + num(v, 1) }.mkString("{", ",", "}")
        rows(name) =
          s"""{"events_per_batch":$perChunk,"batches":$chunks,"events":$fed,""" +
            s""""no_data_batches":$noData,""" +
            s""""rate":${num(fed / sec, 0)},"batch_seconds":${num(sec / chunks, 3)},""" +
            s""""phase_avg_ms":$phaseJson}"""
      } catch {
        case scala.util.control.NonFatal(e) =>
          rows(name) = s"""{"events_per_batch":$perChunk,"completed":false,"why":"${whyOf(e)}"}"""
      }
      System.err.println(s"[batch] $name: ${rows(name)}")
    }
    val json =
      s"""{"metric":"hot_path_batch_size_sweep","unit":"events/sec","cpus":$cpus,""" +
        s""""events_total":$n,""" +
        rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("\"runs\":{", ",", "}}")
    java.nio.file.Files.write(
      Bench.recordPath("batchsweep", smoke = n != 1000000 || cpus != "4"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }

  // fixed workload shape of the throughput rows — shared by the child (which
  // runs them) and the parent (which stamps them into the record)
  private val ThroughputChunks = 20
  private val ThroughputSymbols = 64

  /** One fresh-JVM throughput round (r13, verdict item 2): runs every
    * throughput row once and emits per-row stdout lines instead of writing
    * the record —
    * `#GRAFT TROW <name> <seconds> <events>` per completed row,
    * `#GRAFT TFAIL <name>\t<why>` per failed row (the failure IS a row of
    * the record now, not a stderr-only note), `#GRAFT DONE` at the end.
    * [[throughputParent]] forks N of these and aggregates. Streaming rates
    * on this box swing ±20–40 % under load (the r12 round caught one
    * disturbed hot_path reading by hand); fresh-JVM rounds + the bench's
    * disturbance guard make that discipline structural instead of
    * operator vigilance.
    */
  private def throughputChild(): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toInt).getOrElse(1000000)
    val chunks = ThroughputChunks
    val symbols = ThroughputSymbols
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int)]
    // failed rows are RECORD rows too (r13 advice): a row that fails is
    // indistinguishable from a never-run row if only stderr records it
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---------------------------------------------------------- sbe_decode
    // Frames built once by the fixture encoder UDF (off the measured path)
    // and pinned in memory; the timed pass is decode → project → noop, all
    // whole-stage codegen.
    try {
      val frames = spark.range(n.toLong).select(
        functions.Sbe.encodeTrade(
          (col("id") * 1000L + 1700000000000000L), col("id"),
          (col("id") % 900000L + 100000L), lit(-4),
          (col("id") % 2 === 0), concat(lit("SYM"), col("id") % symbols)
        ).as("frame"))
        .persist()
      frames.count() // materialize outside the timing
      val decoded = frames.select(functions.Sbe.decodeTrade(col("frame")).as("t"))
        .select("t.ts_ms", "t.trade_id", "t.price", "t.is_buyer_maker", "t.symbol")
      decoded.write.format("noop").mode("overwrite").save() // warm codegen
      val t0 = System.nanoTime()
      decoded.write.format("noop").mode("overwrite").save()
      results("sbe_decode") = ((System.nanoTime() - t0) / 1e9, n)
      frames.unpersist()
    } catch {
      case scala.util.control.NonFatal(e) =>
        failures("sbe_decode") = whyOf(e)
        System.err.println(s"[streambench] row sbe_decode FAILED: $e")
    }

    // events actually fed per row: chunks * floor(n / chunks), NOT n (rate
    // would overstate whenever n is not a chunk multiple)
    val fed = (n / chunks) * chunks

    // The four stateful rows ([[statefulRow]] — the one definition shared
    // with ClusterStream) run under BOTH state-store providers: the on-heap
    // default, then (suffix `_rocksdb`) under
    // [[GraftSession.configureRocksDbState]] — runtime confs, so queries
    // started after the call pick up RocksDB. Same data, same micro-batch
    // shape: the delta between the pairs IS the provider cost, the number
    // that justifies (or prices) the 100×-key-cardinality setting.
    def statefulRows(suffix: String): Unit =
      StatefulPaths.foreach { p =>
        val name = s"$p$suffix"
        // per-row isolation: one row's failure (e.g. the prime-batch guard
        // tripping under load) fails THAT row loudly — recorded as a
        // completed:false row with its walked root cause, not a silent drop
        try results(name) =
          (statefulRow(spark, p, symbols).time(chunks, n / chunks)._1, fed)
        catch {
          case scala.util.control.NonFatal(e) =>
            failures(name) = whyOf(e)
            System.err.println(s"[streambench] row $name FAILED: $e")
        }
      }

    statefulRows("")
    GraftSession.configureRocksDbState(spark)
    statefulRows("_rocksdb")

    // ------------------------------------------------------------ reanchor
    // The reference's recovery target: re-anchor in <60 s
    // (`ARCHITECTURE.md:258-263`). The engine's analog is the full T6 flow
    // at the hot-state size — rebuild latest-per-key state from the
    // journaled events and atomically swap the version pointer
    // (Bronze.reAnchor: versioned parquet write + pointer rename). Timed
    // end-to-end; the rebuild is the data-proportional part, the swap
    // itself is two renames.
    {
      val dir = java.nio.file.Files.createTempDirectory("sb_reanchor")
      try {
        val events = spark.range(fed.toLong).select(

          concat(lit("SYM"), col("id") % symbols).as("symbol"),
          // integer division (expr `div`), NOT `/`: the DataFrame `/` is
          // floating-point, which would put these rows on a fractional DOUBLE
          // ts grid instead of eventFor's integral 50 ms LONG grid
          (lit(1700000000000L) + expr(s"id div $symbols") * 50L).as("ts_ms"),
          (lit(100.0) + (col("id") % 1000) * 0.01).as("price"),
          (lit(1.0) + (col("id") % 7)).as("qty"),
          col("id").as("trade_id"))
        val t0 = System.nanoTime()
        val rebuilt = streaming.HotPath.latestPerKeyBatch(
          events, col("symbol"), col("ts_ms"), col("trade_id"))
        sources.Bronze.reAnchor(spark, dir.toString, rebuilt)
        results("reanchor") = ((System.nanoTime() - t0) / 1e9, fed)
      } catch {
        case scala.util.control.NonFatal(e) =>
          failures("reanchor") = whyOf(e)
          System.err.println(s"[streambench] row reanchor FAILED: $e")
      } finally deleteRecursively(dir)
    }

    results.foreach { case (name, (sec, events)) =>
      println(s"#GRAFT TROW $name ${num(sec, 6)} $events")
    }
    failures.foreach { case (name, why) => println(s"#GRAFT TFAIL $name\t$why") }
    println("#GRAFT DONE")
    spark.stop()
  }

  /** Forked-round throughput record (r13, verdict item 2): N fresh child
    * JVMs (default 3), each one full [[throughputChild]] pass, aggregated
    * with EXACTLY the bench's disturbance discipline — broken rounds
    * (extra failed rows vs the all-round intersection) re-forked first,
    * then any round whose total reads > [[Bench.disturbFactor]]× the clean
    * minimum, up to [[Bench.maxReforks]] replacements. The record carries
    * per-row MEDIAN rates (the headline), full min–max bands, round
    * totals, and the discard trail — a single disturbed reading can no
    * longer masquerade as the engine's rate, and a re-forked run is
    * distinguishable from a naturally quiet one. Rows that failed in every
    * round appear as `completed:false` rows with their walked root cause.
    * Writes `streambench.json` (smoke-named on any non-default knob —
    * including SPARK_GRAFT_STREAM_RUNS being SET at all, judged by env
    * presence so an explicit =5 cannot overwrite the canonical record).
    */
  private def throughputParent(): Unit = {
    import scala.jdk.CollectionConverters._
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val n = sys.env.get("SPARK_GRAFT_STREAM_N").map(_.toInt).getOrElse(1000000)
    val runs = sys.env.get("SPARK_GRAFT_STREAM_RUNS").map(_.toInt).getOrElse(3).max(1)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = sys.props("java.class.path")

    final case class Round(
        order: Seq[String], // child emission order, TROW then TFAIL
        times: Map[String, (Double, Long)], // name -> (seconds, events)
        failures: Map[String, String]) {
      def total: Double = times.valuesIterator.map(_._1).sum
      def failed: Set[String] = failures.keySet
    }

    def childRound(label: String): Round = {
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.StreamBench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_STREAM_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      val p = pb.start()
      val drainer = new Thread(() => {
        val buf = new Array[Byte](8192)
        val in = p.getErrorStream
        var nr = in.read(buf)
        while (nr >= 0) { System.err.write(buf, 0, nr); nr = in.read(buf) }
      }, s"streambench-child-$label-stderr")
      drainer.setDaemon(true)
      drainer.start()
      val deadlineMin = Bench.roundTimeoutMin(default = 30L)
      val watchdog = new Thread(() => {
        if (!p.waitFor(deadlineMin, java.util.concurrent.TimeUnit.MINUTES)) p.destroyForcibly()
      }, s"streambench-child-$label-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
      val order = scala.collection.mutable.ArrayBuffer.empty[String]
      val times = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
      val fails = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var done = false
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("#GRAFT ")) {
          val body = line.drop(7)
          if (body.startsWith("TROW ")) {
            val Array(nm, sec, ev) = body.drop(5).split(" ", 3)
            order += nm
            times(nm) = (sec.toDouble, ev.toLong)
          } else if (body.startsWith("TFAIL ")) {
            val Array(nm, why) = body.drop(6).split("\t", 2)
            order += nm
            fails(nm) = why
          } else if (body == "DONE") done = true
        }
        line = reader.readLine()
      }
      val exited = p.waitFor(1, java.util.concurrent.TimeUnit.MINUTES)
      if (!exited) p.destroyForcibly()
      // A child that died mid-pass (vs one that completed with some failed
      // rows) must never enter the medians — but a transient death (e.g. a
      // spill read-ahead OOM on a loaded box) is exactly what the
      // disturbance guard exists for, so it is handed over as a BROKEN
      // round via Bench.ChildDiedKey (as Bench does) and discarded +
      // re-forked; a death SURVIVING the guard aborts loudly below.
      val complete = done && exited && p.exitValue() == 0
      if (!complete) {
        val why = s"child death: done=$done exited=$exited " +
          s"exit=${if (exited) p.exitValue().toString else "?"}"
        System.err.println(s"[streambench] round $label $why — left to the disturbance guard")
        Round(order.toSeq, times.toMap, fails.toMap + (Bench.ChildDiedKey -> why))
      } else {
        System.err.println(s"[streambench] round $label: " +
          s"${num(times.valuesIterator.map(_._1).sum, 1)} s over ${times.size} rows" +
          (if (fails.nonEmpty) s" (${fails.size} failed: ${fails.keys.mkString(",")})" else ""))
        Round(order.toSeq, times.toMap, fails.toMap)
      }
    }

    // Disturbance guard — the ONE shared driver (r14): broken rounds (extra
    // failed rows vs the all-round intersection — a persistent failure in
    // EVERY round is the build, not the box) re-fork first; then totals >
    // factor x the clean minimum. Semantics pinned in ForkedRoundsSpec, so
    // this harness and Bench cannot drift on what counts as "disturbed".
    val outcome = ForkedRounds.run[Round](
      runs, tag = "streambench", brokenNoun = "failed rows",
      fork = (_, label) => childRound(label),
      total = _.total, failedKeys = _.failed)
    val rounds = outcome.rounds
    val discardedTotals = outcome.discardedTotals
    val residualBroken = outcome.residualBroken
    // a child death surviving the re-fork budget poisons every median —
    // abort rather than emit a partial record (Bench does the same)
    val dead = rounds.zipWithIndex.collect {
      case (r, i) if r.failures.contains(Bench.ChildDiedKey) =>
        s"round $i: ${r.failures(Bench.ChildDiedKey)}"
    }
    require(dead.isEmpty,
      s"streambench rounds incomplete after the disturbance guard (budget ${Bench.maxReforks}): " +
        dead.mkString("; "))

    // aggregate: per-row median/min/max seconds over the rounds where the
    // row completed; rate = events / seconds (events are a per-row constant)
    val names = rounds.flatMap(_.order).distinct
    def rowJson(name: String): (String, String, Option[String]) = {
      val secs = rounds.flatMap(_.times.get(name)).map(_._1).sorted
      if (secs.nonEmpty) {
        val events = rounds.flatMap(_.times.get(name)).head._2
        val med = secs(secs.length / 2)
        val rates = secs.map(events / _)
        (num(events / med, 0),
          s"[${num(rates.min, 0)},${num(rates.max, 0)}]",
          None)
      } else {
        val why = rounds.flatMap(_.failures.get(name)).last
        ("null", "null", Some(s"""{"completed":false,"why":"$why"}"""))
      }
    }
    val agg = names.map(nm => nm -> rowJson(nm))
    val failedJson = agg.collect { case (nm, (_, _, Some(f))) => "\"" + nm + "\":" + f }
    val secondsJson = names.flatMap { nm =>
      val secs = rounds.flatMap(_.times.get(nm)).map(_._1).sorted
      if (secs.isEmpty) None
      else Some("\"" + nm + "\":[" + num(secs.head, 3) + "," +
        num(secs(secs.length / 2), 3) + "," + num(secs.last, 3) + "]")
    }
    val json =
      s"""{"metric":"stream_events_per_sec","unit":"events/sec","cpus":$cpus,""" +
        s""""events_per_row":$n,"chunks":$ThroughputChunks,"symbols":$ThroughputSymbols,""" +
        s""""runs":$runs,"mode":"forked-jvm",""" +
        s""""round_totals":${rounds.map(r => num(r.total, 3)).mkString("[", ",", "]")},""" +
        s""""rounds_discarded":${discardedTotals.size},""" +
        s""""discarded_totals":${discardedTotals.map(num(_, 3)).mkString("[", ",", "]")},""" +
        s""""residual_broken_round":$residualBroken,""" +
        s""""rounds_completed":${names.map(nm =>
          "\"" + nm + "\":" + rounds.count(_.times.contains(nm))).mkString("{", ",", "}")},""" +
        s""""baseline_ref":{"sbe_target":1000,"sbe_peak":5000,"kinesis_target":5000,"kinesis_peak":25000,"reanchor_seconds":60},""" +
        s""""rates":${agg.map { case (nm, (med, _, _)) => "\"" + nm + "\":" + med }.mkString("{", ",", "}")},""" +
        s""""rates_band":${agg.map { case (nm, (_, band, _)) => "\"" + nm + "\":" + band }.mkString("{", ",", "}")},""" +
        s""""seconds_min_med_max":${secondsJson.mkString("{", ",", "}")},""" +
        s""""failed":${failedJson.mkString("{", ",", "}")}}"""
    java.nio.file.Files.write(
      Bench.recordPath("streambench",
        // guard knobs count as non-default too: a hair-trigger
        // DISTURB_FACTOR run (the guard-validation pattern) must never
        // overwrite the canonical record. STREAM_RUNS is judged by env
        // PRESENCE, not value (r14 advice): `runs < 3` let STREAM_RUNS=5 —
        // a non-default knob — silently overwrite the canonical record,
        // contradicting the "ANY non-default knob smoke-names" convention.
        smoke = n != 1000000 || cpus != "4" ||
          sys.env.contains("SPARK_GRAFT_STREAM_RUNS") ||
          sys.env.contains("SPARK_GRAFT_DISTURB_FACTOR") ||
          sys.env.contains("SPARK_GRAFT_MAX_REFORKS")),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
  }
}
