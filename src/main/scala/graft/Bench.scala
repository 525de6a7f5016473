package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Prints ONE JSON line.
  *
  * Measurement modes (r6-r9): one-JVM sweep timings carry multi-second GC
  * outliers (observed: d2 0.65 s isolated vs 8.3 s in one sweep), so a
  * single sweep pass cannot distinguish a regression from noise. r7
  * interleaved the rounds so a time-local disturbance becomes a ROUND
  * effect the per-query median discards; r8 added the per-query MIN (the
  * noise-free warm-plan cost — a GC storm can inflate but never deflate
  * it) and `round_totals` so a disturbed round is visible. That absorbed
  * the disturbance; r9 removes its source: JVM AGING. 30/122 queries still
  * showed >2x max/min spread across rounds in ONE JVM — heap growth, dead
  * broadcast/checkpoint blocks, cleaner drains, and codegen-cache pressure
  * all accumulate monotonically, so later rounds run in a measurably
  * different JVM than round 1.
  *
  * FORKED MODE (default when runs > 1): each round is a FRESH child JVM —
  * same classpath and JVM flags as this one (taken from the running JVM, so
  * sbt's -Xmx/--add-opens carry over), running warmup over the full query
  * set then exactly one timed round. Aging cannot leak across rounds
  * because nothing survives a round but the stdout record. The parent
  * holds no SparkSession at all.
  *   - `queries`/`value`: per-query median / summed medians across the
  *     child rounds — the regression signal;
  *   - `queries_min`/`value_min`: per-query min / summed mins;
  *   - `queries_sweep`: round 1's times (each child IS warmup + one timed
  *     pass — the historical sweep shape — so round 1 doubles as the
  *     sweep; kept for round-over-round comparability);
  *   - `queries_exec` (r9): round 1 additionally re-writes each query's
  *     SAME DataFrame once more after its timed pass — Catalyst analysis
  *     and the DataFrame build amortized — isolating EXECUTION from
  *     planning overhead (~0.1-0.4 s/query of the suite total is planning,
  *     which a production job paying it once per long-running query never
  *     sees at 100x data);
  *   - `round_totals`: per-child totals (dispersion across FRESH JVMs is
  *     genuine machine noise, not aging).
  * `SPARK_GRAFT_FORK=0` restores the r8 in-process interleaved rounds;
  * `SPARK_GRAFT_RUNS=1` restores the legacy single sweep (both also
  * measure `queries_exec` off the sweep pass). `SPARK_GRAFT_ONLY=a,b`
  * restricts the query set for local iteration.
  */
object Bench {

  def main(args: Array[String]): Unit =
    if (sys.env.get("SPARK_GRAFT_CHILD").contains("1")) childMain() else parentMain()

  // ---------------------------------------------------------------- shared

  private def sfDir: String = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Cache basis label stamped into every emitted record (r14, verdict
    * item 7): r13 moved the timed rounds from warm-cache (warmup's persisted
    * sets leaked into the timing) to cold-cache (clearCache() before every
    * timed/exec pass), which legitimately moved the char family's numbers —
    * so records must be SELF-describing on basis, or cross-round
    * comparisons silently mix footings. tools/spread_report.py refuses
    * records without the label.
    */
  private[graft] val CacheBasis = "cold-cache"

  /** A full run on a non-canonical BASIS — custom master (multi-JVM), a
    * non-testdata SF dir (scale slice), or a pinned shuffle-partition count
    * (which also disables AQE coalescing) — must not clobber the committed
    * single-JVM baseline records (bench_full/bench_diag).
    */
  private def offBasis: Boolean =
    sys.env.contains("SPARK_GRAFT_MASTER") ||
      sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS") ||
      sys.env.contains("SPARK_GRAFT_ADVISORY_MB") ||
      !sfDir.startsWith("/root/testdata/")

  /** Guard/round knobs count as non-default too (r14 review): a
    * hair-trigger DISTURB_FACTOR run (the guard-validation pattern), a
    * RUNS override, or in-process FORK=0 produces numbers on a different
    * footing — StreamBench already smoke-names on these; Bench's canonical
    * bench_full/bench_diag must not be clobberable by them either.
    */
  private def guardKnobs: Boolean =
    sys.env.contains("SPARK_GRAFT_RUNS") ||
      sys.env.contains("SPARK_GRAFT_FORK") ||
      sys.env.contains("SPARK_GRAFT_DISTURB_FACTOR") ||
      sys.env.contains("SPARK_GRAFT_MAX_REFORKS")

  private[graft] def num(v: Double, dp: Int): String = // Locale.ROOT: '.' decimals always
    s"%.${dp}f".formatLocal(java.util.Locale.ROOT, v)

  /** SPARK_GRAFT_ROUND_TIMEOUT_MIN with a per-tool default — ONE parse +
    * named validation shared by Bench and MemSweep (an NFE from deep inside
    * a multi-hour run would abort with a bare stack trace; copies had
    * already drifted once).
    */
  private[graft] def roundTimeoutMin(default: Long): Long =
    sys.env.get("SPARK_GRAFT_ROUND_TIMEOUT_MIN").map { v =>
      require(v.trim.matches("[0-9]+"),
        s"SPARK_GRAFT_ROUND_TIMEOUT_MIN must be a whole number of minutes, got '$v'")
      v.trim.toLong
    }.getOrElse(default)
  private def fmt(pairs: Seq[(String, Double)], dp: Int): String =
    pairs.map { case (k, v) => "\"" + k + "\":" + num(v, dp) }.mkString("{", ",", "}")

  /** The bench_only convention generalized (r12, verdict item 7): a harness
    * invoked with ANY non-default knob (query subset, event/key count, cpu
    * count, custom SF dir) writes `<base>_smoke.json` instead of the
    * canonical `<base>.json`, so a local smoke run can never clobber the
    * committed record — the r11 protection was procedural (`git checkout`)
    * and nearly shipped a 100k-event record once.
    */
  private[graft] def recordPath(base: String, smoke: Boolean): java.nio.file.Path = {
    val f = if (smoke) s"${base}_smoke.json" else s"$base.json"
    if (smoke) System.err.println(
      s"[$base] non-default knobs detected — writing $f (committed record untouched)")
    java.nio.file.Paths.get(f)
  }

  private def selectedQueries(): Seq[(String, (SparkSession, String) => DataFrame)] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    (only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }).toSeq.sortBy(_._1)
  }

  private[graft] def buildSession(): SparkSession = {
    // SPARK_GRAFT_MASTER overrides (e.g. local-cluster[2,8,4096] for the
    // multi-JVM bench slice); the default stays single-JVM local[N]
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS pins the shuffle partition count for
    // the 100x partition-count sweep (r13, verdict item 4 / TODO #1):
    // per-partition working set = shuffle bytes / partitions, so sweeping
    // the count locates the no-spill knee on one box. A PINNED count also
    // turns off AQE partition coalescing — with it on, AQE would coalesce
    // small post-shuffle partitions back toward the 64 MB advisory target
    // and the sweep would measure the advisory, not the pinned count.
    val pinnedShuffle = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    // Unpinned runs size the INITIAL shuffle-partition count from the SF
    // dir's bytes (r15, verdict item 1): AQE only coalesces DOWN, so the
    // initial count must be >= expected shuffle bytes / the measured
    // ~40 MB sweet spot or heavy shuffles are bound to giant spilling
    // partitions before AQE can act. At sf0.1 and below this returns
    // exactly `cpus` — the committed bench basis is unchanged; the 100x
    // slice sizes to ~235 (see GraftSession.sizedShufflePartitions).
    // Inside getOrElse (by-name) so PINNED rounds — the sweep's 15 child
    // JVMs — never pay the recursive dir walk for a discarded value.
    def sized: String = GraftSession.sizedShufflePartitions(
      GraftSession.dirBytes(sfDir), cpus.toInt).toString
    // SPARK_GRAFT_ADVISORY_MB overrides AQE's advisory partition size for
    // the advisory-alignment experiment (TODO #1): the sweep's measured
    // optimum is ~40 MB of shuffle write per partition, but coalescing
    // merges back toward the 64 MB default advisory — above the optimum —
    // so the sized initial count alone recovers only part of the pinned
    // win. Off-basis (smoke-named) like the pinned knob; the DEFAULT
    // session is unchanged when unset.
    val advisoryMb = sys.env.get("SPARK_GRAFT_ADVISORY_MB").map { v =>
      require(v.trim.matches("[0-9]+") && v.trim.toInt > 0,
        s"SPARK_GRAFT_ADVISORY_MB must be a positive whole number of MB, got '$v'")
      v.trim.toInt
    }
    // SPARK_GRAFT_SPAN_PARTITIONS overrides the char-span STAGE pin
    // (Corpus.SpanPartitionsConf: 0 = off, >0 = forced count) for the
    // stage-pin sweep — off-basis like the session knobs above. A
    // session-wide PINNED sweep always turns the stage pin OFF so the
    // sweep measures pure session pinning, never a mix of the two.
    val spanPinEnv = sys.env.get("SPARK_GRAFT_SPAN_PARTITIONS").map { v =>
      require(v.trim.matches("[0-9]+"),
        s"SPARK_GRAFT_SPAN_PARTITIONS must be a non-negative whole number, got '$v'")
      v.trim
    }
    val spanPin =
      if (pinnedShuffle.isDefined) {
        // the session-wide pin overrides the stage knob by design — but an
        // experimenter setting BOTH must get a signal that one was ignored
        spanPinEnv.filterNot(_ == "0").foreach(v => System.err.println(
          s"[bench] SPARK_GRAFT_SHUFFLE_PARTITIONS is set: ignoring " +
            s"SPARK_GRAFT_SPAN_PARTITIONS=$v (stage pin forced OFF so the " +
            "sweep measures pure session pinning)"))
        Some("0")
      } else spanPinEnv
    val b0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", pinnedShuffle.getOrElse(sized))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        pinnedShuffle.isEmpty.toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        s"${advisoryMb.getOrElse(64)}m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // 97+ queries x several codegen stages far exceed the default
      // 100-entry generated-code cache; every query would otherwise
      // RECOMPILE its codegen each pass (measured +0.1-0.8 s per query,
      // uniformly) — a bench-harness artifact, not a plan cost. A
      // production job runs few queries repeatedly and never sees this.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    val b1 = spanPin.fold(b0)(p =>
      b0.config(graft.operators.Corpus.SpanPartitionsConf, p))
    val spark =
      (if (master.startsWith("local-cluster")) GraftSession.withMultiJvm(b1) else b1)
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // ----------------------------------------------------------- child round

  /** One fresh-JVM round: warmup over the full set, gc+settle, one timed
    * pass (keeping each DataFrame), then — when `SPARK_GRAFT_EXEC=1` — one
    * more timed write of the SAME DataFrame per query. Results go to
    * stdout as `#GRAFT`-prefixed lines (Spark logs go to stderr, so stdout
    * is ours); the parent parses them. The noop sink materializes EVERY
    * output column (a bare count() lets Catalyst prune projections,
    * silently benchmarking just the scan).
    */
  private def childMain(): Unit = {
    val spark = buildSession()
    val selected = selectedQueries()
    val withExec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def record(name: String, e: Throwable): Unit =
      errors.getOrElseUpdate(
        name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
    // Warmup on the TARGET dir: AQE re-plans per data size, so warming on a
    // smaller SF compiles different physical plans and the timed pass would
    // still pay janino/JIT for every query (~2 s/query observed).
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => record(name, e) }
    }
    System.gc(); Thread.sleep(1000)
    // Disturbance attribution (r10): per-query GC-time and process-CPU
    // deltas alongside the wall time, so a cross-round outlier can be
    // pinned to collector pauses (gc tracks the excess), genuine compute
    // (cpu tracks it), or an off-JVM stall (neither does).
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMs(): Long = gcBeans.map(_.getCollectionTime).sum
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def cpuMs(): Long = osBean.map(_.getProcessCpuTime / 1000000L).getOrElse(0L)
    // Per-query executor-pressure sums (r12, verdict item 4): spill and
    // shuffle bytes from task metrics, so a scaling-slope segment that
    // bends (the t25/t26 10x->30x tail) can be attributed to a working-set
    // transition WITH data instead of a candidate cause. Counters reset per
    // query; the listener bus is drained after the wall-time read so the
    // drain cost never lands in the timing.
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    // Task-metric CPU/GC (r13, verdict item 6): summed from every task's
    // executorCpuTime/jvmGCTime, so in cluster mode — where the process
    // gc/cpu beans above see only the DRIVER JVM — the record still carries
    // the EXECUTORS' real compute and collector cost. In local[N] mode the
    // two views agree up to driver-side planning overhead.
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    val taskGcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          taskCpuNs.addAndGet(m.executorCpuTime)
          taskGcMs.addAndGet(m.jvmGCTime)
        }
      }
    })
    val dfs = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]
    selected.foreach { case (name, fn) =>
      // Drop every cached relation the WARMUP pass left behind (r13 advice:
      // sizeAwareSetJoin persists its priced set DISK_ONLY and CacheManager
      // dedupes by logical plan, so without this the timed pass would read
      // the warmup's cached detection aggregate instead of recomputing it —
      // the timed number must be the COLD single-shot cost, persist write +
      // count job included).
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
      spillMem.set(0); spillDisk.set(0); shufRead.set(0); shufWrite.set(0)
      taskCpuNs.set(0); taskGcMs.set(0)
      val (gc0, cpu0) = (gcMs(), cpuMs())
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        if (withExec) dfs(name) = df
      } catch { case e: Throwable => record(name, e) }
      val wall = num((System.nanoTime() - t0) / 1e9, 6)
      // gc/cpu deltas read BEFORE the drain: the drain's own listener
      // processing burns process CPU that must not be charged to this
      // query's diag (it would bias spread attribution toward "cpu")
      val (gcD, cpuD) = (gcMs() - gc0, cpuMs() - cpu0)
      println(s"#GRAFT Q $name $wall")
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark.sparkContext)
      println(s"#GRAFT D $name $gcD $cpuD " +
        s"${spillMem.get} ${spillDisk.get} ${shufRead.get} ${shufWrite.get} " +
        s"${taskCpuNs.get / 1000000L} ${taskGcMs.get}")
    }
    if (withExec) selected.foreach { case (name, _) =>
      dfs.get(name).foreach { df =>
        // same cold-cache basis as the timed pass: exec isolates EXECUTION
        // from planning, and the cached-set rebuild IS execution
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try df.write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => record(name, e) }
        println(s"#GRAFT E $name ${num((System.nanoTime() - t0) / 1e9, 6)}")
      }
    }
    errors.foreach { case (name, msg) =>
      println(s"#GRAFT ERR $name\t${msg.replaceAll("[\\x00-\\x1f]", " ")}")
    }
    println("#GRAFT DONE")
    spark.stop()
  }

  // ---------------------------------------------------------------- parent

  private def parentMain(): Unit = {
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(5).max(1)
    val fork = sys.env.getOrElse("SPARK_GRAFT_FORK", "1") != "0"
    if (runs > 1 && fork) forkedMain(runs) else inProcessMain(runs)
  }

  /** One completed child round: per-query wall times, per-query (gc, cpu)
    * deltas, (exec rounds only) the exec-only re-write times, and the
    * round's OWN errors — kept per round so a discarded round's errors do
    * not contaminate the emitted record, and so the disturbance guard can
    * tell "fast because quiet" from "fast because broken".
    */
  /** Sentinel failure key marking a round whose child JVM died or exited
    * nonzero (never a real query name — query names are lowercase
    * identifiers). Carried in a round's error map so the shared
    * [[ForkedRounds]] guard discards and re-forks the round exactly like a
    * broken one; any sentinel SURVIVING the guard aborts the run.
    */
  private[graft] val ChildDiedKey = "__child_died__"

  private final case class ChildRound(
      times: Seq[(String, Double)],
      diag: Map[String, Seq[Long]], // gc_ms, cpu_ms, spill_mem, spill_disk, shuf_read, shuf_write
      exec: Seq[(String, Double)],
      errors: Map[String, String]) {
    def total: Double = times.map(_._2).sum
  }

  /** Spawn `runs` child JVMs sequentially, each a fresh round. The child
    * command line mirrors THIS JVM (same java, input arguments, classpath)
    * so sbt's javaOptions (--add-opens, -Xmx) apply identically.
    *
    * DISTURBANCE GUARD (r11): the official round-10 driver bench was an
    * environmentally disturbed run (round 1 totaled 139 s vs 83 s settled;
    * 42/129 queries >2x cross-round spread vs 1/129 on a quiet box) — the
    * medians absorbed most of it but the sweep/spread record misrepresented
    * the engine. Forked rounds are fresh JVMs, so a round whose TOTAL is
    * far above the other rounds' is machine interference (another process,
    * page-cache eviction), not code: detect any round with
    * total > DISTURB_FACTOR x min(round totals) after all rounds complete,
    * discard it, and fork a replacement — up to `SPARK_GRAFT_MAX_REFORKS`
    * (default 3) replacements total, so a genuinely busy box terminates.
    * Replacements can themselves be disturbed; the loop re-evaluates
    * against the running min each pass. The emitted record keeps
    * `rounds_discarded` + `discarded_totals` so a re-forked run is
    * distinguishable from a naturally quiet one.
    */
  /** Env-tunable so the re-fork path is exercisable on a quiet box (set it
    * barely above 1.0 and natural jitter trips it) and relaxable on a noisy
    * one. Shared with [[StreamBench]]'s forked throughput rounds (r13) so
    * the two harnesses cannot drift on what counts as "disturbed". */
  private[graft] def disturbFactor: Double =
    sys.env.get("SPARK_GRAFT_DISTURB_FACTOR").map { v =>
      val d = try v.trim.toDouble catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"SPARK_GRAFT_DISTURB_FACTOR must be a number > 1.0, got '$v'")
      }
      require(d > 1.0, s"SPARK_GRAFT_DISTURB_FACTOR must be > 1.0, got '$v'")
      d
    }.getOrElse(1.5)

  /** Re-fork budget for the disturbance guard (shared with [[StreamBench]]). */
  private[graft] def maxReforks: Int =
    sys.env.get("SPARK_GRAFT_MAX_REFORKS").map { v =>
      require(v.trim.matches("[0-9]+"),
        s"SPARK_GRAFT_MAX_REFORKS must be a whole number, got '$v'")
      v.trim.toInt
    }.getOrElse(3)

  private def forkedMain(runs: Int): Unit = {
    val selected = selectedQueries().map(_._1)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cp = sys.props("java.class.path")

    def childRound(label: String, withExec: Boolean): ChildRound = {
      val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CHILD", "1")
      pb.environment().put("SPARK_GRAFT_EXEC", if (withExec) "1" else "0")
      val p = pb.start()
      // child stderr (Spark logs) streams through so a hung round is
      // diagnosable from the driver's capture
      val drainer = new Thread(() => {
        val buf = new Array[Byte](8192)
        val in = p.getErrorStream
        var n = in.read(buf)
        while (n >= 0) { System.err.write(buf, 0, n); n = in.read(buf) }
      }, s"bench-child-$label-stderr")
      drainer.setDaemon(true)
      drainer.start()
      val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val diag = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
      val exec = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
      // The hang guard must fire BEFORE the stdout read loop, not after:
      // a wedged child that never closes stdout keeps readLine() blocked
      // forever, so a post-loop waitFor(timeout) is unreachable. The
      // watchdog kills the child at the deadline, which EOFs stdout and
      // lets the loop fall through to the loud require below.
      // Deadline is env-tunable: bigger SF dirs legitimately run longer than
      // the sf0.1 default; a fixed constant would silently cap them mid-pass.
      val deadlineMin = roundTimeoutMin(default = 20L)
      val watchdog = new Thread(() => {
        if (!p.waitFor(deadlineMin, java.util.concurrent.TimeUnit.MINUTES)) p.destroyForcibly()
      }, s"bench-child-$label-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
      var done = false
      var line = reader.readLine()
      while (line != null) {
        if (line.startsWith("#GRAFT ")) {
          val body = line.drop(7)
          if (body.startsWith("Q ")) {
            val Array(n, t) = body.drop(2).split(" ", 2)
            times(n) = t.toDouble
          } else if (body.startsWith("D ")) {
            val parts = body.drop(2).split(" ")
            diag(parts(0)) = parts.drop(1).toSeq.map(_.toLong)
          } else if (body.startsWith("E ")) {
            val Array(n, t) = body.drop(2).split(" ", 2)
            exec(n) = t.toDouble
          } else if (body.startsWith("ERR ")) {
            val Array(n, msg) = body.drop(4).split("\t", 2)
            errors.getOrElseUpdate(n, msg)
          } else if (body == "DONE") done = true
        }
        line = reader.readLine()
      }
      // stdout already EOF'd here (loop above ended), so the child is done
      // or the watchdog killed it — this wait only reaps the exit code
      val exited = p.waitFor(1, java.util.concurrent.TimeUnit.MINUTES)
      if (!exited) p.destroyForcibly()
      // A round whose child died (or exited nonzero — e.g. the transient
      // spill read-ahead OOM that killed one r14 sweep point AFTER all
      // queries had timed) is handed to the disturbance guard as a BROKEN
      // round via a sentinel failure key, so it is discarded and re-forked
      // like any other disturbance and the death is visible in the record
      // (rounds_discarded / discarded_totals). It must never enter the
      // medians: if deaths persist in EVERY kept round the run still fails
      // loudly below (r6's silent-failure lesson) — a partial bench record
      // is worse than none.
      val complete = done && exited && p.exitValue() == 0 && times.size == selected.size
      if (!complete) {
        val why = s"child death: done=$done exited=$exited " +
          s"exit=${if (exited) p.exitValue().toString else "?"} " +
          s"times=${times.size}/${selected.size}"
        System.err.println(s"[bench] round $label $why — left to the disturbance guard")
        ChildRound(times.toSeq, diag.toMap, exec.toSeq,
          errors.toMap + (ChildDiedKey -> why))
      } else {
        System.err.println(
          s"[bench] round $label: ${num(times.values.sum, 1)} s over ${times.size} queries" +
            (if (errors.nonEmpty) s" (${errors.size} errored)" else ""))
        ChildRound(times.toSeq, diag.toMap, exec.toSeq, errors.toMap)
      }
    }

    // Disturbance guard (r11, one shared driver since r14 — semantics
    // pinned in ForkedRoundsSpec): broken rounds (extra query errors vs the
    // all-round intersection; errors in EVERY round are the build, not the
    // box) re-fork first, then any round whose total reads > factor x the
    // CLEAN minimum. Replacement is IN PLACE so round 0 stays the
    // sweep/exec round (a replacement at slot 0 re-runs with EXEC=1, so the
    // exec record never comes from a disturbed round either).
    val outcome = ForkedRounds.run[ChildRound](
      runs, tag = "bench", brokenNoun = "query errors",
      fork = (idx, label) => childRound(label, withExec = idx == 0),
      total = _.total, failedKeys = _.errors.keySet)
    var rounds = outcome.rounds
    val discardedTotals = outcome.discardedTotals
    val residualBroken = outcome.residualBroken
    // Exec-pass disturbance guard (r18, TODO #0 / verdict item 7): the exec
    // record comes from ONE pass inside round 0, so host interference during
    // exactly that window used to contaminate it with no re-fork protection
    // (the first r17-opt record attempt read exec 117.9 s with untouched t20
    // at 29.9 s — 32x its own SIMULTANEOUS timed median). A clean exec total
    // (planning EXCLUDED, same queries, same cold-cache basis) can never
    // legitimately exceed the disturbance factor times the clean round
    // minimum (planning INCLUDED), so that reading means the pass was
    // disturbed: re-fork slot 0 — full round, EXEC=1, exactly what
    // ForkedRounds' in-place slot-0 replacement runs — on its own re-fork
    // budget. A replacement is accepted only if it is keepable by the
    // normal guard rules (child alive, no extra errors, timed total within
    // the factor); an unacceptable replacement burns budget and is logged.
    // Discarded exec totals land in the full record (`exec_reforks` /
    // `exec_discarded_totals`) — additions only, the stdout contract line
    // carries the same fields as before.
    val execDiscards = scala.collection.mutable.ArrayBuffer.empty[Double]
    if (runs > 1) {
      val commonErrs = rounds.map(_.errors.keySet).reduce(_ intersect _)
      var tries = 0
      def cleanMin: Double = rounds.map(_.total).min
      def execTotal: Double = rounds.head.exec.map(_._2).sum
      while (rounds.head.exec.nonEmpty && execTotal > disturbFactor * cleanMin &&
          tries < maxReforks) {
        System.err.println(
          s"[bench] round 0 EXEC pass disturbed (exec ${num(execTotal, 1)} s > " +
            s"${num(disturbFactor, 2)}x clean round min ${num(cleanMin, 1)} s) — " +
            s"re-forking slot 0 (${tries + 1}/$maxReforks)")
        execDiscards += execTotal
        tries += 1
        val repl = childRound(s"0-execrefork$tries", withExec = true)
        val keepable = !repl.errors.contains(ChildDiedKey) &&
          repl.errors.keySet == commonErrs &&
          repl.total <= disturbFactor * cleanMin
        if (keepable) rounds = rounds.updated(0, repl)
        else System.err.println(
          s"[bench] exec re-fork $tries not keepable " +
            s"(total ${num(repl.total, 1)} s, errors ${repl.errors.size}) — discarded")
      }
      if (rounds.head.exec.nonEmpty && execTotal > disturbFactor * cleanMin)
        System.err.println(s"[bench] exec re-fork budget exhausted ($maxReforks); " +
          "exec pass recorded as-is — box may be genuinely busy")
    }
    // Transient child deaths self-heal through the guard above; a death
    // surviving the re-fork budget (or present in every round, which the
    // guard cannot tell from "the build") means the medians CANNOT be
    // trusted — fail loudly rather than emit a partial record.
    val dead = rounds.zipWithIndex.collect {
      case (r, i) if r.errors.contains(ChildDiedKey) => s"round $i: ${r.errors(ChildDiedKey)}"
    }
    require(dead.isEmpty,
      s"bench rounds incomplete after the disturbance guard (budget $maxReforks): " +
        dead.mkString("; "))
    // errors from KEPT rounds only — a discarded round's transient failure
    // must not be reported against the record built from its replacement
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    rounds.foreach(_.errors.foreach { case (k, v) => errors.getOrElseUpdate(k, v) })

    // Per-round (wall, gc, cpu, spill, shuffle-bytes) matrix for spread and
    // scaling-tail attribution. The committed bench_diag.json stays a
    // full-run artifact; a SPARK_GRAFT_ONLY subset (e.g. the char-family
    // 30x slice) writes bench_diag_only.json so its pressure metrics are
    // still captured without clobbering the baseline.
    {
      val diagJson = selected.map { name =>
        val cells = rounds.indices.map { r =>
          val wall = rounds(r).times.find(_._1 == name).map(_._2).getOrElse(-1.0)
          val d = rounds(r).diag.getOrElse(name, Seq.empty)
          def at(i: Int) = d.lift(i).getOrElse(-1L)
          s"""{"wall":${num(wall, 3)},"gc_ms":${at(0)},"cpu_ms":${at(1)},""" +
            s""""spill_mem":${at(2)},"spill_disk":${at(3)},""" +
            s""""shuffle_read":${at(4)},"shuffle_write":${at(5)},""" +
            s""""task_cpu_ms":${at(6)},"task_gc_ms":${at(7)}}"""
        }
        "\"" + name + "\":" + cells.mkString("[", ",", "]")
      }.mkString("{\"rounds_per_query\":{", ",", "},") +
        s""""basis":"$CacheBasis",""" +
        s""""rounds_discarded":${discardedTotals.size},""" +
        s""""discarded_totals":${discardedTotals.map(num(_, 3)).mkString("[", ",", "]")}}"""
      val diagPath =
        if (sys.env.get("SPARK_GRAFT_ONLY").isEmpty && !offBasis && !guardKnobs)
          "bench_diag.json"
        else "bench_diag_only.json"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(diagPath),
        diagJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    val stats = selected.zipWithIndex.map { case (name, i) =>
      val ts = rounds.map(_.times(i)._2).toSeq.sorted
      (name, ts(ts.length / 2), ts.head, ts.last)
    }
    emit(runs, mode = "forked-jvm", sweep = rounds.head.times, stats = stats,
      roundTotals = rounds.map(_.total).toSeq, execTimes = rounds.head.exec,
      errors = errors, selectedCount = selected.size,
      discardedTotals = discardedTotals.toSeq, residualBroken = residualBroken,
      execDiscardedTotals = execDiscards.toSeq)
  }

  /** r8 behavior: interleaved rounds inside this one JVM (`SPARK_GRAFT_FORK=0`),
    * or the legacy single sweep (`SPARK_GRAFT_RUNS=1`). Kept as the
    * fallback and for quick `SPARK_GRAFT_ONLY` iteration where JVM spawn
    * overhead would dominate.
    */
  private def inProcessMain(runs: Int): Unit = {
    val spark = buildSession()
    val selected = selectedQueries()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runLogged(name: String, fn: (SparkSession, String) => DataFrame): Option[DataFrame] =
      try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        Some(df)
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(
            name, s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
          None
      }
    def timed(name: String, fn: (SparkSession, String) => DataFrame): (Double, Option[DataFrame]) = {
      // cold-cache basis, same as childMain: a prior pass's persisted sets
      // must not subsidize this timed run
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = runLogged(name, fn)
      ((System.nanoTime() - t0) / 1e9, df)
    }
    selected.foreach { case (name, fn) => runLogged(name, fn) } // warmup
    // sweep pass, keeping each DataFrame for the exec-only re-write
    val sweepFull = selected.map { case (name, fn) => name -> timed(name, fn) }
    val sweep = sweepFull.map { case (n, (t, _)) => n -> t }
    val execTimes = sweepFull.flatMap { case (n, (_, dfOpt)) =>
      dfOpt.map { df =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try df.write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        n -> (System.nanoTime() - t0) / 1e9
      }
    }
    val (stats, roundTotals) = if (runs > 1) {
      System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(1000)
      val rounds = (0 until runs).map { _ =>
        System.gc(); Thread.sleep(500)
        selected.map { case (name, fn) => timed(name, fn)._1 }
      }
      val st = selected.zipWithIndex.map { case ((name, _), i) =>
        val ts = rounds.map(_(i)).sorted
        (name, ts(ts.length / 2), ts.head, ts.last)
      }
      (st, rounds.map(_.sum))
    } else (sweep.map { case (n, t) => (n, t, t, t) }, Seq(sweep.map(_._2).sum))
    emit(runs, mode = if (runs > 1) "in-process" else "sweep", sweep = sweep,
      stats = stats, roundTotals = roundTotals, execTimes = execTimes,
      errors = errors, selectedCount = selected.size)
    spark.stop()
  }

  // ------------------------------------------------------------- reporting

  private def emit(
      runs: Int,
      mode: String,
      sweep: Seq[(String, Double)],
      stats: Seq[(String, Double, Double, Double)],
      roundTotals: Seq[Double],
      execTimes: Seq[(String, Double)],
      errors: scala.collection.Map[String, String],
      selectedCount: Int,
      discardedTotals: Seq[Double] = Seq.empty,
      residualBroken: Boolean = false,
      execDiscardedTotals: Seq[Double] = Seq.empty): Unit = {
    val total = stats.map(_._2).sum
    val totalMin = stats.map(_._3).sum
    val totalExec = execTimes.map(_._2).sum
    val errJson = errors
      .map { case (k, v) =>
        // exception messages routinely carry newlines/plan fragments — strip
        // control chars so the one-JSON-line contract survives
        val clean = v.replaceAll("[\\x00-\\x1f]", " ")
          .replace("\\", "\\\\").replace("\"", "'")
        "\"" + k + "\":\"" + clean + "\""
      }
      .mkString("{", ",", "}")
    // Full-precision record → a file in the repo: the driver keeps only the
    // LAST ~2000 chars of the stdout line (BENCH_r5's recorded tail cut the
    // map mid-way), so the complete medians+sweep+spread live on disk where
    // the round artifacts are read from.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs":$runs,
         |"mode":"$mode",
         |"basis":"$CacheBasis",
         |"value_min":${num(totalMin, 6)},
         |"value_exec":${num(totalExec, 6)},
         |"round_totals":${roundTotals.map(num(_, 3)).mkString("[", ",", "]")},
         |"rounds_discarded":${discardedTotals.size},
         |"discarded_totals":${discardedTotals.map(num(_, 3)).mkString("[", ",", "]")},
         |"exec_reforks":${execDiscardedTotals.size},
         |"exec_discarded_totals":${execDiscardedTotals.map(num(_, 3)).mkString("[", ",", "]")},
         |"residual_broken_round":$residualBroken,
         |"errors":$errJson,
         |"queries":${fmt(stats.map { case (n, m, _, _) => n -> m }, 6)},
         |"queries_min":${fmt(stats.map { case (n, _, lo, _) => n -> lo }, 6)},
         |"queries_exec":${fmt(execTimes, 6)},
         |"queries_sweep":${fmt(sweep, 6)},
         |"spread":${stats.map { case (n, _, lo, hi) =>
            "\"" + n + "\":[" + num(lo, 6) + "," + num(hi, 6) + "]" }
            .mkString("{", ",", "}")}}""".stripMargin
    // A SPARK_GRAFT_ONLY subset run must NOT clobber the committed full-run
    // record — it would silently replace the 100+-query regression baseline
    // with a handful of queries (exactly that happened once in r7). The
    // same applies to a full run on a non-canonical BASIS: a custom master
    // (multi-JVM) or a non-testdata SF dir (scale slice) produces numbers
    // on a different footing and goes to bench_smoke.json.
    // SPARK_GRAFT_RECORD names the file explicitly for runs that ARE their
    // own committed record (e.g. the multi-JVM clusterbench slice).
    val fullPath = sys.env.getOrElse(
      "SPARK_GRAFT_RECORD",
      if (sys.env.get("SPARK_GRAFT_ONLY").isDefined) "bench_only.json"
      else if (offBasis || guardKnobs) "bench_smoke.json"
      else "bench_full.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(fullPath),
      full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The stdout line keeps the driver contract; 3-decimal values and the
    // medians map LAST so the surviving tail is the regression signal.
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","runs":$runs,""" +
        s""""mode":"$mode","basis":"$CacheBasis",""" +
        s""""value_min":${num(totalMin, 3)},"value_exec":${num(totalExec, 3)},""" +
        s""""round_totals":${roundTotals.map(num(_, 3)).mkString("[", ",", "]")},""" +
        s""""rounds_discarded":${discardedTotals.size},""" +
        s""""residual_broken_round":$residualBroken,""" +
        s""""full":"$fullPath","errors":$errJson,"queries_sweep":${fmt(sweep, 3)},""" +
        s""""queries_min":${fmt(stats.map { case (n, _, lo, _) => n -> lo }, 3)},""" +
        s""""queries":${fmt(stats.map { case (n, m, _, _) => n -> m }, 3)}}""")
    // A query that throws must be VISIBLE, not a silently-fast row: a
    // swallowed failure once produced a plausible-looking 0.14 s "total"
    // for a 55 s suite (stale classpath). An all-queries-failed run exits
    // nonzero.
    if (errors.size == selectedCount && selectedCount > 0) {
      System.err.println(s"graft.Bench: ALL $selectedCount queries failed — " +
        "timings above are meaningless (broken build/classpath?)")
      sys.exit(2)
    }
  }
}
