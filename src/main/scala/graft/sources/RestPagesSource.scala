package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `rest-pages` — a DataSource V2 for offset-paginated REST endpoints, the
  * engine-side form of the reference's REST backfill ingestor (SURVEY §2.1
  * S3, `binance_rest.py:94-199`: `GET /api/v3/aggTrades?fromId=X&limit=1000`
  * pages with a token-bucket rate limiter and retry/backoff,
  * `:267-295`).
  *
  * Contract: the endpoint serves an APPEND-ONLY sequence of records
  * addressed by absolute offset — `GET url?<offsetParam>=X&<sizeParam>=N`
  * returns records [X, X+N) as JSONL (one record per non-empty line), and a
  * SHORT page means no records exist past it yet. That is exactly the
  * fromId-style pagination of the reference's aggTrades backfill; records
  * at an offset never change once visible, which is what makes both the
  * batch ranges and the streaming cursor replayable. Record DECODE stays
  * downstream (`from_json` over the `record` column), mirroring how
  * `sbe-frames` leaves frame decode to the SBE expressions — the source's
  * job is durable, resumable transport, not schema interpretation.
  *
  * Batch: plan time pins the record space to `min(maxRecords, frontier)`,
  * where the frontier (current end of the upstream sequence) is found by a
  * galloping O(log n) one-record probe — then the pinned space is split
  * into `recordsPerPartition` ranges fetched in parallel, the distributed
  * upgrade of the reference's serial cursor loop. Pinning at plan time is
  * what makes the result hole-free under concurrent appends: every range
  * covers only records that already existed, so a range can never stop at
  * a transient short page while a later range reads past it. (Tasks still
  * stop early at a short page — that only happens if the upstream violates
  * append-only, and truncating beats fabricating.)
  *
  * Streaming: the offset is the record cursor. `latestOffset` advances it
  * to the frontier (same O(log n) probe, bounded by
  * `maxRecordsPerTrigger`); tasks then fetch the confirmed range
  * [start, end) in parallel, exactly once. Probed records are immutable
  * under the append-only contract, so the fetch is deterministic; a
  * restart replays from the checkpointed cursor.
  *
  * Politeness/resilience, per the reference's client: each fetcher enforces
  * `minRequestIntervalMs` between ITS requests (per-task scope — total rate
  * ≈ parallelism / interval, so size the interval to the upstream budget
  * divided by expected task count, the same arithmetic as sharding the
  * reference's token bucket), and every fetch retries `retries` times with
  * doubling backoff on 429/5xx/connect/timeout; other 4xx fail fast (a bad
  * request does not heal by retrying).
  *
  * Scale shape: parallel range fetches, zero shuffle, bounded driver state
  * (one cursor). The natural 100 TB posture is still "land pages into
  * bronze once, then scan parquet" — this source IS that landing step, and
  * doubles as a direct tail for low-volume control-plane feeds.
  */
object RestPagesSource {
  val Schema: StructType = StructType(Seq(
    // the record's absolute offset in the upstream sequence — the stable
    // replayable identifier (same role as sbe-frames' frame_offset)
    StructField("record_offset", LongType, nullable = false),
    StructField("record", StringType, nullable = false)))

  final case class Config(
      url: String,
      offsetParam: String,
      sizeParam: String,
      pageSize: Int,
      retries: Int,
      retryBackoffMs: Long,
      minRequestIntervalMs: Long) extends Serializable

  def config(options: CaseInsensitiveStringMap): Config = {
    val url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException(
        "rest-pages requires an 'url' option (the paginated endpoint base)"))
    val cfg = Config(
      url = url,
      offsetParam = Option(options.get("offsetParam")).getOrElse("offset"),
      sizeParam = Option(options.get("sizeParam")).getOrElse("limit"),
      pageSize = Option(options.get("pageSize")).map(_.toInt).getOrElse(1000),
      retries = Option(options.get("retries")).map(_.toInt).getOrElse(3),
      retryBackoffMs =
        Option(options.get("retryBackoffMs")).map(_.toLong).getOrElse(100L),
      minRequestIntervalMs =
        Option(options.get("minRequestIntervalMs")).map(_.toLong).getOrElse(0L))
    require(cfg.pageSize > 0, s"pageSize must be positive, got ${cfg.pageSize}")
    require(cfg.retries >= 0, s"retries must be >= 0, got ${cfg.retries}")
    cfg
  }

  /** Does a record exist at `offset`? One-record probe — the building block
    * of [[frontier]]'s O(log n) end-of-data search. Honors the politeness
    * interval (driver-side, serial, O(log n) probes — negligible wall time).
    */
  private[sources] def exists(cfg: Config, offset: Long): Boolean = {
    if (cfg.minRequestIntervalMs > 0) Thread.sleep(cfg.minRequestIntervalMs)
    fetch(cfg, offset, 1).nonEmpty
  }

  /** The current end of the upstream sequence within [atLeast, bound]:
    * the first offset with no record, found by galloping doubling steps +
    * binary search over the monotone "record exists" predicate (append-only
    * contract: an existing offset never disappears). Costs O(log n)
    * ONE-record requests — the full-page walk it replaces downloaded every
    * record's body on the driver just to count lines. Under concurrent
    * appends the result is a valid snapshot frontier: everything below it
    * existed when probed.
    */
  def frontier(cfg: Config, atLeast: Long, bound: Long): Long = {
    if (atLeast >= bound || !exists(cfg, atLeast)) return atLeast
    // gallop: lo is always a known-existing offset; overflow-safe stepping
    var lo = atLeast
    var step = 1L
    while (step <= bound - lo - 1 && exists(cfg, lo + step)) {
      lo += step
      step = if (step > (bound - lo) / 2) bound - lo else step << 1
    }
    var hi = math.min(bound, if (step > bound - lo) bound else lo + step)
    if (hi < bound || !exists(cfg, bound - 1)) {
      // first missing offset is in (lo, hi]
      while (lo + 1 < hi) {
        val mid = lo + (hi - lo) / 2
        if (exists(cfg, mid)) lo = mid else hi = mid
      }
      hi
    } else bound
  }

  /** A deliberately non-retryable failure (4xx other than 429): a bad
    * request does not heal by retrying, and the broad IOException retry
    * below must not swallow it.
    */
  final class NonRetryableHttpError(msg: String) extends java.io.IOException(msg)

  /** One paginated GET: records [from, from+limit) as JSONL lines. Retries
    * 429/5xx and ANY transport-level IOException (connect, timeout, reset,
    * mid-body truncation/premature EOF — all look different at the JDK
    * level but mean the same thing operationally) with doubling backoff,
    * capped so a long retry budget cannot overflow the shift or sleep for
    * hours; fails fast on other 4xx.
    */
  @annotation.tailrec
  def fetch(cfg: Config, from: Long, limit: Int, attempt: Int = 0): IndexedSeq[String] = {
    val sep = if (cfg.url.contains("?")) "&" else "?"
    val uri = java.net.URI.create(
      s"${cfg.url}$sep${cfg.offsetParam}=$from&${cfg.sizeParam}=$limit")
    val result: Either[String, IndexedSeq[String]] =
      try {
        val conn = uri.toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(60000)
        try {
          val code = conn.getResponseCode
          if (code == 200) {
            val body = new String(
              conn.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            Right(body.linesIterator.filter(_.nonEmpty).toIndexedSeq)
          } else if (code >= 500 || code == 429) Left(s"HTTP $code")
          else throw new NonRetryableHttpError(
            s"rest-pages: GET $uri -> HTTP $code (not retryable)")
        } finally conn.disconnect()
      } catch {
        case e: NonRetryableHttpError => throw e
        // a malformed URL is a configuration error, not a transport blip —
        // retrying it N times with backoff would only delay the real message
        case e: java.net.MalformedURLException => throw e
        case e: java.io.IOException =>
          Left(e.getClass.getSimpleName +
            Option(e.getMessage).map(m => s": $m").getOrElse(""))
      }
    result match {
      case Right(rows) => rows
      case Left(why) =>
        if (attempt >= cfg.retries)
          throw new java.io.IOException(
            s"rest-pages: GET $uri failed after ${attempt + 1} attempts ($why)")
        Thread.sleep(
          math.min(60000L, cfg.retryBackoffMs << math.min(attempt, 20)))
        fetch(cfg, from, limit, attempt + 1)
    }
  }
}

class RestPagesProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rest-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestPagesSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestPagesTable(new CaseInsensitiveStringMap(properties))
}

class RestPagesTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val cfg = RestPagesSource.config(options)
  override def name(): String = s"rest-pages:${cfg.url}"
  override def schema(): StructType = RestPagesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val maxRecordsOpt = Option(options.get("maxRecords")).map(_.toLong)
    val maxRecords = maxRecordsOpt.getOrElse(1L << 20)
    val recordsPerPartition = Option(options.get("recordsPerPartition")).map(_.toLong)
      .getOrElse(cfg.pageSize.toLong * 64)
    val maxRecordsPerTrigger = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    require(recordsPerPartition > 0,
      s"recordsPerPartition must be positive, got $recordsPerPartition")
    require(maxRecords > 0, s"maxRecords must be positive, got $maxRecords")
    maxRecordsPerTrigger.foreach(n => require(n > 0,
      s"maxRecordsPerTrigger must be positive, got $n")) // 0 would stall forever
    new ScanBuilder {
      override def build(): Scan =
        new RestPagesScan(
          cfg, maxRecords, maxRecordsExplicit = maxRecordsOpt.isDefined,
          recordsPerPartition, maxRecordsPerTrigger)
    }
  }
}

class RestPagesScan(
    cfg: RestPagesSource.Config,
    maxRecords: Long,
    maxRecordsExplicit: Boolean,
    recordsPerPartition: Long,
    maxRecordsPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = RestPagesSource.Schema

  private def ranges(from: Long, until: Long): Array[InputPartition] = {
    if (until <= from) Array.empty
    else {
      val nParts = (until - from + recordsPerPartition - 1) / recordsPerPartition
      // a silent .toInt truncation here would turn a huge maxRecords into an
      // arbitrary (possibly empty) partition set — fail loudly instead
      require(nParts <= (1 << 20),
        s"rest-pages: [$from, $until) at $recordsPerPartition records/partition " +
          s"needs $nParts partitions; raise recordsPerPartition or lower the bound")
      (0 until nParts.toInt).map { i =>
        RestPagesPartition(
          cfg,
          from + i * recordsPerPartition,
          math.min(from + (i + 1) * recordsPerPartition, until)): InputPartition
      }.toArray
    }
  }

  // The record space is pinned to the frontier probed ONCE per scan, so
  // every partition covers only records that already existed and reads its
  // full range: concurrent upstream appends cannot open mid-sequence holes
  // (a range that stopped at a short page while a later range kept reading
  // data appended afterwards). Records past the scan's frontier belong to
  // the next query (or the streaming tail). Lazy + cached because Spark may
  // call planInputPartitions more than once for one query execution.
  //
  // Hitting the DEFAULT record cap with more data upstream fails loudly:
  // a backfill silently landing 2^20 of 5M records is the exact silent-
  // truncation failure this source is built to refuse. An EXPLICIT
  // maxRecords is a requested bound (LIMIT semantics) and truncates as
  // asked.
  private lazy val pinnedFrontier: Long = {
    val f = RestPagesSource.frontier(cfg, 0L, maxRecords)
    if (f == maxRecords && !maxRecordsExplicit &&
        RestPagesSource.exists(cfg, maxRecords)) // throttled like every probe
      throw new IllegalStateException(
        s"rest-pages: endpoint has more than the default maxRecords cap " +
          s"($maxRecords) — set maxRecords explicitly (as a bound, or higher) " +
          "so truncation is a stated choice, not an accident")
    f
  }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      ranges(0L, pinnedFrontier)
    override def createReaderFactory(): PartitionReaderFactory = RestPagesReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl {
      override def initialOffset(): Offset = RestPagesOffset(0L)

      override def getDefaultReadLimit: ReadLimit =
        maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())
      // The engine always calls the admission-control overload below for a
      // SupportsAdmissionControl stream; this no-arg variant has no cursor
      // to advance FROM, and guessing offset 0 could report an offset
      // BEHIND the committed cursor. Refuse rather than mislead.
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "rest-pages uses the admission-control latestOffset(start, limit)")
      /** Driver-side discovery = [[RestPagesSource.frontier]]: O(log n)
        * one-record probes instead of downloading the whole backlog's
        * bodies just to count them (tasks fetch the data exactly once).
        */
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val from = start.asInstanceOf[RestPagesOffset].next
        val bound = limit match {
          case m: ReadMaxRows =>
            if (m.maxRows() > Long.MaxValue - from) Long.MaxValue
            else from + m.maxRows()
          case _ => Long.MaxValue
        }
        RestPagesOffset(RestPagesSource.frontier(cfg, from, bound))
      }
      /** Unrecognized offset JSON fails the restart loudly — a guessed
        * cursor silently duplicates or skips upstream records.
        */
      override def deserializeOffset(json: String): Offset = {
        val re = """\"next\":(\d+)""".r
        re.findFirstMatchIn(json).map(m => RestPagesOffset(m.group(1).toLong))
          .getOrElse(throw new IllegalArgumentException(
            s"rest-pages: unrecognized offset JSON: $json"))
      }
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        ranges(
          start.asInstanceOf[RestPagesOffset].next,
          end.asInstanceOf[RestPagesOffset].next)
      override def createReaderFactory(): PartitionReaderFactory = RestPagesReaderFactory
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

/** The next unconsumed record offset (records [0, next) are consumed). */
case class RestPagesOffset(next: Long) extends Offset {
  override def json(): String = s"""{"next":$next}"""
}

/** Record range [from, until); the task pages through it with early stop at
  * the first short page (end of upstream data inside the range).
  */
case class RestPagesPartition(cfg: RestPagesSource.Config, from: Long, until: Long)
    extends InputPartition

object RestPagesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestPagesPartition]
    new PartitionReader[InternalRow] {
      private val cfg = p.cfg
      private var nextFetch = p.from
      private var ended = false
      private var buf: Iterator[(Long, String)] = Iterator.empty
      private var lastFetchAt = 0L
      private var row: InternalRow = _

      @annotation.tailrec
      private def advance(): Boolean =
        if (buf.hasNext) true
        else if (ended || nextFetch >= p.until) false
        else {
          if (cfg.minRequestIntervalMs > 0) {
            val wait = lastFetchAt + cfg.minRequestIntervalMs - System.currentTimeMillis()
            if (wait > 0) Thread.sleep(wait)
          }
          lastFetchAt = System.currentTimeMillis()
          val limit = math.min(cfg.pageSize.toLong, p.until - nextFetch).toInt
          val rows = RestPagesSource.fetch(cfg, nextFetch, limit)
          val base = nextFetch
          buf = rows.iterator.zipWithIndex.map { case (r, i) => (base + i, r) }
          if (rows.length < limit) ended = true // short page = end of data
          nextFetch += rows.length
          advance()
        }

      override def next(): Boolean =
        if (advance()) {
          val (off, rec) = buf.next()
          row = InternalRow(off, UTF8String.fromString(rec))
          true
        } else { row = null; false }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
