package graft.sources

import java.io.DataInputStream
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `sbe-frames` — a real DataSource V2 source for the reference's SBE feed
  * (SURVEY §2.1 S1, `binance_sbe.py:140-191`), replacing the round-1/2
  * file-stream *analog* with actual connector plumbing.
  *
  * The reference's WebSocket client yields raw SBE frames and survives
  * disconnects by resubscribing (`binance_sbe.py:370-382`); the durable
  * equivalent of that contract in Spark's model is a REPLAYABLE source:
  * a capture process appends frames to rolling files (`<name>.sbef`:
  * `[u32 big-endian length][frame bytes]*`), and this source exposes them
  * to both `spark.read` (backfill) and `spark.readStream` (tailing) with
  * deterministic, checkpointable offsets — restart/reconnect becomes offset
  * replay instead of bespoke backoff loops.
  *
  * Offsets are (file, tailBytes): every file named before `file` is fully
  * consumed, plus `tailBytes` of `file` itself. The lexicographically LAST
  * file is the live capture target and may grow; every earlier file is
  * frozen (the capture rolls with increasing names — the reference's
  * reconnect boundaries do exactly this). `latestOffset` walks the active
  * file's length prefixes to the last COMPLETE frame boundary, so an
  * in-flight append is never half-consumed: tail latency is one trigger,
  * not one file roll.
  *
  * Storage: all paths go through the Hadoop FileSystem API ([[GraftFs]]) —
  * a capture directory can live on `file:`, `hdfs:`, or `s3a:`; executors
  * resolve the FileSystem from a [[SerializableConfiguration]] carried by
  * the reader factory. The journal directory contract is the same on every
  * scheme: files appear/grow under increasing names (on object stores
  * without append, the capture uploads closed rolls — each file is then
  * frozen on arrival and only the tail-walk optimization is moot).
  *
  * Scale shape: one InputPartition per frame file (plus one bounded tail
  * range), so a 1000-executor cluster tails a wide capture directory with
  * per-file parallelism and no shuffle; decode stays columnar via the
  * codegen `sbe_decode_*` expressions downstream ([[graft.functions.Sbe]]).
  */
object SbeFrameSource {
  val Schema: StructType = StructType(Seq(
    StructField("frame", BinaryType, nullable = false),
    StructField("source_file", StringType, nullable = false),
    // the frame's starting byte offset within its file — the stable,
    // replayable per-frame identifier (survives partial-file reads, unlike
    // an ordinal that would restart per byte-range partition)
    StructField("frame_offset", LongType, nullable = false)))

  val FileSuffix = ".sbef"

  /** Sanity bound on a length prefix (shared intent with SocketCapture's
    * maxFrameBytes): anything outside [0, MaxFrameBytes] is a corrupt or
    * torn prefix, and readers stop at the last good boundary instead of
    * mis-seeking or allocating garbage.
    */
  val MaxFrameBytes: Int = 16 << 20

  private[sources] def listFrameFiles(
      dir: String,
      conf: Configuration = GraftFs.conf()): Array[FileStatus] =
    GraftFs.listBySuffix(dir, FileSuffix, conf)

  /** Byte offset just past the last COMPLETE frame in `file` — the safe
    * consumption boundary for a file that may still be appended to. Walks
    * length prefixes with skips (no payload reads) starting from `from`,
    * which MUST be a known frame boundary (0, or a previously returned
    * boundary — the admission-control path resumes from the checkpointed
    * tail so each trigger walks only the new suffix, not the whole file).
    * The walk is bounded by the file length OBSERVED AT LIST TIME
    * (`st.getLen`), not the stream's moving EOF, so a concurrent append
    * cannot push the boundary past what the planner saw. A corrupt prefix
    * (negative or > [[MaxFrameBytes]]) ends the walk at the last good
    * boundary — never a mis-seek or an EOF throw.
    */
  private[sources] def completeFrameBoundary(
      f: FileSystem, st: FileStatus, from: Long = 0L): Long = {
    val len = st.getLen
    val raw = f.open(st.getPath)
    val in = try { raw.seek(from); new DataInputStream(new java.io.BufferedInputStream(raw)) }
    catch { case e: Throwable => raw.close(); throw e }
    try {
      var pos = from
      var boundary = from
      var done = false
      while (!done) {
        if (pos + 4 > len) done = true
        else {
          val frameLen = in.readInt().toLong
          if (frameLen < 0 || frameLen > MaxFrameBytes) done = true
          else if (pos + 4 + frameLen > len) done = true
          else {
            in.skipNBytes(frameLen)
            pos += 4 + frameLen
            boundary = pos
          }
        }
      }
      boundary
    } finally in.close()
  }

  /** Is `target` a frame boundary of `st` — byte 0, or the position just
    * past a complete frame? Walks length prefixes until reaching or passing
    * `target`. Used to validate a legacy index-translated offset: a
    * tailBytes that is NOT a boundary of the candidate file proves the
    * index mapping shifted (the boundary was recorded against a different
    * file), where resuming would skip files and mis-seek mid-frame.
    */
  private[sources] def isFrameBoundary(
      f: FileSystem, st: FileStatus, target: Long): Boolean = {
    if (target == 0L) return true
    if (target > st.getLen) return false
    val in = new DataInputStream(new java.io.BufferedInputStream(f.open(st.getPath)))
    try {
      var pos = 0L
      while (pos < target) {
        if (pos + 4 > st.getLen) return false // torn tail before target
        val frameLen = in.readInt().toLong
        if (frameLen < 0 || frameLen > MaxFrameBytes) return false
        if (pos + 4 + frameLen > st.getLen) return false
        in.skipNBytes(frameLen)
        pos += 4 + frameLen
      }
      pos == target
    } finally in.close()
  }

  /** Capture-side writer (ingest/test fixture, not the query hot path):
    * one length-prefixed frame file.
    */
  def writeFrameFile(file: java.io.File, frames: Seq[Array[Byte]]): Unit =
    writeFrames(new Path(file.toURI), frames, append = false, GraftFs.conf())

  /** Capture-side APPEND to the active file (live-feed fixture). */
  def appendFrameFile(file: java.io.File, frames: Seq[Array[Byte]]): Unit =
    writeFrames(new Path(file.toURI), frames, append = true, GraftFs.conf())

  private[sources] def writeFrames(
      path: Path, frames: Seq[Array[Byte]], append: Boolean, conf: Configuration): Unit = {
    val f = GraftFs.fs(path, conf)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      if (append && f.exists(path)) f.append(path) else f.create(path, true)))
    try frames.foreach { fr => out.writeInt(fr.length); out.write(fr) }
    finally out.close()
  }
}

class SbeFrameSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sbe-frames"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SbeFrameSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("sbe-frames requires a path (load(dir))"))
    new SbeFrameTable(path)
  }
}

class SbeFrameTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sbe-frames:$path"
  override def schema(): StructType = SbeFrameSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
    new ScanBuilder {
      override def build(): Scan = new SbeFrameScan(path, maxFiles)
    }
  }
}

class SbeFrameScan(path: String, maxFilesPerTrigger: Option[Int]) extends Scan {
  // Captured ONCE on the driver while the session is on this thread; tasks
  // get it via the reader factory's SerializableConfiguration.
  private val conf = GraftFs.serializableConf()
  override def readSchema(): StructType = SbeFrameSource.Schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SbeFrameSource.listFrameFiles(path, conf.value)
        .map(st => SbeFramePartition(st.getPath.toString, 0L, -1L): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory = SbeFrameReaderFactory(conf)
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SbeFrameMicroBatchStream(path, maxFilesPerTrigger, conf)
}

/** Every file named lexicographically BEFORE `file` is fully consumed,
  * plus `tailBytes` of `file` itself ("" = nothing consumed). NAME-anchored,
  * not index-counted, so deleting already-consumed capture files
  * (retention) cannot shift the mapping and corrupt replay.
  */
case class SbeFrameOffset(file: String, tailBytes: Long) extends Offset {
  override def json(): String = s"""{"file":"$file","tailBytes":$tailBytes}"""
}

/** Admission control (`maxFilesPerTrigger`) bounds each micro-batch like
  * the reference's fixed-size poll loop (`kinesis_consumer.py:113-143`
  * polls bounded record batches per shard iteration) — a catch-up after
  * downtime becomes N bounded batches instead of one giant one.
  */
class SbeFrameMicroBatchStream(
    path: String,
    maxFilesPerTrigger: Option[Int],
    conf: SerializableConfiguration = GraftFs.serializableConf())
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = SbeFrameOffset("", 0L)

  /** `resume`: when the start offset already tails the ACTIVE file, the
    * boundary walk continues from its checkpointed tail instead of byte 0 —
    * per-trigger cost is O(new frames), not O(file).
    */
  private def available(resume: Option[SbeFrameOffset]): SbeFrameOffset = {
    val files = SbeFrameSource.listFrameFiles(path, conf.value)
    if (files.isEmpty) SbeFrameOffset("", 0L)
    else {
      val active = files.last
      val from = resume
        .filter(_.file == active.getPath.getName).map(_.tailBytes).getOrElse(0L)
      val f = GraftFs.fs(active.getPath, conf.value)
      SbeFrameOffset(
        active.getPath.getName,
        SbeFrameSource.completeFrameBoundary(f, active, from))
    }
  }

  override def latestOffset(): Offset = available(None)
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SbeFrameOffset]
    val avail = available(Some(from))
    limit match {
      case m: ReadMaxFiles =>
        // a capped batch always ends on a complete-file boundary (tail 0 of
        // the file AFTER the admitted ones); the active file's tail is
        // consumed by a later trigger once all complete files are behind
        // the offset. `pending` counts from the partially-consumed start
        // file itself, matching the index-based semantics this replaces.
        val names = SbeFrameSource.listFrameFiles(path, conf.value).map(_.getPath.getName)
        val pending =
          if (from.file.isEmpty) names.toSeq else names.filter(_ >= from.file).toSeq
        if (m.maxFiles() < pending.length) SbeFrameOffset(pending(m.maxFiles()), 0L)
        else avail
      case _ => avail
    }
  }
  /** Current format: `{"file":name,"tailBytes":M}`. Checkpoints written
    * before the name-anchored format carry `{"files":N,"tailBytes":M}` —
    * N files fully consumed by INDEX, tailing the (N+1)th. A legacy index
    * is translated into the Nth sorted file name (same semantics) so an
    * existing checkpoint resumes at its exact boundary instead of silently
    * decoding to the empty offset and replanning every consumed file
    * (duplicate ingestion downstream).
    *
    * The index is only meaningful against the listing it was recorded
    * under — a retention delete of any earlier file shifts every index (the
    * corruption that motivated name anchoring), and no listing can reveal
    * that after the fact. Defenses, each failing the restart LOUDLY rather
    * than guessing: an index past the current listing throws; a non-zero
    * tailBytes must be an exact frame boundary of the candidate file
    * (boundaries are sparse, so a shifted mapping almost surely lands
    * mid-frame and is caught; an unshifted mapping always validates); and
    * JSON matching neither format throws. tailBytes == 0 on a shifted
    * index remains undetectable in principle — that case re-ingests or
    * skips whole files only if files were deleted mid-era, which the
    * legacy format never supported in the first place.
    */
  override def deserializeOffset(json: String): Offset = {
    val fileRe = """\"file\":\"([^\"]*)\"""".r
    val tailRe = """\"tailBytes\":(-?\d+)""".r
    val legacyRe = """\"files\":(\d+)""".r
    val tail = tailRe.findFirstMatchIn(json).map(_.group(1).toLong)
    fileRe.findFirstMatchIn(json).map(m => SbeFrameOffset(m.group(1), tail.getOrElse(0L)))
      .orElse(legacyRe.findFirstMatchIn(json).map { m =>
        val n = m.group(1).toInt
        val t = tail.getOrElse(0L)
        if (n == 0 && t == 0L) SbeFrameOffset("", 0L)
        else {
          val files = SbeFrameSource.listFrameFiles(path, conf.value)
          if (n >= files.length) throw new IllegalStateException(
            s"sbe-frames: legacy offset index $n does not map onto the " +
              s"${files.length} files now under $path (consumed files deleted " +
              "by retention?) — cannot translate safely; clear the checkpoint " +
              "to choose an explicit restart point")
          val st = files(n)
          if (t > 0 && !SbeFrameSource.isFrameBoundary(
              GraftFs.fs(st.getPath, conf.value), st, t))
            throw new IllegalStateException(
              s"sbe-frames: legacy offset tailBytes=$t is not a frame boundary " +
                s"of ${st.getPath.getName} — the index mapping has shifted " +
                "(consumed files deleted by retention?); cannot translate " +
                "safely; clear the checkpoint to choose an explicit restart point")
          SbeFrameOffset(st.getPath.getName, t)
        }
      })
      .getOrElse(throw new IllegalArgumentException(
        s"sbe-frames: unrecognized offset JSON: $json"))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SbeFrameOffset]
    val e = end.asInstanceOf[SbeFrameOffset]
    val files = SbeFrameSource.listFrameFiles(path, conf.value)
    def pathOf(name: String): Option[String] =
      files.find(_.getPath.getName == name).map(_.getPath.toString)
    val parts = Seq.newBuilder[InputPartition]
    if (s.file == e.file) {
      if (e.tailBytes > s.tailBytes)
        pathOf(s.file).foreach(p => parts += SbeFramePartition(p, s.tailBytes, e.tailBytes))
    } else {
      // the rest of the file the start offset was tailing (now frozen)
      pathOf(s.file).foreach(p => parts += SbeFramePartition(p, s.tailBytes, -1L))
      // fully-consumed files in between (by NAME, immune to deletions)
      files.filter(st => st.getPath.getName > s.file && st.getPath.getName < e.file)
        .foreach(st => parts += SbeFramePartition(st.getPath.toString, 0L, -1L))
      // the new active file's complete prefix
      if (e.tailBytes > 0)
        pathOf(e.file).foreach(p => parts += SbeFramePartition(p, 0L, e.tailBytes))
    }
    parts.result().toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = SbeFrameReaderFactory(conf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Byte range [fromByte, untilByte) of one frame file; untilByte = -1 reads
  * to EOF. Range ends always fall on frame boundaries (planInputPartitions
  * only cuts at boundaries computed by completeFrameBoundary).
  */
case class SbeFramePartition(file: String, fromByte: Long, untilByte: Long)
    extends InputPartition

case class SbeFrameReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SbeFramePartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(p.file)
      private val in = {
        val raw = GraftFs.fs(path, conf.value).open(path)
        try raw.seek(p.fromByte)
        catch { case e: Throwable => raw.close(); throw e }
        new DataInputStream(new java.io.BufferedInputStream(raw))
      }
      private val fileName = UTF8String.fromString(path.getName)
      private var pos = p.fromByte
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (p.untilByte >= 0 && pos >= p.untilByte) { row = null; return false }
        // readNBytes loops until 4 bytes or true EOF — a single read() may
        // legally return short before EOF and would drop the partition tail.
        val lenBytes = new Array[Byte](4)
        val n = in.readNBytes(lenBytes, 0, 4)
        if (n < 4) { row = null; false }
        else {
          val len = java.nio.ByteBuffer.wrap(lenBytes).getInt
          // corrupt prefix: stop at the last good boundary (torn-tail
          // posture) instead of a negative-size crash or a huge allocation
          if (len < 0 || len > SbeFrameSource.MaxFrameBytes) { row = null; return false }
          val frame = new Array[Byte](len)
          var off = 0
          var eof = false
          while (off < len && !eof) {
            val r = in.read(frame, off, len - off)
            if (r < 0) eof = true else off += r
          }
          if (eof) {
            // A truncated tail frame is what a live capture's in-flight
            // write looks like — treat it as end-of-file (the frame is
            // re-read complete once the boundary advances), mirroring the
            // reference's skip-bad-lines posture (S7) rather than failing
            // the whole partition.
            row = null; false
          } else {
            val frameStart = pos
            pos += 4 + len
            row = InternalRow(frame, fileName, frameStart)
            true
          }
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
