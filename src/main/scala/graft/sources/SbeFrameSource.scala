package graft.sources

import java.io.{DataInputStream, File, FileInputStream}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  * Offsets are file-granular: an offset is the count of consumed files in
  * lexicographic order. Contract (same as Spark's own FileStreamSource
  * discipline): files are immutable once visible and roll with
  * lexicographically increasing names (the capture's timestamped chunks —
  * the reference's reconnect boundaries — do exactly this).
  *
  * Scale shape: one InputPartition per frame file, so a 1000-executor
  * cluster tails a wide capture directory with per-file parallelism and no
  * shuffle; decode stays columnar via the codegen `sbe_decode_*`
  * expressions downstream ([[graft.functions.Sbe]]).
  */
object SbeFrameSource {
  val Schema: StructType = StructType(Seq(
    StructField("frame", BinaryType, nullable = false),
    StructField("source_file", StringType, nullable = false),
    StructField("frame_seq", LongType, nullable = false)))

  val FileSuffix = ".sbef"

  private[sources] def listFrameFiles(dir: String): Array[File] = {
    val d = new File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty[File])
    fs.filter(f => f.isFile && f.getName.endsWith(FileSuffix)).sortBy(_.getName)
  }

  /** Capture-side writer (ingest/test fixture, not the query hot path):
    * one immutable length-prefixed frame file.
    */
  def writeFrameFile(file: File, frames: Seq[Array[Byte]]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(file)))
    try frames.foreach { f => out.writeInt(f.length); out.write(f) }
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
  override def readSchema(): StructType = SbeFrameSource.Schema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SbeFrameSource.listFrameFiles(path)
        .map(f => SbeFramePartition(f.getAbsolutePath): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory = SbeFrameReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SbeFrameMicroBatchStream(path, maxFilesPerTrigger)
}

/** Offset = number of frame files consumed (lexicographic order). */
case class SbeFrameOffset(fileCount: Int) extends Offset {
  override def json(): String = s"""{"fileCount":$fileCount}"""
}

/** Admission control (`maxFilesPerTrigger`) bounds each micro-batch like
  * the reference's fixed-size poll loop (`kinesis_consumer.py:113-143`
  * polls bounded record batches per shard iteration) — a catch-up after
  * downtime becomes N bounded batches instead of one giant one.
  */
class SbeFrameMicroBatchStream(path: String, maxFilesPerTrigger: Option[Int])
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = SbeFrameOffset(0)
  override def latestOffset(): Offset =
    SbeFrameOffset(SbeFrameSource.listFrameFiles(path).length)
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = SbeFrameSource.listFrameFiles(path).length
    val from = start.asInstanceOf[SbeFrameOffset].fileCount
    limit match {
      case m: ReadMaxFiles => SbeFrameOffset(math.min(avail, from + m.maxFiles()))
      case _ => SbeFrameOffset(avail)
    }
  }
  override def deserializeOffset(json: String): Offset = {
    // sole field of the trivial JSON above; no JSON lib needed
    val n = json.replaceAll("[^0-9]", "")
    SbeFrameOffset(if (n.isEmpty) 0 else n.toInt)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SbeFrameOffset].fileCount
    val e = end.asInstanceOf[SbeFrameOffset].fileCount
    SbeFrameSource.listFrameFiles(path).slice(s, e)
      .map(f => SbeFramePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = SbeFrameReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SbeFramePartition(file: String) extends InputPartition

object SbeFrameReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SbeFramePartition].file
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(
        new java.io.BufferedInputStream(new FileInputStream(file)))
      private val fileName = UTF8String.fromString(new File(file).getName)
      private var seq = -1L
      private var row: InternalRow = _

      override def next(): Boolean = {
        val lenBytes = new Array[Byte](4)
        val n = in.read(lenBytes)
        if (n < 4) { row = null; false }
        else {
          val len = java.nio.ByteBuffer.wrap(lenBytes).getInt
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
            // re-read complete once the file rolls), mirroring the
            // reference's skip-bad-lines posture (S7) rather than failing
            // the whole partition.
            row = null; false
          } else {
            seq += 1
            row = InternalRow(frame, fileName, seq)
            true
          }
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
