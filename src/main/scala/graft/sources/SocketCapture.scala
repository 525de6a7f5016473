package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path

/** Live TCP feed → rolling capture journal: the receiver half of the
  * reference's WS/Kinesis consumers (`services/sbe_ingestor`,
  * `services/kinesis_*` — connect, frame, persist), re-expressed as the
  * standard log-consumer shape: an UNREPLAYABLE network stream is durably
  * journaled into rolling length-prefixed `.sbef` files, and the
  * checkpointable [[SbeFrameSource]] stream tails that journal with
  * (file, offset) replay. Receive → append to log → consume by offset is
  * exactly the Kafka/Kinesis pattern; the journal is the topic, file names
  * are the partition's increasing offsets, and reconnect = replay from the
  * checkpointed boundary.
  *
  * Durability invariant: only COMPLETELY received frames are journaled
  * (length prefix + payload both fully read), so a connection cut mid-frame
  * can never leave a torn record for the tailing source — the source's own
  * complete-frame boundary walk then makes the pipeline end-to-end
  * at-least-once with no partial reads.
  *
  * Scale shape: one receiver per upstream connection (shard/socket), each
  * journaling its own directory; Spark tails the directories with per-file
  * parallelism. The receiver itself is ingest infra (driver/edge side), not
  * a query-path operator.
  */
final class SocketCapture(
    host: String,
    port: Int,
    dir: String,
    rollBytes: Long = 64L << 20,
    flushEveryFrames: Int = 1,
    maxFrameBytes: Int = 16 << 20) extends AutoCloseable {

  private val framesJournaled = new AtomicLong(0)
  @volatile private var failure: Option[Throwable] = None
  private val socket = new Socket(host, port)
  // Captured on the constructing thread (where a Spark session, if any,
  // is registered); the receiver thread must not re-resolve it.
  private val hadoopConf = GraftFs.conf()

  private val thread = new Thread(() => run(), s"socket-capture-$host:$port")
  thread.setDaemon(true)
  thread.start()

  private def nextFile(idx: Int): Path =
    new Path(dir, f"capture_$idx%05d${SbeFrameSource.FileSuffix}")

  private def run(): Unit = {
    val in = new DataInputStream(new java.io.BufferedInputStream(socket.getInputStream))
    var fileIdx = SbeFrameSource.listFrameFiles(dir, hadoopConf).length
    var out: DataOutputStream = null
    var written = 0L
    var sinceFlush = 0
    def roll(): Unit = {
      if (out != null) out.close()
      // Journal files are written via the Hadoop FS API (file:/hdfs:; an
      // object store without flush-visibility would journal closed rolls
      // only — set rollBytes small there). The per-frame flush pushes
      // complete frames toward the tailing source's boundary walk.
      val p = nextFile(fileIdx)
      val f = GraftFs.fs(p, hadoopConf)
      if (fileIdx == 0) f.mkdirs(new Path(dir))
      out = new DataOutputStream(new java.io.BufferedOutputStream(f.create(p, true)))
      fileIdx += 1
      written = 0L
    }
    try {
      roll()
      var eof = false
      while (!eof) {
        val len =
          try in.readInt()
          catch { case _: EOFException => eof = true; -1 }
        if (!eof) {
          // The wire length prefix is untrusted input: a corrupt/negative or
          // ~2 GB value must become a framing error, not an allocation crash
          // (NegativeArraySizeException/OOM) inside the receiver thread.
          if (len < 0 || len > maxFrameBytes)
            throw new java.io.StreamCorruptedException(
              s"framing error: length prefix $len outside [0, $maxFrameBytes]")
          val payload = new Array[Byte](len)
          in.readFully(payload) // EOF mid-payload aborts WITHOUT journaling
          out.writeInt(len)
          out.write(payload)
          written += 4L + len
          framesJournaled.incrementAndGet()
          sinceFlush += 1
          if (sinceFlush >= flushEveryFrames) { out.flush(); sinceFlush = 0 }
          if (written >= rollBytes) roll()
        }
      }
    } catch {
      case _: EOFException => () // cut mid-frame: partial frame discarded
      case e: java.net.SocketException if socket.isClosed => () // close() called
      case e: Throwable => failure = Some(e)
    } finally {
      if (out != null) out.close()
      socket.close()
    }
  }

  /** Frames fully received AND journaled so far. */
  def journaledCount: Long = framesJournaled.get()

  /** Re-throws an unexpected receiver failure (None after a clean EOF). */
  def checkFailure(): Unit = failure.foreach(throw _)

  /** Blocks until the upstream closes and the journal is fully flushed. */
  def awaitCompletion(timeoutMs: Long = 30000): Unit = {
    thread.join(timeoutMs)
    require(!thread.isAlive, s"capture still draining after ${timeoutMs}ms")
    checkFailure()
  }

  override def close(): Unit = {
    socket.close()
    thread.join(5000)
  }
}
