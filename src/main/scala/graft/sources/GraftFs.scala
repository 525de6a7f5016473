package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, LocalFileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Hadoop-FileSystem plumbing shared by the custom sources (`sbe-frames`,
  * `avro-ocf`, the bronze re-anchor pointer). The reference's storage layer
  * is object storage (`s3_writer.py:216-230`, `s3_reader.py:37-72`); binding
  * these sources to `java.io.File` would make them correct in a single-node
  * sandbox but unrunnable on a real cluster, where executors cannot see the
  * driver's local paths at all. Routing every path through
  * `org.apache.hadoop.fs.FileSystem` keeps `file:` working unchanged while
  * gaining `hdfs:` / `s3a:` for free — the scheme on the user's path picks
  * the implementation, and `spark.hadoop.*` session configs (credentials,
  * endpoints) flow through the session's `hadoopConfiguration`.
  *
  * Executor-side access: `Configuration` is not Java-serializable, so scan
  * and write factories carry a [[SerializableConfiguration]] captured on the
  * driver — the same mechanism Spark's own file sources use — and tasks
  * re-resolve the FileSystem from it per partition.
  */
object GraftFs {

  /** The active session's Hadoop configuration (driver side), which carries
    * `spark.hadoop.*` overrides — credentials, endpoints, timeouts. Falls
    * back to classpath defaults when no session exists on this JVM (an
    * edge-side capture process journaling without Spark).
    */
  def conf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def serializableConf(): SerializableConfiguration =
    new SerializableConfiguration(conf())

  /** FileSystem for `path`. The local scheme resolves to the RAW local
    * filesystem, not the checksumming `LocalFileSystem` wrapper: the wrapper
    * refuses `append` (the capture journal's contract), strews `.crc`
    * sidecars through capture directories, and adds nothing here — the
    * length-prefixed/container formats carry their own integrity framing.
    * Raw local preserves the exact `java.io` byte semantics this API
    * replaced; every other scheme (`hdfs:`, `s3a:`, ...) is returned as
    * configured.
    */
  def fs(path: Path, conf: Configuration): FileSystem =
    path.getFileSystem(conf) match {
      case l: LocalFileSystem => l.getRawFileSystem
      case other => other
    }

  /** Non-empty data files under `dir` whose name ends with `suffix`, sorted
    * by name (the offset/replay order contract of both custom sources). A
    * missing directory lists as empty — sources treat "not created yet" as
    * "no data yet", matching the previous `File.listFiles == null` handling.
    * `keepEmpty` admits zero-length files (a frame journal's just-rolled
    * active file is legitimately empty; an Avro container never is — no
    * header).
    */
  def listBySuffix(
      dir: String,
      suffix: String,
      conf: Configuration,
      keepEmpty: Boolean = true): Array[FileStatus] = {
    val p = new Path(dir)
    val f = fs(p, conf)
    val statuses =
      try f.listStatus(p)
      catch {
        // "not created yet" AND "deleted between exists-check and list" both
        // mean "no data yet" — the java.io Option(listFiles) semantics this
        // replaced never threw on either
        case _: java.io.FileNotFoundException => Array.empty[FileStatus]
      }
    statuses
      .filter(s => s.isFile && s.getPath.getName.endsWith(suffix) &&
        (keepEmpty || s.getLen > 0))
      .sortBy(_.getPath.getName)
  }
}
