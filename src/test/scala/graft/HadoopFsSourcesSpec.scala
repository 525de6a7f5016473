package graft

import java.io.File
import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.{Bronze, GraftFs, SbeFrameSource}

/** The custom sources route all IO through the Hadoop FileSystem API so a
  * capture/export directory can live on `file:`, `hdfs:`, or `s3a:`. These
  * specs drive the same surfaces through scheme-QUALIFIED `file:` URIs —
  * the path shape a cluster deployment uses — and pin the local-scheme
  * contract (raw local filesystem: byte-identical to the `java.io` code
  * this replaced, no `.crc` sidecars, append supported).
  */
class HadoopFsSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def frame(id: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(id).putLong(id * 2)
    bb.array()
  }

  test("sbe-frames batch read through a file: URI") {
    val dir = Files.createTempDirectory("sbef_uri").toFile
    SbeFrameSource.writeFrameFile(new File(dir, "cap_00000.sbef"), Seq(frame(1), frame(2)))
    SbeFrameSource.writeFrameFile(new File(dir, "cap_00001.sbef"), Seq(frame(3)))
    val df = spark.read.format("sbe-frames").load("file:" + dir.getAbsolutePath)
    assert(df.count() === 3)
    // journal write went through the raw local FS: no .crc sidecars that
    // would pollute capture directories / survive renames inconsistently
    assert(!dir.listFiles().exists(_.getName.endsWith(".crc")),
      s"checksum sidecars present: ${dir.listFiles().map(_.getName).mkString(",")}")
  }

  test("sbe-frames streaming tail through a file: URI picks up appends") {
    val dir = Files.createTempDirectory("sbef_uri_tail").toFile
    val active = new File(dir, "cap_00000.sbef")
    SbeFrameSource.writeFrameFile(active, Seq(frame(1)))
    val q = spark.readStream.format("sbe-frames").load("file:" + dir.getAbsolutePath)
      .writeStream.outputMode("append").format("memory").queryName("sbef_uri_tail")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sbef_uri_tail").count() === 1)
      // Hadoop-FS append to the active file (raw local supports append;
      // the checksumming wrapper would have refused)
      SbeFrameSource.appendFrameFile(active, Seq(frame(2), frame(3)))
      q.processAllAvailable()
      assert(spark.table("sbef_uri_tail").count() === 3)
    } finally q.stop()
  }

  test("avro-ocf write -> scan round trip through file: URIs") {
    val dir = "file:" + Files.createTempDirectory("ocf_uri").toString
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "tag", "x")
    src.coalesce(1).write.format("avro-ocf").mode("append").save(dir)
    val back = spark.read.format("avro-ocf").load(dir)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(back === Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // tmp files were renamed away by the commit protocol
    val names = GraftFs.listBySuffix(dir, "", spark.sparkContext.hadoopConfiguration)
      .map(_.getPath.getName).toSeq
    assert(names.nonEmpty && names.forall(n => n.endsWith(".avro")), names.toString)
  }

  test("avro-ocf overwrite truncates through the FS API") {
    val dir = "file:" + Files.createTempDirectory("ocf_uri_trunc").toString
    Seq((1L, 1.0)).toDF("id", "x").write.format("avro-ocf").mode("append").save(dir)
    Seq((2L, 2.0)).toDF("id", "x").write.format("avro-ocf").mode("overwrite").save(dir)
    val ids = spark.read.format("avro-ocf").load(dir)
      .select("id").as[Long].collect().toSeq
    assert(ids === Seq(2L))
  }

  test("bronze re-anchor pointer swap + readCurrent through a file: URI") {
    val base = "file:" + Files.createTempDirectory("bronze_uri").toString
    val v1 = Bronze.reAnchor(spark, base, Seq((1L, "one")).toDF("k", "v"))
    assert(v1 === 1L)
    assert(Bronze.readCurrent(spark, base).get.count() === 1)
    val v2 = Bronze.reAnchor(spark, base, Seq((1L, "one"), (2L, "two")).toDF("k", "v"))
    assert(v2 === 2L)
    assert(Bronze.readCurrent(spark, base).get.count() === 2)
    // the shelved prior pointer survives until the NEXT re-anchor (the
    // mid-swap fallback readers rely on), and still resolves version 1
    val conf = spark.sparkContext.hadoopConfiguration
    val priorPath = new Path(base + "/_current_prior")
    assert(GraftFs.fs(priorPath, conf).exists(priorPath))
    assert(Bronze.loadWatermark(spark, base + "/_current_prior", "version") === Some(1L))
  }
}
