package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (scale EXTENSION per
  * BASELINE.json's north star — no reference counterpart): media payloads travel as
  * opaque `binary` columns with typed metadata structs; decode / feature
  * extraction runs batched per partition.
  *
  * The decode kernel itself is STUBBED (no image/audio libs in this
  * container): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. Everything around it — schema, column plumbing, per-partition
  * batch iteration, partition sizing — is the real Spark shape: on a
  * cluster the kernel body is the only thing that changes (JNI/FFI call or
  * `mapInPandas`-style vectorized decode on the Python side).
  *
  * Scale notes: binary payloads make rows wide — size
  * `spark.sql.files.maxPartitionBytes` so a partition of payloads fits in
  * executor memory, and never shuffle the binary column (extract features
  * first, then drop the payload before any join/agg).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  /** Deterministic stand-in for the media decoder: metadata derived from the
    * payload hash (so tests and the DuckDB oracle can reproduce it).
    */
  def fakeDecode(content: Column): Column = {
    val h = conv(substring(md5(content), 1, 8), 16, 10).cast("long")
    struct(
      (pmod(h, lit(1920L)) + 1L).cast("int").as("width"),
      (pmod(h, lit(1080L)) + 1L).cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")), (pmod(h, lit(3L)) + 1).cast("int"))
        .as("format"),
      length(content).cast("long").as("n_bytes"))
  }

  /** Resize/downsample: keep every `stride`-th byte of the payload (the
    * thumbnail shape — real striding, stub semantics; a real resizer
    * replaces the per-byte lambda with its kernel). Pure array ops inside
    * codegen; output length = ceil(len / stride).
    */
  def resize(content: Column, stride: Int): Column = {
    val n = ceil(length(content) / lit(stride.toDouble)).cast("int")
    // null payload -> null thumb (concat_ws would quietly turn it into "",
    // diverging from SQL null semantics and any oracle's NULL result)
    when(content.isNull, lit(null).cast("string"))
      .when(length(content) === 0, lit(""))
      .otherwise(
        concat_ws(
          "",
          transform(
            sequence(lit(0), n - 1),
            i => substring(content, (i * stride + 1).cast("int"), lit(1)).cast("string"))))
  }

  /** Frame sampling: split a payload into `n` equal byte slices (the video
    * "every k-th frame" shape — real slicing, stub semantics).
    */
  def frameSample(content: Column, n: Int): Column =
    transform(
      sequence(lit(0), lit(n - 1)),
      i => {
        val len = length(content)
        val step = (len / n).cast("int")
        substring(content, (i * step + 1).cast("int"), greatest(step, lit(1)))
      })

  /** Batched per-partition feature extraction — the `mapPartitions` plumbing
    * a real decoder plugs into. Batches `batchSize` payloads, runs the
    * (stub) kernel per batch, emits (id, feature vector). The iterator
    * never materializes the whole partition.
    */
  def extractFeaturesBatched(
      media: DataFrame, // id: long, content: binary
      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("feat_mean_byte", DoubleType),
      StructField("feat_len", LongType)))
    val rdd = media.select(col("id"), col("content")).rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // kernel boundary: a real implementation hands `batch` to the
        // decoder in one call; the stub computes per-payload byte stats.
        // null id/content rows emit null features instead of NPE-failing
        // the task — nullable binary is the norm for real media tables
        batch.iterator.map { r =>
          if (r.isNullAt(0)) Row(null, null, null)
          else {
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            if (bytes == null) Row(id, null, null)
            else {
              val mean =
                if (bytes.isEmpty) 0.0
                else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
              Row(id, mean, bytes.length.toLong)
            }
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
