package graft

import org.apache.spark.sql.functions._

import graft.functions.ImageKernels
import graft.operators.Multimodal

/** Real-image kernel coverage: ImageIO encode -> header decode round-trip,
  * corrupt/null payload handling, and real thumbnail scaling — both at the
  * kernel level and through the Column/codegen path.
  */
class ImageKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("encodeImage -> imageMeta round-trips PNG and JPEG header metadata") {
    for ((fmt, name) <- Seq("png" -> "png", "jpg" -> "jpeg")) {
      val bytes = ImageKernels.encodeImage(seed = 7L, width = 23, height = 11, format = fmt)
      assert(bytes.length > 0)
      val row = ImageKernels.imageMeta(bytes)
      assert(row != null, s"meta null for $fmt")
      assert(row.getInt(0) === 23)
      assert(row.getInt(1) === 11)
      assert(row.getUTF8String(2).toString === name)
    }
  }

  test("imageMeta is null for corrupt bytes and for null input") {
    assert(ImageKernels.imageMeta("definitely not an image".getBytes("UTF-8")) == null)
    assert(ImageKernels.imageMeta(Array.emptyByteArray) == null)
    assert(ImageKernels.imageMeta(null) == null)
    // a PNG magic prefix with a truncated body must not crash the task
    val png = ImageKernels.encodeImage(1L, 4, 4, "png")
    assert(ImageKernels.imageMeta(png.take(12)) == null)
  }

  test("thumbnail really halves dimensions (floor, min 1) and re-encodes as png") {
    val bytes = ImageKernels.encodeImage(3L, 9, 4, "jpg")
    val thumb = ImageKernels.thumbnail(bytes, 2)
    val row = ImageKernels.imageMeta(thumb)
    assert(row.getInt(0) === 4) // 9/2 floor
    assert(row.getInt(1) === 2)
    assert(row.getUTF8String(2).toString === "png")
    // factor larger than the image clamps to 1x1, never 0
    val tiny = ImageKernels.imageMeta(ImageKernels.thumbnail(bytes, 100))
    assert(tiny.getInt(0) === 1 && tiny.getInt(1) === 1)
    assert(ImageKernels.thumbnail("nope".getBytes("UTF-8"), 2) == null)
    assert(ImageKernels.thumbnail(null, 2) == null)
  }

  test("Column path: imageMeta/imageThumbnail handle real, corrupt and null payloads") {
    val df = Seq(
      (1L, ImageKernels.encodeImage(1L, 16, 10, "png")),
      (2L, ImageKernels.encodeImage(2L, 33, 21, "jpg")),
      (3L, "corrupt".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "content")
    val out = df
      .select(
        col("id"),
        Multimodal.imageMeta(col("content")).as("m"),
        Multimodal.imageMeta(Multimodal.imageThumbnail(col("content"), 2)).as("t"))
      .select(
        col("id"), col("m.width"), col("m.height"), col("m.format"),
        col("t.width").as("tw"), col("t.height").as("th"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(out(1L) === ((Some(16), Some(10), Some("png"), Some(8), Some(5))))
    assert(out(2L) === ((Some(33), Some(21), Some("jpeg"), Some(16), Some(10))))
    assert(out(3L) === ((None, None, None, None, None)))
    assert(out(4L) === ((None, None, None, None, None)))
  }

  test("imageMeta expression runs inside whole-stage codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would evaluate
    // a projection over a LocalRelation eagerly in the optimizer and leave
    // no codegen span to assert on
    val df = spark.range(4)
      .select(
        Multimodal.imageMeta(
          Multimodal.encodeImageUdf(col("id"), lit(8), lit(8), lit("png"))).as("m"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.nonEmpty, s"no codegen span in:\n${df.queryExecution.executedPlan}")
    // and the expression actually evaluates through that generated code
    assert(df.count() === 4)
  }
}
