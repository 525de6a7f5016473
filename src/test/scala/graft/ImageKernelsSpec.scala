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

  // ------------------------------------------------------ adversarial bytes
  // Property cases for hostile payloads (r11 verdict item 8): every byte
  // stream is DATA — null-not-throw — and the header-only/bounded-decode
  // cost contracts hold even when the header lies.

  test("adversarial: truncation at every 7th prefix length never throws") {
    for (fmt <- Seq("png", "jpg")) {
      val full = ImageKernels.encodeImage(seed = 42L, width = 19, height = 7, format = fmt)
      for (len <- 0 until full.length by 7) {
        val cut = full.take(len)
        // may be null or (for long-enough prefixes) a valid header read —
        // either is fine; throwing is the only failure
        ImageKernels.imageMeta(cut)
        ImageKernels.thumbnail(cut, 2)
      }
      // and flipped tail bytes (valid header, corrupt body)
      val flipped = full.clone()
      for (i <- full.length / 2 until full.length) flipped(i) = (~flipped(i)).toByte
      ImageKernels.imageMeta(flipped)
      ImageKernels.thumbnail(flipped, 2)
    }
  }

  test("adversarial: JPEG with an EXIF APP1 segment still reads header dims") {
    val plain = ImageKernels.encodeImage(seed = 5L, width = 31, height = 13, format = "jpg")
    assert((plain(0) & 0xff) === 0xff && (plain(1) & 0xff) === 0xd8, "not a JPEG SOI")
    // splice a minimal EXIF APP1 (marker FFE1, length, "Exif\0\0", TIFF
    // header "MM" + 42 + IFD offset 8, zero-entry IFD0, no next IFD) right
    // after SOI — the shape every camera writes
    val tiff = Array[Byte](
      'M', 'M', 0, 42, 0, 0, 0, 8, // big-endian TIFF header, IFD0 at offset 8
      0, 0, // zero directory entries
      0, 0, 0, 0) // no next IFD
    val exifBody = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val segLen = exifBody.length + 2
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++ exifBody
    val withExif = plain.take(2) ++ app1 ++ plain.drop(2)
    val row = ImageKernels.imageMeta(withExif)
    assert(row != null, "EXIF APP1 made the header unreadable")
    assert(row.getInt(0) === 31 && row.getInt(1) === 13)
    assert(row.getUTF8String(2).toString === "jpeg")
    val thumb = ImageKernels.imageMeta(ImageKernels.thumbnail(withExif, 2))
    assert(thumb.getInt(0) === 15 && thumb.getInt(1) === 6)
  }

  test("adversarial: 1x1 image round-trips and thumbnails clamp at 1x1") {
    for (fmt <- Seq("png", "jpg")) {
      val one = ImageKernels.encodeImage(seed = 9L, width = 1, height = 1, format = fmt)
      val row = ImageKernels.imageMeta(one)
      assert(row.getInt(0) === 1 && row.getInt(1) === 1, fmt)
      val t = ImageKernels.imageMeta(ImageKernels.thumbnail(one, 4))
      assert(t.getInt(0) === 1 && t.getInt(1) === 1, fmt)
    }
  }

  test("adversarial: huge-dims PNG header over a tiny payload — meta reports, thumbnail refuses") {
    // A real 4x4 PNG whose IHDR is patched to CLAIM 100000x100000 (10^10
    // pixels -> a ~40 GB decode buffer) with the IHDR CRC recomputed so
    // the reader trusts it. imageMeta is header-only: it must report the
    // claimed dims cheaply (this is how a pipeline FINDS such rows).
    // thumbnail must refuse via MaxDecodePixels BEFORE the decoder
    // allocates — an OutOfMemoryError here would kill the executor.
    val png = ImageKernels.encodeImage(seed = 11L, width = 4, height = 4, format = "png")
    val patched = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      patched(off) = ((v >> 24) & 0xff).toByte
      patched(off + 1) = ((v >> 16) & 0xff).toByte
      patched(off + 2) = ((v >> 8) & 0xff).toByte
      patched(off + 3) = (v & 0xff).toByte
    }
    putInt(16, 100000) // IHDR width  (8-byte sig + 4 len + 4 "IHDR")
    putInt(20, 100000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(patched, 12, 4 + 13) // "IHDR" + the 13 data bytes
    putInt(12 + 4 + 13, crc.getValue.toInt)
    val t0 = System.nanoTime()
    val row = ImageKernels.imageMeta(patched)
    assert(row != null, "header-only read rejected a CRC-valid IHDR")
    assert(row.getInt(0) === 100000 && row.getInt(1) === 100000)
    assert(ImageKernels.thumbnail(patched, 2) == null,
      "thumbnail decoded past the MaxDecodePixels screen")
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"header-only contract broken: huge-dims row took ${ms}ms")
  }
}
