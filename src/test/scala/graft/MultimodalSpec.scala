package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Header-parse correctness for the multimodal image path: real bytes
  * from javax.imageio, dimensions recovered by Multimodal's own
  * parser (no codec round-trip on the read side).
  */
class MultimodalSpec extends AnyFunSuite {

  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("PNG IHDR width/height parsed from real encoder output") {
    assert(Multimodal.decodeImageHeader(imageBytes(123, 45, "png")) == ((123, 45, "png")))
  }

  test("JPEG SOFn width/height parsed from real encoder output") {
    assert(Multimodal.decodeImageHeader(imageBytes(640, 480, "jpg")) == ((640, 480, "jpeg")))
  }

  test("GIF logical screen descriptor parsed from real encoder output") {
    assert(Multimodal.decodeImageHeader(imageBytes(77, 33, "gif")) == ((77, 33, "gif")))
  }

  test("unknown and truncated payloads degrade to (0,0,unknown), no throw") {
    assert(Multimodal.decodeImageHeader(Array.empty[Byte]) == ((0, 0, "unknown")))
    assert(Multimodal.decodeImageHeader("not an image".getBytes) == ((0, 0, "unknown")))
    // valid JPEG SOI then truncation mid-segment
    val jpeg = imageBytes(32, 32, "jpg")
    assert(Multimodal.decodeImageHeader(jpeg.take(6)) == ((0, 0, "unknown")))
    // PNG signature but truncated before IHDR payload
    val png = imageBytes(32, 32, "png")
    assert(Multimodal.decodeImageHeader(png.take(16)) == ((0, 0, "unknown")))
  }

  test("imageMeta recovers generation-time dimensions from media fixture bytes") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val media = spark.read.parquet(
      graft.fixtures.TestFixtures.mediaImages(spark, TestSpark.sfDir))
    val meta = Multimodal.imageMeta(media)
    val bad = meta.filter(
      col("width") =!= (lit(16) + col("doc_id") % 32).cast("int") ||
      col("height") =!= (lit(8) + col("doc_id") % 16).cast("int") ||
      col("format") =!= when(col("doc_id") % 2 === 0, "png").otherwise("jpeg"))
    assert(bad.count() == 0)
    assert(meta.count() == media.count())
  }
}
