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

  test("luminance histogram bins exactly and covers every pixel") {
    import TestSpark.spark.implicits._
    def grayPng(levels: Seq[Int], w: Int): Array[Byte] = {
      val h = levels.size / w
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      levels.zipWithIndex.foreach { case (g, k) =>
        img.setRGB(k % w, k / w, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 4x2 image: grays 0,15 (bin 0), 16 (bin 1), 128 (bin 8), 255 x4 (bin 15)
    val px = Seq(0, 15, 16, 128, 255, 255, 255, 255)
    val df = Seq((7L, grayPng(px, 4))).toDF("doc_id", "img")
    val got = Multimodal.imageLumaHistogram(df).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 2L), (1, 1L), (8, 1L), (15, 4L)))
    assert(got.map(_._2).sum == px.size, "every pixel must land in a bin")
    // corrupt bytes produce no rows, not a crash
    val bad = Seq((8L, Array[Byte](1, 2, 3))).toDF("doc_id", "img")
    assert(Multimodal.imageLumaHistogram(bad).collect().isEmpty)
  }

  test("dHash is brightness-invariant and flips under gradient reversal") {
    import TestSpark.spark.implicits._
    def png(f: (Int, Int) => Int, w: Int = 18, h: Int = 10): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grayPx(g: Int) = (g << 16) | (g << 8) | g
    val rising = png((x, _) => grayPx(x * 10))
    val brighter = png((x, _) => grayPx(x * 10 + 40)) // uniform offset
    val falling = png((x, _) => grayPx(170 - x * 10))
    val df = Seq((1L, rising), (2L, brighter), (3L, falling)).toDF("doc_id", "img")
    val got = Multimodal.imageDHash(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // a strictly rising gradient sets every comparison bit
    assert(got(1L) == ((0xffffffffL, 0xffffffffL)), s"rising: ${got(1L)}")
    // the perceptual property: global brightness shifts don't move the hash
    assert(got(2L) == got(1L), "uniform brightness offset must not change dHash")
    // reversing the gradient clears every bit
    assert(got(3L) == ((0L, 0L)), s"falling: ${got(3L)}")
    // the grouping pass clusters 1 and 2, canonical = smaller id
    val groups = Multimodal.imageDedupGroups(df).collect()
    assert(groups.length == 1 && groups.head.getLong(2) == 2L &&
      groups.head.getLong(3) == 1L)
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

  test("WAV chunk parse recovers rate/channels/duration/peak from real RIFF bytes") {
    // 12 frames stereo at 8kHz, peak sample -3000 (abs wins over +2999)
    val data = new Array[Byte](12 * 2 * 2)
    def put16(i: Int, v: Int): Unit = { data(2 * i) = (v & 0xff).toByte; data(2 * i + 1) = ((v >> 8) & 0xff).toByte }
    put16(0, -3000); put16(1, 2999)
    val wav = graft.fixtures.TestFixtures.wavBytes(8000, 2, data)
    assert(Multimodal.decodeWavHeader(wav) == ((8000, 2, 12L * 1000L / 8000L, 3000)))
  }

  test("WAV parse degrades to zeros on garbage, no throw") {
    assert(Multimodal.decodeWavHeader(Array.empty[Byte]) == ((0, 0, 0L, 0)))
    assert(Multimodal.decodeWavHeader("RIFFxxxxWAVE".getBytes) == ((0, 0, 0L, 0)))
    // corrupt chunk sizes must neither loop forever nor throw:
    // negative size (cursor would wrap backwards) ...
    val neg = graft.fixtures.TestFixtures.wavBytes(8000, 1, new Array[Byte](8))
    neg(16) = 0xf8.toByte; neg(17) = 0xff.toByte; neg(18) = 0xff.toByte; neg(19) = 0xff.toByte
    assert(Multimodal.decodeWavHeader(neg) == ((0, 0, 0L, 0)))
    // ... and a size far past the buffer (cursor would overflow)
    val huge = graft.fixtures.TestFixtures.wavBytes(8000, 1, new Array[Byte](8))
    huge(16) = 0xff.toByte; huge(17) = 0xff.toByte; huge(18) = 0xff.toByte; huge(19) = 0x7f.toByte
    assert(Multimodal.decodeWavHeader(huge) == ((0, 0, 0L, 0)))
  }

  test("GIF block walk counts the frames the sequence writer wrote") {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until 5) {
      val img = new java.awt.image.BufferedImage(21, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 9; x <- 0 until 21) img.setRGB(x, y, (f * 13 + x * 7 + y) & 0xffffff)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    assert(Multimodal.decodeGifFrames(bos.toByteArray) == ((21, 9, 5)))
    assert(Multimodal.decodeGifFrames("GIF89a".getBytes) == ((0, 0, 0)))
  }

  test("decodeGifPixels is BIT-EXACT against ImageIO's GIF reader, per frame") {
    javax.imageio.ImageIO.setUseCache(false)
    // same construction as the media_gif fixture (palette-quantized
    // truecolor through the JDK sequence writer)
    def gifBytes(id: Long): Array[Byte] = {
      val w = 10 + (id % 8).toInt; val h = 8 + (id % 4).toInt; val nf = 2 + (id % 6).toInt
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      writer.setOutput(ios); writer.prepareWriteSequence(null)
      for (f <- 0 until nf) {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, ((id * 31 + f * 13 + x * 7 + y) & 0xffffff).toInt)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    var worstDevPerPx = 0.0
    for (id <- 0L until 40L) {
      val bytes = gifBytes(id)
      val got = Multimodal.decodeGifPixels(bytes)
      // ground truth: ImageIO's own reader, frame by frame
      val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = reader.getNumImages(true)
      assert(got.length == n, s"id=$id frames ${got.length} != $n")
      for (f <- 0 until n) {
        val img = reader.read(f)
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        }
        val (gf, gw, gh, gr, gg, gb) = got(f)
        assert((gf, gw, gh) == ((f, img.getWidth, img.getHeight)), s"id=$id f=$f geom")
        assert((gr, gg, gb) == ((sr, sg, sb)), s"id=$id f=$f sums ($gr,$gg,$gb) != ($sr,$sg,$sb)")
        // palette-quantization deviation from the ANALYTIC pixels
        // (bounds the m8 fidelity threshold)
        val w = 10 + (id % 8).toInt; val h = 8 + (id % 4).toInt
        var ar = 0L; var ag = 0L; var ab = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = ((id * 31 + f * 13 + x * 7 + y) & 0xffffff).toInt
          ar += (rgb >> 16) & 0xff; ag += (rgb >> 8) & 0xff; ab += rgb & 0xff
        }
        val px = (w * h).toDouble
        worstDevPerPx = math.max(worstDevPerPx, math.max(math.abs(gr - ar) / px,
          math.max(math.abs(gg - ag) / px, math.abs(gb - ab) / px)))
      }
      reader.dispose()
    }
    info(f"worst palette-quantization deviation: $worstDevPerPx%.2f per pixel per channel")
    // fixture frames carry < 256 distinct colors, so the JDK writer's
    // palette is LOSSLESS — m8 asserts exact equality on this basis
    assert(worstDevPerPx == 0.0,
      f"palette no longer lossless ($worstDevPerPx%.2f/px) — m8's exact-equality oracle breaks")
    // corrupt bytes degrade to Nil, never throw
    assert(Multimodal.decodeGifPixels("GIF89a garbage".getBytes) == Nil)
    val trunc = gifBytes(3L).take(40)
    assert(Multimodal.decodeGifPixels(trunc) == Nil)
    // dimension bomb: a 30-byte file claiming a 65535x65535 frame must
    // degrade BEFORE allocating the multi-GB output buffer
    val bomb = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      2, 0, 2, 0, 0x80.toByte, 0, 0,            // LSD: 2x2, GCT of 2 entries
      1, 2, 3, 4, 5, 6,                          // the 2-entry palette
      0x2c, 0, 0, 0, 0,                          // image descriptor at (0,0)
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, // 65535 x 65535
      0, 2, 0, 0x3b)                             // no LCT, minCode, empty data
    assert(Multimodal.decodeGifPixels(bomb) == Nil)
  }

  test("AVI: header walk recovers stream params; movi payloads decode; corrupt degrades") {
    // one real MJPEG AVI through the same builder the fixture uses
    javax.imageio.ImageIO.setUseCache(false)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("jpg").next()
    val (w, h, nFrames, usp) = (20, 12, 4, 40000)
    val frames = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (f * 13 + x * 7 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
      ios.close()
      bos.toByteArray
    }
    val avi = graft.fixtures.TestFixtures.buildAvi(w, h, usp, frames)

    // meta: dims/frame-count/period from avih, codec from strh
    assert(Multimodal.parseAviHeader(avi) == ((w, h, nFrames, usp, "MJPG")))

    // payload walk returns the EXACT encoded frame bytes in order
    val payloads = Multimodal.aviFramePayloads(avi)
    assert(payloads.map(_.toSeq) == frames.map(_.toSeq))

    // each extracted payload decodes bit-exact vs ImageIO through the
    // baseline decoder m11 uses
    payloads.zipWithIndex.foreach { case (jpeg, f) =>
      val (dw, dh, px) = graft.operators.Jpeg.decodePixels(jpeg)
      assert((dw, dh) == ((w, h)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      var i = 0; var same = true
      for (y <- 0 until h; x <- 0 until w) {
        if ((img.getRGB(x, y) & 0xffffff) != (px(i) & 0xffffff)) same = false
        i += 1
      }
      assert(same, s"frame $f pixels diverge from ImageIO")
    }

    // corrupt: truncated container and non-RIFF bytes degrade, never throw
    assert(Multimodal.aviFramePayloads("not an avi".getBytes) == Nil)
    assert(Multimodal.aviFramePayloads(avi.take(40)) == Nil)
    assert(Multimodal.parseAviHeader("junk".getBytes) == ((0, 0, 0, 0, "")))
    assert(Multimodal.parseAviHeader(avi.take(60)) == ((0, 0, 0, 0, "")))
  }

  test("jpegSofClass separates baseline from progressive; decoder coverage matches") {
    javax.imageio.ImageIO.setUseCache(false)
    def jpeg(progressive: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) img.setRGB(x, y, (x * 7 + y) & 0xffffff)
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("jpg").next()
      val param = writer.getDefaultWriteParam
      if (progressive) param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val base = jpeg(progressive = false)
    val prog = jpeg(progressive = true)
    assert(Multimodal.jpegSofClass(base) == "baseline")
    assert(Multimodal.jpegSofClass(prog) == "progressive")
    assert(Multimodal.jpegSofClass("not a jpeg".getBytes) == "not_jpeg")
    // both classes fully decode; the progressive path must be
    // pixel-exact vs ImageIO, same as baseline — the entropy stages
    // are lossless, so the same quantized coefficients reconstruct
    // bit-identically through the shared IDCT/upsample/convert tail
    for (bytes <- Seq(base, prog)) {
      val (dw, dh, px) = graft.operators.Jpeg.decodePixels(bytes)
      assert((dw, dh) == ((24, 16)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      var i = 0
      for (y <- 0 until 16; x <- 0 until 24) {
        assert((img.getRGB(x, y) & 0xffffff) == (px(i) & 0xffffff),
          s"(${x},${y}) diverges from ImageIO (progressive=${bytes eq prog})")
        i += 1
      }
    }
    // truncated progressive stream degrades, never throws
    assert(graft.operators.Jpeg.decodePixels(prog.take(prog.length / 2))._1 == 0)
  }

  test("GCE transparent index excluded from frame sums; scope ends with its frame") {
    // Hand-authored GIF89a, 4x1 frame, 2-entry GCT, pixel indices
    // [0,1,0,1]. LZW at minCode=2 with a CLEAR before every pixel
    // code, so every code is 3 bits wide: [4,0,4,1,4,0,4,1,5] packed
    // LSB-first = 0x04 0x43 0x30 0x05.
    val lzw = Array[Byte](4, 0x04, 0x43, 0x30, 0x05, 0) // sub-block + terminator
    def gif(frames: Array[Byte]*): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte]('G', 'I', 'F', '8', '9', 'a',
        4, 0, 1, 0, 0x80.toByte, 0, 0,           // LSD 4x1, GCT 2 entries
        10, 20, 30,                              // color 0
        200.toByte, 100, 50))                    // color 1
      frames.foreach(bos.write)
      bos.write(0x3b); bos.toByteArray
    }
    val desc = Array[Byte](0x2c, 0, 0, 0, 0, 4, 0, 1, 0, 0, 2) ++ lzw
    val gceT = Array[Byte](0x21, 0xf9.toByte, 4, 0x01, 0, 0, 1, 0) // transparent idx 1
    // transparency on: the two index-1 pixels contribute nothing
    assert(Multimodal.decodeGifPixels(gif(gceT ++ desc)) ==
      Seq((0, 4, 1, 20L, 40L, 60L)))
    // no GCE: all four pixels counted
    assert(Multimodal.decodeGifPixels(gif(desc)) ==
      Seq((0, 4, 1, 420L, 240L, 160L)))
    // GCE with the transparency FLAG off: index byte must be ignored
    val gceOff = Array[Byte](0x21, 0xf9.toByte, 4, 0x00, 0, 0, 1, 0)
    assert(Multimodal.decodeGifPixels(gif(gceOff ++ desc)) ==
      Seq((0, 4, 1, 420L, 240L, 160L)))
    // scope: a GCE governs only the NEXT frame — frame 2 is opaque
    assert(Multimodal.decodeGifPixels(gif(gceT ++ desc, desc)) ==
      Seq((0, 4, 1, 20L, 40L, 60L), (1, 4, 1, 420L, 240L, 160L)))
    // cross-check the hand-rolled container against ImageIO's reader
    val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif(gceT ++ desc))))
    val img = reader.read(0)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (x <- 0 until 4) {
      val argb = img.getRGB(x, 0)
      if ((argb >>> 24) != 0) { // ImageIO reports the transparent px as alpha 0
        sr += (argb >> 16) & 0xff; sg += (argb >> 8) & 0xff; sb += argb & 0xff
      }
    }
    reader.dispose()
    assert((sr, sg, sb) == ((20L, 40L, 60L)))
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

  test("decodePngStats: exact channel sums on a known image; non-PNG degrades") {
    import graft.operators.Multimodal
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x010203); img.setRGB(1, 0, 0x0A0B0C)
    img.setRGB(0, 1, 0x646566); img.setRGB(1, 1, 0xFF0080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, r, g, b) = Multimodal.decodePngStats(bos.toByteArray)
    assert((w, h) == ((2, 2)))
    assert(r == 0x01L + 0x0A + 0x64 + 0xFF)
    assert(g == 0x02L + 0x0B + 0x65 + 0x00)
    assert(b == 0x03L + 0x0C + 0x66 + 0x80)
    // JPEG signature and truncated IDAT both degrade to zeros
    assert(Multimodal.decodePngStats("JFIF-not-a-png".getBytes) == ((0, 0, 0L, 0L, 0L)))
    val truncated = bos.toByteArray.take(bos.size() - 24)
    assert(Multimodal.decodePngStats(truncated) == ((0, 0, 0L, 0L, 0L)))
  }

  test("imageResize: nearest-neighbor grid over decoded pixels; corrupt -> empty") {
    import graft.operators.Multimodal
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, x * 16 + y)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (w, h, px) = Multimodal.decodePngPixels(bos.toByteArray)
    assert((w, h) == ((8, 4)))
    assert(px(0) == 0 && px(1 * 8 + 2) == 2 * 16 + 1) // (x=2,y=1)
    // 2x2 thumbnail: src = (x*8/2, y*4/2) = (0,0),(4,0),(0,2),(4,2)
    val sp = org.apache.spark.sql.graft.Shim.classic(TestSpark.spark)
    import sp.implicits._
    val df = Seq((1L, bos.toByteArray), (2L, "junk".getBytes)).toDF("doc_id", "img")
    val got = Multimodal.imageResize(df, t = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(0L, 4L * 16, 2L, 4L * 16 + 2))
    assert(got(2L).isEmpty, "undecodable image yields an empty thumb, not a crash")
  }

  test("decodeWavEnergy: exact streaming energy, windowed max, corrupt degrade") {
    import graft.operators.Multimodal
    // samples 3, -4, 5 as 16-bit LE PCM
    val data = Array[Byte](3, 0, (-4 & 0xff).toByte, (-1 & 0xff).toByte, 5, 0)
    val wav = graft.fixtures.TestFixtures.wavBytes(8000, 1, data)
    val (n, total, maxWin) = Multimodal.decodeWavEnergy(wav, window = 2)
    assert(n == 3)
    assert(total == 9L + 16L + 25L)
    // windows: [9+16]=25, tail [25]=25 -> max 25
    assert(maxWin == 25L)
    // window larger than the file: one (tail) window = the total
    assert(Multimodal.decodeWavEnergy(wav, window = 100) == ((3, 50L, 50L)))
    // corrupt bytes degrade to zeros, never throw
    assert(Multimodal.decodeWavEnergy("nope".getBytes, 50) == ((0, 0L, 0L)))
  }

  test("Jpeg.decodePixels is BIT-EXACT against ImageIO on fixture-shaped JPEGs") {
    import graft.operators.Jpeg
    javax.imageio.ImageIO.setUseCache(false)
    // the fixture generator's exact encode path (javax.imageio,
    // default quality, 4:2:0) across every (w, h) residue class
    (1L until 65L by 2).foreach { id =>
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      val (dw, dh, px) = Jpeg.decodePixels(bytes)
      assert(dw == w && dh == h, s"id=$id dims $dw x $dh != $w x $h")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == (ref.getRGB(x, y) & 0xffffff),
          s"id=$id pixel ($x,$y): got ${px(y * w + x).toHexString}, " +
            s"ImageIO ${(ref.getRGB(x, y) & 0xffffff).toHexString}")
    }
  }

  test("Jpeg.decodePixels degrades on corrupt/unsupported bytes, never throws") {
    import graft.operators.Jpeg
    assert(Jpeg.decodePixels("not a jpeg".getBytes)._1 == 0)
    assert(Jpeg.decodePixels(Array.empty[Byte])._1 == 0)
    assert(Jpeg.decodePixels(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))._1 == 0)
    // a PNG through the JPEG decoder: rejected cleanly
    val png = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Jpeg.decodePixels(png)._1 == 0)
    // truncated valid JPEG: degrades, no throw
    val jb = {
      val img = new java.awt.image.BufferedImage(24, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    assert(Jpeg.decodePixels(jb.take(jb.length / 2))._1 == 0)
  }

  test("imagePHash: DCT bits match a reference recompute; exact under nearest upscale") {
    import TestSpark.spark.implicits._
    def png(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def pix(x: Int, y: Int) = (x * 7919 + y * 104729 + x * y * 31) & 0xffffff
    val base = png(20, 12, pix)
    // 2x nearest upscale: grid sampling must land on identical pixels
    val up = png(40, 24, (x, y) => pix(x / 2, y / 2))
    val df = Seq((1L, base), (2L, up), (3L, Array[Byte](9, 9))).toDF("doc_id", "img")
    val got = graft.operators.Multimodal.imagePHash(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // reference: same integer pipeline in plain Scala over the known pixels
    val t = graft.operators.Multimodal.PhashDct
    def ref(w: Int, h: Int): (Long, Long) = {
      val g = Array.tabulate(16, 16) { (y, x) =>
        val v = pix(x * w / 16 * 20 / w, y * h / 16 * 12 / h) // analytic src of the (possibly upscaled) image
        (299L * ((v >> 16) & 255) + 587L * ((v >> 8) & 255) + 114L * (v & 255)) / 1000L
      }
      val coef = Array.tabulate(8, 8) { (u, vq) =>
        (for { y <- 0 until 16; x <- 0 until 16 } yield g(y)(x) * t(u)(x) * t(vq)(y)).sum
      }
      val ac = (for { u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0 } yield coef(u)(v)).sorted
      val med = ac(31)
      var hi = 0L; var lo = 0L
      for { u <- 0 until 8; v <- 0 until 8; p = u * 8 + v; if p > 0 } {
        if (coef(u)(v) > med) { if (p < 32) hi |= 1L << p else lo |= 1L << (p - 32) }
      }
      (hi, lo)
    }
    assert(got(1L) == ref(20, 12))
    assert(got(2L) == got(1L), "nearest 2x upscale must hash identically")
    assert(got(3L) == ((0L, 0L)), "corrupt bytes degrade to zeros")
    assert(got(1L) != ((0L, 0L)))
  }

  test("audioSilence counts silent samples and the longest run from real PCM bytes") {
    import TestSpark.spark.implicits._
    // samples: 500, 5, -5, 0, 800, 99, -99, 5 -> silent (|v|<100) at
    // 1,2,3,5,6,7: n_silent=6, max run=3 (indices 5..7)
    val samples = Array(500, 5, -5, 0, 800, 99, -99, 5)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      data(2 * i) = (v & 0xff).toByte; data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = graft.fixtures.TestFixtures.wavBytes(8000, 1, data)
    val df = Seq((1L, wav), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "wav")
    val rows = graft.operators.Multimodal.audioSilence(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(rows == Seq((1L, 8, 6, 3), (2L, 0, 0, 0)))
  }

  test("videoSceneCuts agrees with a Scala lag-delta over the decoder's own sums") {
    javax.imageio.ImageIO.setUseCache(false)
    def gifBytes(id: Long): Array[Byte] = {
      val w = 10 + (id % 8).toInt; val h = 8 + (id % 4).toInt; val nf = 2 + (id % 6).toInt
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
      writer.setOutput(ios); writer.prepareWriteSequence(null)
      for (f <- 0 until nf) {
        val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, ((id * 31 + f * 13 + x * 7 + y) & 0xffffff).toInt)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      bos.toByteArray
    }
    import TestSpark.spark.implicits._
    val ids = (0L until 12L).toSeq
    val df = ids.map(id => (id, gifBytes(id))).toDF("doc_id", "gif")
    val got = graft.operators.Multimodal.videoSceneCuts(df, threshold = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = ids.map { id =>
      val frames = graft.operators.Multimodal.decodeGifPixels(gifBytes(id))
        .map { case (_, _, _, sr, sg, sb) => (sr, sg, sb) }
      val deltas = frames.sliding(2).collect {
        case Seq((r0, g0, b0), (r1, g1, b1)) =>
          math.abs(r1 - r0) + math.abs(g1 - g0) + math.abs(b1 - b0)
      }.toSeq
      (id, frames.size.toLong, deltas.count(_ > 1800L).toLong,
        if (deltas.isEmpty) 0L else deltas.max)
    }
    assert(got == want)
    assert(want.map(_._3).sum > 0, "the fixture construction should produce some cuts")
  }
}
