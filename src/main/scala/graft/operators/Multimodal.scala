package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted executor-side.
  *
  * The Spark-side machinery — binary column, per-partition batch
  * iteration with a typed Encoder, stable output schema, narrow (no
  * shuffle) execution — is shared by all three media kinds. Image
  * metadata ([[imageMeta]]) does a REAL header parse (PNG IHDR / JPEG
  * SOFn / GIF logical screen — dimensions sit at fixed offsets or in
  * marker segments, no codec library needed). Frame sampling and
  * audio metadata still stub the decode (the container ships no
  * video/audio codecs); swapping in a real decoder changes only the
  * per-record function — schema, partitioning and batching stay
  * identical.
  *
  * Scale note: mapPartitions keeps per-record overhead at
  * iterator-step cost and lets a real decoder amortize native-lib
  * init per partition (the Scala analog of `mapInPandas` batching).
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String)

  /** Parse width/height/format from real image bytes.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandatory-first,
    *    so width/height are the big-endian ints at offsets 16/20.
    *  - JPEG: walk the marker segments from SOI to the first frame
    *    header SOFn (0xC0-0xCF minus DHT/JPG/DAC); its payload is
    *    [len][precision][height][width].
    *  - GIF: 6-byte version tag, then little-endian logical screen
    *    width/height.
    *
    * Truncated or unrecognized bytes -> (0, 0, "unknown") rather than
    * an exception: at 100 TB a corrupt record must degrade to a
    * filterable row, not kill the stage.
    */
  def decodeImageHeader(bytes: Array[Byte]): (Int, Int, String) = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (bytes.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      (be32(16), be32(20), "png")
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: (Int, Int, String) = (0, 0, "unknown")
      var done = false
      while (!done && i + 3 < bytes.length) {
        if (u8(i) != 0xff) i += 1 // stray/entropy byte between segments
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte before a marker
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone markers
          else {
            val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (isSof && i + 9 <= bytes.length) {
              res = (be16(i + 7), be16(i + 5), "jpeg")
              done = true
            } else i += 2 + be16(i + 2)
          }
        }
      }
      res
    } else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      (le16(6), le16(8), "gif")
    else (0, 0, "unknown")
  }

  /** media(doc_id, img: binary) -> parsed image metadata via
    * [[decodeImageHeader]] — a real decode of real bytes, executed
    * per-partition with no shuffle.
    */
  def imageMeta(media: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[MediaMeta]
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select(col("doc_id"), col("img"))
      .as[(Long, Array[Byte])](tupleEnc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, fmt) = decodeImageHeader(bytes)
          MediaMeta(id, w, h, fmt)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  final case class FrameMeta(doc_id: Long, n_frames: Int, n_sampled: Int, head_hash: Long)

  /** "Video" frame sampling over an opaque binary payload: fixed-size
    * frames, every `stride`-th frame sampled, plus a fingerprint of
    * the head frame. The frame math and byte-level hash are real; a
    * production decoder would replace the byte-split with container
    * parsing (same mapPartitions shape).
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    val binary = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    implicit val enc = Encoders.product[FrameMeta]
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    binary.as[(Long, Array[Byte])](tupleEnc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nFrames = bytes.length / frameBytes
          val nSampled = (nFrames + stride - 1) / stride
          var h = 0L
          val headLen = math.min(frameBytes, bytes.length)
          var i = 0
          while (i < headLen) { h = (h * 31 + (bytes(i) & 0xff)) % graft.functions.CrossHash.P; i += 1 }
          FrameMeta(id, nFrames, nSampled, h)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  final case class AudioMeta(doc_id: Long, duration_ms: Long, channels: Int, peak: Int)

  /** "Audio" metadata stub over an opaque binary payload: treats the
    * bytes as 16 kHz 16-bit PCM (2 bytes/sample), derives duration,
    * a fake channel count, and the peak byte value. Integer-exact
    * math only, so the oracle matches without rounding concerns.
    */
  def audioMeta(docs: DataFrame): DataFrame = {
    val binary = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    implicit val enc = Encoders.product[AudioMeta]
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    binary.as[(Long, Array[Byte])](tupleEnc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val samples = bytes.length / 2
          val durationMs = samples.toLong * 1000L / 16000L
          val channels = 1 + (bytes.length % 2)
          val peak = if (bytes.isEmpty) 0 else bytes.map(_ & 0xff).max
          AudioMeta(id, durationMs, channels, peak)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle for [[audioMeta]] (ASCII payloads: peak byte = max char
    * code).
    */
  def sqlAudioMeta: String =
    """SELECT doc_id,
      |  CAST((octet_length(encode(text)) // 2) * 1000 // 16000 AS BIGINT) AS duration_ms,
      |  CAST(1 + (octet_length(encode(text)) % 2) AS INTEGER) AS channels,
      |  CAST(coalesce(list_max(list_transform(string_split(text, ''), c -> ord(c))), 0) AS INTEGER) AS peak
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Oracle for [[frameSample]] (ASCII payloads: bytes == chars). */
  def sqlFrameSample: String = {
    val fold = graft.functions.CrossHash.sqlCharFold("substr(text, 1, 16)")
    s"""SELECT doc_id,
       |  CAST(octet_length(encode(text)) // 16 AS INT) AS n_frames,
       |  CAST((octet_length(encode(text)) // 16 + 3) // 4 AS INT) AS n_sampled,
       |  $fold AS head_hash
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Oracle for [[imageMeta]] over the media fixture
    * (TestFixtures.mediaImages): image dimensions were DERIVED from
    * doc_id at generation time (w = 16+id%32, h = 8+id%16, png for
    * even ids / jpeg for odd), so the oracle recomputes them from
    * doc_id alone — the Spark side must recover the same numbers by
    * actually parsing the PNG/JPEG bytes.
    */
  def sqlImageMeta: String =
    """SELECT doc_id,
      |  CAST(16 + doc_id % 32 AS INTEGER) AS width,
      |  CAST(8 + doc_id % 16 AS INTEGER) AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin
}
