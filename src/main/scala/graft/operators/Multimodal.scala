package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata extracted executor-side.
  *
  * The Spark-side machinery is real — binary column, per-partition
  * batch iteration with a typed Encoder, stable output schema,
  * narrow (no shuffle) execution — while the actual media decode is a
  * STUB: this container has no image/audio codecs, so
  * [[decodeImageStub]] derives deterministic fake dimensions from the
  * byte stream. Swapping in a real decoder (javax.imageio / ffmpeg
  * via a native lib on the executors) changes only that one function;
  * schema, partitioning and batching stay identical.
  *
  * Scale note: mapPartitions keeps per-record overhead at
  * iterator-step cost and lets a real decoder amortize native-lib
  * init per partition (the Scala analog of `mapInPandas` batching).
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String)

  /** STUB decoder — deterministic fake metadata from the payload
    * bytes (length + first byte). A real implementation would parse
    * the image header here.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val len = bytes.length
    val first = if (len > 0) bytes(0) & 0xff else 0
    val fmt = (len % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    (64 + (len % 513), 32 + first, fmt)
  }

  /** documents(text) -> fake image bytes (utf-8 payload) -> decoded
    * metadata. The encode step stands in for "binary column read from
    * parquet"; everything downstream treats it as opaque bytes.
    */
  def imageMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val binary = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    implicit val enc = Encoders.product[MediaMeta]
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    binary.as[(Long, Array[Byte])](tupleEnc)
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, fmt) = decodeImageStub(bytes)
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

  /** Oracle: the same deterministic stub in DuckDB (texts are ASCII so
    * octet_length(encode(text)) == len and the first byte is
    * ord(text[1])).
    */
  def sqlImageMeta: String =
    """SELECT doc_id,
      |  CAST(64 + (octet_length(encode(text)) % 513) AS INTEGER) AS width,
      |  CAST(32 + ord(substr(text, 1, 1)) AS INTEGER) AS height,
      |  CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin
}
