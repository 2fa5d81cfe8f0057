package graft.llm

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads modeled as
 * opaque `binary` columns with typed metadata, plus batch
 * decode / feature-extract / frame-sample operators.
 *
 * The container has no media codecs, so the decode step is a STUB: a
 * deterministic fake decoder that parses a tiny structured header we
 * define (`GRFT` magic + kind + width + height). Everything around it —
 * schema, batched `mapPartitions` execution, partition sizing, metadata
 * projection — is real Spark and tested; swapping the stub for a JNI /
 * Python-worker decoder changes one function.
 *
 * Scale notes: media payloads dominate row size, so the operators here
 * never shuffle the binary column — metadata is extracted first
 * (narrow), and any grouping happens on the small extracted columns.
 */
object Multimodal {

  /** Typed record for a decoded media asset. */
  case class MediaMeta(
      media_id: Long,
      kind: String,     // "image" | "audio" | "video"
      n_bytes: Long,
      width: Int,
      height: Int,
      valid: Boolean)

  val Magic: Array[Byte] = "GRFT".getBytes("UTF-8")

  /** Build a deterministic fake media payload: 4-byte magic, 1-byte
    * kind, 2-byte width, 2-byte height, then the body. Used by tests to
    * fabricate binary columns from fixture text. */
  def encodeFake(kind: Byte, width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val header = Array[Byte](
      Magic(0), Magic(1), Magic(2), Magic(3),
      kind,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte)
    header ++ body
  }

  /**
   * STUB decoder (the one piece a real deployment replaces): parse the
   * fake header. A real build would call the image/audio codec here.
   */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val valid = bytes != null && bytes.length >= 9 &&
      bytes.take(4).sameElements(Magic)
    if (!valid) MediaMeta(id, "unknown", if (bytes == null) 0L else bytes.length.toLong, 0, 0, valid = false)
    else {
      val kind = bytes(4) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"; case _ => "unknown"
      }
      val w = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
      val h = ((bytes(7) & 0xff) << 8) | (bytes(8) & 0xff)
      MediaMeta(id, kind, bytes.length.toLong, w, h, valid = true)
    }
  }

  /**
   * Batched decode over a binary-column DataFrame(media_id: Long,
   * payload: Binary): `mapPartitions` so a real decoder could amortize
   * per-batch setup (codec init, model load) exactly like
   * `mapInPandas` batches would.
   */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }

  /**
   * Resize STUB: rewrite the header to the target dimensions and
   * deterministically subsample the body proportionally to the area
   * ratio — a real build swaps the body transform for the codec's
   * scaler; the batched executor-side shape is identical.
   */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val meta = decodeStub(id, bytes)
          if (!meta.valid) (id, bytes, false)
          else {
            val body = bytes.drop(9)
            val ratio = if (meta.width * meta.height == 0) 1.0
              else math.min(1.0, (w.toDouble * h) / (meta.width.toDouble * meta.height))
            val keep = math.max(1, (body.length * ratio).toInt)
            val stride = math.max(1, body.length / keep)
            val scaled = body.indices.collect { case i if i % stride == 0 => body(i) }
            val kindByte = bytes(4)
            (id, encodeFake(kindByte, w, h, scaled.toArray), true)
          }
        }
      }
      .toDF("media_id", "payload", "resized")
  }

  /**
   * REAL format metadata, no codec needed: parse a PNG's IHDR chunk —
   * width, height, bit depth, color type — straight out of the binary
   * column with built-in byte arithmetic. The PNG container puts IHDR
   * at a FIXED offset (8-byte signature, 4-byte length, "IHDR", then
   * big-endian fields), so extraction is `substring` on the binary +
   * `hex` + base-16 `conv` — fully codegen'd Catalyst built-ins, no
   * UDF, no library, and only the first 26 bytes of each payload are
   * touched. This is the metadata-first discipline at 100 TB: filter
   * and group on parsed dimensions BEFORE any decode ships the full
   * payload anywhere. (JPEG needs a marker walk — variable offsets —
   * so its header parse belongs in the batched decoder, not here.)
   */
  def pngMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val isPng = hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A")
    def be(pos: Int, len: Int) =
      conv(hex(substring(payload, pos, len)), 16, 10).cast("long")
    struct(
      isPng.as("is_png"),
      when(isPng, be(17, 4)).as("width"),
      when(isPng, be(21, 4)).as("height"),
      when(isPng, be(25, 1)).as("bit_depth"),
      when(isPng, be(26, 1)).as("color_type"))
  }

  /**
   * WAV (RIFF) header metadata — the audio twin of [[pngMeta]]: format
   * tag, channel count, sample rate and bit depth parsed from the
   * canonical 44-byte RIFF/fmt header with the same `substring` +
   * `hex` + `conv` built-ins. RIFF fields are LITTLE-endian, so each
   * integer is assembled by concatenating its bytes' hex in reverse
   * order before the base-16 conv — still pure codegen'd expressions,
   * zero UDFs, ≤ 36 bytes touched per payload. Metadata-first at
   * 100 TB: group/filter on (sample_rate, channels) before any PCM
   * decode ships full payloads.
   */
  def wavMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def ascii(pos: Int, len: Int, expect: String) =
      substring(payload, pos, len).cast("string") === lit(expect)
    val isWav = ascii(1, 4, "RIFF") && ascii(9, 4, "WAVE") && ascii(13, 4, "fmt ")
    // little-endian: hex bytes concatenated high-address-first
    def le(pos: Int, len: Int) =
      conv(concat((pos + len - 1 to pos by -1)
        .map(p => hex(substring(payload, p, 1))): _*), 16, 10).cast("long")
    struct(
      isWav.as("is_wav"),
      when(isWav, le(21, 2)).as("audio_format"),
      when(isWav, le(23, 2)).as("channels"),
      when(isWav, le(25, 4)).as("sample_rate"),
      when(isWav, le(35, 2)).as("bits_per_sample"))
  }

  /** Frame-sampling stub: pick every `stride`-th byte offset as a fake
    * "frame" index — demonstrates the explode-to-frames shape
    * (one row per sampled frame) without a codec. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(col("n_bytes") - 1, lit(0L)), lit(stride.toLong))))
      .select(col("media_id"), col("frame_idx"), col("n_bytes"))

  /**
   * Feature extraction STUB: a deterministic 64-dim feature vector from
   * the payload — a normalized byte-pair histogram standing in for a
   * vision/audio encoder. The Spark plumbing (batched mapPartitions,
   * float-array schema, downstream ANN compatibility) is exactly what a
   * real encoder needs; only the math inside the loop is fake.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model load" would happen here, amortized
        it.map { case (id, bytes) =>
          val hist = new Array[Float](64)
          if (bytes != null) {
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) % 64) += 1.0f
              i += 1
            }
            val n = math.max(1, bytes.length).toFloat
            var d = 0
            while (d < 64) { hist(d) /= n; d += 1 }
          }
          (id, hist)
        }
      }
      .toDF("media_id", "embedding")
  }

  /**
   * Media-manifest aggregation, oracle-checked END TO END through the
   * binary path: payloads are synthesized from fixture text
   * ([[encodeFake]] with deterministic kind/width/height from doc_id),
   * pushed through the real batched [[decodeMeta]] decoder and the
   * [[sampleFrames]] explode, then aggregated per kind. The oracle
   * never sees a byte — it derives the same numbers analytically
   * (n_bytes = text bytes + 9-byte header; frames =
   * (n_bytes−1) div stride + 1) — so hash equality proves the whole
   * encode → decode → frame-sample round trip byte-exact.
   *
   * Scale: the binary column never shuffles — it is decoded to narrow
   * metadata in the scan stage and every aggregation runs on that.
   */
  def mediaManifest(spark: SparkSession, dir: String, stride: Int = 16): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 3).toByte
          val w = (64 + id % 512).toInt
          val h = (64 + id % 256).toInt
          (id, encodeFake(kind, w, h, text.getBytes("UTF-8")))
        }
      }
      .toDF("media_id", "payload")
      // read twice below (decode + frame-sample): checkpoint so the
      // documents scan + encode runs once, not per branch
      .localCheckpoint()
    val meta = decodeMeta(spark, payloads).toDF()
    val frames = sampleFrames(payloads, stride)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
    meta.join(frames, "media_id")
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_w"),
        max(col("height")).as("max_h"),
        sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("kind"))
  }

  /**
   * Oracle-checkable binary-column query: documents' text re-encoded as
   * binary payloads; project byte length and a prefix — exercises the
   * binary type end-to-end (cast, octet_length, substring-on-binary).
   */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(col("text"), 1, 12).as("prefix"))
      .orderBy("doc_id")
}
