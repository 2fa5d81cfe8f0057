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
   * payload anywhere. (JPEG's variable segment offsets get the same
   * treatment via a bounded marker walk — [[jpegMeta]].)
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

  /**
   * JPEG SOF frame-header metadata — the third real format beside
   * [[pngMeta]]/[[wavMeta]], still zero UDFs. Unlike PNG's fixed IHDR
   * offset, a JPEG's SOF segment floats behind a variable prefix of
   * APPn/DQT/DHT/COM segments, so the parse is a BOUNDED MARKER WALK
   * expressed as one `aggregate` fold over 16 steps: every
   * length-bearing segment starts `FF mk len(2,BE)` and the next
   * starts at `pos + 2 + len`, so each step either records the SOF
   * position (marker C0–C3: baseline/extended/progressive/lossless)
   * or hops one segment. The fold is a scalar struct per row —
   * row-local, codegen'd built-ins (`substring`+`hex`+`conv`), touches
   * only header bytes, and is TOTAL: a truncated or non-JPEG payload
   * stalls the walk and yields nulls, never an error. Dimensions then
   * read at fixed offsets inside the SOF segment (precision, height,
   * width big-endian, component count).
   */
  def jpegMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nBytes = octet_length(payload).cast("long")
    def u8(pos: org.apache.spark.sql.Column) =
      conv(hex(substring(payload, pos.cast("int"), lit(1))), 16, 10).cast("long")
    def be16(pos: org.apache.spark.sql.Column) =
      conv(hex(substring(payload, pos.cast("int"), lit(2))), 16, 10).cast("long")
    val isJpeg = hex(substring(payload, 1, 2)) === lit("FFD8") && nBytes >= 4L
    val init = struct(lit(3L).as("pos"), lit(0L).as("sof"))
    val walked = aggregate(sequence(lit(1), lit(16)), init, (st, _) => {
      val pos = st.getField("pos")
      val sof = st.getField("sof")
      // live: SOF not yet found, a full `FF mk len` head is in range,
      // and the byte under the cursor really is a marker prefix
      val live = sof === 0L && (pos + 3L) <= nBytes && u8(pos) === 255L
      val mk = u8(pos + 1L)
      val isSof = mk.isin(192L, 193L, 194L, 195L) // SOF0..SOF3
      struct(
        when(live && !isSof, pos + 2L + be16(pos + 2L))
          .otherwise(pos).as("pos"),
        when(live && isSof, pos).otherwise(sof).as("sof"))
    })
    val sof = walked.getField("sof")
    val ok = isJpeg && sof > 0L && (sof + 9L) <= nBytes
    struct(
      isJpeg.as("is_jpeg"),
      when(ok, u8(sof + 1L) - 192L).as("sof_type"), // 0=baseline, 2=progressive
      when(ok, u8(sof + 4L)).as("bit_depth"),
      when(ok, be16(sof + 5L)).as("height"),
      when(ok, be16(sof + 7L)).as("width"),
      when(ok, u8(sof + 9L)).as("n_components"))
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
   * JPEG header round-trip, oracle-checked END TO END through real
   * bytes: per document, synthesize an actual JPEG header — SOI, a
   * JFIF APP0, a COM segment whose LENGTH VARIES with doc_id (so the
   * marker walk's variable prefix is genuinely exercised, not a fixed
   * offset in disguise), then SOF0 or SOF2 with dimensions derived
   * from doc_id — via `unhex` of concatenated hex (pure built-ins),
   * and parse it back with [[jpegMeta]]. The oracle never sees a byte:
   * it recomputes the same dimensions analytically from doc_id, so
   * hash equality proves the synth → marker-walk → field-extract loop
   * byte-exact over the whole corpus. Row-local both ways — one narrow
   * projection at any scale.
   */
  def jpegManifest(spark: SparkSession, dir: String): DataFrame = {
    def hex4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
    val width = lit(64L) + col("doc_id") % 512L
    val height = lit(64L) + col("doc_id") % 256L
    val comLen = col("doc_id") % 7L // COM body bytes: shifts SOF's offset
    val sofMarker = when(col("doc_id") % 2L === 0L, "FFC0").otherwise("FFC2")
    val headerHex = concat(
      lit("FFD8"),                                    // SOI
      lit("FFE0" + "0010"), lit("4A464946" + "00010200000100010000"), // APP0/JFIF
      lit("FFFE"), hex4(comLen + 2L), repeat(lit("61"), comLen.cast("int")), // COM
      sofMarker, lit("0011" + "08"), hex4(height), hex4(width), // SOF head
      lit("03"), lit("012200021101031101"))           // 3 component specs
    // pinnedSort: the marker walk is one pure-map fold per payload —
    // unpinned, the presentation sort's range sampler walks every
    // header twice (r17 optimization round)
    graft.ops.GlobalOrder.pinnedSort(
      Tables.documents(spark, dir)
        .select(col("doc_id"), unhex(headerHex).as("payload"))
        .select(col("doc_id"), jpegMeta(col("payload")).as("m"))
        .select(col("doc_id"), col("m.is_jpeg"), col("m.sof_type"),
          col("m.bit_depth"), col("m.height"), col("m.width"),
          col("m.n_components")),
      col("doc_id"))
  }

  /**
   * MP4 (ISO BMFF) container metadata — the VIDEO member of the header
   * family beside [[pngMeta]]/[[wavMeta]]/[[jpegMeta]], still zero
   * UDFs. An MP4 is a sequence of length-prefixed BOXES
   * (`size(4,BE) type(4,ascii)`), so locating `moov` is a bounded box
   * walk (one `aggregate` fold, 8 hops — real files lead with
   * ftyp/free/mdat prefixes). A box whose 32-bit size field is 1
   * carries a 64-bit `largesize` at pos+8 (mandatory for the >4 GiB
   * `mdat` every real long video has) — the walk reads it and hops by
   * it; a 64-bit size that overflows BIGINT nulls through `conv` and
   * stalls the walk, still TOTAL. The movie header fields sit at fixed
   * offsets inside moov's first child `mvhd`, BOTH versions: v0 puts
   * timescale at moov+28 / 32-bit duration at moov+32 (1-based); v1
   * (64-bit creation/modification times) puts timescale at moov+36 /
   * 64-bit duration at moov+40. TOTAL on truncated or non-MP4
   * payloads — the walk stalls on an out-of-range or degenerate box
   * and every field nulls, never errors. Unsupported by design: a
   * moov box ITSELF in largesize encoding (a >4 GiB movie header does
   * not occur; media scale lives in mdat), and a trailing moov behind
   * a physically present >4 GiB mdat needs the real extent fetched —
   * the metadata-first pattern at 100 TB reads head AND tail ranges.
   * Metadata-first: a duration/timescale filter touches ≤ ~96 header
   * bytes per object, not the media.
   */
  def mp4Meta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nBytes = octet_length(payload).cast("long")
    def be32(pos: org.apache.spark.sql.Column) =
      conv(hex(substring(payload, pos.cast("int"), lit(4))), 16, 10).cast("long")
    def be64(pos: org.apache.spark.sql.Column) =
      conv(hex(substring(payload, pos.cast("int"), lit(8))), 16, 10).cast("long")
    def ascii(pos: org.apache.spark.sql.Column, len: Int) =
      substring(payload, pos.cast("int"), lit(len)).cast("string")
    val isMp4 = ascii(lit(5L), 4) === lit("ftyp") && nBytes >= 16L
    val init = struct(lit(1L).as("pos"), lit(0L).as("moov"))
    val walked = aggregate(sequence(lit(1), lit(8)), init, (st, _) => {
      val pos = st.getField("pos")
      val moov = st.getField("moov")
      val size32 = be32(pos)
      val isLarge = size32 === 1L
      val size = when(isLarge, be64(pos + 8L)).otherwise(size32)
      // largesize needs its 8 extra header bytes in range and a size
      // covering the 16-byte header; null (BIGINT-overflow) sizes
      // propagate to a stall through the `when` conditions
      val headerOk = when(isLarge, (pos + 15L) <= nBytes && size >= 16L)
        .otherwise(size32 >= 8L)
      val live = moov === 0L && (pos + 7L) <= nBytes && headerOk
      val isMoov = ascii(pos + 4L, 4) === lit("moov")
      struct(
        when(live && !isMoov, pos + size).otherwise(pos).as("pos"),
        when(live && isMoov, pos).otherwise(moov).as("moov"))
    })
    val m = walked.getField("moov")
    val verWord = be32(m + 16L) // mvhd version byte + 3 flag bytes
    val mvhdAt = m > 0L && (m + 19L) <= nBytes &&
      ascii(m + 12L, 4) === lit("mvhd")
    val hasV0 = mvhdAt && verWord < 16777216L && (m + 35L) <= nBytes
    val hasV1 = mvhdAt && verWord >= 16777216L &&
      verWord < 33554432L && (m + 47L) <= nBytes
    struct(
      isMp4.as("is_mp4"),
      when(isMp4, ascii(lit(9L), 4)).as("brand"),
      when(isMp4 && m > 0L, m).as("moov_pos"),
      when(isMp4 && hasV0, be32(m + 28L))
        .when(isMp4 && hasV1, be32(m + 36L)).as("timescale"),
      when(isMp4 && hasV0, be32(m + 32L))
        .when(isMp4 && hasV1, be64(m + 40L)).as("duration"))
  }

  /**
   * q254: MP4 header round-trip, the q234 discipline on the video
   * container — Spark synthesizes REAL ISO-BMFF bytes per document
   * (ftyp + a doc-varying `free` box that SHIFTS moov's offset — in
   * 64-bit LARGESIZE encoding for every doc_id ≡ 1 mod 3, so the
   * walk's extended-size hop is oracle-pinned — + moov/mvhd with
   * doc-derived timescale/duration, VERSION 1 layout with 64-bit
   * times/duration for every doc_id ≡ 2 mod 4) via `unhex`, then
   * parses them back with [[mp4Meta]]. The oracle never sees a byte:
   * it recomputes the fields analytically from doc_id, so hash
   * equality proves the synth → box-walk → field-extract loop
   * byte-exact across both size encodings and both mvhd versions.
   * Row-local both ways.
   */
  def mp4Manifest(spark: SparkSession, dir: String): DataFrame = {
    def a(s: String) = s.getBytes("US-ASCII").map("%02X".format(_)).mkString
    def hex8(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
    def hex16(c: org.apache.spark.sql.Column) = lpad(hex(c), 16, "0")
    val freeLen = col("doc_id") % 9L
    val timescale = lit(600L) + (col("doc_id") % 5L) * 100L
    val duration = col("doc_id") % 100000L
    val freeHex = when(col("doc_id") % 3L === 1L,
        concat(lit("00000001" + a("free")), hex16(freeLen + 16L),
          repeat(lit("00"), freeLen.cast("int"))))
      .otherwise(
        concat(hex8(freeLen + 8L), lit(a("free")),
          repeat(lit("00"), freeLen.cast("int"))))
    val moovHex = when(col("doc_id") % 4L === 2L,
        concat(lit("00000080" + a("moov") + "00000078" + a("mvhd") +
          "01000000" + // v1 + flags
          "0000000000000000" + "0000000000000000"), // 64-bit creation, modification
          hex8(timescale), hex16(duration)))
      .otherwise(
        concat(lit("00000074" + a("moov") + "0000006C" + a("mvhd") +
          "00000000" + "00000000" + "00000000"), // v0+flags, creation, modification
          hex8(timescale), hex8(duration)))
    val headerHex = concat(
      lit("00000018" + a("ftyp") + a("isom") + "00000200" + a("isom") + a("iso2")),
      freeHex, moovHex)
    // pinnedSort: the box walk (64-bit-largesize/v1-mvhd aware, the
    // r14 ledgered robustness cost) is one pure-map fold per payload —
    // unpinned, the sort sampler pays that whole walk a second time
    graft.ops.GlobalOrder.pinnedSort(
      Tables.documents(spark, dir)
        .select(col("doc_id"), unhex(headerHex).as("payload"))
        .select(col("doc_id"), mp4Meta(col("payload")).as("m"))
        .select(col("doc_id"), col("m.is_mp4"), col("m.brand"),
          col("m.moov_pos"), col("m.timescale"), col("m.duration")),
      col("doc_id"))
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
