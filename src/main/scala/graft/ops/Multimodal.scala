package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, plus a batched feature-extraction stage.
  *
  * The Spark-side shape is the real deliverable — schema, partitioning, batch
  * iteration, and the metadata expressions all run distributed and
  * codegen'd. The media DECODE itself is a deliberate deterministic stub
  * (`fakeDecodeFeatures`): this container has no image/audio codecs, so the
  * stub derives a fixed-size feature vector from the payload bytes alone.
  * Swapping in a real decoder changes only the function body — the
  * partition-level batching contract (many rows per model/codec
  * initialization, the same shape `mapInPandas` batches give PySpark) stays.
  */
object Multimodal {

  /** A decoded media batch row: payload metadata + extracted features.
    * Checksum is md5 hex (portable: any engine can recompute it from the
    * same bytes, unlike crc32 which not every SQL dialect ships). */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      magic_hex: String,
      checksum_md5: String,
      features: Array[Float])

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Synthesizes an opaque binary payload column from the documents table
    * (deterministic: UTF-8 bytes of the text prefixed with a fake container
    * header) — stands in for real image/audio bytes so the binary-column
    * plumbing is exercised end to end. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit(Array[Byte](0x47, 0x52, 0x46, 0x54)), col("text").cast("binary"))
        .as("payload"))

  /** Typed metadata over the binary column — pure expressions (length, magic
    * bytes, checksum), no decode, scan-speed at any scale. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      length(col("payload")).as("byte_len"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"),
      md5(col("payload")).as("checksum_md5"))

  /** Deterministic frame sampling over the opaque payload — the Spark-side
    * shape of video frame-sampling: `nFrames` evenly-spaced fixed-size byte
    * windows per media row, exploded to (doc_id, frame_idx, frame) rows
    * that a batched decoder consumes downstream. Pure byte slicing (no
    * codec), so any engine can recompute the frames from the same bytes —
    * the registry oracle checks per-frame length + md5. */
  def sampleFrames(media: DataFrame, nFrames: Int = 4, frameBytes: Int = 32): DataFrame = {
    val g = greatest(length(col("payload")).cast("long") - frameBytes, lit(0L))
    media
      .select(col("doc_id"), col("payload"), g.as("g"))
      .select(col("doc_id"), col("payload"), col("g"),
        posexplode(sequence(lit(0), lit(nFrames - 1))))
      .toDF("doc_id", "payload", "g", "frame_idx", "i")
      .withColumn("off",
        (floor(col("i").cast("double") * col("g") / lit(math.max(nFrames - 1, 1))) + 1)
          .cast("int"))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"substring(payload, off, $frameBytes)").as("frame"))
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"), md5(col("frame")).as("frame_md5"))
  }

  /** Deterministic stand-in for a media decoder + feature extractor: folds
    * payload bytes into `dim` accumulators. STUB — replace with a real codec;
    * everything around it (batching, schema, distribution) is real.
    *
    * Accumulation is exact (integer byte sums per dim) with ONE float
    * rounding at the end — so the output is bit-reproducible by any engine
    * (a float32 add per byte would make the result depend on accumulation
    * order, unverifiable cross-engine). */
  private[ops] def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      acc(i % dim) += (payload(i) & 0xFF).toLong
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** Batched feature extraction over partitions: each executor thread walks
    * its partition in `batchSize` groups — the once-per-batch block is where
    * a real pipeline would run a vectorized decode/model call (exactly the
    * contract of a Pandas-UDF `mapInPandas` stage). Output is a typed
    * Dataset with the feature vector and metadata columns. */
  def extractFeatures(media: DataFrame, dim: Int = 8, batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // once-per-batch: codec/model init + vectorized decode goes here
          batch.iterator.map { r =>
            val md = java.security.MessageDigest.getInstance("MD5")
            MediaFeatures(
              doc_id = r.doc_id,
              byte_len = r.payload.length,
              magic_hex = r.payload.take(4).map(b => f"$b%02X").mkString,
              checksum_md5 = md.digest(r.payload).map(b => f"$b%02x").mkString,
              features = fakeDecodeFeatures(r.payload, dim))
          }
        }
      }
  }

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** 4-byte big-endian serialization of a non-negative int-valued column —
    * PNG's integer wire format (hex → lpad → bytes, all codegen'd). */
  private def be4(c: Column): Column =
    to_binary(lpad(hex(c), 8, "0"), lit("hex"))

  /** Synthesizes a VALID PNG header per document: 8-byte PNG signature,
    * IHDR length (13), the IHDR chunk (big-endian width/height derived
    * from the text, bit depth 8, color type 6 = RGBA, default
    * compression/filter/interlace), a REAL CRC-32 over the chunk — then
    * the UTF-8 text bytes standing in for the compressed image stream.
    * Every byte is a deterministic function of the text, so an oracle can
    * derive the expected decode output independently of the byte path. */
  def withPngPayload(docs: DataFrame): DataFrame = {
    val width  = (lit(1) + pmod(length(col("text")), lit(512))).cast("int")
    val height = (lit(1) + pmod(length(col("text")), lit(256))).cast("int")
    val chunk = concat(lit("IHDR").cast("binary"), be4(width), be4(height),
      lit(Array[Byte](8, 6, 0, 0, 0)))
    docs.select(col("doc_id"),
      concat(lit(PngSignature), lit(Array[Byte](0, 0, 0, 13)), chunk,
        be4(crc32(chunk)), col("text").cast("binary")).as("payload"))
  }

  /** REAL media decode over the binary column — PNG IHDR metadata
    * extraction per the public PNG spec (ISO/IEC 15948 §5.2, §11.2.2):
    * verify the 8-byte signature and the IHDR chunk type at bytes 13-16,
    * then read big-endian width (17-20), height (21-24), bit depth (25)
    * and color type (26). Pure offset arithmetic over the hex of the first
    * 26 bytes — no codec library, whole-stage codegen, scan-speed at any
    * scale. Dimensions are NULL unless both signature and chunk type check
    * out (a non-PNG payload yields flags false, not garbage numbers). */
  def decodePngMeta(media: DataFrame): DataFrame = {
    def beInt(h: Column, byteOff: Int, nBytes: Int): Column =
      conv(substring(h, (byteOff - 1) * 2 + 1, nBytes * 2), 16, 10).cast("int")
    val isPng   = col("__h").startsWith("89504E470D0A1A0A")
    val hasIhdr = substring(col("__h"), 25, 8) === "49484452" // "IHDR"
    // the magics cover bytes 1-16; the fields live at 17-26 — a payload
    // truncated inside the IHDR body must yield NULL fields, not a conv()
    // of whatever hex chars survived
    val ok = isPng && hasIhdr && length(col("payload")) >= 26
    media
      .select(col("doc_id"), col("payload"),
        hex(substring(col("payload"), 1, 26)).as("__h"))
      .select(
        col("doc_id"),
        isPng.as("is_png"),
        hasIhdr.as("has_ihdr"),
        when(ok, beInt(col("__h"), 17, 4)).as("width"),
        when(ok, beInt(col("__h"), 21, 4)).as("height"),
        when(ok, beInt(col("__h"), 25, 1)).as("bit_depth"),
        when(ok, beInt(col("__h"), 26, 1)).as("color_type"),
        length(col("payload")).as("byte_len"))
  }

  /** Little-endian serialization of an int-valued column to `nBytes` —
    * RIFF's integer wire format: hex, left-pad to width, then reverse the
    * byte pairs (all codegen'd string ops). */
  private def leN(c: Column, nBytes: Int): Column = {
    val h = lpad(hex(c), nBytes * 2, "0")
    to_binary(concat((nBytes to 1 by -1).map(i =>
      substring(h, (i - 1) * 2 + 1, 2)): _*), lit("hex"))
  }

  /** Synthesizes a VALID 44-byte canonical PCM WAV header per document
    * (RIFF container, public format: RIFF size / WAVE / fmt-16 / PCM /
    * channels / sample rate / byte rate / block align / bits / data size),
    * followed by the UTF-8 text bytes standing in for the sample stream.
    * All parameters derive deterministically from the text so an oracle
    * can compute the expected decode independently of the byte path. */
  def withWavPayload(docs: DataFrame): DataFrame = {
    val len      = length(col("text"))
    val channels = (lit(1) + pmod(len, lit(2))).cast("int")
    val rate     = (lit(8000) + pmod(len, lit(100)) * 100).cast("int")
    val bits     = lit(16)
    val blockAlign = (channels * bits / lit(8)).cast("int")
    val byteRate   = (rate * blockAlign).cast("int")
    docs.select(col("doc_id"),
      concat(
        lit("RIFF").cast("binary"), leN(lit(36) + len, 4),
        lit("WAVE").cast("binary"),
        lit("fmt ").cast("binary"), leN(lit(16), 4), leN(lit(1), 2),
        leN(channels, 2), leN(rate, 4), leN(byteRate, 4),
        leN(blockAlign, 2), leN(bits, 2),
        lit("data").cast("binary"), leN(len, 4),
        col("text").cast("binary")).as("payload"))
  }

  /** REAL audio-container decode over the binary column — WAV/RIFF header
    * parse per the public RIFF/WAVE layout: verify the RIFF/WAVE/fmt/data
    * magics at their fixed offsets, then read the little-endian PCM
    * fields. Pure offset arithmetic over the hex of the first 44 bytes,
    * whole-stage codegen, scan-speed at any scale. `byte_rate_ok`
    * cross-checks the stored byte rate against rate×channels×bits/8 —
    * the consistency test a real ingest would gate on. Fields are NULL
    * unless every magic checks out. */
  def decodeWavMeta(media: DataFrame): DataFrame = {
    def leInt(h: Column, byteOff: Int, nBytes: Int): Column =
      conv(concat(((byteOff + nBytes - 1) to byteOff by -1).map(i =>
        substring(h, (i - 1) * 2 + 1, 2)): _*), 16, 10).cast("int")
    def magic(h: Column, byteOff: Int, ascii: String): Column =
      substring(h, (byteOff - 1) * 2 + 1, ascii.length * 2) ===
        ascii.getBytes("US-ASCII").map("%02X".format(_)).mkString
    val h = col("__h")
    // the 44-byte header must be complete: the last magic ('data') ends at
    // byte 40, so a payload truncated at 40-43 bytes would pass all four
    // magics while data_size (bytes 41-44) decoded from partial hex
    val ok = magic(h, 1, "RIFF") && magic(h, 9, "WAVE") &&
      magic(h, 13, "fmt ") && magic(h, 37, "data") &&
      length(col("payload")) >= 44
    media
      .select(col("doc_id"), col("payload"),
        hex(substring(col("payload"), 1, 44)).as("__h"))
      .select(
        col("doc_id"),
        ok.as("is_wav"),
        when(ok, leInt(h, 23, 2)).as("n_channels"),
        when(ok, leInt(h, 25, 4)).as("sample_rate"),
        when(ok, leInt(h, 35, 2)).as("bits_per_sample"),
        when(ok, leInt(h, 29, 4) ===
          leInt(h, 25, 4) * leInt(h, 23, 2) * leInt(h, 35, 2) / lit(8))
          .as("byte_rate_ok"),
        when(ok, leInt(h, 41, 4)).as("data_size"),
        length(col("payload")).as("byte_len"))
  }

  /** End-to-end multimodal pipeline on the documents table: payload
    * synthesis → batched feature extraction, summarized to verifiable
    * per-doc scalars. EVERY column is oracle-checkable from the same bytes:
    * metadata (byte_len/magic/md5) directly, and `feature_sum` because the
    * stub decoder accumulates exactly — per-dim integer byte sums scaled
    * once to float32, then summed in double. The 8 float32-valued terms sum
    * exactly in a 53-bit double significand, so the total is
    * order-independent and any engine reproduces it bit-for-bit. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(withPayload(docs)).toDF()
      .select(col("doc_id"), col("byte_len"), col("magic_hex"), col("checksum_md5"),
        aggregate(col("features"), lit(0.0), (a, x) => a + x.cast("double"))
          .as("feature_sum"))
  }
}
