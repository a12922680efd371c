package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column pattern: opaque `binary` payloads plus a typed metadata
  * struct, with decode / feature-extraction as distributed per-partition
  * transforms.
  *
  * The decode and resize kernels are REAL as of round 3: `javax.imageio`
  * ships with the JDK (PNG/BMP/GIF/JPEG readers, headless-safe), so no
  * external codec is needed. Payloads that are not decodable images yield a
  * null `decoded` struct — honest semantics for mixed binary columns. Only
  * feature extraction remains a clearly-marked STUB: it stands in for a
  * model forward pass, which is genuinely external to the engine.
  */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType),
    StructField("fingerprint", StringType),
    StructField("mime", StringType)))

  /** Attach a binary payload column + metadata struct. In production the
    * payload comes from `spark.read.format("binaryFile")` or an upstream
    * extract; here it is derived from a string column so the pattern is
    * testable on the driver tables.
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, mime: String = "application/octet-stream"): DataFrame =
    df.withColumn("payload", col(srcCol).cast("binary"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"),
        lit(mime).as("mime")))

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  // ImageIO defaults to a temp-FILE cache per stream — 32 executor threads
  // each creating/deleting a disk cache file per image serializes on the
  // filesystem. In-memory streams for KB-scale payloads are strictly better.
  private lazy val imageIoMemoryCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL decode kernel: `ImageIO.read` over the payload bytes (JDK-native
    * PNG/BMP/GIF/JPEG readers). Non-image payloads decode to null — the
    * fixed-schema contract (bytes in, struct-or-null out) is what a JNI
    * codec for other formats would also satisfy.
    */
  def decodeImage(bytes: Array[Byte]): Row = {
    imageIoMemoryCache
    // null/empty payloads short-circuit, and NonFatal (not just
    // IOException) maps to null: ImageIO readers throw RuntimeExceptions
    // (IllegalArgument/IndexOutOfBounds/NegativeArraySize) on
    // malformed-but-recognized payloads — in a mixed 100 TB binary column
    // one bad row must yield null, not kill the job
    if (bytes == null || bytes.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) null
    else Row(img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  /** Deterministic PNG encoder: a real `width(id) × height(id)` image with
    * id-seeded pixels, encoded by the JDK PNG writer. Gives the decode path
    * genuine image bytes on tables that carry none; the dimension formulas
    * are trivially oracle-expressible (w = 8 + id % 16,
    * h = 8 + (id / 16) % 16).
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    imageIoMemoryCache
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 31 + y.toLong * width + x) & 0xFFFFFFL).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Attach a generated PNG payload derived from a long id column
    * (mapPartitions — encoding runs distributed, like any ingest decode).
    */
  def withGeneratedPngPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    // codec work is per-row CPU; a small parquet input arrives as one task
    OpUtils.spread(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = encodePng((8 + id % 16).toInt, (8 + (id / 16) % 16).toInt, id)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"),
        lit("image/png").as("mime")))
  }

  /** Distributed decode: mapPartitions over the payload column, emitting the
    * original row plus the decoded struct. Per-partition (not per-row driver
    * logic), so it parallelizes like any scan.
    */
  def decodeImages(spark: SparkSession, df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("decoded", decodedSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeImage(bytes))
      }
    }(enc)
  }

  /** REAL image resize (JDK Graphics2D, headless-safe): decode → scale →
    * re-encode PNG. Non-image payloads pass through unchanged. Distributed
    * via mapPartitions like decodeImages.
    */
  def resizeImages(df: DataFrame, scale: Double): DataFrame = {
    require(scale > 0, "resizeImages: scale must be positive")
    val enc = RowEncoder.encoderFor(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        imageIoMemoryCache
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // same hardening as decodeImage: null/empty passes through, any
        // non-fatal decoder throw (ImageIO RuntimeExceptions included)
        // means "not an image" rather than a dead job
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) r
        else {
          val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
            math.max(1, (img.getHeight * scale).toInt))
          val out = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          Row.fromSeq(r.toSeq.updated(payloadIdx, baos.toByteArray))
        }
      }
    }(enc)
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"),
        col("meta.mime").as("mime")))
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("duration_ms", LongType)))

  /** Deterministic WAV encoder: a REAL RIFF/PCM container (canonical 44-byte
    * header + 16-bit mono PCM, LCG-seeded samples) — no external codec
    * needed, WAV is a trivial binary layout. Gives the audio decode path
    * genuine container bytes on tables that carry none; size and duration
    * are closed-form in (sampleRate, nSamples) so they oracle cleanly.
    */
  def encodeWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataBytes = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(36 + dataBytes)
    buf.put("WAVE".getBytes("US-ASCII")); buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16); buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(sampleRate); buf.putInt(sampleRate * 2) // byte rate = rate * block
    buf.putShort(2); buf.putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataBytes)
    var i = 0
    var s = seed
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      buf.putShort((s >>> 48).toShort)
      i += 1
    }
    buf.array()
  }

  /** REAL WAV header parse — walks the RIFF chunk list (fmt /data, honoring
    * odd-size padding) and derives (sample_rate, n_samples, channels, bits,
    * duration_ms). Null for anything malformed or non-WAV: in a mixed
    * 100 TB binary column one bad row must yield null, not kill the job —
    * the same contract as [[decodeImage]].
    */
  def decodeWav(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val size = bb.getInt(off + 4)
      // bound check in Long: a size near Int.MaxValue overflows `off + 8 + size`
      // to negative in int arithmetic and would bypass the check
      if (size < 0 || off + 8L + size > bytes.length) return null
      if (id == "fmt " && size >= 16) {
        channels = bb.getShort(off + 10).toInt
        rate = bb.getInt(off + 12)
        bits = bb.getShort(off + 22).toInt
      } else if (id == "data") dataLen = size
      off += 8 + size + (size & 1) // RIFF pads odd-sized chunks
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataLen < 0) return null
    val bytesPerFrame = channels * bits / 8
    if (bytesPerFrame <= 0) return null
    val n = dataLen / bytesPerFrame
    Row(rate, n, channels, bits, n * 1000L / rate)
  }

  /** Attach a generated WAV payload derived from a long id column — the
    * audio twin of [[withGeneratedPngPayload]]. Rate cycles 8/12/16/20 kHz,
    * sample count 400..1840, both closed-form in the id.
    */
  def withGeneratedWavPayload(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("payload", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    OpUtils.spread(df).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = encodeWav((8000 + (id % 4) * 4000).toInt, (400 + (id % 37) * 40).toInt, id)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"),
        lit("audio/wav").as("mime")))
  }

  /** Distributed audio decode: mapPartitions over the payload column
    * emitting the original row plus the `audio` struct (null for non-WAV
    * payloads) — same shape as [[decodeImages]].
    */
  def decodeAudio(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("audio", audioSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeWav(bytes))
      }
    }(enc)
  }

  /** REAL pixel-statistics feature extraction: decode the payload
    * (ImageIO) and walk the raster accumulating per-channel INTEGER sums
    * plus the pixel count — exact image features with no float drift, so
    * on the closed-form generated PNGs the whole decode→extract path is
    * oracle-checkable pixel-for-pixel. Null for non-image payloads (the
    * decodeImage contract). The model-embedding forward pass remains
    * [[stubFeatures]]; this is the real statistics tier below it.
    */
  def colorStats(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        rs += (rgb >> 16) & 255; gs += (rgb >> 8) & 255; bs += rgb & 255
        x += 1
      }
      y += 1
    }
    Row(rs, gs, bs, img.getWidth.toLong * img.getHeight)
  }

  val colorSchema: StructType = StructType(Seq(
    StructField("r_sum", LongType), StructField("g_sum", LongType),
    StructField("b_sum", LongType), StructField("n_px", LongType)))

  /** Distributed color-stats extraction over the payload column
    * (mapPartitions, the decodeImages shape): original row plus a `color`
    * struct, null where the payload doesn't decode.
    */
  def imageColorStats(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("color", colorSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ colorStats(r.getAs[Array[Byte]](payloadIdx)))
      }
    }(enc)
  }

  /** Decoded-PIXEL digest — codec-independent exact image identity: md5
    * over (width, height) followed by the canonical row-major sRGB ARGB
    * walk of the decoded raster, so the same picture re-encoded (different
    * PNG filter choices, a lossless re-save, a different container)
    * digests identically while any single pixel difference — including
    * alpha-only — changes it, and a WxH image never collides with its HxW
    * transpose. The first stage of an image dedup pipeline: exact clusters
    * by pixel digest, then perceptual hashing only within what remains.
    * Null/undecodable payloads → null digest (one bad row in a 100 TB
    * binary column must not kill the job).
    */
  def pixelDigest(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.isEmpty) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val (w, h) = (img.getWidth, img.getHeight)
    val md = java.security.MessageDigest.getInstance("MD5")
    // dimensions prefix the stream: a WxH image and its HxW transpose have
    // the same row-major pixel walk and must NOT collide
    md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
    // bulk per-row getRGB (one conversion pass per row, not a virtual call
    // per pixel); full ARGB kept so alpha-only differences change the hash
    val rowPix = new Array[Int](w)
    val rowBuf = java.nio.ByteBuffer.allocate(w * 4)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowPix, 0, w) // sRGB regardless of raster layout
      rowBuf.clear()
      var x = 0
      while (x < w) { rowBuf.putInt(rowPix(x)); x += 1 }
      md.update(rowBuf.array())
      y += 1
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Distributed pixel-digest extraction over the payload column
    * (mapPartitions, the decodeImages shape): original row plus a
    * `pixel_md5` string, null where the payload doesn't decode.
    */
  def withPixelDigest(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("pixel_md5", StringType))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ pixelDigest(r.getAs[Array[Byte]](payloadIdx)))
      }
    }(enc)
  }

  /** STUB feature extraction: fixed-length deterministic pseudo-embedding
    * from payload bytes (stands in for a model forward pass). Pure column
    * expression — scales as a scan.
    */
  def stubFeatures(payload: org.apache.spark.sql.Column, dim: Int = 8): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (xxhash64(payload, i) % 1000L).cast("double") / 1000.0)

  /** STUB resize kernel: deterministic byte-level downsample standing in for
    * an image resize (no codecs in this container) — keeps every k-th byte
    * so output size is ⌈n/k⌉, preserving the real kernel's contract
    * (bytes in, smaller bytes out, metadata updated).
    */
  def stubResize(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Distributed resize over the payload column (mapPartitions, like
    * decodeImages): replaces payload with the downsampled bytes and
    * refreshes meta.n_bytes.
    */
  def resizePayloads(df: DataFrame, factor: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val resized = stubResize(r.getAs[Array[Byte]](payloadIdx), factor)
        Row.fromSeq(r.toSeq.updated(payloadIdx, resized))
      }
    }(enc)
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"),
        col("meta.mime").as("mime")))
  }

  /** Frame sampling for video/audio-shaped payloads: cut the binary into
    * fixed-size frames and keep every `everyK`-th, as (frame_idx, frame)
    * structs. Expression-only (binary substring), so it scales as a scan;
    * a real demuxer swaps in at the same schema.
    */
  def sampleFrames(payload: org.apache.spark.sql.Column, frameBytes: Int, everyK: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(payload).cast("double") / frameBytes).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => struct(i.as("frame_idx"),
          // substring is 1-based and works on BinaryType
          substring(payload, i * frameBytes + 1, lit(frameBytes)).as("frame"))),
      f => f.getField("frame_idx") % everyK === 0 && length(f.getField("frame")) > 0)
  }
}
