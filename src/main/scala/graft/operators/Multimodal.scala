package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column pattern: opaque `binary` payloads plus a typed metadata
  * struct, with decode / feature-extraction as distributed per-partition
  * transforms.
  *
  * The container has no image/audio codecs, so the *decode kernel* is a
  * clearly-marked deterministic STUB (`stubDecodeImage`) — the Spark-side
  * plumbing (schema, batching, partition-parallel execution, metadata
  * propagation) is real and tested, and swapping the stub for a JNI/codec
  * call changes nothing structurally.
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

  /** STUB decode kernel — deterministic fake standing in for a real image
    * decoder (no codecs in this container). Derives plausible dimensions
    * from the payload bytes so tests are reproducible. Replace the body
    * with an actual decoder to productionize; the signature (bytes in,
    * fixed-schema struct out) is the contract.
    */
  def stubDecodeImage(bytes: Array[Byte]): Row = {
    val h = java.util.Arrays.hashCode(bytes)
    Row(64 + math.abs(h % 512), 64 + math.abs((h >> 9) % 512), 3)
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
        Row.fromSeq(r.toSeq :+ stubDecodeImage(bytes))
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
