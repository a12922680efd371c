package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abcdefghij"),      // 10 bytes
    (2L, "xyz"))             // 3 bytes
    .toDF("doc_id", "text")

  test("withBinaryPayload attaches payload + metadata struct") {
    val out = Multimodal.withBinaryPayload(docs, "text", "text/plain")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").toSeq === "abcdefghij".getBytes.toSeq)
    val meta = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(meta.getAs[Int]("n_bytes") === 10)
    assert(meta.getAs[String]("mime") === "text/plain")
  }

  test("decodeImages recovers real PNG dimensions; non-image payloads decode to null") {
    // real PNG bytes round-trip through the JDK codec
    val png = Multimodal.encodePng(width = 5, height = 3, seed = 7L)
    val mixed = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(spark, mixed)
      .orderBy("doc_id").collect()
    val dec = out(0).getStruct(out(0).fieldIndex("decoded"))
    assert((dec.getInt(0), dec.getInt(1), dec.getInt(2)) === ((5, 3, 3)))
    assert(out(1).isNullAt(out(1).fieldIndex("decoded")))
  }

  test("decode/resize survive null, empty, and malformed-but-recognized payloads") {
    val png = Multimodal.encodePng(width = 4, height = 4, seed = 1L)
    // a truncated PNG is RECOGNIZED by the reader (magic bytes intact) but
    // throws from inside the decoder — historically a RuntimeException, not
    // IOException, i.e. the one-bad-row-kills-the-job case
    val truncated = png.take(30)
    val rows = Seq((1L, png), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.empty[Byte]), (4L, truncated))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(spark, rows).orderBy("doc_id").collect()
    assert(!out(0).isNullAt(out(0).fieldIndex("decoded")))
    (1 to 3).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("decoded")), s"row $i"))
    // resize: bad payloads pass through unchanged instead of throwing
    val meta = rows.withColumn("meta", struct(lit("image/png").as("mime")))
    val resized = Multimodal.resizeImages(meta, scale = 0.5).orderBy("doc_id").collect()
    assert(resized.length === 4)
    assert(resized(3).getAs[Array[Byte]]("payload").toSeq === truncated.toSeq)
  }

  test("imageColorStats sums decoded pixels exactly; bad payloads yield null") {
    val png = Multimodal.encodePng(width = 4, height = 3, seed = 9L)
    val rows = Seq((1L, png), (2L, "nope".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]), (4L, png.take(30)))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageColorStats(rows).orderBy("doc_id").collect()
    val c = out(0).getStruct(out(0).fieldIndex("color"))
    // scala reference straight from the generator's closed form
    val px = (0 until 12).map(p => (9L * 31 + p) & 0xFFFFFF)
    assert(c.getLong(0) === px.map(v => (v >> 16) & 255).sum.toLong)
    assert(c.getLong(1) === px.map(v => (v >> 8) & 255).sum.toLong)
    assert(c.getLong(2) === px.map(v => v & 255).sum.toLong)
    assert(c.getLong(3) === 12L)
    (1 to 3).foreach(i => assert(out(i).isNullAt(out(i).fieldIndex("color")), s"row $i"))
  }

  test("pixelDigest is codec-independent (re-encode invariant) and pixel-sensitive") {
    val png = Multimodal.encodePng(width = 5, height = 4, seed = 7L)
    // re-save through a different raster path: decode + identity-scale
    // re-encode (TYPE_3BYTE_BGR rebuild) — same pixels, fresh bytes
    val withMeta = Seq((1L, png)).toDF("doc_id", "payload")
      .withColumn("meta", struct(length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("fingerprint"), lit("image/png").as("mime")))
    val resaved = Multimodal.resizeImages(withMeta, scale = 1.0)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(Multimodal.pixelDigest(png) === Multimodal.pixelDigest(resaved))
    // any pixel difference changes the digest
    val other = Multimodal.encodePng(width = 5, height = 4, seed = 8L)
    assert(Multimodal.pixelDigest(png) !== Multimodal.pixelDigest(other))
    // a WxH image and its HxW transpose share the row-major pixel walk but
    // must not collide — dimensions are part of the digested stream
    assert(Multimodal.pixelDigest(Multimodal.encodePng(6, 1, 3L)) !==
      Multimodal.pixelDigest(Multimodal.encodePng(1, 6, 3L)))
    // hardening: null / empty / non-image payloads digest to null
    assert(Multimodal.pixelDigest(null) === null)
    assert(Multimodal.pixelDigest(Array.emptyByteArray) === null)
    assert(Multimodal.pixelDigest("nope".getBytes("UTF-8")) === null)
    // distributed form: duplicate payloads cluster by digest
    val df = Seq((1L, png), (2L, png), (3L, other)).toDF("doc_id", "payload")
    val dig = Multimodal.withPixelDigest(df).select("doc_id", "pixel_md5").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dig(1L) === dig(2L))
    assert(dig(1L) !== dig(3L))
  }

  test("withGeneratedPngPayload + resizeImages halve real dimensions") {
    val ids = Seq(Tuple1(0L), Tuple1(20L), Tuple1(255L)).toDF("doc_id")
    val decoded = Multimodal.decodeImages(spark,
        Multimodal.resizeImages(
          Multimodal.withGeneratedPngPayload(ids, "doc_id"), scale = 0.5))
      .select($"doc_id", $"decoded.width", $"decoded.height")
      .orderBy("doc_id").collect()
    def expect(id: Long) = (math.max((8 + id % 16) / 2, 1).toInt,
      math.max((8 + (id / 16) % 16) / 2, 1).toInt)
    assert(decoded.map(r => (r.getInt(1), r.getInt(2))).toSeq ===
      Seq(expect(0L), expect(20L), expect(255L)))
  }

  test("resizePayloads downsamples bytes and refreshes metadata") {
    val df = Multimodal.withBinaryPayload(docs, "text")
    val out = Multimodal.resizePayloads(df, factor = 3).orderBy("doc_id").collect()
    // 10 bytes / 3 -> ceil = 4 bytes: a, d, g, j
    assert(out(0).getAs[Array[Byte]]("payload").toSeq === "adgj".getBytes.toSeq)
    assert(out(0).getStruct(out(0).fieldIndex("meta")).getAs[Int]("n_bytes") === 4)
    assert(out(1).getAs[Array[Byte]]("payload").toSeq === "x".getBytes.toSeq)
  }

  test("WAV encode/decode round-trips header fields; malformed audio decodes to null") {
    // direct kernel round-trip at a few (rate, n) points
    for ((rate, n) <- Seq((8000, 400), (16000, 1201), (44100, 7))) {
      val row = Multimodal.decodeWav(Multimodal.encodeWav(rate, n, seed = 42L))
      assert(row.getInt(0) === rate && row.getInt(1) === n)
      assert(row.getInt(2) === 1 && row.getInt(3) === 16)
      assert(row.getLong(4) === n * 1000L / rate)
    }
    // odd-sized extra chunk before data exercises RIFF padding in the walk
    val base = Multimodal.encodeWav(8000, 10, 1L)
    val extra = java.nio.ByteBuffer.allocate(base.length + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 36) // RIFF..fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(1).put(7.toByte).put(0.toByte) // odd chunk + pad
    extra.put(base, 36, base.length - 36) // data chunk
    val padded = extra.array()
    java.nio.ByteBuffer.wrap(padded).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, padded.length - 8) // fix RIFF size
    val viaPadding = Multimodal.decodeWav(padded)
    assert(viaPadding != null && viaPadding.getInt(1) === 10, "RIFF padding walk broke")
    // malformed payloads -> null, never a throw
    assert(Multimodal.decodeWav(null) === null)
    assert(Multimodal.decodeWav(Array[Byte]()) === null)
    assert(Multimodal.decodeWav("not audio at all, just text bytes....................".getBytes) === null)
    assert(Multimodal.decodeWav(base.take(30)) === null) // truncated header
    // distributed generate+decode matches the closed form
    val out = Multimodal.decodeAudio(
        Multimodal.withGeneratedWavPayload(spark.range(20).select(col("id").as("doc_id")), "doc_id"))
      .select(col("doc_id"), col("audio.sample_rate"), col("audio.n_samples"), col("audio.duration_ms"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val (rate, n) = ((8000 + (id % 4) * 4000).toInt, (400 + (id % 37) * 40).toInt)
      assert(r.getInt(1) === rate && r.getInt(2) === n && r.getLong(3) === n * 1000L / rate)
    }
  }

  test("sampleFrames cuts fixed-size frames and keeps every k-th") {
    val df = Multimodal.withBinaryPayload(docs, "text")
      .select(col("doc_id"), Multimodal.sampleFrames(col("payload"), frameBytes = 2, everyK = 2).as("frames"))
      .orderBy("doc_id").collect()
    // doc 1: frames ab cd ef gh ij -> idx 0,2,4 kept: ab, ef, ij
    val frames = df(0).getSeq[org.apache.spark.sql.Row](1)
    assert(frames.map(_.getAs[Int]("frame_idx")) === Seq(0, 2, 4))
    assert(frames.map(f => new String(f.getAs[Array[Byte]]("frame"))) === Seq("ab", "ef", "ij"))
  }
}
