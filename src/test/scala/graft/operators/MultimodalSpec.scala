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

  test("decodeImages appends the stub-decoded struct deterministically") {
    val df = Multimodal.withBinaryPayload(docs, "text")
    val a = Multimodal.decodeImages(spark, df).select("doc_id", "decoded.width", "decoded.height")
      .orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeImages(spark, df).select("doc_id", "decoded.width", "decoded.height")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
  }

  test("resizePayloads downsamples bytes and refreshes metadata") {
    val df = Multimodal.withBinaryPayload(docs, "text")
    val out = Multimodal.resizePayloads(df, factor = 3).orderBy("doc_id").collect()
    // 10 bytes / 3 -> ceil = 4 bytes: a, d, g, j
    assert(out(0).getAs[Array[Byte]]("payload").toSeq === "adgj".getBytes.toSeq)
    assert(out(0).getStruct(out(0).fieldIndex("meta")).getAs[Int]("n_bytes") === 4)
    assert(out(1).getAs[Array[Byte]]("payload").toSeq === "x".getBytes.toSeq)
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
