package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a short payload"),
    (2L, "another considerably longer payload with more bytes in it"),
    (3L, "x"))
    .toDF("doc_id", "text")

  test("withMedia attaches binary payload + typed metadata struct") {
    val m = Multimodal.withMedia(docs, col("text"), "text/plain")
    assert(m.schema("payload").dataType.typeName == "binary")
    val meta = m.select("media.*").collect()
    meta.foreach { r =>
      assert(r.getAs[String]("mime") == "text/plain")
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
    }
    val sz = m.select(col("doc_id"), col("media.size_bytes")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sz(1L) == 15L && sz(3L) == 1L)
    // decode is deterministic: same payload -> same metadata
    val again = Multimodal.withMedia(docs, col("text"), "text/plain").select("media.width").collect()
    assert(again.map(_.getInt(0)).toSeq == m.select("media.width").collect().map(_.getInt(0)).toSeq)
  }

  test("explodeFrames yields stable frame ids and reassembles to payload") {
    val m = Multimodal.withMedia(docs, col("text"))
    val frames = Multimodal.explodeFrames(m, "payload", maxFrames = 4)
    assert(frames.columns.contains("frame_id") && frames.columns.contains("frame"))
    // doc 3 is a single byte -> 1 frame; doc 2 -> 4 frames
    val counts = frames.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(3L) == 1L && counts(2L) == 4L)
    // frames concatenated in order reassemble the exact payload
    val doc1 = frames.filter(col("doc_id") === 1L).orderBy("frame_id")
      .select("frame").collect().map(_.getAs[Array[Byte]](0)).reduce(_ ++ _)
    assert(new String(doc1) == "a short payload")
  }

  test("byteStats nibble histogram sums to 2x byte count") {
    val m = Multimodal.withMedia(docs, col("text"))
    val st = m.select(col("doc_id"), Multimodal.byteStats(col("payload")).as("bs"))
      .select(col("doc_id"), col("bs.n_bytes"), col("bs.nibble_hist"))
    st.collect().foreach { r =>
      val n = r.getLong(1)
      val hist = r.getSeq[Long](2)
      assert(hist.length == 16)
      assert(hist.sum == 2 * n) // two hex digits per byte
    }
  }

  test("mapBatches drives the per-partition codec seam") {
    val ds = docs.select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.BINARY))
    val out = Multimodal.mapBatches(ds, Multimodal.stubDecode).collect()
    assert(out.length == 3)
    out.foreach { case (_, w, h) => assert(w >= 1 && h >= 1) }
    // deterministic across runs
    val out2 = Multimodal.mapBatches(ds, Multimodal.stubDecode).collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }
}
