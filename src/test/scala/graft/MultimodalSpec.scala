package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("decodeStub: exact byte stats and deterministic feature") {
    val m = Multimodal.decodeStub(7L, "aabb".getBytes("UTF-8"))
    assert(m.byteLen === 4L)
    assert(m.byteSum === 2L * 'a' + 2L * 'b')
    assert(m.meanByte === ('a' + 'b') / 2.0)
    assert(math.abs(m.entropy - math.log(2.0)) < 1e-12,
      "two equi-frequent symbols -> ln 2 nats")
    assert(m.feature.length === 8)
    val again = Multimodal.decodeStub(7L, "different bytes".getBytes("UTF-8"))
    assert(m.feature.toSeq === again.feature.toSeq,
      "stub feature depends only on docId (deterministic)")
  }

  test("extractFeatures: batched decode keeps ids, schema contract holds") {
    import spark.implicits._
    val media = Seq((1L, "hello"), (2L, ""), (3L, "aaa"))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val out = Multimodal.extractFeatures(media, "doc_id", "payload")
    assert(out.schema.fieldNames.toSeq ===
      Seq("docId", "byteLen", "byteSum", "meanByte", "entropy", "feature"))
    val rows = out.collect().map(r => r.docId -> r).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows(3L).byteSum === 3L * 'a')
    assert(rows(3L).entropy === 0.0)
    assert(rows(2L).byteLen === 0L && rows(2L).byteSum === 0L)
  }

  test("decoder seam: a second registered decoder runs through the same " +
    "plumbing with per-partition open/close") {
    import spark.implicits._
    val media = Seq((1L, "xy"), (2L, "z")).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    Multimodal.Decoders.register(LenDecoder)
    val byName = Multimodal.Decoders("len")
    val out = Multimodal.extractFeatures(media, "doc_id", "payload", byName)
      .collect().map(r => r.docId -> r).toMap
    assert(out(1L).feature.toSeq === Seq(2f), "decoder output flows through")
    assert(out(2L).feature.toSeq === Seq(1f))
    assert(out(1L).entropy === -1.0, "stub not used when a decoder is passed")
    intercept[NoSuchElementException] { Multimodal.Decoders("gpu-jpeg") }
  }
}

/** Test decoder: feature = [byte length]; entropy sentinel -1 proves the
  * stub was bypassed. Top-level object so the closure cleaner ships it
  * without dragging the suite in. */
object LenDecoder extends Multimodal.Decoder {
  def name: String = "len"
  def decode(docId: Long, bytes: Array[Byte]): Multimodal.MediaFeatures =
    Multimodal.MediaFeatures(docId, bytes.length, 0L, 0.0, -1.0,
      Array(bytes.length.toFloat))
}
