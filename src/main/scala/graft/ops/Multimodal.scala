package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extraction
 * runs batched per partition (the Scala analogue of `mapInPandas` —
 * same batch shape: the expensive decoder amortises over a partition,
 * the schema contract is explicit, and partitioning controls batch
 * size).
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * container): `decodeStub` produces deterministic fake features from
 * the bytes. The Spark-side plumbing — schema, partitioning, batch
 * iteration, output contract — is real and tested; swapping in a real
 * decoder is a one-function change.
 */
object Multimodal {

  /** Typed metadata every media payload carries. */
  case class MediaMeta(docId: Long, mediaType: String, byteLen: Long)

  case class MediaFeatures(docId: Long, byteLen: Long, byteSum: Long,
                           meanByte: Double, entropy: Double,
                           feature: Array[Float])

  /** STUB decoder — deterministic fake "embedding" from payload bytes:
    * byte histogram statistics + 8 hashed moments. A real implementation
    * would decode pixels/samples here. byteSum is carried as an exact
    * integer so the oracle face of this operator has a float-free column. */
  def decodeStub(docId: Long, bytes: Array[Byte], dim: Int = 8): MediaFeatures = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(1, bytes.length).toDouble
    var sum = 0L; var ent = 0.0
    i = 0
    while (i < 256) {
      sum += i * hist(i)
      if (hist(i) > 0) { val p = hist(i) / n; ent -= p * math.log(p) }
      i += 1
    }
    val feat = Array.tabulate(dim) { d =>
      (graft.hash.HashKernels.mix64(docId * 31 + d) % 1000).toFloat / 1000f
    }
    MediaFeatures(docId, bytes.length, sum, sum / n, ent, feat)
  }

  /** Batched feature extraction over (docId, payload) — partition-at-a-
    * time like mapInPandas; repartition upstream to control batch size. */
  def extractFeatures(media: DataFrame, docIdCol: String, payloadCol: String)
  : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(docIdCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real decoders initialise once per batch here (codec contexts etc.)
        batch.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Declarative metadata pass (no decode): byte length + md5 — fully
    * codegen'd, used as the oracle-checkable face of the binary plumbing. */
  def payloadMeta(media: DataFrame, docIdCol: String, payloadCol: String): DataFrame =
    media.select(col(docIdCol),
      length(col(payloadCol)).cast("long").as("payload_bytes"),
      md5(col(payloadCol)).as("payload_md5"))
}
