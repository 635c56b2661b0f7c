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

  /**
   * Decoder seam: a codec-bearing environment drops a real media
   * decoder in WITHOUT touching the Spark-side plumbing (schema,
   * partition batching, output contract). Contract (see DESIGN.md):
   *  - must be Serializable (ships inside the task closure);
   *  - `open()` is called once per partition and returns the instance
   *    that decodes that partition — a STATEFUL decoder (codec
   *    contexts, native handles) must return a FRESH instance here,
   *    because a registered Scala `object` deserialises to the JVM-wide
   *    singleton shared by every concurrent task in an executor; the
   *    default returns `this`, which is correct only for stateless
   *    decoders;
   *  - `close()` runs on the per-partition instance via a task
   *    completion listener — it fires on success, early termination
   *    (limit/take) and task failure alike;
   *  - `decode` must be deterministic per (docId, bytes) — signatures
   *    and features feed deterministic fits downstream;
   *  - never throw on malformed payloads: return a zero/empty feature
   *    and let quality filters drop the row (a throwing decoder kills
   *    the whole task and, after retries, the job).
   */
  trait Decoder extends Serializable {
    def name: String
    /** Per-partition instance factory; stateful decoders override. */
    def open(): Decoder = this
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures
    def close(): Unit = ()
  }

  /** The environment-limitation stub (no media libs in this container),
    * registered as the default: deterministic fake features from byte
    * statistics. */
  object StubDecoder extends Decoder {
    def name: String = "stub"
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures =
      decodeStub(docId, bytes)
  }

  /** Name → decoder registry for config-driven pipelines. */
  object Decoders {
    private val reg =
      scala.collection.concurrent.TrieMap[String, Decoder]("stub" -> StubDecoder)
    def register(d: Decoder): Unit = reg.put(d.name, d)
    def apply(name: String): Decoder = reg.getOrElse(name,
      throw new NoSuchElementException(
        s"no decoder '$name' registered (have: ${reg.keys.mkString(", ")})"))
  }

  /** STUB decode — deterministic fake "embedding" from payload bytes:
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
    * time like mapInPandas; repartition upstream to control batch size.
    * Any registered [[Decoder]] runs through this same path. */
  def extractFeatures(media: DataFrame, docIdCol: String, payloadCol: String,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoder
    // null ids fail LOUDLY (DESIGN invariant 33): a null in the
    // primitive-Long tuple field would otherwise kill the job with an
    // opaque encoder NPE ("Null value appeared in non-nullable field")
    // — one row from a failed upstream ingest should name itself
    media.select(coalesce(col(docIdCol).cast("long"), raise_error(lit(
        "identity-less media row: null doc id — feature rows are keyed " +
          "by docId")).cast("long")), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition instance: concurrent tasks must not share codec
        // state (a deserialised `object` decoder is the JVM singleton)
        val d = dec.open()
        // completion listener, not iterator-exhaustion: close() must
        // also fire when the consumer stops early (limit/take) or the
        // task fails — an exhaustion hook leaks native handles there
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.close()))
        // null payloads (an upstream fetch failure) decode as EMPTY,
        // enforced by the plumbing so EVERY decoder inherits the
        // never-throw contract — a null dereference inside a decoder
        // would fail the task and, after retries, the job
        batch.map { case (id, bytes) =>
          d.decode(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** Declarative metadata pass (no decode): byte length + md5 — fully
    * codegen'd, used as the oracle-checkable face of the binary plumbing. */
  def payloadMeta(media: DataFrame, docIdCol: String, payloadCol: String): DataFrame =
    media.select(col(docIdCol),
      length(col(payloadCol)).cast("long").as("payload_bytes"),
      md5(col(payloadCol)).as("payload_md5"))
}
