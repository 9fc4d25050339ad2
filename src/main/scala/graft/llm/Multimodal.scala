package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride along as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs
  * as a batched per-partition stage (the Scala analog of a Pandas UDF
  * over mapInPandas: one partition = one batch, arbitrary library code
  * inside, schema declared up front).
  *
  * The container ships no image/audio codecs, so `decodeMedia`'s codec
  * call is STUBBED with a deterministic fake derived from the payload
  * (clearly marked below); the Spark-side plumbing — binary column,
  * typed Dataset, partition-batched execution, fixed output schema —
  * is real and is what the driver verifies.
  */
object Multimodal {

  /** Typed metadata emitted per decoded payload. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** Input batch row (public: Spark codegen instantiates it). */
  final case class Payload(doc_id: Long, payload: Array[Byte], n_chars: Long)

  /** Attach the opaque media column: (doc_id, payload binary, n_chars). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("n_chars"))

  /** Batched decode + feature extraction over the binary payloads.
    * Partition-parallel, no shuffle; output schema is fixed so
    * downstream stays fully relational. */
  def decodeMedia(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs).as[Payload].mapPartitions { batch =>
      batch.map { p =>
        // STUB: a real implementation decodes p.payload with an image/
        // audio codec here. No codec libs ship in this container, so we
        // emit a deterministic fake derived from payload size — the
        // batch shape, schema, and partitioning are the real contract.
        MediaMeta(
          doc_id = p.doc_id,
          n_bytes = p.payload.length.toLong,
          width = p.n_chars % 640,
          height = (p.n_chars * 7) % 480,
          n_frames = 1 + p.doc_id % 3)
      }
    }
  }
}
