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

  /** One resized payload per input (doc_id, dims, bytes kept). */
  final case class Resized(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, payload: Array[Byte])

  /** Batched 1→1 media transform (the resize/resample shape): binary
    * in, binary out, partition-parallel, no shuffle. The codec step is
    * STUBBED like [[decodeMedia]] — the "resized" payload is a
    * deterministic byte prefix capped at width*height/64 so the
    * contract (batching, binary-out schema, size bound) is testable
    * without codecs. */
  def resizeMedia(docs: DataFrame, width: Int, height: Int): Dataset[Resized] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = width * height / 64
    asMedia(docs).as[Payload].mapPartitions { batch =>
      batch.map { p =>
        // STUB: a real implementation decodes + resamples to the
        // target dims; the byte-prefix fake keeps output size bounded
        // by the requested resolution like a real resize would
        val out = java.util.Arrays.copyOf(p.payload, math.min(p.payload.length, cap))
        Resized(p.doc_id, width.toLong, height.toLong, out.length.toLong, out)
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Batched 1→N media transform (the video frame-sampling shape):
    * every `everyN`-th frame of each payload becomes its own row, so
    * downstream per-frame ops (embedding, dedup) stay relational.
    * Frame count and content are STUBBED from the decode metadata;
    * the 1→N iterator plumbing is the real contract. */
  def sampleFrames(docs: DataFrame, everyN: Int = 2): Dataset[Frame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asMedia(docs).as[Payload].mapPartitions { batch =>
      batch.flatMap { p =>
        val nFrames = 1 + p.doc_id % 3 // matches decodeMedia's stub meta
        (0L until nFrames by everyN.toLong).iterator.map { idx =>
          // STUB: a real implementation seeks + decodes frame `idx`
          val slice = java.util.Arrays.copyOf(p.payload,
            math.min(p.payload.length, 64))
          Frame(p.doc_id, idx, slice)
        }
      }
    }
  }
}
