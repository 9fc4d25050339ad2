package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride along as opaque
  * `binary` columns with typed metadata; codec work runs as a batched
  * per-partition stage (the Scala analog of a Pandas UDF over
  * mapInPandas: one partition = one batch, arbitrary library code
  * inside, schema declared up front).
  *
  * The image path is REAL: payloads are genuine PNG files produced by
  * the JDK's `javax.imageio` PNG encoder and read back with
  * `ImageIO.read` — a wrong decode would change the reported
  * dimensions / pixel sums and fail the oracle. The pixel CONTENT is
  * synthesized deterministically from `doc_id` (the corpus has no
  * image column), which is what lets a SQL oracle recompute the same
  * sums without a codec. Only the VIDEO path (`sampleFrames`) remains
  * stubbed — the JDK ships no video codec.
  *
  * At 100 TB the shape is what matters: encode/decode/resize are
  * narrow partition-parallel batch stages with fixed relational output
  * schemas — no shuffle, no driver involvement, codec state per
  * executor thread (`ImageIO` cache disabled so threads don't contend
  * on a shared scratch file).
  */
object Multimodal {

  /** Deterministic source dimensions per document: 8..15 × 8..15. */
  private[graft] def srcDims(docId: Long): (Int, Int) =
    ((8 + docId % 8).toInt, (8 + (docId * 3) % 8).toInt)

  /** Pixel value at flat index i of doc d's image: (i*31 + d) mod 256. */
  @inline private[graft] def pix(docId: Long, i: Int): Int =
    (((i.toLong * 31 + docId) % 256 + 256) % 256).toInt

  /** Render doc `docId`'s deterministic gray image and encode it as a
    * real PNG via the JDK encoder. */
  private[graft] def renderPng(docId: Long): Array[Byte] = {
    val (w, h) = srcDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, pix(docId, i))
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One media row: the payload is a complete PNG file. */
  final case class Media(doc_id: Long, payload: Array[Byte])

  /** Attach the opaque media column: one real PNG per document. */
  def encodeMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    ImageIO.setUseCache(false)
    docs.select(col("doc_id")).as[Long].mapPartitions { batch =>
      ImageIO.setUseCache(false) // executor-side: no shared scratch file
      batch.map(id => Media(id, renderPng(id)))
    }
  }

  /** Typed metadata emitted per decoded payload. */
  final case class MediaMeta(
      doc_id: Long, width: Long, height: Long, n_pixels: Long, sum_gray: Long)

  /** Batched REAL decode: `ImageIO.read` parses each PNG payload and
    * the reported dims + gray-sum come from the decoded raster.
    * Partition-parallel, no shuffle; output schema fixed so downstream
    * stays fully relational. */
  def decodeMedia(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodeMedia(docs).mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        MediaMeta(m.doc_id, w.toLong, h.toLong, w.toLong * h, sum)
      }
    }
  }

  /** One resized payload per input; the payload is the re-encoded PNG
    * of the resampled image. */
  final case class Resized(doc_id: Long, width: Long, height: Long,
      sum_gray: Long, payload: Array[Byte])

  /** Batched 1→1 REAL media transform: decode the PNG, nearest-neighbor
    * resample to `tw`×`th` (out(x,y) = src((x*sw)/tw, (y*sh)/th) with
    * integer floor — exact, so an oracle can replay it), re-encode.
    * Partition-parallel, no shuffle. */
  def resizeMedia(docs: DataFrame, tw: Int, th: Int): Dataset[Resized] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodeMedia(docs).mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { m =>
        val src = ImageIO.read(new ByteArrayInputStream(m.payload))
        val (sw, sh) = (src.getWidth, src.getHeight)
        val sr = src.getRaster
        val out = new BufferedImage(tw, th, BufferedImage.TYPE_BYTE_GRAY)
        val or = out.getRaster
        var sum = 0L
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val v = sr.getSample(x * sw / tw, y * sh / th, 0)
            or.setSample(x, y, 0, v)
            sum += v
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Resized(m.doc_id, tw.toLong, th.toLong, sum, bos.toByteArray)
      }
    }
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Batched 1→N media transform (the video frame-sampling shape):
    * every `everyN`-th frame of each payload becomes its own row, so
    * downstream per-frame ops (embedding, dedup) stay relational.
    * The VIDEO codec step is STUBBED — the JDK ships no video decoder —
    * so frame count derives from doc_id and each "frame" is the still
    * PNG; the 1→N iterator plumbing is the real contract. */
  def sampleFrames(docs: DataFrame, everyN: Int = 2): Dataset[Frame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodeMedia(docs).mapPartitions { batch =>
      batch.flatMap { m =>
        // STUB: a real implementation seeks + decodes frame `idx` from a
        // video container; no video codec ships with the JDK
        val nFrames = 1 + m.doc_id % 3
        (0L until nFrames by everyN.toLong).iterator.map { idx =>
          Frame(m.doc_id, idx, m.payload)
        }
      }
    }
  }
}
