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

  /** One codec instance per format, resolved from the ImageIO registry
    * ONCE and reused across a partition's rows. `ImageIO.read`/`write`
    * walk the registry (a synchronized singleton) and construct a new
    * reader/writer per call — across 32 codec threads that lookup
    * dominates the actual pixel work. Instances are per-task (never
    * shared between threads: ImageIO readers/writers are not
    * thread-safe). */
  private[graft] def pngWriter() =
    ImageIO.getImageWritersByFormatName("png").next()
  private[graft] def pngReader() =
    ImageIO.getImageReadersByFormatName("png").next()
  private[graft] def gifWriter() =
    ImageIO.getImageWritersByFormatName("gif").next()
  private[graft] def gifReader() =
    ImageIO.getImageReadersByFormatName("gif").next()

  private def writeImage(w: javax.imageio.ImageWriter,
      img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(img)
    ios.close()
    bos.toByteArray
  }

  private def readImage(r: javax.imageio.ImageReader,
      bytes: Array[Byte]): BufferedImage = {
    r.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
    r.read(0)
  }

  /** Render doc `docId`'s deterministic gray image and encode it as a
    * real PNG via the JDK encoder. */
  private[graft] def renderPng(docId: Long,
      w0: javax.imageio.ImageWriter = null): Array[Byte] = {
    val (w, h) = srcDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, pix(docId, i))
      i += 1
    }
    writeImage(if (w0 != null) w0 else pngWriter(), img)
  }

  /** One media row: the payload is a complete PNG file. */
  final case class Media(doc_id: Long, payload: Array[Byte])

  /** Spread CPU-bound codec work across every core. Media decode cost
    * is per-row COMPUTE, not per-byte I/O, so split-aligned input
    * partitioning (one ~128 MB parquet split = one task) serializes a
    * corpus whose rows are small — at sf1 the whole 500k-doc table is
    * one split and the codec stage ran on one core. The exchange moves
    * only the 8-byte ids; on a real media table the equivalent lever
    * is a small `spark.sql.files.maxPartitionBytes` for the scan. */
  private def spread(ids: Dataset[Long]): Dataset[Long] = {
    val cores = ids.sparkSession.sparkContext.defaultParallelism
    ids.repartition(cores * 4)
  }

  /** Attach the opaque media column: one real PNG per document. */
  def encodeMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    ImageIO.setUseCache(false)
    spread(docs.select(col("doc_id")).as[Long]).mapPartitions { batch =>
      ImageIO.setUseCache(false) // executor-side: no shared scratch file
      val w = pngWriter()
      batch.map(id => Media(id, renderPng(id, w)))
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
      val rd = pngReader()
      batch.map { m =>
        val img = readImage(rd, m.payload)
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

  /** Per-image gray-level entropy row. */
  final case class ImageEntropy(doc_id: Long, n_pixels: Long,
      entropy_q9: Long)

  /** Gray-level Shannon entropy per image — the blank/flat-image
    * quality gate an image-corpus pipeline runs next to the dHash
    * dedup: a near-constant image (screenshot letterbox, solid fill)
    * reads near 0, a textured one near ln(16). The histogram is 16
    * gray bands over the REAL decoded raster; each band's −p·ln(p)
    * contribution is floor-quantized ×1e9 from the integer (count,
    * n) pair BEFORE the per-image sum, so the total is an exact,
    * order-independent integer (the PSI/DSIR trick — the shared
    * measure-zero libm residual is the accepted class). Decode and
    * the 16-bin fold are local to the partition-parallel codec pass;
    * no shuffle, one row per image. */
  def imageEntropy(docs: DataFrame, bins: Int = 16): Dataset[ImageEntropy] = {
    require(bins >= 2 && 256 % bins == 0, "bins must divide 256")
    val spark = docs.sparkSession
    import spark.implicits._
    val width = 256 / bins
    encodeMedia(docs).mapPartitions { batch =>
      ImageIO.setUseCache(false)
      val rd = pngReader()
      batch.map { m =>
        val img = readImage(rd, m.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val hist = new Array[Long](bins)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            hist(raster.getSample(x, y, 0) / width) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var q = 0L
        var b = 0
        while (b < bins) {
          val c = hist(b)
          if (c > 0L) {
            val p = c.toDouble / n.toDouble
            q += math.floor(-p * math.log(p) * 1e9).toLong
          }
          b += 1
        }
        ImageEntropy(m.doc_id, n, q)
      }
    }
  }

  /** Per-image 64-bit difference hash, split into two unsigned 32-bit
    * halves so neither column ever carries a sign bit (int64-clean in
    * any engine). */
  final case class DHash(doc_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** Perceptual image hash (dHash) — the standard near-duplicate
    * fingerprint for image corpora (9×8 nearest-neighbor downsample,
    * one bit per horizontally-adjacent brighter-than comparison):
    * REAL decode of each PNG payload, integer floor sampling
    * identical to [[resizeMedia]] (so the oracle replays every bit
    * from the pixel formula), no resize re-encode — the hash is read
    * straight off the decoded raster. Partition-parallel, no shuffle;
    * grouping equal hashes afterwards is the image-dedup step. */
  def imageDHash(docs: DataFrame): Dataset[DHash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    encodeMedia(docs).mapPartitions { batch =>
      ImageIO.setUseCache(false)
      val rd = pngReader()
      batch.map { m =>
        val img = readImage(rd, m.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        var hash = 0L
        var y = 0
        while (y < 8) {
          val sy = y * h / 8
          var x = 0
          while (x < 8) {
            val p0 = r.getSample(x * w / 9, sy, 0)
            val p1 = r.getSample((x + 1) * w / 9, sy, 0)
            if (p1 > p0) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        DHash(m.doc_id, hash >>> 32, hash & 0xffffffffL)
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
      val rd = pngReader()
      val wr = pngWriter()
      batch.map { m =>
        val src = readImage(rd, m.payload)
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
        Resized(m.doc_id, tw.toLong, th.toLong, sum, writeImage(wr, out))
      }
    }
  }

  /** Pixel value at flat index i of frame f of doc d's clip. */
  @inline private[graft] def framePix(docId: Long, f: Long, i: Int): Int =
    (((i.toLong * 31 + docId + f * 7) % 256 + 256) % 256).toInt

  /** Frames per clip: 1..3, derived from doc_id. */
  private[graft] def clipFrames(docId: Long): Long = 1 + docId % 3

  /** Render doc `docId`'s deterministic multi-frame clip as a real
    * animated GIF (the JDK's GIF writer in sequence mode) — an actual
    * multi-frame media container, 8×8 gray frames. */
  private[graft] def renderGif(docId: Long,
      w0: javax.imageio.ImageWriter = null): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = if (w0 != null) w0 else gifWriter()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    var f = 0L
    while (f < clipFrames(docId)) {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
      var i = 0
      while (i < 64) { img.getRaster.setSample(i % 8, i / 8, 0, framePix(docId, f, i)); i += 1 }
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    w.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  final case class Frame(doc_id: Long, frame_idx: Long, width: Long,
      height: Long, sum_gray: Long)

  /** Batched 1→N REAL media transform — the video frame-sampling
    * shape: each payload is a genuine animated GIF, and every
    * `everyN`-th frame is seek-decoded from the container by the JDK's
    * GIF reader (`reader.read(idx)` — only sampled frames decode, the
    * skip is a real container seek). Each sampled frame becomes its
    * own relational row, so downstream per-frame ops (embedding,
    * dedup) fan out of one narrow partition-parallel stage. */
  def sampleFrames(docs: DataFrame, everyN: Int = 2): Dataset[Frame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    ImageIO.setUseCache(false)
    spread(docs.select(col("doc_id")).as[Long]).mapPartitions { batch =>
      ImageIO.setUseCache(false)
      val writer = gifWriter()
      val reader = gifReader()
      batch.flatMap { id =>
        val gif = renderGif(id, writer)
        reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(gif)))
        val n = reader.getNumImages(true)
        val out = (0 until n by everyN).map { idx =>
          val img = reader.read(idx)
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          Frame(id, idx.toLong, img.getWidth.toLong, img.getHeight.toLong, sum)
        }
        out.iterator
      }
    }
  }

  /** Deterministic 16-bit PCM sample i of doc d's audio clip. */
  @inline private[graft] def audioSample(docId: Long, i: Int): Int =
    (((i.toLong * 131 + docId) % 4096 + 4096) % 4096).toInt - 2048

  /** Samples per clip: 64..127, derived from doc_id. */
  private[graft] def clipSamples(docId: Long): Int = (64 + docId % 64).toInt

  /** The WAV-capable `AudioFileWriter` SPI, resolved once per caller.
    * `AudioSystem.write` re-walks the provider list per call; in a
    * tight per-row loop that allocation dominates, so hot paths hold
    * the provider (public `javax.sound.sampled.spi` API). */
  private[graft] def wavWriter(): javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala
      .find(_.getAudioFileTypes.contains(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer SPI"))
  }

  /** Render doc `docId`'s deterministic audio clip as a real WAV file
    * (RIFF container, 16 kHz 16-bit mono little-endian PCM). */
  private[graft] def renderWav(docId: Long,
      w: javax.sound.sampled.spi.AudioFileWriter = wavWriter()): Array[Byte] = {
    import javax.sound.sampled._
    val ns = clipSamples(docId)
    val pcm = new Array[Byte](ns * 2)
    var i = 0
    while (i < ns) {
      val s = audioSample(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, ns.toLong)
    val bos = new ByteArrayOutputStream()
    w.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Typed metadata per decoded audio payload. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long,
      n_samples: Long, sum_abs: Long)

  /** Batched REAL audio decode: each payload is a genuine WAV file
    * parsed by the JDK's RIFF reader — the reported rate, sample
    * count, and absolute-amplitude sum come from the decoded PCM
    * stream, so a wrong parse fails the oracle.
    *
    * Provider resolution is PER PARTITION, not per row: the matching
    * `AudioFileReader` is found by probing the first payload and then
    * reused (re-probing only if a payload it rejects appears).
    * `AudioSystem.getAudioInputStream` instead walks EVERY provider
    * per call, and each non-matching provider signals with a filled-in
    * exception — measured 30× slower across 16 threads than the
    * cached-reader loop. */
  def decodeAudio(docs: DataFrame): Dataset[AudioMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs.select(col("doc_id")).as[Long]).mapPartitions { batch =>
      import javax.sound.sampled.{AudioInputStream, UnsupportedAudioFileException}
      import javax.sound.sampled.spi.AudioFileReader
      import scala.jdk.CollectionConverters._
      val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
        .asScala.toVector
      val writer = wavWriter()
      var cached: AudioFileReader = null
      def open(bytes: Array[Byte]): AudioInputStream = {
        if (cached != null) {
          try return cached.getAudioInputStream(new ByteArrayInputStream(bytes))
          catch { case _: UnsupportedAudioFileException => cached = null }
        }
        readers.foreach { r =>
          try {
            val in = r.getAudioInputStream(new ByteArrayInputStream(bytes))
            cached = r
            return in
          } catch { case _: UnsupportedAudioFileException => }
        }
        throw new UnsupportedAudioFileException("no SPI provider accepts payload")
      }
      batch.map { id =>
        val in = open(renderWav(id, writer))
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        in.close()
        var sum = 0L
        var i = 0
        while (i < pcm.length / 2) {
          val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)).toShort
          sum += math.abs(s.toInt)
          i += 1
        }
        AudioMeta(id, fmt.getSampleRate.toLong, pcm.length / 2L, sum)
      }
    }
  }

  /** One merged run of silent windows inside a clip. */
  final case class SilenceSpan(doc_id: Long, start_win: Long,
      end_win: Long, n_windows: Long)

  /** Silence segmentation — the trim step an ASR-data pipeline runs
    * before transcription: the REAL decoded PCM is cut into `win`-
    * sample windows, a window is silent when its mean |amplitude| is
    * under `meanAbsMax` (compared as the exact integer cross-product
    * sum|s| < meanAbsMax·n, so a short tail window is judged by its
    * own length), and consecutive silent windows merge into one span
    * row. Decode and the span walk are both per-clip local work inside
    * the same partition-parallel pass as [[decodeAudio]] — no shuffle,
    * no window functions; output is span-sized. The oracle replays
    * the deterministic sample field, windows it with one hash agg,
    * and merges runs with the gaps-and-islands idiom — so a wrong
    * decode or a wrong merge both fail the hash. */
  def audioSilence(docs: DataFrame, win: Int = 16,
      meanAbsMax: Long = 900L): Dataset[SilenceSpan] = {
    require(win >= 1 && meanAbsMax > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs.select(col("doc_id")).as[Long]).mapPartitions { batch =>
      import javax.sound.sampled.{AudioInputStream, UnsupportedAudioFileException}
      import javax.sound.sampled.spi.AudioFileReader
      import scala.jdk.CollectionConverters._
      val readers = java.util.ServiceLoader.load(classOf[AudioFileReader])
        .asScala.toVector
      val writer = wavWriter()
      var cached: AudioFileReader = null
      def open(bytes: Array[Byte]): AudioInputStream = {
        if (cached != null) {
          try return cached.getAudioInputStream(new ByteArrayInputStream(bytes))
          catch { case _: UnsupportedAudioFileException => cached = null }
        }
        readers.foreach { r =>
          try {
            val in = r.getAudioInputStream(new ByteArrayInputStream(bytes))
            cached = r
            return in
          } catch { case _: UnsupportedAudioFileException => }
        }
        throw new UnsupportedAudioFileException("no SPI provider accepts payload")
      }
      batch.flatMap { id =>
        val in = open(renderWav(id, writer))
        val pcm = in.readAllBytes()
        in.close()
        val n = pcm.length / 2
        val spans = Vector.newBuilder[SilenceSpan]
        var start = -1L
        var w = 0
        while (w * win < n) {
          val lo = w * win
          val hi = math.min(lo + win, n)
          var sum = 0L
          var i = lo
          while (i < hi) {
            val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)).toShort
            sum += math.abs(s.toInt)
            i += 1
          }
          val silent = sum < meanAbsMax * (hi - lo)
          if (silent && start < 0) start = w.toLong
          if (!silent && start >= 0) {
            spans += SilenceSpan(id, start, w - 1L, w - start)
            start = -1L
          }
          w += 1
        }
        if (start >= 0) spans += SilenceSpan(id, start, w - 1L, w - start)
        spans.result()
      }
    }
  }
}
