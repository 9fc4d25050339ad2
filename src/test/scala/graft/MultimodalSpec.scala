package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal

/** Pins the REAL image codec path: payloads are genuine PNG files
  * (JDK encoder), decode goes through ImageIO.read, and the reported
  * stats equal the deterministic pixel field — so a broken decode or
  * resample cannot pass. Video frame-sampling stays a declared stub
  * (no JDK video codec) and only its 1→N plumbing is pinned. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = (0L until 24L).map(i => (i, s"doc$i"))
    .toDF("doc_id", "text")

  test("encodeMedia emits genuine PNG files (magic bytes + ImageIO parse)") {
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val rows = Multimodal.encodeMedia(docs).collect()
    assert(rows.length == 24)
    rows.foreach { m =>
      assert(m.payload.take(8).sameElements(pngMagic), s"doc ${m.doc_id} not a PNG")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      val (w, h) = Multimodal.srcDims(m.doc_id)
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("decodeMedia's dims and gray-sum come from the decoded raster and match the field") {
    val metas = Multimodal.decodeMedia(docs).collect()
    assert(metas.length == 24)
    metas.foreach { m =>
      val (w, h) = Multimodal.srcDims(m.doc_id)
      assert(m.width == w && m.height == h && m.n_pixels == w.toLong * h)
      val expected = (0 until w * h).map(i => Multimodal.pix(m.doc_id, i).toLong).sum
      assert(m.sum_gray == expected, s"doc ${m.doc_id} gray-sum drifted through the codec")
    }
  }

  test("resizeMedia is exact nearest-neighbor and re-encodes a decodable PNG") {
    val (tw, th) = (5, 5)
    val out = Multimodal.resizeMedia(docs, tw, th).collect()
    out.foreach { r =>
      val (sw, sh) = Multimodal.srcDims(r.doc_id)
      val expected = (for { y <- 0 until th; x <- 0 until tw }
        yield Multimodal.pix(r.doc_id, (y * sh / th) * sw + (x * sw / tw)).toLong).sum
      assert(r.width == tw && r.height == th && r.sum_gray == expected)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == tw && img.getHeight == th)
      // re-encoded pixels are the sampled ones, not a resampling blur
      val raster = img.getRaster
      val roundTrip = (for { y <- 0 until th; x <- 0 until tw }
        yield raster.getSample(x, y, 0).toLong).sum
      assert(roundTrip == expected)
    }
  }

  test("imageDHash reads the bits off the decoded raster; halves are unsigned 32-bit") {
    val out = Multimodal.imageDHash(docs).collect()
    assert(out.length == 24)
    out.foreach { r =>
      val (w, h) = Multimodal.srcDims(r.doc_id)
      var expected = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = y * h / 8
        val p0 = Multimodal.pix(r.doc_id, sy * w + x * w / 9)
        val p1 = Multimodal.pix(r.doc_id, sy * w + (x + 1) * w / 9)
        if (p1 > p0) expected |= 1L << (y * 8 + x)
      }
      assert(r.dhash_hi == (expected >>> 32) && r.dhash_lo == (expected & 0xffffffffL),
        s"doc ${r.doc_id} hash drifted through the codec")
      assert(r.dhash_hi >= 0 && r.dhash_hi < (1L << 32) &&
        r.dhash_lo >= 0 && r.dhash_lo < (1L << 32))
    }
    // identical pixels hash identically: an image is its own dup
    assert(out.map(r => (r.dhash_hi, r.dhash_lo)).distinct.length <= out.length)
  }

  test("sampleFrames seek-decodes real animated-GIF frames") {
    val frames = Multimodal.sampleFrames(docs, everyN = 2).collect()
    val perDoc = frames.groupBy(_.doc_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq)
    (0L until 24L).foreach { d =>
      val n = Multimodal.clipFrames(d)
      assert(perDoc(d) == (0L until n by 2L).toSeq)
    }
    frames.foreach { f =>
      assert(f.width == 8 && f.height == 8)
      val expected = (0 until 64).map(i => Multimodal.framePix(f.doc_id, f.frame_idx, i).toLong).sum
      assert(f.sum_gray == expected,
        s"doc ${f.doc_id} frame ${f.frame_idx} drifted through the GIF codec")
    }
    // the payload really is a multi-frame GIF container
    val gif = Multimodal.renderGif(5L) // 3 frames
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a")
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    r.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif)))
    assert(r.getNumImages(true) == 3)
  }

  test("decodeAudio parses real WAV containers and reports decoded PCM stats") {
    val metas = Multimodal.decodeAudio(docs).collect()
    assert(metas.length == 24)
    metas.foreach { m =>
      val ns = Multimodal.clipSamples(m.doc_id)
      assert(m.sample_rate == 16000L && m.n_samples == ns.toLong)
      val expected = (0 until ns).map(i => math.abs(Multimodal.audioSample(m.doc_id, i)).toLong).sum
      assert(m.sum_abs == expected, s"doc ${m.doc_id} PCM drifted through the WAV codec")
    }
    // the payload really is a RIFF/WAVE file
    val wav = Multimodal.renderWav(3L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
  }

  test("imageEntropy matches a scalar replay of the pixel field; flat image reads 0") {
    val out = Multimodal.imageEntropy(docs).collect()
      .map(e => e.doc_id -> (e.n_pixels, e.entropy_q9)).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      val (w, h) = Multimodal.srcDims(id)
      val n = w * h
      val hist = new Array[Long](16)
      (0 until n).foreach(i => hist(Multimodal.pix(id, i) / 16) += 1)
      val q = hist.filter(_ > 0).map { c =>
        val p = c.toDouble / n.toDouble
        math.floor(-p * math.log(p) * 1e9).toLong
      }.sum
      assert(out(id) === ((n.toLong, q)), s"doc $id")
      // the cycling pixel field is textured: well above 0
      assert(q > 1000000000L, s"doc $id entropy $q")
    }
  }

  test("audioSilence merges silent-window runs exactly like a scalar replay of the PCM") {
    val spans = Multimodal.audioSilence(docs, win = 16, meanAbsMax = 900L)
      .collect().groupBy(_.doc_id)
    // scalar reference walk over the SAME deterministic samples
    docs.collect().map(_.getLong(0)).foreach { id =>
      val ns = Multimodal.clipSamples(id)
      val sil = (0 until (ns + 15) / 16).map { w =>
        val idx = (w * 16) until math.min((w + 1) * 16, ns)
        val sum = idx.map(i => math.abs(Multimodal.audioSample(id, i)).toLong).sum
        sum < 900L * idx.size
      }
      val expect = Vector.newBuilder[(Long, Long, Long)]
      var start = -1
      sil.zipWithIndex.foreach { case (s, w) =>
        if (s && start < 0) start = w
        if (!s && start >= 0) { expect += ((start.toLong, w - 1L, (w - start).toLong)); start = -1 }
      }
      if (start >= 0) expect += ((start.toLong, sil.size - 1L, (sil.size - start).toLong))
      val got = spans.getOrElse(id, Array.empty).sortBy(_.start_win)
        .map(s => (s.start_win, s.end_win, s.n_windows)).toVector
      assert(got === expect.result(), s"doc $id")
    }
  }
}
