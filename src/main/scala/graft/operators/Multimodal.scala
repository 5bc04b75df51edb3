package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension scope): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batched per-partition passes.
  *
  * The decode pass is REAL as of round 8: `javax.imageio.ImageIO` (JDK
  * built-in, zero extra dependencies) parses PNG/BMP/GIF/JPEG payloads
  * to actual width/height/channel-count/frame-count, with the format
  * sniffed from the payload's magic bytes. `synthMediaTable` generates
  * deterministic multi-format images (including multi-frame GIFs) keyed
  * by doc_id, so the oracle can verify the decode end-to-end: the
  * generation parameters are pure arithmetic over doc_id, and the query
  * only passes if encode→decode round-trips them exactly. Payloads that
  * no installed codec recognises fall back to the original deterministic
  * stub (format "raw"), keeping the pipeline total.
  */
object Multimodal {

  /** Typed metadata row produced by the decode pass. */
  final case class MediaMeta(doc_id: Long, width: Long, height: Long,
                             channels: Long, n_frames: Long, payload_len: Long,
                             content_hash: String, format: String)

  /** DECODE STUB — deterministic fallback for payloads no installed
    * codec recognises (e.g. raw text standing in for media). Derives
    * plausible dimensions from byte length so results stay
    * oracle-checkable.
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long, Long) = {
    val n = payload.length.toLong
    (64L + n % 577L, 64L + (n * 31L) % 417L, 3L, 1L + n % 7L)
  }

  /** Sniff the container format from magic bytes (the cheap pre-pass a
    * production pipeline runs before routing to a codec).
    */
  def sniffFormat(payload: Array[Byte]): String =
    if (payload.length >= 8 &&
        (payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') "png"
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') "bmp"
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == '8') "gif"
    else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) "jpeg"
    else "raw"

  /** Real image decode via the JDK's ImageIO: (width, height, channels,
    * n_frames), or None when no installed reader claims the payload.
    * Channels = the color model's color component count (3 for RGB and
    * palette formats, 1 for grayscale); n_frames counts GIF animation
    * frames via the reader's image index scan.
    */
  private def decodeImage(payload: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in, false, false)
          val frames = r.getNumImages(true).toLong
          val img = r.read(0)
          Some((img.getWidth.toLong, img.getHeight.toLong,
                img.getColorModel.getNumColorComponents.toLong, frames))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally in.close()
  }

  private def md5Hex(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    d.map(b => f"$b%02x").mkString
  }

  /** Batched decode pass: binary payload column → typed metadata.
    * mapPartitions so codec init (ImageIO registry scan, cache
    * disabling) happens once per partition, not once per row.
    */
  def decodeMeta(media: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false) // per-partition codec init: no temp-file cache
        rows.map { case (id, payload) =>
          val fmt = sniffFormat(payload)
          decodeImage(payload) match {
            case Some((w, h, c, f)) =>
              MediaMeta(id, w, h, c, f, payload.length.toLong, md5Hex(payload), fmt)
            case None =>
              val (w, h, c, f) = decodeStub(payload)
              MediaMeta(id, w, h, c, f, payload.length.toLong, md5Hex(payload), "raw")
          }
        }
      }
  }

  /** Typed row produced by the resize pass. `thumb_w`/`thumb_h` are the
    * dimensions READ BACK from the re-encoded thumbnail, not the
    * requested ones — the row only matches the oracle if decode →
    * scale → PNG-encode → decode really round-trips.
    */
  final case class ThumbMeta(doc_id: Long, width: Long, height: Long,
                             thumb_w: Long, thumb_h: Long, thumb_len: Long)

  /** Real thumbnail resize (JDK-only: ImageIO decode, Graphics2D
    * bilinear scale, PNG re-encode) — the canonical image-preprocessing
    * step of a multimodal training pipeline, in the same
    * per-partition-codec-init shape as [[decodeMeta]]. Target
    * dimensions follow the exact integer fit-to-box rule
    * `t = max(1, side·maxDim div max(w,h))`, so a SQL oracle can
    * recompute them from the generation parameters; the emitted
    * dimensions come from RE-DECODING the produced PNG (self-verifying
    * plumbing). Undecodable payloads are dropped (the honest contract:
    * a thumbnail pass yields thumbnails, not stub rows).
    */
  def resizeThumbs(media: DataFrame, maxDim: Int, idCol: String = "doc_id",
                   payloadCol: String = "payload"): Dataset[ThumbMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, payload) =>
          Option(ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val m = math.max(w, h)
            val tw = math.max(1, w * maxDim / m)
            val th = math.max(1, h * maxDim / m)
            val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
            g.dispose()
            val baos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", baos)
            val thumb = baos.toByteArray
            val re = ImageIO.read(new ByteArrayInputStream(thumb))
            ThumbMeta(id, w.toLong, h.toLong,
              re.getWidth.toLong, re.getHeight.toLong, thumb.length.toLong)
          }
        }
      }
  }

  /** Frame sampling over decoded metadata: one row per frame with its
    * deterministic byte offset — the plumbing a video frame-extraction
    * pass would use (explode stays columnar; a real extractor would then
    * mapPartitions over (payload, offset) slices).
    */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta.select(col("doc_id"), col("payload_len"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * expr("payload_len div n_frames")).as("frame_offset"))

  /** Deterministic generation parameters for `synthMediaTable`, pure
    * arithmetic over doc_id so a SQL oracle can recompute them:
    * (width, height, format, n_frames, grayscale).
    */
  def synthSpec(id: Long): (Int, Int, String, Int, Boolean) = {
    val w = (8 + id % 25).toInt
    val h = (8 + (id * 3) % 17).toInt
    val fmt = (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" }
    val frames = if (fmt == "gif") (1 + id % 4).toInt else 1
    val gray = fmt == "png" && id % 2 == 0
    (w, h, fmt, frames, gray)
  }

  /** Encode one synthetic image for doc_id: PNG (RGB or grayscale), BMP,
    * or GIF (multi-frame when frames > 1), all via the JDK's ImageIO
    * writers. Pixel values are a deterministic function of
    * (id, frame, x, y).
    */
  def encodeSynthetic(id: Long): Array[Byte] = {
    val (w, h, fmt, frames, gray) = synthSpec(id)
    val typ = if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR
    def frame(k: Int): BufferedImage = {
      val img = new BufferedImage(w, h, typ)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (id * 31 + k * 17 + y * w + x).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      img
    }
    val bos = new ByteArrayOutputStream()
    if (fmt == "gif" && frames > 1) {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val out = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(out)
      writer.prepareWriteSequence(null)
      (0 until frames).foreach { k =>
        writer.writeToSequence(new IIOImage(frame(k), null, null), null)
      }
      writer.endWriteSequence()
      out.flush()
      writer.dispose()
      out.close()
    } else {
      ImageIO.write(frame(0), fmt, bos)
    }
    bos.toByteArray
  }

  /** Synthetic media table with REAL image payloads: one deterministic
    * PNG/BMP/GIF per document id (multi-frame GIFs every third id).
    * Same binary-column shape a production media scan would have; the
    * per-partition mapPartitions is where codec init amortises.
    *
    * `where` filters doc_id BEFORE encoding (r15): Catalyst cannot push
    * a predicate through the typed mapPartitions, so a caller that only
    * wants the BMP third must say so here or pay 3× the encode work —
    * the stand-in for partition/predicate pruning on a real media lake.
    */
  def synthMediaTable(s: SparkSession, dir: String,
                      where: Column = lit(true)): DataFrame = {
    import s.implicits._
    graft.sources.Tables.parquet(s, s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).filter(where).as[Long]
      .mapPartitions { ids =>
        ImageIO.setUseCache(false) // per-partition codec init
        ids.map(id => (id, encodeSynthetic(id)))
      }.toDF("doc_id", "payload")
  }

  /** Demo media table: documents' text bytes standing in for opaque
    * payloads (exercises the sniff-miss → stub fallback path).
    */
  def fakeMediaTable(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.parquet(s, s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  // ------------------------------------------------------------- audio

  /** Typed metadata row produced by the audio decode pass. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                             n_frames: Long, duration_ms: Long,
                             payload_len: Long, format: String)

  /** Deterministic WAV generation parameters, pure arithmetic over
    * doc_id: (sampleRate, channels, nFrames).
    */
  def audioSpec(id: Long): (Int, Int, Int) =
    (8000 * (1 + id % 3).toInt, 1 + (id % 2).toInt, 500 + ((id * 7) % 1000).toInt)

  /** The real JDK audio codecs, resolved ONCE per JVM. The
    * `AudioSystem` facade re-resolves its SPI providers through a
    * weakly-referenced registry cache on every call — fine on a plain
    * classpath, but inside an executor (multi-hundred-jar classpath,
    * allocation-heavy tasks collecting the weak cache) the rescan ran
    * almost per row and cost ~30× the actual codec work (measured at
    * sf1: 6 s to synthesize 50k WAVs that take 1.6 s of codec CPU —
    * PLANS_r14). These are the same provider objects the facade hands
    * back; only the per-call registry walk is gone. Providers are
    * stateless by SPI contract, so sharing across tasks is exactly as
    * safe as `AudioSystem` itself.
    */
  private lazy val wavWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader).asScala.toList
  }
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader],
      classOf[javax.sound.sampled.AudioSystem].getClassLoader).asScala.toList
  }

  /** Encode one synthetic PCM-16 WAV for doc_id via the JDK's
    * javax.sound.sampled (zero extra dependencies): a deterministic
    * sawtooth whose samples are a function of (id, channel, frame).
    */
  def encodeSyntheticWav(id: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (rate, channels, frames) = audioSpec(id)
    val bytesPerFrame = 2 * channels
    val pcm = new Array[Byte](frames * bytesPerFrame)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val v = (((id * 131 + c * 17 + f * 37) % 65536L) - 32768L).toShort
        val off = f * bytesPerFrame + c * 2
        pcm(off) = (v & 0xff).toByte          // little-endian PCM16
        pcm(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      f += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais)) match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, bos)
      case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    }
    ais.close()
    bos.toByteArray
  }

  /** Synthetic audio table with REAL WAV payloads keyed by doc_id. */
  def synthAudioTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.sources.Tables.parquet(s, s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        // audio codec init would happen here, once per partition
        ids.map(id => (id, encodeSyntheticWav(id)))
      }.toDF("doc_id", "payload")
  }

  /** Real WAV header decode via javax.sound.sampled: sample rate,
    * channel count, frame count and integer-exact duration
    * (frames·1000 / rate). None when no installed reader claims the
    * payload.
    */
  /** Adaptive dispatch: the reader that claimed the LAST payload is
    * tried first. Readers claim disjoint formats (magic-byte checks),
    * so the result is order-independent — but order decides how many
    * `UnsupportedAudioFileException`s the hot loop pays, and each
    * throw fills a stack trace whose cost scales with stack DEPTH:
    * trivial on a plain JVM's ~5 frames, ~30 µs inside a Spark task's
    * deep stack. On a homogeneous corpus (the common case) the cache
    * makes the steady state zero-exception; a mixed corpus pays one
    * miss per format flip. Measured at sf1: 50k decodes 5.5 s → ~1 s.
    */
  @volatile private var preferredReader: javax.sound.sampled.spi.AudioFileReader = _

  private def decodeAudio(payload: Array[Byte]): Option[(Long, Long, Long)] = {
    // first reader that claims the payload wins (AudioSystem's own
    // dispatch rule); a fresh ByteArrayInputStream per attempt stands
    // in for the facade's mark/reset discipline
    def tryOne(r: javax.sound.sampled.spi.AudioFileReader): Option[(Long, Long, Long)] =
      try {
        val ais = r.getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong, ais.getFrameLength))
        } finally ais.close()
      } catch { case _: Exception => None }
    val pref = preferredReader
    if (pref != null) {
      val hit = tryOne(pref)
      if (hit.isDefined) return hit
    }
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      if (r ne pref) {
        val hit = tryOne(r)
        if (hit.isDefined) { preferredReader = r; return hit }
      }
    }
    if (audioReaders.nonEmpty) None
    else try { // no SPI providers visible: fall back to the facade
      import javax.sound.sampled.AudioSystem
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        Some((fmt.getSampleRate.toLong, fmt.getChannels.toLong, ais.getFrameLength))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Batched audio decode pass: binary payload column → typed metadata;
    * undecodable payloads fall back to a deterministic stub (format
    * "raw", byte-length-derived fields) so the pipeline stays total.
    */
  def decodeAudioMeta(media: DataFrame, idCol: String = "doc_id",
                      payloadCol: String = "payload"): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val isWav = payload.length >= 12 &&
            payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
            payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E'
          decodeAudio(payload) match {
            case Some((rate, ch, frames)) =>
              AudioMeta(id, rate, ch, frames, frames * 1000L / rate,
                payload.length.toLong, if (isWav) "wav" else "audio")
            case None =>
              val n = payload.length.toLong
              AudioMeta(id, 8000L, 1L, n, n * 1000L / 8000L, n, "raw")
          }
        }
      }
  }

  // ----------------------------------------------------- perceptual hash

  /** dHash row: the 64 gradient bits packed as two 32-bit halves
    * (hi = bits 32..63) — neither engine needs the overflowing
    * `1 << 63` signed shift, and band keys fall out of the halves.
    */
  final case class DHashRow(doc_id: Long, width: Long, height: Long,
                            hash_hi: Long, hash_lo: Long)

  /** Difference-hash (dHash) over REAL decoded images — the standard
    * perceptual fingerprint for image near-dup detection (public
    * knowledge; 64 bits = sign of adjacent column-block luminance
    * gradients on a 9×8 grid). All arithmetic is exact integer:
    * luminance `(299r+587g+114b) div 1000`, block membership by the
    * exact floor-boundary inverse (`bi = (9x+8) div w`), block means
    * on the milli lattice — so a SQL oracle recomputes the identical
    * hash from the synthetic pixel formula, proving decode → hash
    * end-to-end. Images narrower than the 9×8 grid yield no row.
    *
    * Scale shape: one mapPartitions decode pass (codec init amortised
    * per partition, the [[decodeMeta]] contract), emitting 4 longs per
    * image — the hash table is corpus-row-sized, never pixel-sized,
    * and downstream near-dup joins band on 16-bit hash slices.
    */
  def dHash(media: DataFrame, idCol: String = "doc_id",
            payloadCol: String = "payload"): Dataset[DHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, payload) =>
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(payload)))
            catch { case _: Exception => None }
          img.flatMap { im =>
            val w = im.getWidth
            val h = im.getHeight
            if (w < 9 || h < 8) None
            else {
              val sums = Array.ofDim[Long](8, 9)
              val cnts = Array.ofDim[Long](8, 9)
              var y = 0
              while (y < h) {
                val bj = ((8 * y + 7) / h)
                var x = 0
                while (x < w) {
                  val bi = ((9 * x + 8) / w)
                  val p = im.getRGB(x, y)
                  val lum = (((p >> 16) & 255) * 299L +
                    ((p >> 8) & 255) * 587L + (p & 255) * 114L) / 1000L
                  sums(bj)(bi) += lum
                  cnts(bj)(bi) += 1
                  x += 1
                }
                y += 1
              }
              var hi = 0L
              var lo = 0L
              var j = 0
              while (j < 8) {
                var i = 0
                while (i < 8) {
                  val a = sums(j)(i) * 1000L / cnts(j)(i)
                  val b = sums(j)(i + 1) * 1000L / cnts(j)(i + 1)
                  if (b > a) {
                    val k = j * 8 + i
                    if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
                  }
                  i += 1
                }
                j += 1
              }
              Some(DHashRow(id, w.toLong, h.toLong, hi, lo))
            }
          }
        }
      }
  }

  /** Distinct-hash table off a (doc_id, hash_hi, hash_lo) frame:
    * one row per DISTINCT 64-bit hash with its representative (= min)
    * doc id and its clique size. The r15 collapse: every downstream
    * band join and CC loop runs on hash cardinality, not corpus
    * cardinality — the fix for the closed-alphabet fixture's measured
    * super-linearity (the synthetic pixel formula yields few distinct
    * hashes, so doc-level banding degenerated into near-cliques; a
    * hash-diverse real corpus collapses ~1:1 and loses nothing).
    */
  private def distinctHashes(docsH: DataFrame): DataFrame =
    CachePool.track(docsH.groupBy(col("hash_hi"), col("hash_lo"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt")))

  /** Near-pairs over DISTINCT hashes via byte-band blocking: two
    * hashes within hamming ≤ 7 MUST share one of their 8 bytes
    * (pigeonhole), so candidates come from an equi-join on (band,
    * byte) over the distinct-hash table, verified by exact popcount.
    * Output: (ha, la, hb, lb, rep_a, rep_b, hamming), one row per
    * unordered hash pair ((ha,la) < (hb,lb) lexicographically).
    */
  private def hashPairs(distinctH: DataFrame, maxHamming: Int): DataFrame = {
    val banded = CachePool.track(distinctH
      .select(col("hash_hi"), col("hash_lo"), col("rep"),
        explode(array((0 until 8).map { k =>
          struct(lit(k).as("k"),
            (if (k < 4) shiftright(col("hash_lo"), 8 * k)
             else shiftright(col("hash_hi"), 8 * (k - 4)))
              .bitwiseAND(lit(255L)).as("b"))
        }: _*)).as("band"))
      .select(col("hash_hi"), col("hash_lo"), col("rep"),
        col("band.k").as("k"), col("band.b").as("b")))
    banded.as("x").join(banded.as("y"),
        col("x.k") === col("y.k") && col("x.b") === col("y.b") &&
          (col("x.hash_hi") < col("y.hash_hi") ||
            (col("x.hash_hi") === col("y.hash_hi") &&
              col("x.hash_lo") < col("y.hash_lo"))))
      .select(col("x.hash_hi").as("ha"), col("x.hash_lo").as("la"),
        col("y.hash_hi").as("hb"), col("y.hash_lo").as("lb"),
        col("x.rep").as("rep_a"), col("y.rep").as("rep_b"))
      .distinct()
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) + bit_count(la ^ lb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Image near-dup pairs over a dHash table. Semantics unchanged from
    * the doc-level banding (the oracle pins them): all doc pairs whose
    * hashes are within `maxHamming`, output (id_a < id_b, hamming),
    * ordered. Since r15 the candidate join runs on DISTINCT hashes
    * ([[hashPairs]]); doc pairs come from an output-sized expansion —
    * cross-hash pairs via two hash-keyed joins, same-hash cliques via
    * one equi-self-join at hamming 0.
    *
    * Scale: the hash table is corpus-row-sized (4 longs per image);
    * the band join is distinct-hash-sized; the expansion is bounded by
    * the result itself, which a dedup pipeline consumes pair by pair.
    */
  def dHashNearDup(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "byte-band blocking is pigeonhole-lossless only up to hamming 7")
    val docsH = CachePool.track(
      hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo")))
    val hp = hashPairs(distinctHashes(docsH), maxHamming)
    val cross = hp
      .join(docsH.select(col("doc_id").as("ia"),
        col("hash_hi").as("ha"), col("hash_lo").as("la")), Seq("ha", "la"))
      .join(docsH.select(col("doc_id").as("ib"),
        col("hash_hi").as("hb"), col("hash_lo").as("lb")), Seq("hb", "lb"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    val intra = docsH.as("x").join(docsH.as("y"),
        col("x.hash_hi") === col("y.hash_hi") &&
          col("x.hash_lo") === col("y.hash_lo") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0L).as("hamming"))
    cross.unionByName(intra).orderBy("id_a", "id_b")
  }

  /** Image near-dup GROUPS: connected components over the
    * [[dHashNearDup]] pair graph, WITHOUT materializing the doc-level
    * pairs — the CC loop ([[Dedup.nearDupGroups]]) runs on the
    * distinct-HASH graph (nodes = representative doc ids, edges =
    * near-hash pairs plus a self-loop per ≥2-doc clique), then each
    * doc inherits its hash's component label. Identical output to
    * `nearDupGroups(dHashNearDup(hashes).select(id_a, id_b))`: a
    * component's group_id is the min doc id in it, which is the min
    * REPRESENTATIVE (reps are per-hash min doc ids), and exactly the
    * docs appearing in ≥1 pair — a near-hash edge or a shared hash —
    * get a row. Output (UNORDERED): doc_id, group_id.
    */
  def dHashGroups(hashes: DataFrame, maxHamming: Int = 7): DataFrame = {
    val docsH = CachePool.track(
      hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo")))
    val distinctH = distinctHashes(docsH)
    val hp = hashPairs(distinctH, maxHamming)
    val edges = hp.select(col("rep_a").as("id_a"), col("rep_b").as("id_b"))
      .unionByName(distinctH.filter(col("cnt") >= 2)
        .select(col("rep").as("id_a"), col("rep").as("id_b")))
    val repGroups = graft.operators.Dedup.nearDupGroups(edges)
      .select(col("doc_id").as("rep"), col("group_id"))
    docsH.join(distinctH.select(col("hash_hi"), col("hash_lo"), col("rep")),
        Seq("hash_hi", "hash_lo"))
      .join(repGroups, Seq("rep"))
      .select(col("doc_id"), col("group_id"))
  }
}
