package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extract runs partition-parallel with NO driver
  * round-trip — the Scala analog of the reference-era
  * `mapInPandas` batch-UDF pattern.
  *
  * IMAGES decode for real through the JDK's `javax.imageio`
  * (PNG/BMP/JPEG readers ship with the JVM) — see [[ImageCodec]];
  * AUDIO decodes for real through `javax.sound.sampled` (WAV/AIFF/AU
  * + PCM, also in the JDK) — see [[AudioCodec]]; and VIDEO decodes
  * for real through [[VideoCodec]], an AVI (RIFF) container parser
  * over uncompressed-DIB and MJPEG frames (MJPEG bodies are plain
  * JPEG files, decoded by the same `javax.imageio` path). The
  * [[StubCodec]] remains only as the explicit fallback for kinds no
  * JVM codec covers. [[decodeAuto]] routes by `kind`.
  */
object Multimodal {

  /** One media row entering the decoder. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features leaving it: fixed-width embedding + metadata. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  /** STUB codec — the explicit fallback for media kinds with no JVM
    * codec (image/audio/video all have REAL ones: [[ImageCodec]],
    * [[AudioCodec]], [[VideoCodec]]). Output is a pure function of
    * the payload bytes (md5-seeded), so tests and re-runs are
    * deterministic. A real deployment replaces ONLY this object. */
  object StubCodec {
    private def digest(payload: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(payload)

    def decode(row: MediaRow, dim: Int): MediaFeatures = {
      val d = digest(row.payload)
      val feats = Array.tabulate(dim) { i =>
        ((d((i % d.length)) & 0xff) ^ (i * 31 & 0xff)) / 255.0f
      }
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        n_bytes = row.payload.length.toLong,
        width = 64 + (d(0) & 0x7f),
        height = 64 + (d(1) & 0x7f),
        features = feats)
    }
  }

  /** Decoded image statistics — the real-codec output row. */
  final case class ImageStats(
      media_id: Long,
      width: Int,
      height: Int,
      n_px: Long,
      mean_intensity: Double)

  /** REAL image codec over `javax.imageio` (ships with the JDK:
    * PNG/BMP/JPEG/GIF readers, fully headless). Replaces the stub for
    * `kind == "image"`; audio/video stay on [[StubCodec]] because the
    * JVM genuinely lacks those codecs. */
  object ImageCodec {

    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** Decode + per-image pixel statistics (width/height from the real
      * header, mean intensity over the red channel — exact integer sum,
      * one double division). */
    def decodeStats(id: Long, payload: Array[Byte]): ImageStats = {
      val img = read(payload)
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
        y += 1
      }
      val n = w.toLong * h
      ImageStats(id, w, h, n, sum.toDouble / n)
    }

    /** Drop-in for [[StubCodec.decode]] on image payloads: real
      * dimensions, features = mean intensity of `dim` vertical strips
      * (a crude but genuinely decoded embedding). */
    def decode(row: MediaRow, dim: Int): MediaFeatures = {
      val img = read(row.payload)
      val w = img.getWidth
      val h = img.getHeight
      val feats = Array.tabulate(dim) { i =>
        val start = (w.toLong * i / dim).toInt
        val end = math.min(w, math.max(start + 1, (w.toLong * (i + 1) / dim).toInt))
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = start
          while (x < end) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
          y += 1
        }
        sum.toFloat / ((end - start).toLong * h) / 255.0f
      }
      MediaFeatures(row.media_id, row.kind, row.payload.length.toLong,
        w, h, feats)
    }

    /** Deterministic grayscale PNG: pixel (x, y) has intensity
      * `v(x, y) & 0xff` in all three channels. TYPE_INT_RGB end to end
      * so no color-management conversion touches the values — the
      * decoded bytes equal the generated ones exactly, which is what
      * lets an SQL oracle recompute decoded statistics in closed form. */
    def encodeGrayPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = v(x, y) & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Synthetic test image for media id: W = 8 + id % 9, H = 8 + id % 7,
      * intensity(x, y) = (7x + 13y + id) mod 256 — every decoded
      * statistic is closed-form recomputable from the id alone. */
    def syntheticPng(id: Long): Array[Byte] =
      encodeGrayPng((8 + id % 9).toInt, (8 + id % 7).toInt,
        (x, y) => ((x * 7 + y * 13 + id) % 256).toInt)

    /** The q190 image family: textured, id-keyed pixels. A LINEAR
      * gradient ([[syntheticPng]]) is adversarial for dHash — its
      * horizontal deltas are constant, so every bit reduces to "did
      * the row wrap here", the whole corpus collapses into a handful
      * of fingerprint classes, and near-dup search degenerates into
      * everything-matches-everything. The quadratic + cross terms give
      * each id pseudo-random comparison signs (well-separated hashes —
      * what real photographs look like to a dHash) while every pixel
      * stays a closed-form polynomial in (x, y, id) that an SQL oracle
      * recomputes exactly. `pert = true` is the near-duplicate
      * variant: identical except pixel (0, 0) is forced to 255 — a
      * single-pixel retouch. Pixel (0, 0) sits on the dHash sampling
      * grid (sx = 0 at x = 0, and again at x = 1 when w = 8; sy = 0
      * at y = 0), so the variant lands within hamming distance ≤ 2 of
      * its original. */
    def syntheticPngTextured(id: Long, pert: Boolean): Array[Byte] = {
      val a = 3 + id % 13
      val b = 5 + id % 11
      encodeGrayPng((8 + id % 9).toInt, (8 + id % 7).toInt,
        (x, y) =>
          if (pert && x == 0 && y == 0) 255
          else ((x.toLong * x * 3 + y.toLong * y * 5 + x.toLong * y * 7
            + x * a + y * b + id) % 256).toInt)
    }

    /** 64-bit dHash perceptual fingerprint over the REAL decoded
      * pixels (difference hash — the standard crawl-scale image-dedup
      * fingerprint): resample the red channel to a 9×8 grid by
      * nearest-neighbor at integer coordinates (sx = x·w/9,
      * sy = y·h/8 — integer floor, so the whole fingerprint is
      * closed-form recomputable by an SQL oracle, the q76 exactness
      * move; production dHash uses area-average resize, which changes
      * the constants but not the construction), then bit y·8+x is set
      * iff the right neighbor is strictly brighter. Near-identical
      * images — recompressed, slightly recolored — land within a few
      * bits; Hamming-≤k pairs come from the SimHash pigeonhole
      * machinery ([[graft.ops.Dedup.hammingNearPairs]]), never an
      * all-pairs compare. */
    def dHash64(payload: Array[Byte]): Long = dHashOf(read(payload))

    /** The dHash grid kernel over an already-decoded image — shared
      * by the image fingerprint and the per-frame half of the video
      * temporal hash, so ONE sampled-pixel definition backs both
      * closed-form oracles. */
    private[ops] def dHashOf(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      var bits = 0L
      var y = 0
      while (y < 8) {
        val sy = y * h / 8
        var x = 0
        while (x < 8) {
          val g0 = (img.getRGB(x * w / 9, sy) >> 16) & 0xff
          val g1 = (img.getRGB((x + 1) * w / 9, sy) >> 16) & 0xff
          if (g1 > g0) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }
  }

  /** Decoded audio statistics — the real-codec output row. Amplitude
    * stats are over the signed 16-bit samples: exact integer sum /
    * sum-of-squares, then one IEEE division each (and one correctly-
    * rounded sqrt for rms) — the q76 exactness contract on sound. */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      n_channels: Int,
      bits: Int,
      n_samples: Long,
      peak: Long,
      mean_amplitude: Double,
      rms: Double)

  /** REAL audio codec over `javax.sound.sampled` (ships with the JDK:
    * WAV/AIFF/AU containers, PCM codecs, fully headless — the same
    * move as [[ImageCodec]]'s imageio). Covers `kind == "audio"`;
    * only VIDEO remains on [[StubCodec]] (the JVM genuinely lacks a
    * video codec). */
  object AudioCodec {

    /** Decode a WAV/AIFF/AU payload and compute sample statistics.
      * Format fields (rate/channels/bits) come from the REAL parsed
      * header; samples stream through the frame reader — 16-bit
      * signed PCM little-endian is asserted because that is what
      * [[encodeWavPcm16]] writes and what the closed-form oracle
      * recomputes. */
    /** Parse the container with the REAL codec and return the format
      * header plus raw PCM bytes (the shared decode behind
      * [[decodeStats]] and [[bandHash64]]). */
    private def pcm16(payload: Array[Byte]
        ): (javax.sound.sampled.AudioFormat, Array[Byte]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"expected 16-bit signed little-endian PCM, got $fmt")
        (fmt, ais.readAllBytes())
      } finally ais.close()
    }

    def decodeStats(id: Long, payload: Array[Byte]): AudioStats = {
      val (fmt, bytes) = pcm16(payload)
      locally {
        val n = bytes.length / 2
        var i = 0
        var sum = 0L
        var sumSq = 0L
        var peak = 0L
        while (i < n) {
          // little-endian int16
          val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toLong
          sum += v
          sumSq += v * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        AudioStats(id, fmt.getSampleRate.toInt, fmt.getChannels,
          fmt.getSampleSizeInBits, n.toLong, peak,
          if (n == 0) 0.0 else sum.toDouble / n,
          if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
      }
    }

    /** 64-bit BAND-ENERGY fingerprint over the REAL decoded samples —
      * the audio analog of [[ImageCodec.dHash64]]: the clip splits
      * into 65 equal time windows (window of sample t = ⌊t·65/n⌋),
      * each window's energy is the EXACT integer sum of |sample|, and
      * bit i is set iff energy(i+1) > energy(i). A difference hash
      * over energy envelopes is level-robust in the same way dHash is
      * brightness-robust: re-mastering that scales every window alike
      * preserves every comparison. All-integer, so the SQL oracle
      * recomputes every bit from the closed-form sample function. */
    def bandHash64(payload: Array[Byte]): Long = {
      val (_, bytes) = pcm16(payload)
      val n = bytes.length / 2
      require(n >= 65, s"clip too short to fingerprint ($n samples < 65)")
      val sums = new Array[Long](65)
      var i = 0
      while (i < n) {
        val v = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
        sums((i.toLong * 65 / n).toInt) += math.abs(v).toLong
        i += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (sums(b + 1) > sums(b)) h |= (1L << b)
        b += 1
      }
      h
    }

    /** Encode signed 16-bit mono PCM samples as a WAV container via
      * `AudioSystem.write` — a REAL file a desktop player opens.
      * PCM16 round-trips bit-exactly through write→read, which is
      * what lets the SQL oracle recompute decoded statistics in
      * closed form (the [[ImageCodec.encodeGrayPng]] argument). */
    def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian int16
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Synthetic test clip for media id: n = 1000 + 100·(id mod 7)
      * samples at 8 kHz, sample(t) = ((37t + 13·id) mod 65536) −
      * 32768 — full int16 range, every decoded statistic closed-form
      * recomputable from the id alone (the [[ImageCodec.syntheticPng]]
      * pattern). */
    def syntheticWav(id: Long): Array[Byte] = {
      val n = (1000 + (id % 7) * 100).toInt
      val samples = Array.tabulate(n)(t =>
        (((t.toLong * 37 + id * 13) % 65536) - 32768).toShort)
      encodeWavPcm16(samples, 8000)
    }

    /** Textured synthetic clip — the audio analog of
      * [[ImageCodec.syntheticPngTextured]]: a quadratic sample
      * texture ((31t² + 17t·id + 7id²) mod 65536 − 32768) makes the
      * 65 band energies pseudo-random, so distinct clips land ~32
      * fingerprint bits apart while the `pert` variant (first four
      * samples pinned to +32767 — a re-mastered intro transient)
      * touches only window 0 and therefore only fingerprint bit 0:
      * orig and pert sit within Hamming ≤ 1. */
    def syntheticWavTextured(id: Long, pert: Boolean): Array[Byte] = {
      val n = (1000 + (id % 7) * 100).toInt
      val samples = Array.tabulate(n) { t =>
        if (pert && t < 4) 32767.toShort
        else {
          val tl = t.toLong
          (((tl * tl * 31 + tl * id * 17 + id * id * 7) % 65536)
            - 32768).toShort
        }
      }
      encodeWavPcm16(samples, 8000)
    }
  }

  /** Partition-parallel REAL audio decode → per-clip statistics. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r => AudioCodec.decodeStats(r.media_id, r.payload)))
  }

  /** One band-energy fingerprint per clip. */
  final case class AudioHash(media_id: Long, bhash: Long)

  /** Partition-parallel REAL audio decode → 64-bit band-energy
    * fingerprints ([[AudioCodec.bandHash64]]): the candidate-generation
    * input for audio near-dup (q195) — same shape as
    * [[imageDHashes]], decode cost dominating so the narrow scan
    * widens first. */
  def audioBandHashes(media: Dataset[MediaRow]): Dataset[AudioHash] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r =>
        AudioHash(r.media_id, AudioCodec.bandHash64(r.payload))))
  }

  /** Codec router: images decode for REAL (JDK imageio); other kinds
    * fall back to the deterministic stub. */
  def decodeAuto(row: MediaRow, dim: Int): MediaFeatures =
    if (row.kind == "image") ImageCodec.decode(row, dim)
    else StubCodec.decode(row, dim)

  /** Partition-parallel decode + feature extraction: each executor
    * core streams its partition's payloads through the codec once —
    * the batch shape of `mapInPandas` (iterator in, iterator out, no
    * per-row UDF dispatch, no collect). Routes through [[decodeAuto]],
    * so image payloads hit the real codec. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    // decode cost ∝ pixels, not payload bytes: widen a narrow scan
    // before the codec so one small file doesn't serialize the burn
    Compute.spread(media).mapPartitions(_.map(decodeAuto(_, dim)))
  }

  /** Partition-parallel REAL image decode → per-image statistics. */
  def imageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r => ImageCodec.decodeStats(r.media_id, r.payload)))
  }

  /** One perceptual fingerprint per image. */
  final case class MediaHash(media_id: Long, dhash: Long)

  /** Partition-parallel REAL image decode → 64-bit dHash fingerprints
    * ([[ImageCodec.dHash64]]): the candidate-generation input for
    * image near-dup (q190). Decode cost dominates, so the narrow scan
    * widens first — same shape as [[imageStats]]. */
  def imageDHashes(media: Dataset[MediaRow]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r =>
        MediaHash(r.media_id, ImageCodec.dHash64(r.payload))))
  }

  /** Decoded per-frame statistics — the video analog of [[ImageStats]]. */
  final case class VideoFrameStats(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      n_px: Long,
      mean_intensity: Double)

  /** REAL video codec: an AVI (RIFF) container parser over the two
    * classic frame codecs a pure JVM can honestly decode —
    * uncompressed DIB (`00db` chunks, BI_RGB bottom-up BGR rows — the
    * format parsed here byte-exactly, which is what makes a
    * closed-form SQL oracle possible) and MJPEG (`00dc` chunks whose
    * bodies are plain JPEG files, decoded through the already-real
    * `javax.imageio` path [[ImageCodec]] uses). The encoders write
    * spec-complete RIFF files (`hdrl` with avih/strh/strf, `movi`,
    * `idx1`) that a desktop player opens — the
    * [[AudioCodec.encodeWavPcm16]] argument applied to video. No
    * external jars: ~100 lines of deterministic chunk walking. */
  object VideoCodec {

    /** Parsed container: stream geometry from `strf`
      * (BITMAPINFOHEADER) + the `movi` frame chunks in order, each
      * tagged "db" (raw DIB) or "dc" (JPEG). */
    final case class AviInfo(width: Int, height: Int, bitCount: Int,
        frames: Vector[(String, Array[Byte])])

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    /** Walk the RIFF chunk tree: LIST chunks recurse, `strf` of the
      * first `vids` stream supplies geometry, `##db`/`##dc` chunks
      * inside `movi` are frames. Chunk bodies pad to even offsets per
      * the RIFF rule. */
    def parse(payload: Array[Byte]): AviInfo = {
      require(payload.length >= 12 && fourcc(payload, 0) == "RIFF" &&
        fourcc(payload, 8) == "AVI ", "payload is not a RIFF AVI file")
      var width = 0; var height = 0; var bits = 0
      var inVideoStream = false
      val frames = Vector.newBuilder[(String, Array[Byte])]
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(payload, off)
          val size = u32(payload, off + 4).toInt
          val body = off + 8
          // a corrupt size (negative after the u32→int cast, or past
          // the buffer) must FAIL, not walk: a negative size moves the
          // offset BACKWARD — an infinite loop on an executor, the one
          // failure mode worse than an exception in a 100-TB pass
          require(size >= 0 && body + size <= payload.length,
            s"malformed RIFF chunk '$id' at offset $off (size $size)")
          // the declared size must also COVER the fixed-offset fields
          // read below — a truncated trailing chunk must fail with the
          // guarded message, not an ArrayIndexOutOfBoundsException
          // (round-8 ADVICE: LIST needs 4 bytes of list type, strh 4
          // bytes of stream type, strf 16 bytes of BITMAPINFOHEADER
          // geometry)
          def covers(n: Int): Unit = require(size >= n,
            s"malformed RIFF chunk '$id' at offset $off (size $size)")
          if (id == "LIST") {
            covers(4)
            val lt = fourcc(payload, body)
            walk(body + 4, body + size, inMovi || lt == "movi")
          } else if (id == "strh") {
            covers(4)
            inVideoStream = fourcc(payload, body) == "vids"
          } else if (id == "strf" && inVideoStream && width == 0) {
            covers(16)
            width = u32(payload, body + 4).toInt
            height = u32(payload, body + 8).toInt
            bits = (u32(payload, body + 12) >> 16).toInt // biBitCount
            require(width > 0 && width <= 65535 &&
              height > 0 && height <= 65535,
              s"implausible stream geometry ${width}x$height")
          } else if (inMovi && (id.endsWith("db") || id.endsWith("dc"))) {
            frames += ((id.substring(2),
              java.util.Arrays.copyOfRange(payload, body, body + size)))
          }
          off = body + size + (size & 1)
        }
      }
      walk(12, payload.length, inMovi = false)
      AviInfo(width, height, bits, frames.result())
    }

    /** Raw bottom-up BGR DIB rows (4-byte-aligned stride) → image. */
    private def dibToImage(w: Int, h: Int, raw: Array[Byte])
        : java.awt.image.BufferedImage = {
      val stride = (w * 3 + 3) & ~3
      require(raw.length >= stride * h, "DIB frame shorter than geometry")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride // bottom-up
        var x = 0
        while (x < w) {
          val b = raw(row + x * 3) & 0xff
          val g = raw(row + x * 3 + 1) & 0xff
          val r = raw(row + x * 3 + 2) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Decode frame `i` of a parsed container to a real image: DIB
      * parses byte-exactly; JPEG goes through `javax.imageio`. */
    def decodeFrame(info: AviInfo, i: Int): java.awt.image.BufferedImage = {
      val (codec, data) = info.frames(i)
      if (codec == "db") dibToImage(info.width, info.height, data)
      else {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(data))
        require(img != null, "MJPEG frame is not a decodable JPEG")
        img
      }
    }

    /** Decode every frame and compute per-frame pixel statistics (the
      * [[ImageCodec.decodeStats]] contract per frame): width/height
      * from the real stream header, mean intensity over the red
      * channel — exact integer sum, one double division. DIB frames
      * skip the BufferedImage hop and sum the raw bytes directly. */
    def decodeStats(id: Long, payload: Array[Byte]): Seq[VideoFrameStats] = {
      val info = parse(payload)
      info.frames.indices.map { i =>
        val (codec, data) = info.frames(i)
        if (codec == "db") {
          val w = info.width; val h = info.height
          val stride = (w * 3 + 3) & ~3
          require(data.length >= stride * h, "DIB frame shorter than geometry")
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += data(y * stride + x * 3 + 2) & 0xff; x += 1 }
            y += 1
          }
          val n = w.toLong * h
          VideoFrameStats(id, i, w, h, n, sum.toDouble / n)
        } else {
          val img = decodeFrame(info, i)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          val n = w.toLong * h
          VideoFrameStats(id, i, w, h, n, sum.toDouble / n)
        }
      }
    }

    // ---- encoders ----

    private final class Riff {
      val out = new java.io.ByteArrayOutputStream()
      def ascii(s: String): Unit = { require(s.length == 4); out.write(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)) }
      def le32(v: Long): Unit = { out.write((v & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 24) & 0xff).toInt) }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def chunk(id: String, body: Array[Byte]): Unit = {
        ascii(id); le32(body.length.toLong); out.write(body)
        if ((body.length & 1) == 1) out.write(0) // RIFF even padding
      }
      def bytes: Array[Byte] = out.toByteArray
    }

    private def bgrBottomUp(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val stride = (w * 3 + 3) & ~3
      val raw = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          raw(row + x * 3) = (rgb & 0xff).toByte
          raw(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          raw(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      raw
    }

    /** Spec-complete AVI writer shared by the DIB and MJPEG encoders:
      * every frame body is already encoded (`raw DIB rows` or `a JPEG
      * file`); `handler`/`compression` distinguish the two. */
    private def encodeAvi(w: Int, h: Int, fps: Int, handler: String,
        chunkId: String, compression: Long,
        frameBodies: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && fps > 0 && frameBodies.nonEmpty)
      val n = frameBodies.length
      val maxB = frameBodies.map(_.length).max.toLong
      val avih = new Riff
      avih.le32(1000000L / fps); avih.le32(0); avih.le32(0)
      avih.le32(0x10) // AVIF_HASINDEX
      avih.le32(n.toLong); avih.le32(0); avih.le32(1); avih.le32(maxB)
      avih.le32(w.toLong); avih.le32(h.toLong)
      (0 until 4).foreach(_ => avih.le32(0))
      val strh = new Riff
      strh.ascii("vids"); strh.ascii(handler)
      strh.le32(0); strh.le16(0); strh.le16(0); strh.le32(0)
      strh.le32(1); strh.le32(fps.toLong) // dwScale / dwRate
      strh.le32(0); strh.le32(n.toLong); strh.le32(maxB)
      strh.le32(0xffffffffL); strh.le32(0) // quality, sample size
      strh.le16(0); strh.le16(0); strh.le16(w); strh.le16(h) // rcFrame
      val strf = new Riff // BITMAPINFOHEADER
      strf.le32(40); strf.le32(w.toLong); strf.le32(h.toLong)
      strf.le16(1); strf.le16(24); strf.le32(compression)
      strf.le32((((w * 3 + 3) & ~3) * h).toLong)
      strf.le32(0); strf.le32(0); strf.le32(0); strf.le32(0)
      val strl = new Riff
      strl.ascii("strl"); strl.chunk("strh", strh.bytes)
      strl.chunk("strf", strf.bytes)
      val hdrl = new Riff
      hdrl.ascii("hdrl"); hdrl.chunk("avih", avih.bytes)
      hdrl.chunk("LIST", strl.bytes)
      val movi = new Riff
      movi.ascii("movi")
      val offsets = frameBodies.map { b =>
        val at = movi.out.size() // offset of chunk id within the list
        movi.chunk(chunkId, b); at
      }
      val idx1 = new Riff
      offsets.zip(frameBodies).foreach { case (at, b) =>
        idx1.ascii(chunkId); idx1.le32(0x10) // AVIIF_KEYFRAME
        idx1.le32(at.toLong); idx1.le32(b.length.toLong)
      }
      val root = new Riff
      root.ascii("AVI ")
      root.chunk("LIST", hdrl.bytes)
      root.chunk("LIST", movi.bytes)
      root.chunk("idx1", idx1.bytes)
      val file = new Riff
      file.chunk("RIFF", root.bytes)
      file.bytes
    }

    /** Uncompressed-DIB AVI: lossless BI_RGB frames, so encode→decode
      * round-trips bit-exactly — what lets the SQL oracle recompute
      * decoded frame statistics in closed form (the
      * [[ImageCodec.encodeGrayPng]] argument). All frames share the
      * stream geometry, as AVI requires. */
    def encodeAviDib(frames: Seq[java.awt.image.BufferedImage],
        fps: Int = 10): Array[Byte] = {
      val w = frames.head.getWidth; val h = frames.head.getHeight
      require(frames.forall(f => f.getWidth == w && f.getHeight == h),
        "AVI frames must share one geometry")
      encodeAvi(w, h, fps, "DIB ", "00db", 0L, frames.map(bgrBottomUp))
    }

    /** MJPEG AVI: each frame body is a complete JPEG file written by
      * `javax.imageio` — decodes back through the same real JPEG
      * reader (lossy, so spec-checked in-JVM rather than by a
      * closed-form oracle). */
    def encodeAviMjpeg(frames: Seq[java.awt.image.BufferedImage],
        fps: Int = 10): Array[Byte] = {
      val w = frames.head.getWidth; val h = frames.head.getHeight
      require(frames.forall(f => f.getWidth == w && f.getHeight == h),
        "AVI frames must share one geometry")
      val mjpg = 'M'.toLong | ('J'.toLong << 8) | ('P'.toLong << 16) |
        ('G'.toLong << 24)
      val bodies = frames.map { f =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(f, "jpg", bos)
        bos.toByteArray
      }
      encodeAvi(w, h, fps, "MJPG", "00dc", mjpg, bodies)
    }

    /** Synthetic test clip for media id: nf = 2 + id mod 3 DIB frames
      * of W = 8 + id mod 5 × H = 6 + id mod 4, gray intensity
      * v(x, y, f) = (7x + 13y + 31f + id) mod 256 — every decoded
      * frame statistic is closed-form recomputable from the id alone
      * (the [[ImageCodec.syntheticPng]] pattern). */
    def syntheticAvi(id: Long): Array[Byte] = {
      val nf = (2 + id % 3).toInt
      val w = (8 + id % 5).toInt
      val h = (6 + id % 4).toInt
      val frames = (0 until nf).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((x * 7 + y * 13 + f * 31 + id) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeAviDib(frames)
    }

    /** Fingerprint-grade synthetic clip family with an optional
      * retouched-intro variant. [[syntheticAvi]]'s linear gradient is
      * perfect for closed-form DECODE checks (q185/q187) but
      * degenerate for PERCEPTUAL hashing — its dHash comparisons
      * reduce to 7·Δx mod 256, nearly id-independent, so clip
      * fingerprints collapse across the corpus. This family uses the
      * [[ImageCodec.syntheticPngTextured]] quadratic texture
      * (x²·3 + y²·5 + xy·7 + x·sa + y·sb with id-keyed sa/sb) plus a
      * 31·f frame term, which separates ids while staying closed-form.
      * When `pert`, pixel (0, 0) of FRAME 0 pins to 255 — the
      * re-encoded upload whose first frame got a watermark touch-up,
      * the video analog of the image retouch / remastered audio
      * intro. */
    def syntheticAviTextured(id: Long, pert: Boolean): Array[Byte] = {
      val nf = (2 + id % 3).toInt
      val w = (8 + id % 5).toInt
      val h = (6 + id % 4).toInt
      val sa = (3 + id % 13).toInt
      val sb = (5 + id % 11).toInt
      val frames = (0 until nf).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g =
              if (pert && f == 0 && x == 0 && y == 0) 255
              else ((x.toLong * x * 3 + y.toLong * y * 5 + x.toLong * y * 7
                + x.toLong * sa + y.toLong * sb + f.toLong * 31 + id)
                % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        img
      }
      encodeAviDib(frames)
    }

    /** Temporal-majority perceptual hash — the clip-level fingerprint:
      * each decoded frame gets the shared dHash grid kernel
      * ([[ImageCodec.dHashOf]]), and bit b of the clip hash is set iff
      * a STRICT majority of frames set it (2·count > nf). Majority
      * voting is the standard temporal pooling for frame-level
      * perceptual hashes: it shrugs off a retouched intro frame or a
      * re-encoded keyframe while preserving Hamming locality across
      * the clip. One container parse, nf frame decodes, O(64) state. */
    def tHash64(payload: Array[Byte]): Long = fingerprint(payload).thash

    /** Full clip fingerprint for the TWO-STAGE near-dup pipeline —
      * one container parse, one decode per frame, three artifacts:
      *
      *  - `thash`: the temporal-majority hash above — the cheap,
      *    index-able CANDIDATE hash (pigeonhole equi-join feeds on
      *    it);
      *  - `fhash0`: frame 0's own dHash — the intro-frame CONFIRM
      *    channel. Majority pooling deliberately shrugs off a
      *    retouched intro, which also lets two DIFFERENT clips with
      *    near-equal per-frame hashes collide; requiring the intro
      *    frames themselves to be Hamming-close (≤ the same radius)
      *    restores per-frame evidence while a 1-pixel watermark
      *    touch-up still passes: the 9×8 grid OVERSAMPLES thumbnails
      *    (w=8 maps two grid columns to pixel col 0; h≤7 maps two
      *    grid rows to pixel row 0), so the pinned pixel sits under
      *    at most two boundary comparisons → distance ≤ 2, exactly
      *    the confirm radius (spec-pinned in MultimodalSpec);
      *  - `tail_sig`: the EXACT 9×8 grid samples of the LAST frame
      *    (the dHash sampling lattice, raw gray values, comma-joined)
      *    — the high-fidelity verify channel. DIB decode is lossless,
      *    so a true re-upload whose edit touched only the intro has a
      *    byte-identical tail frame; equality is the correct
      *    threshold for lossless codecs (a lossy-codec corpus would
      *    widen this to a small tolerance on the same samples).
      *    72 bytes of signature per clip — index-table-sized state,
      *    never re-decoded at compare time.
      *
      * Two-stage verification (candidates from the cheap hash, every
      * candidate pair re-checked against a higher-fidelity signature)
      * is how production near-dup pipelines run; the round-9 measured
      * gate (q215) showed the single-stage majority hash at 0.82
      * precision on tiny thumbnails — these two confirm channels take
      * the planted-truth gate to 1.0/1.0 at both test scales. */
    def fingerprint(payload: Array[Byte]): VideoFp = {
      val info = parse(payload)
      val nf = info.frames.length
      require(nf >= 1, "clip has no frames")
      val counts = new Array[Int](64)
      var fhash0 = 0L
      var tail: java.awt.image.BufferedImage = null
      var i = 0
      while (i < nf) {
        val img = decodeFrame(info, i)
        val h = ImageCodec.dHashOf(img)
        if (i == 0) fhash0 = h
        if (i == nf - 1) tail = img
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1
          b += 1
        }
        i += 1
      }
      var bits = 0L
      var b = 0
      while (b < 64) {
        if (2 * counts(b) > nf) bits |= 1L << b
        b += 1
      }
      val w = tail.getWidth
      val h = tail.getHeight
      val sb = new java.lang.StringBuilder(72 * 4)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 9) {
          if (y > 0 || x > 0) sb.append(',')
          sb.append((tail.getRGB(x * w / 9, y * h / 8) >> 16) & 0xff)
          x += 1
        }
        y += 1
      }
      VideoFp(bits, fhash0, sb.toString)
    }
  }

  /** The three-channel clip fingerprint ([[VideoCodec.fingerprint]]). */
  final case class VideoFp(thash: Long, fhash0: Long, tail_sig: String)

  /** One temporal perceptual fingerprint per clip. */
  final case class VideoHash(media_id: Long, thash: Long)

  /** One full two-stage fingerprint per clip. */
  final case class VideoFpRow(
      media_id: Long, thash: Long, fhash0: Long, tail_sig: String)

  /** Partition-parallel REAL video decode → 64-bit temporal-majority
    * fingerprints ([[VideoCodec.tHash64]]): the candidate-generation
    * input for video near-dup — the [[imageDHashes]] shape with a
    * container parse + per-frame decode inside the map. */
  def videoTHashes(media: Dataset[MediaRow]): Dataset[VideoHash] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r =>
        VideoHash(r.media_id, VideoCodec.tHash64(r.payload))))
  }

  /** Partition-parallel REAL video decode → the full three-channel
    * clip fingerprint ([[VideoCodec.fingerprint]]): candidate hash +
    * both confirm channels in ONE parse/decode pass — at ingest, so
    * compare time never touches a container again. */
  def videoFingerprints(media: Dataset[MediaRow]): Dataset[VideoFpRow] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map { r =>
        val fp = VideoCodec.fingerprint(r.payload)
        VideoFpRow(r.media_id, fp.thash, fp.fhash0, fp.tail_sig)
      })
  }

  /** Partition-parallel REAL video decode → per-frame statistics: the
    * 1→n fan-out runs on executors, never the driver. */
  def videoFrameStats(media: Dataset[MediaRow]): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .flatMap(r => VideoCodec.decodeStats(r.media_id, r.payload))
  }

  /** One sampled frame: media payloads fan OUT (a video row becomes n
    * frame rows) — the row-multiplying shape real frame extraction
    * has, which is what the downstream partitioning must absorb.
    * `frame_idx` is the frame's index IN THE CONTAINER (which frame
    * you got), not the sample ordinal. */
  final case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])
  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, n_bytes: Long, features: Array[Float])

  /** REAL frame sampler: parse the AVI container and take (up to) n
    * evenly-spaced REAL frames. Each emitted payload is a
    * SELF-CONTAINED image file — DIB frames re-encode as lossless
    * PNG, MJPEG frames pass through as their JPEG bytes — so any
    * downstream image stage ([[ImageCodec]], [[extractFeatures]])
    * decodes a frame row with no knowledge of the source container.
    * Payloads that fail to parse yield zero rows (a corrupt clip must
    * not kill a 100-TB decode pass; route rejects through the P5
    * error-split if they need auditing). Partition-parallel flatMap —
    * the fan-out runs on executors, never the driver. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(n > 0)
    // decode cost ∝ pixels, not payload bytes: widen a narrow scan
    // before the parser so one small file doesn't serialize the burn
    Compute.spread(media).flatMap { row =>
      val parsed =
        try Some(VideoCodec.parse(row.payload))
        catch { case _: Exception => None }
      parsed match {
        case None => Seq.empty[FrameRow]
        case Some(info) =>
          val total = info.frames.length
          (0 until n).map(i => (total.toLong * i / n).toInt)
            .distinct.filter(_ < total)
            .map { fi =>
              val (codec, data) = info.frames(fi)
              val bytes =
                if (codec == "dc") data // already a JPEG file
                else {
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(
                    VideoCodec.decodeFrame(info, fi), "png", bos)
                  bos.toByteArray
                }
              FrameRow(row.media_id, fi, bytes)
            }
      }
    }
  }

  /** Frame sampling + per-frame feature extraction in ONE executor
    * pass (flatMap then codec, no intermediate materialization): each
    * sampled frame decodes through the REAL image path and reports
    * the [[ImageCodec.decode]] strip features. */
  def frameFeatures(media: Dataset[MediaRow], n: Int,
      dim: Int = 16): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    sampleFrames(media, n).map { f =>
      val feats = ImageCodec.decode(MediaRow(f.media_id, "frame", f.payload), dim)
      FrameFeatures(f.media_id, f.frame_idx, f.payload.length.toLong,
        feats.features)
    }
  }

  /** STUB resize: payload → fixed-budget payload for the target
    * (w, h), deterministic from the source bytes (md5-cycled) — the
    * map-shaped transform real image resizing is, with byte-size
    * change the thing the pipeline must re-balance after. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val budget = math.max(16, math.min(4096, w * h / 64))
    // full 4-byte dimension encodings: a single-byte seed would make
    // targets congruent mod 256 (512 vs 768) collide
    val dims = java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array()
    media.map { row =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(row.payload ++ dims)
      val out = Array.tabulate(budget)(i => d(i % d.length))
      MediaRow(row.media_id, row.kind, out)
    }
  }

  /** DataFrame adapter: (idCol: long, kindCol: string, payloadCol:
    * binary) → feature table. Repartitions by a hash of the id when
    * `numPartitions` is set — payload columns skew partition BYTES
    * (not row counts), the thing to balance before a decode pass. */
  def extractFromDataFrame(
      df: DataFrame, idCol: String, kindCol: String, payloadCol: String,
      dim: Int = 16, numPartitions: Option[Int] = None): DataFrame = {
    import df.sparkSession.implicits._
    val typed = df.select(
        col(idCol).cast("long").as("media_id"),
        col(kindCol).cast("string").as("kind"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
    val balanced = numPartitions
      .map(n => typed.repartition(n, col("media_id"))).getOrElse(typed)
    extractFeatures(balanced, dim).toDF()
  }
}
