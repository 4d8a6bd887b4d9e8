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
  * (PNG/BMP/JPEG readers ship with the JVM) — see [[ImageCodec]] —
  * and AUDIO decodes for real through `javax.sound.sampled`
  * (WAV/AIFF/AU + PCM, also in the JDK) — see [[AudioCodec]]. Only
  * VIDEO remains on the clearly-marked deterministic [[StubCodec]]
  * (the JVM ships no video codec); everything around it — schema,
  * batch iteration, partition parallelism, typed Encoders — is the
  * real pipeline a production codec would drop into. [[decodeAuto]]
  * routes by `kind`.
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

  /** STUB codec — stands in for a real image/audio decoder. Output is
    * a pure function of the payload bytes (md5-seeded), so tests and
    * re-runs are deterministic. A real deployment replaces ONLY this
    * object. */
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
    def decodeStats(id: Long, payload: Array[Byte]): AudioStats = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"expected 16-bit signed little-endian PCM, got $fmt")
        val bytes = ais.readAllBytes()
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
      } finally ais.close()
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
  }

  /** Partition-parallel REAL audio decode → per-clip statistics. */
  def audioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    Compute.spread(media)
      .mapPartitions(_.map(r => AudioCodec.decodeStats(r.media_id, r.payload)))
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

  /** One sampled frame: media payloads fan OUT (a video row becomes n
    * frame rows) — the row-multiplying shape real frame extraction
    * has, which is what the downstream partitioning must absorb. */
  final case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])
  final case class FrameFeatures(
      media_id: Long, frame_idx: Int, n_bytes: Long, features: Array[Float])

  /** STUB frame sampler: n evenly-spaced byte windows of the payload
    * stand in for decoded frames (deterministic; a real video codec
    * replaces only the window extraction). Partition-parallel flatMap —
    * the 1→n fan-out runs on executors, never the driver. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(n > 0)
    media.flatMap { row =>
      val len = row.payload.length
      (0 until n).map { i =>
        val start = if (len == 0) 0 else (len.toLong * i / n).toInt
        val end = if (len == 0) 0
          else math.max(start + 1, (len.toLong * (i + 1) / n).toInt)
        FrameRow(row.media_id, i,
          java.util.Arrays.copyOfRange(row.payload, start, math.min(end, len)))
      }
    }
  }

  /** Frame sampling + per-frame feature extraction in ONE executor
    * pass (flatMap then codec, no intermediate materialization). */
  def frameFeatures(media: Dataset[MediaRow], n: Int,
      dim: Int = 16): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    sampleFrames(media, n).map { f =>
      val asMedia = MediaRow(f.media_id, "frame", f.payload)
      val feats = StubCodec.decode(asMedia, dim)
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
