package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: partition-parallel decode with typed schema") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .limit(100)
    val out = Multimodal.extractFromDataFrame(
      docs, idCol = "doc_id", kindCol = "source", payloadCol = "text",
      dim = 8, numPartitions = Some(4))

    assert(out.columns.toSeq == Seq("media_id", "kind", "n_bytes", "width",
      "height", "features"))
    assert(out.count() == 100)
    // deterministic: same payload -> same features, independent of
    // partitioning
    val a = out.filter($"media_id" === 1).select("features")
      .as[Array[Float]].head()
    val b = Multimodal.extractFromDataFrame(docs.repartition(7),
        "doc_id", "source", "text", dim = 8)
      .filter($"media_id" === 1).select("features").as[Array[Float]].head()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
    // feature width/height derived from content hash, in range
    val wh = out.select("width", "height").as[(Int, Int)].collect()
    assert(wh.forall { case (w, h) => w >= 64 && w < 192 && h >= 64 && h < 192 })
  }

  test("VideoCodec: DIB AVI encode→decode round-trips closed-form stats") {
    import Multimodal._
    // id=5: nf = 2+5%3 = 4, w = 8+5%5 = 8, h = 6+5%4 = 7
    val stats = VideoCodec.decodeStats(5L, VideoCodec.syntheticAvi(5L))
    assert(stats.length == 4)
    assert(stats.forall(s => s.width == 8 && s.height == 7 && s.n_px == 56))
    stats.foreach { s =>
      val expected = (for (y <- 0 until 7; x <- 0 until 8)
        yield (x * 7 + y * 13 + s.frame_idx * 31 + 5) % 256).sum.toDouble / 56
      assert(s.mean_intensity == expected, s"frame ${s.frame_idx}")
    }
  }

  test("VideoCodec: MJPEG frames decode through the container exactly " +
      "as the same JPEG bytes decode standalone") {
    import Multimodal._
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) {
        val g = (x * 3 + y * 5 + f * 17) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val avi = VideoCodec.encodeAviMjpeg(frames)
    val info = VideoCodec.parse(avi)
    assert(info.frames.length == 3 && info.frames.forall(_._1 == "dc"))
    val viaContainer = VideoCodec.decodeStats(9L, avi)
    info.frames.zip(viaContainer).foreach { case ((_, jpeg), s) =>
      val direct = ImageCodec.decodeStats(9L, jpeg) // standalone JPEG file
      assert(s.width == direct.width && s.height == direct.height &&
        s.mean_intensity == direct.mean_intensity)
    }
  }

  test("frame sampling fans 1 row into real decoded frames; " +
      "corrupt payloads yield zero rows") {
    import Multimodal._
    // id=1: nf = 3 frames; sample 2 -> container frames {0, 1}
    val media = Seq(
      MediaRow(1L, "video", VideoCodec.syntheticAvi(1L)),
      MediaRow(2L, "video", Array.emptyByteArray),
      MediaRow(3L, "video", (0 until 64).map(_.toByte).toArray)).toDS()
    val frames = sampleFrames(media, 2)
    val f1 = frames.filter($"media_id" === 1).orderBy($"frame_idx")
      .as[FrameRow].collect()
    assert(f1.map(_.frame_idx).toSeq == Seq(0, 1))
    // each sampled payload is a SELF-CONTAINED lossless PNG of the
    // original DIB frame: decoding it reproduces the closed-form stats
    val direct = VideoCodec.decodeStats(1L, VideoCodec.syntheticAvi(1L))
    f1.foreach { fr =>
      val s = ImageCodec.decodeStats(fr.media_id, fr.payload)
      val d = direct(fr.frame_idx)
      assert(s.width == d.width && s.height == d.height &&
        s.mean_intensity == d.mean_intensity)
    }
    // corrupt / empty payloads: zero rows, no crash
    assert(frames.filter($"media_id" isin (2L, 3L)).count() == 0)
    // a chunk with size 0xFFFFFFFF (negative after the int cast) must
    // THROW in parse, not walk backward into an infinite loop — and
    // sampleFrames must therefore drop it, promptly
    val evil = "RIFF".getBytes ++ Array[Byte](100, 0, 0, 0) ++
      "AVI ".getBytes ++ "JUNK".getBytes ++
      Array[Byte](-1, -1, -1, -1) ++ new Array[Byte](64)
    intercept[IllegalArgumentException](VideoCodec.parse(evil))
    assert(sampleFrames(Seq(MediaRow(9L, "video", evil)).toDS(), 2)
      .count() == 0)
    // oversampling clamps to the frame count with distinct indices
    assert(sampleFrames(media, 10).filter($"media_id" === 1).count() == 3)

    // MJPEG containers: the sampled payload is the container's JPEG
    // chunk VERBATIM (passthrough, no re-encode)
    val mj = VideoCodec.encodeAviMjpeg((0 until 2).map { f =>
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, (x * 11 + y * 29 + f * 41) % 256 * 0x010101)
      img
    })
    val mjFrames = sampleFrames(Seq(MediaRow(7L, "video", mj)).toDS(), 2)
      .orderBy($"frame_idx").as[FrameRow].collect()
    val mjChunks = VideoCodec.parse(mj).frames
    assert(mjFrames.length == 2)
    mjFrames.foreach(fr =>
      assert(java.util.Arrays.equals(fr.payload, mjChunks(fr.frame_idx)._2),
        s"frame ${fr.frame_idx} must pass through verbatim"))

    val ff = frameFeatures(media, 2, dim = 8)
    val twice = frameFeatures(media, 2, dim = 8)
    assert(ff.orderBy($"media_id", $"frame_idx").as[FrameFeatures]
      .collect().map(_.features.toSeq).toSeq ==
      twice.orderBy($"media_id", $"frame_idx").as[FrameFeatures]
        .collect().map(_.features.toSeq).toSeq)
    assert(ff.count() == 2)
  }

  test("ImageCodec: real PNG decode recovers exact dimensions and pixels") {
    import Multimodal._
    // encode → decode round trip is exact (TYPE_INT_RGB, no color mgmt)
    val png = ImageCodec.encodeGrayPng(5, 3, (x, y) => x * 7 + y * 13)
    val stats = ImageCodec.decodeStats(42L, png)
    assert(stats.width == 5 && stats.height == 3 && stats.n_px == 15)
    val expected = (for (y <- 0 until 3; x <- 0 until 5)
      yield (x * 7 + y * 13) & 0xff).sum.toDouble / 15
    assert(stats.mean_intensity == expected)
    // synthetic ids: dimensions are closed-form in the id
    val s17 = ImageCodec.decodeStats(17L, ImageCodec.syntheticPng(17L))
    assert(s17.width == 8 + 17 % 9 && s17.height == 8 + 17 % 7)
  }

  test("extractFeatures routes images through the real codec") {
    import Multimodal._
    val media = Seq(
      MediaRow(1L, "image", ImageCodec.syntheticPng(1L)),
      MediaRow(2L, "audio", Array[Byte](1, 2, 3))).toDS()
    val out = extractFeatures(media, dim = 4).collect()
      .map(f => f.media_id -> f).toMap
    // image: REAL header dimensions, not the stub's hash-derived ones
    assert(out(1L).width == 8 + 1 % 9 && out(1L).height == 8 + 1 % 7)
    assert(out(1L).features.length == 4)
    assert(out(1L).features.forall(f => f >= 0f && f <= 1f))
    // audio: still the deterministic stub (JVM has no audio codec)
    assert(out(2L).n_bytes == 3)
    assert(out(2L).features.length == 4)
  }

  test("AudioCodec: real WAV decode recovers format and exact samples") {
    import Multimodal._
    // encode → decode round trip is exact (PCM16 in a WAV container)
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = AudioCodec.encodeWavPcm16(samples, 8000)
    // a real RIFF/WAVE container, not a raw byte blob
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val stats = AudioCodec.decodeStats(42L, wav)
    assert(stats.sample_rate == 8000 && stats.n_channels == 1 &&
      stats.bits == 16)
    assert(stats.n_samples == 6L && stats.peak == 32768L)
    assert(stats.mean_amplitude ==
      samples.map(_.toLong).sum.toDouble / 6)
    assert(stats.rms ==
      math.sqrt(samples.map(s => s.toLong * s.toLong).sum.toDouble / 6))
    // synthetic ids: length closed-form in the id; decode is real
    val s17 = AudioCodec.decodeStats(17L, AudioCodec.syntheticWav(17L))
    assert(s17.n_samples == 1000 + (17 % 7) * 100)
  }

  test("audioStats: partition-parallel real decode over a Dataset") {
    import Multimodal._
    val media = Seq(3L, 8L, 11L)
      .map(id => MediaRow(id, "audio", AudioCodec.syntheticWav(id))).toDS()
    val out = audioStats(media).collect().map(s => s.media_id -> s).toMap
    Seq(3L, 8L, 11L).foreach { id =>
      assert(out(id).n_samples == 1000 + (id % 7) * 100)
      val exp = (0L until out(id).n_samples)
        .map(t => ((t * 37 + id * 13) % 65536) - 32768)
      assert(out(id).peak == exp.map(math.abs).max)
      assert(out(id).mean_amplitude == exp.sum.toDouble / exp.size)
    }
  }

  test("dHash64: closed-form over the textured family; retouch stays " +
      "within hamming 2; unrelated ids are far") {
    import Multimodal._
    // the hash equals the bit-by-bit recompute from the pixel formula
    def expected(id: Long, pert: Boolean): Long = {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val a = 3 + id % 13; val b = 5 + id % 11
      def v(sx: Int, sy: Int): Long =
        if (pert && sx == 0 && sy == 0) 255
        else (sx.toLong * sx * 3 + sy.toLong * sy * 5 + sx.toLong * sy * 7
          + sx * a + sy * b + id) % 256
      (for { y <- 0 until 8; x <- 0 until 8
             if v((x + 1) * w / 9, y * h / 8) > v(x * w / 9, y * h / 8) }
        yield 1L << (y * 8 + x)).foldLeft(0L)(_ | _)
    }
    for (id <- Seq(0L, 7L, 63L, 255L, 256L, 1000L)) {
      val orig = ImageCodec.dHash64(ImageCodec.syntheticPngTextured(id, pert = false))
      assert(orig == expected(id, pert = false), s"id=$id")
      val variant = ImageCodec.dHash64(ImageCodec.syntheticPngTextured(id, pert = true))
      assert(variant == expected(id, pert = true), s"id=$id variant")
      // single-pixel retouch: the perturbed pixel sits on ≤2 sampled
      // grid comparisons, so the fingerprints stay within hamming 2
      assert(java.lang.Long.bitCount(orig ^ variant) <= 2, s"id=$id dist")
    }
    // the family is non-degenerate: distinct ids separate
    val hs = (0L until 64L).map(id =>
      ImageCodec.dHash64(ImageCodec.syntheticPngTextured(id, pert = false)))
    val near = (for { i <- hs.indices; j <- i + 1 until hs.size
                      if java.lang.Long.bitCount(hs(i) ^ hs(j)) <= 2 } yield 1).size
    assert(near <= 3, s"textured corpus collapsed: $near near pairs in 64")
  }

  test("tHash64: temporal-majority of per-frame dHashes, closed-form; " +
      "retouched intro stays near; corrupt payload fails loudly") {
    import Multimodal._
    def expected(id: Long, pert: Boolean): Long = {
      val nf = (2 + id % 3).toInt
      val w = (8 + id % 5).toInt
      val h = (6 + id % 4).toInt
      val sa = 3 + id % 13
      val sb = 5 + id % 11
      def v(f: Int, sx: Int, sy: Int): Long =
        if (pert && f == 0 && sx == 0 && sy == 0) 255
        else (sx.toLong * sx * 3 + sy.toLong * sy * 5 + sx.toLong * sy * 7
          + sx * sa + sy * sb + f.toLong * 31 + id) % 256
      val counts = new Array[Int](64)
      for {
        f <- 0 until nf; y <- 0 until 8; x <- 0 until 8
        if v(f, (x + 1) * w / 9, y * h / 8) > v(f, x * w / 9, y * h / 8)
      } counts(y * 8 + x) += 1
      (0 until 64).collect { case b if 2 * counts(b) > nf => 1L << b }
        .foldLeft(0L)(_ | _)
    }
    for (id <- Seq(0L, 1L, 2L, 7L, 63L, 255L, 256L, 1000L)) {
      val orig = VideoCodec.tHash64(
        VideoCodec.syntheticAviTextured(id, pert = false))
      assert(orig == expected(id, pert = false), s"id=$id")
      val variant = VideoCodec.tHash64(
        VideoCodec.syntheticAviTextured(id, pert = true))
      assert(variant == expected(id, pert = true), s"id=$id variant")
      // the retouch touches ONE pixel of ONE frame: it can shift at
      // most the handful of grid comparisons that sample (0,0), and
      // majority pooling absorbs part of even those
      assert(java.lang.Long.bitCount(orig ^ variant) <= 6, s"id=$id dist")
    }
    // distinct ids separate (the family is non-degenerate)
    val hs = (0L until 64L).map(id =>
      VideoCodec.tHash64(VideoCodec.syntheticAviTextured(id, pert = false)))
    val near = (for { i <- hs.indices; j <- i + 1 until hs.size
      if java.lang.Long.bitCount(hs(i) ^ hs(j)) <= 2 } yield 1).size
    assert(near <= 3, s"synthetic clip corpus collapsed: $near near pairs")
    intercept[IllegalArgumentException] {
      VideoCodec.tHash64(Array.fill[Byte](64)(7))
    }
  }

  test("fingerprint: three channels from one decode pass — thash equals " +
      "tHash64, twins stay within confirm radii, lookalikes need content") {
    import Multimodal._
    for (id <- Seq(0L, 1L, 7L, 63L, 255L, 1000L)) {
      val orig = VideoCodec.fingerprint(
        VideoCodec.syntheticAviTextured(id, pert = false))
      val pert = VideoCodec.fingerprint(
        VideoCodec.syntheticAviTextured(id, pert = true))
      assert(orig.thash == VideoCodec.tHash64(
        VideoCodec.syntheticAviTextured(id, pert = false)), s"id=$id")
      // recall safety of the confirm channels, by construction:
      // the planted retouch pins ONE pixel of frame 0. The 9x8 grid
      // oversamples thumbnails (w=8 maps grid cols {0,1} to pixel
      // col 0; h<=7 maps grid rows {0,1} to pixel row 0), so the
      // pinned pixel sits under at most 2 grid rows x the one
      // boundary comparison per row — at most 2 intro bits flip,
      // exactly the confirm radius. The tail frame is untouched and
      // decodes byte-identically under DIB.
      assert(java.lang.Long.bitCount(orig.fhash0 ^ pert.fhash0) <= 2,
        s"id=$id intro confirm must stay within radius")
      assert(orig.tail_sig == pert.tail_sig,
        s"id=$id tail signature must be byte-identical for twins")
      // the signature is the 72-sample grid: 8 rows x 9 cols
      assert(orig.tail_sig.split(",").length == 72)
    }
    // distinct clips separate on the tail content even when their
    // perceptual hashes are close — the channel that restored q215
    // precision to 1.0
    val sigs = (0L until 64L).map(id => VideoCodec.fingerprint(
      VideoCodec.syntheticAviTextured(id, pert = false)).tail_sig)
    assert(sigs.distinct.size == sigs.size,
      "tail signatures must separate distinct clips")
  }

  test("videoFingerprints: partition-parallel full fingerprints match " +
      "the local kernel") {
    import Multimodal._
    import spark.implicits._
    val ids = (0L until 12L)
    val media = ids.map(id => MediaRow(id, "video",
      VideoCodec.syntheticAviTextured(id, pert = false))).toDS()
    val got = videoFingerprints(media.repartition(5)).collect()
      .map(r => r.media_id -> ((r.thash, r.fhash0, r.tail_sig))).toMap
    ids.foreach { id =>
      val fp = VideoCodec.fingerprint(
        VideoCodec.syntheticAviTextured(id, pert = false))
      assert(got(id) == ((fp.thash, fp.fhash0, fp.tail_sig)), s"id=$id")
    }
  }

  test("videoTHashes: partition-parallel clip fingerprints match the " +
      "local kernel") {
    import Multimodal._
    import spark.implicits._
    val ids = (0L until 12L)
    val media = ids.map(id => MediaRow(id, "video",
      VideoCodec.syntheticAviTextured(id, pert = false))).toDS()
    val got = videoTHashes(media.repartition(5)).collect()
      .map(h => h.media_id -> h.thash).toMap
    ids.foreach { id =>
      assert(got(id) == VideoCodec.tHash64(
        VideoCodec.syntheticAviTextured(id, pert = false)), s"id=$id")
    }
  }

  test("imageDHashes + hammingNearPairs: pairs equal the brute-force " +
      "hamming-≤2 set, via the pigeonhole equi-join") {
    import Multimodal._
    val ids = (0L until 40L)
    val media = ids.flatMap { id =>
      val orig = MediaRow(id, "image", ImageCodec.syntheticPngTextured(id, pert = false))
      if (id % 4 == 0)
        Seq(orig, MediaRow(id + 1000L, "image",
          ImageCodec.syntheticPngTextured(id, pert = true)))
      else Seq(orig)
    }.toDS()
    val hashes = imageDHashes(media)
    val hs = hashes.collect().map(h => h.media_id -> h.dhash).toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys; if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 2
    } yield (a, b)).toSet
    val got = graft.ops.Dedup.hammingNearPairs(hashes.toDF(), "media_id",
        maxDist = 2, bits = 64, hashCol = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // every retouched variant is recovered as a near-dup of its original
    ids.filter(_ % 4 == 0).foreach { id =>
      assert(got.contains((id, id + 1000L)), s"variant pair $id missing")
    }
  }

  test("bandHash64: closed-form over the textured WAV family; retouch " +
      "stays within hamming 1; unrelated ids are far") {
    import Multimodal._
    // the hash equals the bit-by-bit recompute from the sample formula
    def expected(id: Long, pert: Boolean): Long = {
      val n = (1000 + (id % 7) * 100).toInt
      val sums = new Array[Long](65)
      for (t <- 0 until n) {
        val v =
          if (pert && t < 4) 32767L
          else ((t.toLong * t * 31 + t.toLong * id * 17 + id * id * 7)
            % 65536) - 32768
        sums((t.toLong * 65 / n).toInt) += math.abs(v)
      }
      (0 until 64).foldLeft(0L)((h, b) =>
        if (sums(b + 1) > sums(b)) h | (1L << b) else h)
    }
    for (id <- Seq(0L, 3L, 7L, 63L, 255L, 1000L)) {
      val orig = AudioCodec.bandHash64(
        AudioCodec.syntheticWavTextured(id, pert = false))
      assert(orig == expected(id, pert = false), s"id=$id")
      val variant = AudioCodec.bandHash64(
        AudioCodec.syntheticWavTextured(id, pert = true))
      assert(variant == expected(id, pert = true), s"id=$id variant")
      // the retouched intro lives in window 0 only → only bit 0 can flip
      assert(java.lang.Long.bitCount(orig ^ variant) <= 1, s"id=$id dist")
    }
    // the family is non-degenerate: distinct ids separate
    val hs = (0L until 64L).map(id =>
      AudioCodec.bandHash64(AudioCodec.syntheticWavTextured(id, pert = false)))
    val near = (for { i <- hs.indices; j <- i + 1 until hs.size
                      if java.lang.Long.bitCount(hs(i) ^ hs(j)) <= 2 } yield 1).size
    assert(near == 0, s"textured WAV corpus collapsed: $near near pairs in 64")
  }

  test("bandHash64: monotone energy envelopes pin the bit convention; " +
      "short clips are rejected") {
    import Multimodal._
    // 130 samples → 65 windows of exactly 2; strictly rising |sample|
    // energies set every comparison bit, strictly falling clear them
    val rising = Array.tabulate(130)(t => (t * 25).toShort)
    assert(AudioCodec.bandHash64(
      AudioCodec.encodeWavPcm16(rising, 8000)) == -1L)
    val falling = Array.tabulate(130)(t => ((129 - t) * 25).toShort)
    assert(AudioCodec.bandHash64(
      AudioCodec.encodeWavPcm16(falling, 8000)) == 0L)
    val short = Array.tabulate(64)(t => t.toShort)
    val e = intercept[IllegalArgumentException] {
      AudioCodec.bandHash64(AudioCodec.encodeWavPcm16(short, 8000))
    }
    assert(e.getMessage.contains("too short"))
  }

  test("audioBandHashes + hammingNearPairs: pairs equal the brute-force " +
      "hamming-≤2 set, via the pigeonhole equi-join") {
    import Multimodal._
    val ids = (0L until 40L)
    val media = ids.flatMap { id =>
      val orig = MediaRow(id, "audio",
        AudioCodec.syntheticWavTextured(id, pert = false))
      if (id % 4 == 0)
        Seq(orig, MediaRow(id + 1000L, "audio",
          AudioCodec.syntheticWavTextured(id, pert = true)))
      else Seq(orig)
    }.toDS()
    val hashes = audioBandHashes(media)
    val hs = hashes.collect().map(h => h.media_id -> h.bhash).toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys; if a < b
      if java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 2
    } yield (a, b)).toSet
    val got = graft.ops.Dedup.hammingNearPairs(hashes.toDF(), "media_id",
        maxDist = 2, bits = 64, hashCol = "bhash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    // every retouched variant is recovered as a near-dup of its original
    ids.filter(_ % 4 == 0).foreach { id =>
      assert(got.contains((id, id + 1000L)), s"variant pair $id missing")
    }
  }

  test("resize: deterministic fixed-budget payloads, metadata re-derivable") {
    import Multimodal._
    val media = Seq(MediaRow(1L, "image", Array[Byte](1, 2, 3))).toDS()
    val small = resize(media, 64, 64).as[MediaRow].head()
    val big = resize(media, 512, 512).as[MediaRow].head()
    assert(small.payload.length == 64 * 64 / 64)
    assert(big.payload.length == 4096)
    // deterministic per (payload, target)
    assert(resize(media, 64, 64).as[MediaRow].head()
      .payload.toSeq == small.payload.toSeq)
    assert(small.payload.toSeq != big.payload.take(small.payload.length).toSeq)
  }
}
