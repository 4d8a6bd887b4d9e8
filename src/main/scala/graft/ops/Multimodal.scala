package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extract runs partition-parallel with NO driver
  * round-trip — the Scala analog of the reference-era
  * `mapInPandas` batch-UDF pattern.
  *
  * The container ships no image/audio codecs (builder brief), so
  * [[StubCodec]] is a clearly-marked deterministic fake; everything
  * around it — schema, batch iteration, partition parallelism, typed
  * Encoders — is the real pipeline a production codec would drop into.
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

  /** Partition-parallel decode + feature extraction: each executor
    * core streams its partition's payloads through the codec once —
    * the batch shape of `mapInPandas` (iterator in, iterator out, no
    * per-row UDF dispatch, no collect). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubCodec.decode(_, dim)))
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
