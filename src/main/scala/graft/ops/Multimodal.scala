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
