package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 metadata-action layer: the driver-side Bloom probe must
  * equal the distributed register join bit-for-bit, and the scoped
  * conf helpers must scale/restore exactly. */
class MetaActionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_metaact_").toString

  test("localBloomProbe == the register-join probe (same superset, " +
      "both key types), and the conf cap forces the join path") {
    val root = freshDir() + "/t"
    val df = spark.range(0, 4000)
      .select($"id".as("k"), ($"id" % 97).as("y"),
        concat(lit("key"), $"id").as("s"))
    ManifestTable.commit(df, root)
    ZTable.optimizeZOrder(spark, root, "k", "y", "k", nFiles = 6,
      bloomCol = Some("s"))
    val dir = ManifestTable.versionDataDir(spark, root, 2L)
    def probe(keys: org.apache.spark.sql.Column): Seq[String] =
      ZTable.bloomProbePathsAny(spark, root, dir, keys)
    val keys = array(lit("key123"), lit("key3999"), lit("nosuchkey"))
    val local = probe(keys).sorted
    // force the distributed join path via the size cap
    spark.conf.set("spark.graft.bloom.localProbeMaxBytes", "0")
    val joined = try probe(keys).sorted
      finally spark.conf.unset("spark.graft.bloom.localProbeMaxBytes")
    assert(local == joined,
      s"driver probe diverged from the register join: $local vs $joined")
    // present keys must be findable (no false negatives)
    assert(local.nonEmpty)
    // a definitely-absent key alone: subset (usually empty) and again
    // identical across paths
    val absent = array(lit("definitely-absent-key"))
    val la = probe(absent).sorted
    spark.conf.set("spark.graft.bloom.localProbeMaxBytes", "0")
    val ja = try probe(absent).sorted
      finally spark.conf.unset("spark.graft.bloom.localProbeMaxBytes")
    assert(la == ja)
  }

  test("withScaledShufflePartitions derives from bytes, clamps to " +
      "[1, session], and restores the conf (also on throw)") {
    val sess = spark.sessionState.conf.numShufflePartitions
    val key = "spark.sql.shuffle.partitions"
    // tiny working set → 1 partition inside, restored after
    Compute.withScaledShufflePartitions(spark, Some(10L)) {
      assert(spark.conf.get(key).toInt == 1)
    }
    assert(spark.conf.get(key).toInt == sess)
    // huge working set → clamp at the session value (no conf flip)
    Compute.withScaledShufflePartitions(spark, Some(1L << 40)) {
      assert(spark.conf.get(key).toInt == sess)
    }
    // unknown working set → unscaled
    Compute.withScaledShufflePartitions(spark, None) {
      assert(spark.conf.get(key).toInt == sess)
    }
    // restore survives a throwing body
    intercept[RuntimeException] {
      Compute.withScaledShufflePartitions(spark, Some(10L)) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key).toInt == sess)
  }

  test("countVersion == readVersion.count() across COW commits, MoR " +
      "deletes/updates and file-list carries") {
    val root = freshDir() + "/t"
    ManifestTable.commit(
      spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("g")),
      root)
    ManifestTable.deleteWhereDV(spark, root, $"g" === 3)        // v2 MoR
    ManifestTable.updateWhereDV(spark, root, $"g" === 2,
      Map("g" -> lit(99L)))                                     // v3 MoR
    ManifestTable.append(spark, root,
      spark.range(5000, 5050).select($"id".as("k"),
        lit(1L).as("g")))                                       // v4 carry
    (1L to 4L).foreach { v =>
      assert(ManifestTable.countVersion(spark, root, v) ==
        ManifestTable.readVersion(spark, root, v).count(),
        s"countVersion diverged at v$v")
    }
  }

  test("withMetaActionConf flips AQE off + 1 shuffle partition for " +
      "the action only, restoring both") {
    val key = "spark.sql.shuffle.partitions"
    val aqe = "spark.sql.adaptive.enabled"
    val sess = spark.conf.get(key)
    val aqe0 = spark.conf.get(aqe, "true")
    MetaIO.withMetaActionConf(spark) {
      assert(spark.conf.get(key) == "1")
      assert(spark.conf.get(aqe) == "false")
    }
    assert(spark.conf.get(key) == sess)
    assert(spark.conf.get(aqe, "true") == aqe0)
  }
}
