package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Durable IVF-PQ index versions on the manifest commit protocol:
  * save/load round-trips bit-exactly, retrains version (old index
  * keeps serving), and a torn save is invisible. */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def emb(n: Int) = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")
    .filter(col("vec_id") < n)

  private def search(idx: ProductQuantizer.IvfPqIndex) =
    ProductQuantizer.ivfPqSearchIndexed(idx,
        emb(200).filter($"vec_id" < 5), dim = 64, m = 4, nProbe = 2,
        topK = 3)
      .orderBy(col("id_q"), col("rank"))
      .collect().toSeq

  private def build(n: Int) = {
    val e = emb(n)
    ProductQuantizer.ivfPqIndexShared(e, s"idxstore-spec|$n", dim = 64,
      kc = 4, cIters = 1, m = 4, k = 4, iters = 1)
  }

  test("save/load round-trip: the persisted index serves bit-equal " +
      "results; versions advance; time travel serves the old index") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_idxstore_").toString + "/idx"
    val idx1 = build(100)
    val inMem = search(idx1)
    assert(IndexStore.save(idx1, root) == 1L)
    val loaded = IndexStore.load(spark, root).get
    assert(search(loaded) == inMem,
      "persisted index must serve bit-equal results")

    // a retrain on more data commits version 2; version 1 still serves
    val idx2 = build(200)
    assert(IndexStore.save(idx2, root) == 2L)
    val v2 = search(IndexStore.load(spark, root).get)
    assert(v2 == search(idx2))
    assert(search(IndexStore.loadVersion(spark, root, 1L)) == inMem,
      "rollback version must serve the original results")
    // the two trains genuinely differ (otherwise the rollback
    // assertion proves nothing)
    assert(v2 != inMem || idx2.codes.count() != idx1.codes.count())
  }

  test("torn save is invisible: data dirs written, marker absent — " +
      "load still serves the previous version") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_idxstore_torn_").toString + "/idx"
    val idx1 = build(100)
    IndexStore.save(idx1, root)
    val before = search(IndexStore.load(spark, root).get)
    // simulate the crash: all three frames of version 2 land, the
    // marker never does
    val idx2 = build(200)
    idx2.coarse.write.parquet(s"$root/d2-torn/coarse")
    idx2.cents.write.parquet(s"$root/d2-torn/cents")
    idx2.codes.write.parquet(s"$root/d2-torn/codes")
    assert(ManifestTable.currentVersion(spark, root).contains(1L))
    assert(search(IndexStore.load(spark, root).get) == before)
    // the re-attempted save claims version 2 in its own fresh dir
    assert(IndexStore.save(idx2, root) == 2L)
    assert(search(IndexStore.load(spark, root).get) == search(idx2))
  }

  test("never-committed root loads as None") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_idxstore_empty_").toString + "/idx"
    assert(IndexStore.load(spark, root).isEmpty)
  }
}
