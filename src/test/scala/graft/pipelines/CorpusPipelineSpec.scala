package graft.pipelines

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}
import graft.runner.ModelRegistry

/** End-to-end corpus curation over real documents through the model
  * registry: each stage shrinks (or keeps) the corpus, exact dedup
  * leaves unique fingerprints, near-dup dedup keeps exactly one doc
  * per LSH cluster, stats match the surviving set. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("registry run: monotone filtering, unique fps, one survivor per cluster") {
    val wh = new ModelRegistry.Warehouse(
      Files.createTempDirectory("graft_corpus_wh_").toString, spark)
    // seed the warehouse's `documents` source from testdata
    graft.ops.Upsert.overwriteAtomic(
      Tables(spark, sf("sf0.001"), "documents"), s"${wh.root}/documents")

    val res = ModelRegistry.run(spark, wh, CorpusPipeline.models(), "r1",
      auditTable = None)

    val nDocs = wh.read("documents").count()
    val nQuality = res("corpus_quality").count()
    val nEn = res("corpus_en").count()
    val nUnique = res("corpus_unique").count()
    val nCanonical = res("corpus_canonical").count()
    assert(nDocs >= nQuality && nQuality >= nEn && nEn >= nUnique &&
      nUnique >= nCanonical, s"$nDocs >= $nQuality >= $nEn >= $nUnique >= $nCanonical")
    assert(nCanonical > 0)

    // exact dedup: fingerprints unique among survivors
    val fps = res("corpus_unique")
      .select(T.fingerprint(col("text")).as("fp"))
    assert(fps.distinct().count() == nUnique)

    // near-dup: survivors share no LSH cluster — re-deriving pairs on
    // the canonical set and clustering again must change nothing
    val again = CorpusPipeline.dedupNear(res("corpus_canonical")).count()
    assert(again == nCanonical, s"dedupNear not idempotent: $again != $nCanonical")

    // stats row describes the canonical corpus
    val st = res("corpus_stats")
      .select("n_docs", "total_tokens").as[(Long, Long)].head()
    assert(st._1 == nCanonical && st._2 > 0)
  }
}
