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
}
