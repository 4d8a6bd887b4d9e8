package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContrastiveMiningSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("hardPairs: picks nearest same-label positive and nearest " +
      "cross-label negative") {
    // anchor 0 (label 1) at e1; 1 (label 1) near e1; 2 (label 1) far;
    // 10 (label 2) CLOSE to anchor — the hard negative; 11 (label 2) far
    val e = (v: Seq[Float]) => v
    val data = emb(
      (0L, e(Seq(1f, 0f, 0f, 0f)), 1),
      (1L, e(Seq(0.9f, 0.1f, 0f, 0f)), 1),
      (2L, e(Seq(0f, 1f, 0f, 0f)), 1),
      (10L, e(Seq(0.95f, 0.05f, 0f, 0f)), 2),
      (11L, e(Seq(0f, 0f, 1f, 0f)), 2))
    val got = ContrastiveMining.hardPairs(data,
      data.filter(col("vec_id") === 0L)).collect().head
    assert(got.getLong(0) == 0L)
    assert(got.getLong(2) == 1L, "positive = nearest same-label")
    assert(got.getLong(4) == 10L, "negative = nearest cross-label")
    assert(got.getDouble(3) > 0.9 && got.getDouble(5) > 0.9)
  }

  test("hardPairs: anchor without a cross-label peer is dropped") {
    val data = emb(
      (0L, Seq(1f, 0f, 0f, 0f), 1),
      (1L, Seq(0f, 1f, 0f, 0f), 1))
    assert(ContrastiveMining.hardPairs(data, data).count() == 0)
  }

  test("hardPairs on real embeddings: pos is same-label by construction, " +
      "one row per anchor with both peers") {
    val embs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val anchors = embs.filter(col("vec_id") < 10)
    val got = ContrastiveMining.hardPairs(embs, anchors)
    assert(got.count() == 10) // 10 labels, plenty of peers both sides
    val joined = got.join(embs.select(col("vec_id").as("id_pos"),
        col("label").as("pos_label")), Seq("id_pos"))
      .join(embs.select(col("vec_id").as("id_neg"),
        col("label").as("neg_label")), Seq("id_neg"))
    assert(joined.filter(col("label") =!= col("pos_label")).count() == 0)
    assert(joined.filter(col("label") === col("neg_label")).count() == 0)
  }
}
