package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** HARD-NEGATIVE MINING for contrastive embedding training — for each
  * anchor, the most similar SAME-label member (the positive a triplet
  * loss pulls closer) and the most similar DIFFERENT-label member
  * (the hard negative it pushes away; random negatives are too easy
  * to carry gradient, which is why every dense-retrieval /
  * contrastive pipeline mines the hard ones).
  *
  * Determinism: the shared exact-integer cosine channel (quantized
  * dot / norms, one IEEE division), (cosine DESC, id ASC) tie-break —
  * the mined pairs are oracle-checkable, not just plausible.
  *
  * Scale shape: anchors are a SAMPLED set (the q112/ANN-benchmark
  * protocol) and broadcast against the corpus — one pass, no
  * corpus×corpus pair set. At full-corpus mining scale the anchor
  * side swaps to the banded-LSH candidates ([[Dedup]]'s scale path);
  * the ranking logic here is unchanged. */
object ContrastiveMining {

  /** (id_q, label, id_pos, cos_pos, id_neg, cos_neg) per anchor —
    * anchors lacking a same-label peer or a different-label peer are
    * dropped (nothing to contrast). */
  def hardPairs(emb: DataFrame, anchors: DataFrame,
      id: String = "vec_id", vec: String = "embedding",
      label: String = "label"): DataFrame = {
    val prep = (d: DataFrame, suffix: String) =>
      d.select(col(id).as(s"id_$suffix"), col(label).as(s"lab_$suffix"),
          V.quantize(col(vec)).as(s"q_$suffix"))
        .withColumn(s"n_$suffix", V.normSqQ(col(s"q_$suffix")))
    val c = prep(Compute.spread(emb), "c")
    val q = prep(anchors, "q")
    val scored = c.join(broadcast(q), col("id_q") =!= col("id_c"))
      .withColumn("cosine", V.cosineFrom(
        V.dotQ(col("q_q"), col("q_c")), col("n_q"), col("n_c")))
      .select(col("id_q"), col("lab_q"), col("id_c"), col("lab_c"),
        col("cosine"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cosine").desc, col("id_c").asc)
    def top1(side: DataFrame, idAs: String, cosAs: String): DataFrame =
      side.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("id_q"), col("lab_q").as("label"),
          col("id_c").as(idAs), col("cosine").as(cosAs))
    val pos = top1(scored.filter(col("lab_q") === col("lab_c")),
      "id_pos", "cos_pos")
    val neg = top1(scored.filter(col("lab_q") =!= col("lab_c")),
      "id_neg", "cos_neg").drop("label")
    pos.join(neg, Seq("id_q"))
      .select(col("id_q"), col("label"), col("id_pos"), col("cos_pos"),
        col("id_neg"), col("cos_neg"))
      .orderBy(col("id_q"))
  }
}
