package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-order MATERIALIZATION — the step between a mixing recipe
  * (q117 shares, q130 quotas) and a data loader: lay the corpus out
  * in the interleaved order training will consume it, so "shuffle the
  * sources together" is a deterministic, resumable property of the
  * dataset instead of loader-local RNG state.
  *
  * Stride scheduling (Waldspurger & Weihl 1995, brought to data
  * mixing by every multi-corpus loader since): doc with within-source
  * rank r from a source holding n docs gets virtual time
  * vt = r·S / n (integer division, S = 10^6 stride scale) — each
  * source's docs spread evenly over [0, S], so reading in vt order
  * interleaves sources proportionally to size (equal-epoch: every
  * source finishes its pass together). Weighted mixtures substitute
  * any integer weight for n — same op, different divisor column.
  *
  * Exactness: ranks and virtual times are pure integers (floor
  * division, both engines agree on non-negative operands;
  * src_rank·strideScale stays in int64 for up to ~9.2×10^12 docs per
  * source at the default 10^6 scale). The
  * output carries (vt, source, doc_id) as the TOTAL order key — the
  * consumer sorts, which at scale is the one global sort any layout
  * step pays (range partition); no single-partition global
  * row_number is materialized.
  */
object MixtureOrder {

  /** Equal-epoch stride interleave: (doc_id, source, src_rank, vt),
    * read order = (vt, source, doc_id). */
  def interleave(docs: DataFrame, id: String = "doc_id",
      group: String = "source", strideScale: Long = 1000000L): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(id))
    val ranked = docs.select(col(id), col(group))
      .withColumn("src_rank", row_number().over(w).cast("long"))
    val counts = docs.groupBy(col(group)).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), Seq(group))
      .select(col(id), col(group), col("src_rank"),
        expr(s"CAST((src_rank * $strideScale) div __n AS BIGINT)").as("vt"))
      .orderBy(col("vt"), col(group), col(id))
  }
}
