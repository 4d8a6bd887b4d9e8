package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the §2.9 surface beyond
  * the reference's file-drop + foreachBatch pattern: when BOTH sides
  * of a correlation are live streams (orders and their shipments,
  * requests and their callbacks), the join must carry watermarks and
  * a time-interval predicate or its state grows without bound.
  *
  * Scale shape: state per key is bounded by the interval width ×
  * arrival rate; Spark drops left rows once the right watermark
  * passes leftTs + within, and right rows once the left watermark
  * passes their event time. On a 1000-executor cluster the join
  * shuffles both streams on the key exactly like a batch shuffle
  * join — the watermark is what keeps the state store finite.
  */
object StreamJoins {

  /** Watermarked inner join of two streams on `key`, with the right
    * side's event time constrained to [leftTs, leftTs + within].
    * `within` is a SQL interval string (e.g. "1 hour"); `watermark`
    * is the lateness bound applied to BOTH sides. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r, expr(
      s"l.$key = r.$key AND " +
      s"r.$rightTs >= l.$leftTs AND " +
      s"r.$rightTs <= l.$leftTs + interval $within"))
      .select(col(s"l.$key").as(key),
        col(s"l.$leftTs").as(leftTs), col(s"r.$rightTs").as(rightTs))
  }
}
