package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k uniform sample sketch as a typed Aggregator: keep the k
  * rows with the SMALLEST seeded 60-bit hash of their unique id — a
  * deterministic uniform random sample per group whose buffer is k
  * (hash, value) pairs regardless of group size.
  *
  * Why this sketch: per-group quantiles over hot groups need either a
  * full sort (exact, q71) or a bounded sample; hash-minimum selection
  * makes the sample MERGEABLE (partial buffers combine associatively —
  * map-side partial aggregation, no all-rows shuffle) and
  * DETERMINISTIC given the md5-derived hash, so quantiles read off the
  * sample are oracle-checkable bit-for-bit in DuckDB — the same
  * property [[KmvSketch]] has for distinct counts, here for
  * distributions. At 100 TB this is the bounded-memory quantile path
  * for groups too hot to sort; `approx_percentile` remains the
  * built-in when cross-engine determinism is not needed.
  *
  * finish() returns the sample VALUES sorted ascending; callers index
  * it at ⌊q·(m−1)⌋ for the q-quantile estimate (exact integer
  * indexing — no interpolation ambiguity across engines).
  *
  * Input is (pre-hashed id, value), keeping the hash in codegen'd
  * column space and the aggregator pure. */
final case class BottomKSample(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[Double]] {
  require(k >= 1)

  def zero: Array[(Long, Double)] = Array.empty

  private def insert(buf: Array[(Long, Double)],
      e: (Long, Double)): Array[(Long, Double)] =
    if (buf.length < k) buf :+ e
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (buf(i)._1 > buf(mi)._1) mi = i; i += 1 }
      if (e._1 < buf(mi)._1) { val b = buf.clone(); b(mi) = e; b } else buf
    }

  def reduce(buf: Array[(Long, Double)],
      e: (Long, Double)): Array[(Long, Double)] = insert(buf, e)
  def merge(a: Array[(Long, Double)],
      b: Array[(Long, Double)]): Array[(Long, Double)] = b.foldLeft(a)(insert)

  def finish(buf: Array[(Long, Double)]): Array[Double] =
    buf.map(_._2).sorted

  def bufferEncoder: Encoder[Array[(Long, Double)]] =
    ExpressionEncoder[Array[(Long, Double)]]()
  def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
