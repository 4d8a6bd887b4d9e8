package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator
  * (the custom-UDAF surface): keep the k smallest DISTINCT 60-bit
  * hashes of the values; with R = (k-th smallest)/2^60 the estimate is
  * (k−1)/R, or the exact buffer size while fewer than k distinct
  * hashes were seen (Bar-Yossef et al., RANDOM'02).
  *
  * Why this sketch here: the buffer is tiny (k longs), MERGEABLE
  * (partial buffers combine associatively across partitions — map-side
  * partial aggregation works, no all-rows shuffle), and — unlike HLL —
  * DETERMINISTIC given the md5-derived hash, so the approximate answer
  * itself is oracle-checkable in DuckDB (same k-th min hash, same
  * estimate bits). At 100 TB this is the bounded-memory distinct count
  * for per-group cardinalities too hot for exact COUNT(DISTINCT);
  * `approx_count_distinct` remains the built-in alternative when
  * cross-engine determinism is not needed.
  *
  * Input is the PRE-HASHED value ([[TextFunctions.hash60]]), keeping
  * the hash in codegen'd column space and the aggregator pure. */
final case class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2)

  def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], h: Long): Array[Long] =
    if (buf.contains(h)) buf
    else if (buf.length < k) buf :+ h
    else {
      var mi = 0
      var i = 1
      while (i < buf.length) { if (buf(i) > buf(mi)) mi = i; i += 1 }
      if (h < buf(mi)) { val b = buf.clone(); b(mi) = h; b } else buf
    }

  def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = b.foldLeft(a)(insert)

  def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble / (buf.max.toDouble / math.pow(2.0, 60))

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
