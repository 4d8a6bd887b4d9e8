package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.expressions.LongArrayDot

/** Vector primitives over `array<float>` embedding columns, built on
  * codegen'd higher-order functions (`transform`/`zip_with`/
  * `aggregate`) — no UDFs, no driver-side math.
  *
  * Determinism: cosine similarity on raw floats is summation-order
  * dependent, which breaks exact oracle comparison AND stable top-k
  * ranking across engines. We therefore quantize to integer vectors
  * (round(x * 1000)) and compute exact integer dot products; the final
  * cosine is a single IEEE double division — bit-identical everywhere.
  * Semantically this is "cosine over 3-decimal-quantized embeddings",
  * the scale path a 100 TB ANN pipeline would take anyway (int8/int16
  * quantization).
  */
object VectorFunctions {

  /** float vector -> exact integer vector at 3-decimal precision. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression (see [[graft.expressions.LongArrayDot]]);
    * the `zip_with`+`aggregate` HOF equivalent is interpreted per pair
    * and ~15× slower on all-pairs joins. */
  def dotQ(a: Column, b: Column): Column =
    Bridge.column(LongArrayDot(Bridge.expression(a), Bridge.expression(b)))

  /** Squared L2 norm (exact integer). */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from exact integer dot/norms: one double
    * division, deterministic. Pass precomputed norms to avoid
    * recomputing per pair. */
  def cosineFrom(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))
}
