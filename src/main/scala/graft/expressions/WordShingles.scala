package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a single-space-separated text, natively.
  *
  * Replaces the builtin chain
  * `when(size(toks) >= n, transform(sequence(1, size(toks)-n+1),
  *   i => concat_ws(" ", slice(toks, i, n)))).otherwise(array())`
  * over `toks = split(text, " ")`, which only runs interpreted
  * (higher-order functions are CodegenFallback) and — because the
  * lambda body references the outer `split` — re-evaluates the full
  * split PLUS a slice PLUS a concat per shingle position: O(m²)
  * string work and allocation per document.
  *
  * Key observation making this a single pass: with single-space
  * separation (guaranteed by the corpus and by `normText`), the
  * n-gram "tok_i .. tok_{i+n-1}" joined by one space IS the byte
  * substring of the original text from the start of token i to the
  * end of token i+n-1. So shingling = one scan for space positions +
  * one bounded byte-copy per shingle. A 0x20 byte never occurs inside
  * a multi-byte UTF-8 sequence, so byte scanning is code-point safe.
  *
  * Bit-identical output to the builtin chain (same strings, same
  * order, same empty-array-when-short semantics), so every downstream
  * hash (xxhash64, md5-prefix60) and every DuckDB oracle is unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.grams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.WordShingles.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** All word n-grams as substrings [start of token i, end of token
    * i+n-1]. One pass to collect token start offsets, then one
    * substring per position; empty array when fewer than n tokens.
    * NOTE `split(s, " ")` semantics: consecutive/leading/trailing
    * spaces yield EMPTY tokens, which the builtin chain includes in
    * grams — reproduced here by treating every space as a boundary. */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) {
      // split("", " ") = [""] — one empty token; n==1 yields [""],
      // larger n yields no grams
      return if (n == 1) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      else new GenericArrayData(Array.empty[Any])
    }
    // token i spans [starts(i), ends(i)); a token starts at 0 and
    // after every space byte
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) m += 1; i += 1 }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](m)
    var t = 1
    i = 0
    starts(0) = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    var p = 0
    while (p <= m - n) {
      val from = starts(p)
      // end of token p+n-1: next start minus the separating space,
      // or end of text for the last token
      val until = if (p + n < m) starts(p + n) - 1 else len
      out(p) = UTF8String.fromBytes(bytes, from, until - from)
      p += 1
    }
    new GenericArrayData(out)
  }
}
