package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 prefix of a string as a non-negative long — the fused
  * native form of `conv(substring(md5(cast(s as binary)), 1, 15), 16,
  * 10)`: one digest over the UTF8 bytes, then the top 7.5 bytes
  * big-endian (first 15 hex chars ≡ the unsigned first-8-bytes value
  * shifted right 4). No hex-string materialization, no base-16 string
  * parse — this chain runs once per TOKEN/SHINGLE in the minhash /
  * simhash / fingerprint family, so the allocations it removes are the
  * per-row hot path. Bit-identical to the builtin chain, hence the
  * DuckDB oracles (`CAST('0x'||substr(md5(..),1,15) AS BIGINT)`) are
  * unchanged.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 15 hex chars of md5(bytes) as an unsigned 60-bit long. */
  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
