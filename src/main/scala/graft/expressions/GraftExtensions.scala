package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions in the SQL function registry, so raw-SQL callers (the
  * EP1 entry point) get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  * ...
  * spark.sql("SELECT graft_dotq(a.embedding_q, b.embedding_q) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dotq"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dotq"),
      GraftExtensions.dotqBuilder))
  }
}

object GraftExtensions {
  private val dotqBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "graft_dotq(arrayA, arrayB)")
    LongArrayDot(args.head, args(1))
  }

  /** Retrofit registration for an ALREADY-RUNNING session (builder
    * extensions only apply at session construction; getOrCreate on an
    * existing session silently skips them). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dotq", dotqBuilder, "built-in")
}
