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
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    }
    // SQL TEXT front-end for the table format (EP1 parity): MERGE
    // INTO / UPDATE / DELETE / OPTIMIZE / VACUUM / RESTORE / DESCRIBE
    // HISTORY|DETAIL statement text addressed at graft.`<path>`
    // routes to the ManifestTable/ZTable kernels; everything else
    // delegates to Spark's parser verbatim.
    ext.injectParser((_, delegate) =>
      new graft.sql.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dotq", classOf[LongArrayDot], { args =>
      require(args.length == 2, "graft_dotq(arrayA, arrayB)")
      LongArrayDot(args.head, args(1))
    }),
    ("graft_md5prefix60", classOf[Md5Prefix60], { args =>
      require(args.length == 1, "graft_md5prefix60(str)")
      Md5Prefix60(args.head)
    }),
    ("graft_nfc", classOf[NfcNormalize], { args =>
      require(args.length == 1, "graft_nfc(str)")
      NfcNormalize(args.head)
    }),
    ("graft_word_shingles", classOf[WordShingles], { args =>
      require(args.length == 2, "graft_word_shingles(text, n)")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_word_shingles: n must be an integer literal, got $other")
      }
      WordShingles(args.head, n)
    }))

  /** Retrofit registration for an ALREADY-RUNNING session (builder
    * extensions only apply at session construction; getOrCreate on an
    * existing session silently skips them). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
