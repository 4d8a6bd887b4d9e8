package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table PROFILING — the ANALYZE/statistics surface: per-column null
  * counts, exact distinct counts, and numeric ranges, computed in ONE
  * pass over the table (a single aggregation producing 4·N values,
  * then a constant-size unpivot to rows). The per-column-query
  * formulation would scan the table N times; at 100 TB the single
  * pass is the difference between a profile and a bill.
  *
  * Exactness: null/distinct counts are exact integers;
  * min/max are exact data values (no arithmetic — the same bits any
  * engine reads from the file), surfaced as DOUBLE for numeric
  * columns and null otherwise. Exact distinct is a deliberate choice
  * — it is the expensive-but-oracle-checkable baseline; the HLL
  * registers ([[graft.functions.HllSketch]]) are the sketch path a
  * 100 TB profile would swap in per column. */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    def isNumeric(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    val aggs = cols.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
        count_distinct(c).as(s"__nd_${f.name}")) ++
        (if (isNumeric(f.dataType))
          Seq(min(c).cast("double").as(s"__mn_${f.name}"),
            max(c).cast("double").as(s"__mx_${f.name}"))
        else
          Seq(lit(null).cast("double").as(s"__mn_${f.name}"),
            lit(null).cast("double").as(s"__mx_${f.name}")))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // constant-size unpivot of the single stats row
    val stacked = cols.map { f =>
      struct(lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col("__rows").as("n_rows"),
        col(s"__nn_${f.name}").as("n_nulls"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mn_${f.name}").as("min_value"),
        col(s"__mx_${f.name}").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }
}
