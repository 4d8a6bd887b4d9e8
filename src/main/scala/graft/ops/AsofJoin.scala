package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator Spark's built-ins lack as
  * a primitive (builder brief §custom operators, preference (a):
  * compose existing ops).
  *
  * For each probe row, find the single most recent event row of the
  * same key with event_ts <= probe_ts. Implemented with the union
  * trick: tag both inputs, union them, sort within key by
  * (ts, probe-after-event), and carry event values forward with
  * last(_, ignoreNulls) over an unbounded-preceding frame. ONE
  * shuffle + sort of events∪probes — no range-join row explosion, no
  * per-key driver loop; at 100 TB this is a single sort-based pass,
  * the same shape a dedicated ASOF physical operator would run.
  *
  * Ties: events sort before probes at equal ts (inclusive <=); among
  * events with identical (key, ts) the LAST under `eventOrder` wins —
  * pass tie-break column name(s) (must be in `eventValueCols`) to make
  * the survivor deterministic. With `eventOrder` empty the winner among
  * equal-ts events is whichever the sort happens to place last —
  * nondeterministic if the data has such ties.
  */
object AsofJoin {

  def asofJoin(
      probes: DataFrame,
      events: DataFrame,
      keys: Seq[String],
      probeTs: String,
      eventTs: String,
      eventValueCols: Seq[String],
      eventOrder: Seq[String] = Nil): DataFrame = {
    require(eventOrder.forall(eventValueCols.contains),
      s"eventOrder columns must be carried in eventValueCols " +
        s"(missing: ${eventOrder.filterNot(eventValueCols.contains).mkString(",")})")
    val probeCols = probes.columns.toSeq
    val p = probes
      .withColumn("__ts", col(probeTs))
      .withColumn("__is_probe", lit(1))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__is_probe")) ++
        probeCols.filterNot(keys.contains).map(col) ++
        eventValueCols.map(c => lit(null).cast(
          events.schema(c).dataType).as(s"__evt_$c"))): _*)
    val e = events
      .withColumn("__ts", col(eventTs))
      .withColumn("__is_probe", lit(0))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__is_probe")) ++
        probeCols.filterNot(keys.contains).map(c =>
          lit(null).cast(probes.schema(c).dataType).as(c)) ++
        eventValueCols.map(c => col(c).as(s"__evt_$c"))): _*)
    // eventOrder tie-breaks AFTER (__ts, __is_probe): probes still sort
    // after events at equal ts (probe rows carry null __evt_* values —
    // harmless here, the probe/event split is already decided); among
    // equal-ts events the greatest tie-break value sorts last, so
    // last(ignoreNulls) picks it — "LAST under eventOrder wins".
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(col("__ts").asc, col("__is_probe").asc) ++
        eventOrder.map(c => col(s"__evt_$c").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = eventValueCols.foldLeft(p.unionByName(e)) { (df, c) =>
      df.withColumn(s"__evt_$c", last(col(s"__evt_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_probe") === 1)
      .select((probeCols.map(col) ++
        eventValueCols.map(c => col(s"__evt_$c").as(s"evt_$c"))): _*)
  }
}
