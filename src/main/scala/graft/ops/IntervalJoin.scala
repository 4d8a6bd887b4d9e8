package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-INTERVAL (band) join — the second operator of the brief's
  * custom-join list after [[AsofJoin]]: for each probe row, every
  * event row of the same key within ± `radius` of the probe
  * timestamp (the "what happened around this error" join).
  *
  * Scale shape: the naive formulation is a non-equi range predicate —
  * on a cluster that's a broadcast nested-loop or a full sort-merge
  * over the key alone (all of a user's history × all their probes).
  * Here both sides bucket by floor(ts / radius) and each PROBE
  * explodes to its three adjacent buckets {b−1, b, b+1}; any pair
  * within the radius differs by at most one bucket, so the band
  * equi-join on (key, bucket) is COMPLETE, and the exact |Δts| ≤
  * radius filter runs after. Fan-out is bounded by true temporal
  * density (rows per key per radius window), never by history length
  * — the same banding idea the LSH family uses, applied to time.
  */
object IntervalJoin {

  /** Matched (probe, event) pairs: all probe columns plus the event's
    * timestamp as `evt_ts` and `valueCols` as `evt_<name>`. Exact
    * microsecond arithmetic end-to-end. */
  def intervalJoin(
      probes: DataFrame,
      events: DataFrame,
      keys: Seq[String],
      probeTs: String,
      eventTs: String,
      radiusSec: Long,
      valueCols: Seq[String] = Nil): DataFrame = {
    require(radiusSec > 0, "radiusSec must be positive")
    val rUs = radiusSec * 1000000L
    val p = probes
      .withColumn("__pus", expr(s"unix_micros($probeTs)"))
      .withColumn("__b0", expr(s"unix_micros($probeTs) div ${rUs}L"))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val e = events
      .withColumn("__eus", expr(s"unix_micros($eventTs)"))
      .withColumn("__b", expr(s"unix_micros($eventTs) div ${rUs}L"))
      .select((keys.map(col) ++ Seq(col("__b"), col("__eus"),
        col(eventTs).as("__evt_ts")) ++
        valueCols.map(c => col(c).as(s"evt_$c"))): _*)
    p.join(e, keys :+ "__b")
      .filter(abs(col("__pus") - col("__eus")) <= rUs)
      .drop("__b", "__pus", "__eus")
      .withColumnRenamed("__evt_ts", "evt_ts")
  }
}
