package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.ops.{Partitioned, Upsert}

/** Crash-window regression tests for the swap protocols: a crash
  * between the `dst → bak` and `tmp → dst` renames leaves only the
  * backup on disk; every sink that reads the target before merging
  * must recover FIRST or it merges into nothing and silently drops all
  * rows not in the replayed batch. */
class CrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "shipment_id STRING, status STRING, updated_at TIMESTAMP")

  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  /** Simulate the atomic-swap crash window: live dir renamed to backup,
    * replacement never promoted. */
  private def simulateSwapCrash(target: String): Unit = {
    val f = fs(target)
    assert(f.rename(new org.apache.hadoop.fs.Path(target),
      new org.apache.hadoop.fs.Path(target + "__old")))
  }

  test("runUpsertSink survives a crash window: rows outside the replayed batch are kept") {
    val landing = Files.createTempDirectory("graft_crash_landing_")
    val work = Files.createTempDirectory("graft_crash_")
    val target = s"$work/fact"; val ckpt = s"$work/ckpt"
    def runOnce(): Unit = IncrementalStream.runUpsertSink(
      IncrementalStream.fileDropJson(spark, landing.toString, schema),
      target, ckpt, keys = Seq("shipment_id"), order = Seq(col("updated_at")))

    drop(landing, "b1.json",
      """{"shipment_id":"S1","status":"Created","updated_at":"2024-01-01T10:00:00"}""",
      """{"shipment_id":"S2","status":"Created","updated_at":"2024-01-01T10:00:00"}""")
    runOnce()

    // crash mid-swap BEFORE batch 2; batch 2 only carries S3 — S1/S2
    // exist solely in the backup dir at merge time
    simulateSwapCrash(target)
    drop(landing, "b2.json",
      """{"shipment_id":"S3","status":"Created","updated_at":"2024-01-02T09:00:00"}""")
    runOnce()

    val t = spark.read.parquet(target)
      .select("shipment_id", "status").as[(String, String)].collect().toMap
    assert(t == Map("S1" -> "Created", "S2" -> "Created", "S3" -> "Created"))
    assert(!fs(target).exists(new org.apache.hadoop.fs.Path(target + "__old")))
  }

  test("ShipmentPipeline.run recovers the target before merging") {
    val work = Files.createTempDirectory("graft_crash_ship_")
    val target = s"$work/fact_shipments"
    def raw(rows: (String, String, String)*) = rows.toSeq.map { case (id, o, ts) =>
      s"""{"shipment_id":"$id","carrier":{"carrier_id":"C1","carrier_name":"X"},
          "route":{"origin":{"city":"A","pincode":"1","warehouse_id":"W"},
                   "destination":{"city":"B","pincode":"2","customer_address_type":"home"}},
          "order_reference":{"order_id":"$o","seller_id":"SL1","channel":"web"},
          "charges":{"shipping_cost":1.0,"fuel_surcharge":0.1,"insurance":0.1,"cod_fee":0.0},
          "shipment_details":{"status":"Created","rto_flag":false,"delay_flag":false,
            "delivery_tat_days":2,"created_at":"$ts","delivered_at":null,
            "status_tracking":[{"status":"Created","timestamp":"$ts"}]}}"""
        .replaceAll("\n\\s*", "")
    }.toDF("value")
    graft.silver.ShipmentPipeline.run(spark, raw(("S1", "O1", "2024-01-01T08:00:00")), target)
    simulateSwapCrash(target)
    val merged = graft.silver.ShipmentPipeline.run(
      spark, raw(("S2", "O2", "2024-01-02T08:00:00")), target)
    assert(merged.select("order_id").as[String].collect().toSet == Set("O1", "O2"))
  }

  test("ModelRegistry IncrementalMerge recovers an interrupted swap via Warehouse") {
    import graft.runner.ModelRegistry
    import graft.runner.ModelRegistry._
    val work = Files.createTempDirectory("graft_crash_wh_")
    val wh = new Warehouse(work.toString, spark)
    Seq((1, "a", "2024-01-01 00:00:00")).toDF("k", "v", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .createOrReplaceTempView("src_rows")
    val m = Model("inc_t", Nil, IncrementalMerge(Seq("k"), "ts"),
      (s, _) => s.table("src_rows"))
    ModelRegistry.run(spark, wh, Seq(m), "r1", auditTable = None)
    simulateSwapCrash(s"$work/inc_t")
    // second run brings only k=2; k=1 must be restored from backup
    Seq((2, "b", "2024-01-02 00:00:00")).toDF("k", "v", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .createOrReplaceTempView("src_rows")
    ModelRegistry.run(spark, wh, Seq(m), "r2", auditTable = None)
    assert(wh.read("inc_t").select("k").as[Int].collect().toSet == Set(1, 2))
  }

  test("partitioned sink: interrupted per-partition swap is healed and batch replays cleanly") {
    val pschema = StructType.fromDDL(
      "shipment_id STRING, status STRING, created_at TIMESTAMP, updated_at TIMESTAMP")
    val landing = Files.createTempDirectory("graft_crash_psink_l_")
    val work = Files.createTempDirectory("graft_crash_psink_")
    val target = s"$work/fact"; val ckpt = s"$work/ckpt"
    def runOnce(): Unit = IncrementalStream.runPartitionedUpsertSink(
      IncrementalStream.fileDropJson(spark, landing.toString, pschema),
      target, ckpt, keys = Seq("shipment_id"), order = Seq(col("updated_at")),
      partitionCol = "created_date", partition = to_date(col("created_at")))

    drop(landing, "b1.json",
      """{"shipment_id":"S1","status":"Created","created_at":"2024-01-01T08:00:00","updated_at":"2024-01-01T08:00:00"}""",
      """{"shipment_id":"S2","status":"Created","created_at":"2024-01-02T08:00:00","updated_at":"2024-01-02T08:00:00"}""")
    runOnce()

    // simulate a crash between the two renames of day-1's swap: live
    // partition moved to backup, staged replacement never promoted
    val f = fs(target)
    val live = new org.apache.hadoop.fs.Path(s"$target/created_date=2024-01-01")
    val bak = new org.apache.hadoop.fs.Path(
      s"$target/.graft_backup/created_date=2024-01-01")
    f.mkdirs(bak.getParent)
    assert(f.rename(live, bak))
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$target/.graft_staging/junk=1"))

    drop(landing, "b2.json",
      """{"shipment_id":"S3","status":"Created","created_at":"2024-01-03T07:00:00","updated_at":"2024-01-03T07:00:00"}""")
    runOnce()

    val t = spark.read.parquet(target)
      .select("shipment_id", "status").as[(String, String)].collect().toMap
    assert(t == Map("S1" -> "Created", "S2" -> "Created", "S3" -> "Created"))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$target/.graft_backup")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$target/.graft_staging")))
  }

  test("partitioned sink rejects NULL-derived partition values") {
    val pschema = StructType.fromDDL(
      "shipment_id STRING, status STRING, created_at TIMESTAMP, updated_at TIMESTAMP")
    val landing = Files.createTempDirectory("graft_crash_null_l_")
    val work = Files.createTempDirectory("graft_crash_null_")
    drop(landing, "b1.json",
      """{"shipment_id":"S1","status":"Created","created_at":null,"updated_at":"2024-01-01T08:00:00"}""")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalStream.runPartitionedUpsertSink(
        IncrementalStream.fileDropJson(spark, landing.toString, pschema),
        s"$work/fact", s"$work/ckpt", keys = Seq("shipment_id"),
        order = Seq(col("updated_at")),
        partitionCol = "created_date", partition = to_date(col("created_at")))
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(err).exists(e =>
      Option(e.getMessage).exists(_.contains("non-null"))))
  }

  test("asofJoin eventOrder makes equal-timestamp event ties deterministic") {
    import graft.ops.AsofJoin
    val events = Seq(
      ("k1", "2024-01-01 10:00:00", 1L, "first"),
      ("k1", "2024-01-01 10:00:00", 2L, "second"))
      .toDF("k", "ts", "event_id", "val")
      .withColumn("ts", col("ts").cast("timestamp"))
    val probes = Seq(("k1", "2024-01-01 11:00:00")).toDF("k", "pts")
      .withColumn("pts", col("pts").cast("timestamp"))
    val out = AsofJoin.asofJoin(probes, events, Seq("k"), "pts", "ts",
      eventValueCols = Seq("event_id", "val"), eventOrder = Seq("event_id"))
    val r = out.select("evt_event_id", "evt_val").as[(Long, String)].collect()
    assert(r.toSeq == Seq((2L, "second")))
    // tie-break column must be carried in eventValueCols
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probes, events, Seq("k"), "pts", "ts",
        eventValueCols = Seq("val"), eventOrder = Seq("event_id"))
    }
  }
}
