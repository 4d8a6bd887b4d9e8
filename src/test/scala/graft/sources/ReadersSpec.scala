package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): Path = Files.createTempDirectory("graft_src_")
  private def write(dir: Path, name: String, lines: String*): Unit =
    Files.writeString(dir.resolve(name), lines.mkString("\n"))

  private val shipmentSchema = StructType.fromDDL(
    "shipment_id STRING, cost DOUBLE, status STRING")

  test("json: schema'd bulk load (S3)") {
    val d = tmpDir()
    write(d, "shipment_1.json",
      """{"shipment_id":"S1","cost":10.5,"status":"Created"}""",
      """{"shipment_id":"S2","cost":20.0,"status":"Delivered"}""")
    val df = Readers.json(spark, s"$d/shipment_*.json", shipmentSchema)
    assert(df.count() == 2)
    assert(df.filter($"status" === "Delivered").select("shipment_id")
      .as[String].collect().toSeq == Seq("S2"))
  }

  test("jsonWithErrors: permissive corrupt routing (S4/P5)") {
    val d = tmpDir()
    write(d, "batch.json",
      """{"shipment_id":"S1","cost":10.5,"status":"Created"}""",
      """{"shipment_id":"S2","cost":"not-a-number","status":"x"}""",
      """this is not json at all""")
    val (valid, corrupt) = Readers.jsonWithErrors(spark, s"$d/batch.json",
      shipmentSchema)
    assert(valid.count() == 1)
    assert(corrupt.count() == 2)
  }

  test("csv: snowpark option parity (S5/S7)") {
    val d = tmpDir()
    write(d, "weather_a.csv",
      "city|temp|wind",
      "  Delhi |31.5|NULLVAL",
      "Mumbai| 29.0 |12.5")
    write(d, "skipme.txt", "nope")
    val df = Readers.csv(spark, d.toString,
      schema = Some(StructType.fromDDL("city STRING, temp DOUBLE, wind DOUBLE")),
      sep = "|", header = true, nullValue = "NULLVAL",
      pattern = Some("weather_*.csv"))
    val rows = df.orderBy("city").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "Delhi" && rows(0).isNullAt(2))
    assert(rows(1).getString(0) == "Mumbai" && rows(1).getDouble(1) == 29.0)
  }

  test("stageSelect: positional cols + file metadata + row numbers (S6)") {
    val d = tmpDir()
    write(d, "sales_1.csv", "1,a,10", "2,b,20")
    write(d, "sales_2.csv", "3,c,30")
    val df = Readers.stageSelect(spark, s"$d/sales_*.csv", nCols = 3)
    assert(df.columns.toSeq == Seq("c1", "c2", "c3", "file_name",
      "file_last_modified", "file_content_key", "file_row_number"))
    val rows = df.select($"c1", $"file_name", $"file_row_number")
      .as[(String, String, Int)].collect().sortBy(_._1)
    assert(rows.map(r => r._1 -> r._3).toSeq ==
      Seq("1" -> 1, "2" -> 2, "3" -> 1))
    assert(rows.forall(_._2.contains("sales_")))
    // content key: stable per file, distinct across files, md5-shaped
    val keys = df.select($"file_name", $"file_content_key")
      .distinct().as[(String, String)].collect().toMap
    assert(keys.size == 2 && keys.values.toSet.size == 2)
    assert(keys.values.forall(_.matches("[0-9a-f]{32}")))
    // CONTENT-derived: a same-size in-place overwrite (mtime preserved)
    // must change the key — metadata-only keys miss exactly this case
    val f1 = d.resolve("sales_1.csv")
    val mtime = f1.toFile.lastModified()
    write(d, "sales_1.csv", "9,z,99", "8,y,88") // same byte count
    f1.toFile.setLastModified(mtime)
    val keys2 = Readers.stageSelect(spark, s"$d/sales_*.csv", nCols = 3)
      .select($"file_name", $"file_content_key")
      .distinct().as[(String, String)].collect().toMap
    val k1 = keys.find(_._1.endsWith("sales_1.csv")).get
    val k2 = keys2.find(_._1.endsWith("sales_1.csv")).get
    assert(k1._2 != k2._2, "content change must change the key")
    assert(keys2.find(_._1.endsWith("sales_2.csv")).get._2 ==
      keys.find(_._1.endsWith("sales_2.csv")).get._2,
      "untouched file keeps its key")
  }

  test("stageHasFiles + archiveFiles (S16/S17)") {
    val d = tmpDir()
    write(d, "drop_1.csv", "x")
    assert(Readers.stageHasFiles(spark, s"$d/drop_*.csv"))
    val n = Readers.archiveFiles(spark, d.toString, s"$d/archive", "20240101",
      suffix = ".csv")
    assert(n == 1)
    assert(!Readers.stageHasFiles(spark, s"$d/drop_*.csv"))
    assert(Readers.stageHasFiles(spark, s"$d/archive/20240101/drop_*.csv"))
  }
}
