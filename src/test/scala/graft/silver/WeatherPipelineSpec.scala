package graft.silver

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.runner.ModelRegistry

/** Weather CSV landing → bronze (PATTERN-restricted COPY) → typed
  * silver, end-to-end through the model registry. */
class WeatherPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("weather models: pattern-filtered bronze, typed silver via registry") {
    val landing = Files.createTempDirectory("graft_weather_spec_")
    val header = "city,timestamp,weather_main,weather_description," +
      "temp,feels_like,humidity,wind_speed,clouds"
    write(landing, "weather_20240101120000.csv", header,
      "New York,1704110400,Clouds,scattered clouds,3.5,1.2,81,4.6,40",
      "Boston,1704110400,Clear,clear sky,-2.0,-6.5,55,7.1,0")
    write(landing, "weather_20240101130000.csv", header,
      "New York,1704114000,Rain,light rain,4.0,2.1,90,5.0,75")
    // decoy: same dir, must be excluded by PATTERN '.*weather_.*\.csv'
    write(landing, "sales_20240101.csv", "a,b", "1,2")

    val wh = new ModelRegistry.Warehouse(
      Files.createTempDirectory("graft_weather_wh_").toString, spark)
    ModelRegistry.run(spark, wh, WeatherPipeline.models(landing.toString),
      "r1", auditTable = None)

    val silver = wh.read("weather_silver")
    assert(silver.count() == 3) // decoy rows excluded
    val ny = silver.filter($"city" === "New York")
      .orderBy($"observed_at")
      .select($"weather_main", $"temp", $"humidity")
      .as[(String, Double, Long)].collect().toSeq
    assert(ny == Seq(("Clouds", 3.5, 81L), ("Rain", 4.0, 90L)))
    // epoch -> timestamp typing
    assert(silver.schema("observed_at").dataType.typeName == "timestamp")
    assert(silver.filter($"city" === "Boston").select($"temp")
      .as[Double].head() == -2.0)
  }
}
