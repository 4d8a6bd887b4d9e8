package graft.silver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sources.Readers

/** The weather side-pipeline (`dags/weather_util.py:8-87` +
  * `dags/weather_api_dag.py:59-68`): OpenWeather JSON is flattened to
  * 9 CSV fields, landed as `weather_YYYYMMDDHHMMSS.csv`, bulk-loaded
  * with COPY INTO (PATTERN '.*weather_.*\.csv') and typed by the
  * target table. The HTTP fetch-and-land front half is
  * [[graft.sources.HttpIngest.landWeatherCsv]] (pluggable transport);
  * this pipeline consumes its landed CSV files.
  */
object WeatherPipeline {

  /** The 9 extract_csv_data fields (`weather_util.py:14-25`), as
    * landed: strings for the numerics — typing happens in silver. */
  val bronzeSchema: StructType = StructType.fromDDL(
    "city STRING, timestamp BIGINT, weather_main STRING, " +
      "weather_description STRING, temp STRING, feels_like STRING, " +
      "humidity STRING, wind_speed STRING, clouds STRING")

  /** Bronze: the COPY INTO analog — header CSV glob restricted to the
    * reference's PATTERN so unrelated files in the landing dir are
    * ignored (`weather_api_dag.py:63-66`). */
  def bronze(spark: SparkSession, landingDir: String): DataFrame =
    Readers.csv(spark, landingDir, schema = Some(bronzeSchema),
      pattern = Some("weather_*.csv"))

  /** Typed silver: epoch seconds → timestamp plus numeric casts (the
    * weather_data table's column types). */
  def silver(bronze: DataFrame): DataFrame =
    bronze.select(
      col("city"),
      timestamp_seconds(col("timestamp")).as("observed_at"),
      col("weather_main"),
      col("weather_description"),
      col("temp").cast("double").as("temp"),
      col("feels_like").cast("double").as("feels_like"),
      col("humidity").cast("long").as("humidity"),
      col("wind_speed").cast("double").as("wind_speed"),
      col("clouds").cast("long").as("clouds"))

  /** The pipeline as registry models: landing → bronze view → silver
    * table (materialized via the atomic-swap warehouse). */
  def models(landingDir: String): Seq[graft.runner.ModelRegistry.Model] = {
    import graft.runner.ModelRegistry._
    Seq(
      Model("weather_bronze", Nil, View, (s, _) => bronze(s, landingDir)),
      Model("weather_silver", Seq("weather_bronze"), Table,
        (_, d) => silver(d("weather_bronze"))))
  }
}
