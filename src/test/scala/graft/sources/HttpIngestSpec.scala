package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.silver.WeatherPipeline

/** The HTTP front half of S1/S2 behind a fake transport: landing
  * formats, failure semantics (S1 propagates, S2 swallows per city /
  * fails only when all cities fail), and the landed files flowing into
  * the engine-side readers unchanged. */
class HttpIngestSpec extends SparkSpec {
  import spark.implicits._

  private val weatherJson =
    """{"dt": 1718000000,
      | "weather": [{"main": "Rain", "description": "light rain"}],
      | "main": {"temp": 21.5, "feels_like": 22.0, "humidity": 60},
      | "wind": {"speed": 3.2}, "clouds": {"all": 75}}""".stripMargin

  test("landJson: 2xx lands the body verbatim; non-2xx and transport " +
      "exceptions propagate") {
    val dir = Files.createTempDirectory("graft_http_").toString
    val p = HttpIngest.landJson(
      (_, headers) => {
        assert(headers("Authorization").startsWith("Bearer "))
        HttpIngest.Response(200, """[{"shipment_id": 1}]""")
      },
      "http://api/generate", "tok", dir, "shipment", "20240101_000000")
    assert(p.getFileName.toString == "shipment_20240101_000000.json")
    assert(Files.readString(p) == """[{"shipment_id": 1}]""")
    intercept[RuntimeException](HttpIngest.landJson(
      (_, _) => HttpIngest.Response(503, "oops"),
      "http://api", "tok", dir, "s", "t"))
    intercept[RuntimeException](HttpIngest.landJson(
      (_, _) => throw new java.io.IOException("conn refused"),
      "http://api", "tok", dir, "s", "t"))
  }

  test("landWeatherCsv: lands the 9-field header CSV that the weather " +
      "bronze/silver pipeline reads end to end") {
    val dir = Files.createTempDirectory("graft_http_w_").toString
    val p = HttpIngest.landWeatherCsv(
      (url, _) => {
        assert(url.contains("q=Oslo") && url.contains("appid=k1"))
        HttpIngest.Response(200, weatherJson)
      },
      "http://w/data?q={city}&appid={api_key}", Seq("Oslo"), "k1",
      dir, "20240101000000")
    assert(p.get.getFileName.toString == "weather_20240101000000.csv")
    val silver = WeatherPipeline.silver(WeatherPipeline.bronze(spark, dir))
      .as[(String, java.sql.Timestamp, String, String,
        Double, Double, Long, Double, Long)].collect().toSeq
    assert(silver == Seq(("Oslo",
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1718000000L)),
      "Rain", "light rain", 21.5, 22.0, 60L, 3.2, 75L)))
  }

  test("landWeatherCsv: per-city failures are skipped; all-failed " +
      "lands nothing; missing weather list nulls the two text fields") {
    val dir = Files.createTempDirectory("graft_http_f_").toString
    val noWeatherList = weatherJson.replace(
      """"weather": [{"main": "Rain", "description": "light rain"}],""", "")
    val p = HttpIngest.landWeatherCsv(
      (url, _) =>
        if (url.contains("Down")) HttpIngest.Response(500, "boom")
        else HttpIngest.Response(200, noWeatherList),
      "http://w?q={city}&k={api_key}", Seq("Down", "Oslo"), "k",
      dir, "t1")
    assert(p.isDefined)
    val rows = WeatherPipeline.silver(WeatherPipeline.bronze(spark, dir))
      .collect()
    assert(rows.length == 1 && rows(0).getString(0) == "Oslo")
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3)) // main/description
    // every city failing → None, nothing landed
    val none = HttpIngest.landWeatherCsv(
      (_, _) => throw new java.io.IOException("down"),
      "http://w?q={city}&k={api_key}", Seq("A", "B"), "k",
      Files.createTempDirectory("graft_http_n_").toString, "t2")
    assert(none.isEmpty)
  }
}
