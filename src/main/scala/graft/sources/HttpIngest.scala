package graft.sources

import java.nio.file.{Files, Path, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The HTTP ingestion FRONT HALF of S1/S2 — the reference's
  * fetch-and-land orchestration re-expressed behind a pluggable
  * transport, the same seam pattern the S18/S19 effectors use for
  * SES/SNS (zero-egress sandbox: the network client is injected, the
  * behavior around it is real and tested):
  *
  *  - S1 (`dags/restapi.py:16-44`, `dags/2_logistics-shipment-dag
  *    .py:25-56`): GET with a bearer-token header, raise on non-2xx,
  *    land the raw JSON body as `<prefix>_<timestamp>.json` — failures
  *    PROPAGATE (the reference wraps and re-raises: the DAG task must
  *    fail).
  *  - S2 (`dags/weather_util.py:8-87`): per city, GET the templated
  *    URL, extract the fixed 9-field map (missing `weather` list →
  *    null main/description), SWALLOW per-city failures (log-and-
  *    continue), and land one header CSV `weather_<timestamp>.csv`;
  *    when EVERY city fails, land nothing and report failure (the
  *    reference's statusCode-500 branch).
  *
  * The landed files feed the engine-side readers unchanged
  * ([[Readers.csv]] / [[Readers.jsonOrdered]],
  * [[graft.silver.WeatherPipeline.bronze]]). Timestamps are
  * caller-supplied (the DAG's logical date in the reference) — never
  * wall-clock, so landings are deterministic and replayable.
  */
object HttpIngest {

  /** Minimal HTTP response surface the ingest logic needs. */
  final case class Response(status: Int, body: String)

  /** The injected network client: (url, headers) → response. May
    * throw — both ingest paths handle failure per their contract. */
  type Transport = (String, Map[String, String]) => Response

  /** S1: fetch one JSON payload and land it verbatim. Non-2xx or a
    * transport exception propagates as RuntimeException (the
    * reference's `raise_for_status` + re-raise). Returns the landed
    * file path. */
  def landJson(transport: Transport, url: String, bearerToken: String,
      landingDir: String, namePrefix: String, timestamp: String): Path = {
    val resp =
      try transport(url, Map("Authorization" -> s"Bearer $bearerToken"))
      catch { case e: Exception =>
        throw new RuntimeException(s"Upload failed: ${e.getMessage}", e)
      }
    if (resp.status < 200 || resp.status >= 300)
      throw new RuntimeException(s"Upload failed: HTTP ${resp.status}")
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"${namePrefix}_$timestamp.json"), resp.body)
  }

  /** The 9 extract_csv_data fields in landed order
    * (`weather_util.py:14-25`). */
  val weatherFields: Seq[String] = Seq("city", "timestamp", "weather_main",
    "weather_description", "temp", "feels_like", "humidity", "wind_speed",
    "clouds")

  /** One city's row from the OpenWeather JSON — None for main/
    * description when the `weather` list is absent or empty, exactly
    * the reference's guarded extraction. Throws on missing required
    * numerics (caught per city by [[landWeatherCsv]]). */
  def extractWeatherRow(city: String, json: String): Seq[Option[String]] = {
    val j = JsonMethods.parse(json)
    def str(v: JValue): Option[String] = v match {
      case JString(s) => Some(s)
      case JInt(i) => Some(i.toString)
      case JLong(l) => Some(l.toString)
      case JDouble(d) => Some(d.toString)
      case JDecimal(d) => Some(d.toString)
      case _ => None
    }
    def req(v: JValue, name: String): Option[String] =
      str(v).orElse(throw new NoSuchElementException(name))
    val weather0 = j \ "weather" match {
      case JArray(h :: _) => h
      case _ => JNothing
    }
    Seq(
      Some(city),
      str(j \ "dt"),
      str(weather0 \ "main"),
      str(weather0 \ "description"),
      req(j \ "main" \ "temp", "main.temp"),
      req(j \ "main" \ "feels_like", "main.feels_like"),
      req(j \ "main" \ "humidity", "main.humidity"),
      req(j \ "wind" \ "speed", "wind.speed"),
      req(j \ "clouds" \ "all", "clouds.all"))
  }

  /** S2: fetch every city, extract, and land ONE header CSV. Per-city
    * failures are swallowed (the city is skipped); if every city
    * fails, nothing lands and None is returned (the reference's
    * statusCode-500 branch). The `{city}` / `{api_key}` placeholders
    * mirror the reference's URL template. */
  def landWeatherCsv(transport: Transport, urlTemplate: String,
      cities: Seq[String], apiKey: String, landingDir: String,
      timestamp: String): Option[Path] = {
    val rows = cities.flatMap { city =>
      try {
        val url = urlTemplate
          .replace("{city}", city).replace("{api_key}", apiKey)
        val resp = transport(url, Map.empty)
        if (resp.status < 200 || resp.status >= 300)
          throw new RuntimeException(s"HTTP ${resp.status}")
        Some(extractWeatherRow(city, resp.body))
      } catch { case e: Exception =>
        System.err.println(s"Error fetching data for $city: ${e.getMessage}")
        None
      }
    }
    if (rows.isEmpty) None
    else {
      val dir = Paths.get(landingDir)
      Files.createDirectories(dir)
      // RFC-4180 minimal quoting (the reference's csv.DictWriter
      // behavior): a cell containing comma, quote, CR or LF is wrapped
      // in double quotes with embedded quotes doubled — a city name
      // like `Washington, D.C.` must not shift the columns.
      def cell(v: String): String =
        if (v.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      val csv = (weatherFields.map(cell).mkString(",") +: rows.map(
        _.map(o => cell(o.getOrElse(""))).mkString(","))).mkString("", "\r\n", "\r\n")
      Some(Files.writeString(
        dir.resolve(s"weather_$timestamp.csv"), csv))
    }
  }
}
