package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S18 serving: the reference renders gold aggregates as an HTML table
  * and e-mails it via SES (`dags/snowflake/email_utils.py:21-127`,
  * `dags/4_logistics_ticket_classifier_full_dag.py:106-150`). The
  * engine-side part is: compute the small summary DISTRIBUTED, bring
  * only the final rows to the driver, format. Transport (SES/SMTP) is
  * out of engine, as in the reference.
  */
object Report {

  /** Top-N rows by a metric (TakeOrderedAndProject — no global sort),
    * the `sort_values().head(n)` pattern of the e-mail report. */
  def topN(df: DataFrame, metric: String, n: Int): DataFrame =
    df.orderBy(col(metric).desc).limit(n)

  /** S14: the pandas round-trip, Spark-side. The reference pulls a
    * whole table to the client, enriches it in-process, and writes it
    * back (`dags/4_logistics_ticket_classifier_full_dag.py:65-78`).
    * The faithful (anti-)pattern: collect → driver-side transform →
    * createDataFrame. Kept ONLY for small summary tables; the engine's
    * real enrichment path is distributed (`TicketClassifier.classify`). */
  def driverRoundTrip(df: DataFrame)(
      f: Seq[org.apache.spark.sql.Row] => Seq[org.apache.spark.sql.Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    spark.createDataFrame(f(df.collect().toSeq).asJava, df.schema)
  }

  /** S15: fetch-to-CSV export (`...:88-103`): one header'd CSV file. */
  def exportCsv(df: DataFrame, path: String, limit: Int = 1000): Unit =
    df.limit(limit).coalesce(1)
      .write.mode("overwrite").option("header", true).csv(path)

  /** Render a (small) DataFrame as an HTML table. Only `limit` rows
    * cross the driver boundary. */
  def htmlTable(df: DataFrame, limit: Int = 100, caption: String = ""): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val head = cols.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map { r =>
      cols.indices.map { i =>
        val v = if (r.isNullAt(i)) "" else r.get(i).toString
        s"<td>${esc(v)}</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    val cap = if (caption.nonEmpty) s"<caption>${esc(caption)}</caption>" else ""
    s"""<table border="1">$cap<thead><tr>$head</tr></thead>
       |<tbody>
       |$body
       |</tbody></table>""".stripMargin
  }
}
