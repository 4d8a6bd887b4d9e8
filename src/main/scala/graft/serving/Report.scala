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
