package graft.serving

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S18/S19 outbound effectors behind a pluggable transport.
  *
  * The reference's last mile is two network sends the sandbox cannot
  * perform: an SES e-mail carrying the daily HTML report
  * (`dags/snowflake/email_utils.py:82-97`) and an SNS alert fired from
  * the DAG's failure callback (`dags/utils/aws_utils.py:6-38`). The
  * engine-side contract IS testable, and it is asymmetric in a way
  * that matters operationally:
  *
  *  - the REPORT send PROPAGATES failure (the reference re-raises the
  *    SES ClientError — a missing business report must fail the task);
  *  - the failure ALERT swallows its own failure (the reference logs
  *    and returns — an alerting error must never mask the original
  *    task failure it is reporting).
  *
  * [[Transport]] is the seam: production plugs an SES/SNS/SMTP client;
  * specs and local runs plug [[RecordingTransport]]. Retry policy
  * lives HERE (not in transports) so every transport gets the same
  * contract.
  */
trait Transport {
  /** Deliver one message; returns a provider message id. MUST throw on
    * delivery failure — retry/swallow policy is [[Effectors]]' job. */
  def send(endpoint: String, subject: String, body: String): String
}

/** In-memory transport for specs and dry runs: records every accepted
  * message, failing the first `failures` attempts (to exercise the
  * retry contract). Thread-safe. */
final class RecordingTransport(failures: Int = 0) extends Transport {
  final case class Sent(endpoint: String, subject: String, body: String)
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Sent]()
  private val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
  def send(endpoint: String, subject: String, body: String): String = {
    val n = attempts.incrementAndGet()
    if (n <= failures)
      throw new RuntimeException(s"transport failure $n of $failures")
    buf.add(Sent(endpoint, subject, body))
    s"msg-$n"
  }
  def sent: Seq[Sent] = { import scala.jdk.CollectionConverters._
    buf.asScala.toSeq }
  def attemptCount: Int = attempts.get()
}

object Effectors {

  /** One completed delivery: provider id + how many attempts it took. */
  final case class Delivery(id: String, attempts: Int)

  /** S18 report send: up to `retries` re-attempts, then the LAST error
    * propagates — a report that cannot be delivered fails the caller,
    * as in the reference (`email_utils.py:96-97` re-raises). */
  def sendEmail(t: Transport, to: String, subject: String, html: String,
      retries: Int = 2): Delivery = {
    var attempt = 0
    var last: Throwable = null
    while (attempt <= retries) {
      attempt += 1
      try return Delivery(t.send(to, subject, html), attempt)
      catch { case e: Throwable => last = e }
    }
    throw last
  }

  /** S19 failure alert: formats the reference's alert payload
    * (`aws_utils.py:12-31` — DAG/task/execution time/log URL, subject
    * `Task Failure: dag.task`) and sends WITHOUT propagating transport
    * errors: `None` means the alert was lost, and that is deliberate —
    * the alert path must never mask the failure it reports. */
  def failureAlert(t: Transport, topic: String, dag: String, task: String,
      executionTime: String, logUrl: String, retries: Int = 2): Option[Delivery] = {
    val message =
      s"""Task Failed
         |
         |DAG: $dag
         |Task: $task
         |Execution Time: $executionTime
         |Log URL: $logUrl""".stripMargin
    try Some(sendEmail(t, topic, s"Task Failure: $dag.$task", message, retries))
    catch { case _: Throwable => None }
  }

  /** The daily-report formatter (`email_utils.py:21-77`), generalized:
    * an executive summary of metric totals, a top-N section by
    * `topMetric`, and a per-`groupCol` breakdown. All aggregation runs
    * DISTRIBUTED; only the final summary rows cross the driver
    * boundary (1 + topN + #groups). Returns (subject, html); an empty
    * frame yields the reference's explicit no-data message rather than
    * an empty table. */
  def dailyReportHtml(df: DataFrame, dateCol: String, metrics: Seq[String],
      topMetric: String, groupCol: String, topN: Int = 5): (String, String) = {
    val head = df.select(col(dateCol)).limit(1).collect()
    if (head.isEmpty)
      return ("No Data for Today", "<p>No data available for today.</p>")
    val date = head(0).get(0).toString
    val totals = df.agg(
      count(lit(1)).as("n_rows"),
      metrics.map(m => sum(col(m)).as(s"total_$m")): _*)
    val byGroup = df.groupBy(col(groupCol))
      .agg(metrics.map(m => sum(col(m)).as(s"total_$m")).head,
        metrics.map(m => sum(col(m)).as(s"total_$m")).tail: _*)
      .orderBy(col(groupCol))
    val html =
      s"""<html><body>
         |<h2>Daily Report - $date</h2>
         |<h3>Executive Summary</h3>
         |${Report.htmlTable(totals, 1)}
         |<h3>Top $topN by $topMetric</h3>
         |${Report.htmlTable(Report.topN(df, topMetric, topN), topN)}
         |<h3>Breakdown by $groupCol</h3>
         |${Report.htmlTable(byGroup, 1000)}
         |</body></html>""".stripMargin
    (s"Daily Report - $date", html)
  }

  /** End-to-end S18: format [[dailyReportHtml]] and deliver it. The
    * empty-frame case still SENDS (the reference e-mails "No Data"
    * rather than staying silent — silence is indistinguishable from a
    * broken pipeline). Failure propagates per [[sendEmail]]. */
  def sendDailyReport(df: DataFrame, t: Transport, to: String,
      dateCol: String, metrics: Seq[String], topMetric: String,
      groupCol: String, retries: Int = 2): Delivery = {
    val (subject, html) =
      dailyReportHtml(df, dateCol, metrics, topMetric, groupCol)
    sendEmail(t, to, subject, html, retries)
  }
}
