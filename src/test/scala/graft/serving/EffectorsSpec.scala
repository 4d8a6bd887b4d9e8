package graft.serving

import graft.SparkSpec

/** S18/S19 effector contract: retry-then-propagate for the report
  * send, retry-then-swallow for the failure alert, and the reference's
  * report shape (summary + top-N + group breakdown; explicit no-data
  * mail for an empty frame). */
class EffectorsSpec extends SparkSpec {
  import spark.implicits._

  test("sendEmail delivers first try and records the message") {
    val t = new RecordingTransport()
    val d = Effectors.sendEmail(t, "ops@example.com", "s", "<p>b</p>")
    assert(d.attempts == 1)
    assert(t.sent.map(_.subject) == Seq("s"))
    assert(t.sent.head.endpoint == "ops@example.com")
  }

  test("sendEmail retries through transient failures") {
    val t = new RecordingTransport(failures = 2)
    val d = Effectors.sendEmail(t, "to", "s", "b", retries = 2)
    assert(d.attempts == 3)
    assert(t.sent.size == 1)
  }

  test("sendEmail propagates once retries are exhausted (S18: a lost " +
      "report must fail the task)") {
    val t = new RecordingTransport(failures = 10)
    val e = intercept[RuntimeException] {
      Effectors.sendEmail(t, "to", "s", "b", retries = 1)
    }
    assert(e.getMessage.contains("transport failure"))
    assert(t.attemptCount == 2) // initial + 1 retry
    assert(t.sent.isEmpty)
  }

  test("failureAlert formats the reference payload and subject") {
    val t = new RecordingTransport()
    val d = Effectors.failureAlert(t, "arn:topic", "daily_dag", "load_gold",
      "2026-08-12T00:00:00", "http://logs/1")
    assert(d.isDefined)
    val m = t.sent.head
    assert(m.subject == "Task Failure: daily_dag.load_gold")
    assert(m.body.contains("DAG: daily_dag"))
    assert(m.body.contains("Task: load_gold"))
    assert(m.body.contains("Log URL: http://logs/1"))
  }

  test("failureAlert swallows transport errors (S19: alerting must " +
      "never mask the original failure)") {
    val t = new RecordingTransport(failures = 10)
    val d = Effectors.failureAlert(t, "arn:topic", "d", "t", "now", "url",
      retries = 1)
    assert(d.isEmpty)     // lost, reported as None, NOT thrown
    assert(t.attemptCount == 2)
  }

  test("dailyReportHtml carries summary, top-N and group breakdown") {
    val df = Seq(
      ("2026-08-12", "store1", "cityA", 100.0),
      ("2026-08-12", "store2", "cityA", 300.0),
      ("2026-08-12", "store3", "cityB", 200.0))
      .toDF("sales_date", "store", "city", "gross")
    val (subject, html) =
      Effectors.dailyReportHtml(df, "sales_date", Seq("gross"), "gross", "city")
    assert(subject == "Daily Report - 2026-08-12")
    assert(html.contains("Executive Summary"))
    assert(html.contains("600.0"))          // distributed total
    assert(html.contains("store2"))         // top row present
    assert(html.contains("cityB"))          // group breakdown present
  }

  test("empty frame still sends the explicit no-data mail") {
    val t = new RecordingTransport()
    val empty = Seq.empty[(String, String, Double)]
      .toDF("sales_date", "city", "gross")
    val d = Effectors.sendDailyReport(empty, t, "to", "sales_date",
      Seq("gross"), "gross", "city")
    assert(d.attempts == 1)
    assert(t.sent.head.subject == "No Data for Today")
    assert(t.sent.head.body.contains("No data available"))
  }
}
