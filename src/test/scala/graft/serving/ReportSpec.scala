package graft.serving

import graft.SparkSpec

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("topN + htmlTable render the email-report shape (S18)") {
    val df = Seq(("Delhi", 30, 12.5), ("Mumbai", 55, 9.1), ("Pune", 12, 3.3))
      .toDF("city", "n_tickets", "avg_days")
    val top = Report.topN(df, "n_tickets", 2)
    assert(top.select("city").as[String].collect().toSeq == Seq("Mumbai", "Delhi"))
    val html = Report.htmlTable(top, caption = "Top cities <script>")
    assert(html.contains("<th>city</th>"))
    assert(html.contains("<td>Mumbai</td>"))
    assert(html.contains("Top cities &lt;script&gt;")) // escaped
    assert(!html.contains("<script>"))
  }

  test("driverRoundTrip and exportCsv (S14/S15)") {
    import org.apache.spark.sql.Row
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "n")
    val enriched = Report.driverRoundTrip(df)(rows =>
      rows.map(r => Row(r.getString(0).toUpperCase, r.getInt(1) * 10)))
    assert(enriched.orderBy("k").as[(String, Int)].collect().toSeq ==
      Seq(("A", 10), ("B", 20)))

    val out = java.nio.file.Files.createTempDirectory("graft_csv_").toString + "/x"
    Report.exportCsv(df, out)
    val back = spark.read.option("header", true).csv(out)
    assert(back.count() == 2 && back.columns.toSeq == Seq("k", "n"))
  }
}
