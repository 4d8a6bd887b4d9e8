package graft

/** The session factory must hand back a session whose SQL surface
  * includes BOTH the custom aggregates (kmv_distinct) and the native
  * expressions (graft_*) — whether the session was freshly built with
  * extensions or reused from an earlier builder (retrofit path). */
class GraftSessionSpec extends SparkSpec {

  test("getOrCreate exposes native expressions and aggregates in SQL") {
    // the shared test JVM already holds a session built WITHOUT the
    // extensions — this exercises exactly the retrofit branch
    val s = GraftSession.getOrCreate("graft-session-spec")
    val g = s.sql("SELECT graft_word_shingles('a b c', 2) AS g")
      .collect().head.getSeq[String](0)
    assert(g == Seq("a b", "b c"))
    assert(s.sql("SELECT graft_dotq(array(1L,2L), array(3L,4L)) AS d")
      .collect().head.getLong(0) == 11L)
    assert(s.sql(
      "SELECT kmv_distinct(graft_md5prefix60(CAST(x AS STRING))) AS n " +
        "FROM range(1000) t(x)").collect().head.getDouble(0) > 0.0)
  }
}
