package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MixtureOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: equal-epoch property — every source's k-th quantile " +
      "lands at the same virtual time") {
    // 4 docs of src a, 2 of src b: b's docs must land at vt 500000 and
    // 1000000 — interleaved halfway and at the end of a's pass
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"), (11L, "b"))
      .toDF("doc_id", "source")
    val got = MixtureOrder.interleave(docs)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got(1L) == 250000L && got(4L) == 1000000L)
    assert(got(10L) == 500000L && got(11L) == 1000000L)
    // read order: a1, b10 and a2 interleave before a3
    val order = MixtureOrder.interleave(docs)
      .collect().map(_.getLong(0)).toSeq
    assert(order.indexOf(10L) < order.indexOf(3L),
      s"b's first doc must interleave into a's pass: $order")
  }

  test("interleave on real documents: a permutation (no row gained or " +
      "lost), vt within (0, strideScale], every source finishes together") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = MixtureOrder.interleave(docs).cache()
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    assert(out.filter(col("vt") <= 0 || col("vt") > 1000000L).count() == 0)
    // equal-epoch: each source's LAST doc lands exactly at strideScale
    val lastVt = out.groupBy("source").agg(max("vt").as("m"))
    assert(lastVt.filter(col("m") =!= 1000000L).count() == 0)
  }

  test("interleave: vt is integer floor division, ranks dense per source") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "source")
    val got = MixtureOrder.interleave(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 333333L), (2L, 2L, 666666L),
      (3L, 3L, 1000000L)))
  }
}
