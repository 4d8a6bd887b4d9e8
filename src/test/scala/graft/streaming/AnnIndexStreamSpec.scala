package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.ProductQuantizer

/** Streaming IVF-PQ index maintenance: micro-batches encode against a
  * FROZEN state and append per-batch subdirectories; re-delivered
  * vectors are suppressed by the other batches' claims; the streamed
  * index equals a one-shot frozen-state encode of the distinct
  * vectors. */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def vecRow(i: Long): String = {
    val e = Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40) / 8.0f)
    s"""{"vec_id":$i,"embedding":[${e.mkString(",")}]}"""
  }
  private def drop(dir: Path, name: String, rows: String*): Unit =
    Files.writeString(dir.resolve(name), rows.mkString("\n"))

  test("foreachBatch ingest: per-micro-batch subdirs, frozen state, " +
      "re-delivery suppressed, equals one-shot encode") {
    val landing = Files.createTempDirectory("graft_annstream_landing_")
    val work = Files.createTempDirectory("graft_annstream_")
    val idx = s"$work/index"; val ckpt = s"$work/ckpt"
    def emb(ids: Seq[Long]) = ids.map(i =>
      i -> Seq.tabulate(8)(d => ((i * 5 + d * 11) % 40).toFloat / 8f))
      .toDF("vec_id", "embedding")
    // state trains ONCE, on the first ten vectors
    val (coarse, cents) = ProductQuantizer.ivfPqState(emb(0L until 10L),
      dim = 8, kc = 2, cIters = 1, m = 2, k = 3, iters = 1)

    // one sink run over whatever currently sits in the landing dir
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .json(landing.toString)
      val q = AnnIndexStream.runIngestSink(src, coarse, cents, idx, ckpt,
        dim = 8, m = 2)
      q.processAllAvailable()
      q.stop()
    }

    // micro-batch 0: vectors 0..9
    drop(landing, "b1.json", (0L until 10L).map(vecRow): _*)
    runOnce()
    // micro-batch 1 (same checkpoint → next batch id): vectors 8..15,
    // where 8 and 9 are RE-DELIVERED
    drop(landing, "b2.json", (8L until 16L).map(vecRow): _*)
    runOnce()

    val table = spark.read.option("recursiveFileLookup", "true")
      .parquet(idx)
    // every distinct vector indexed exactly once (m=2 rows each)
    assert(table.count() == 16 * 2)
    // batch ids are namespaced by the checkpoint (round-8 ADVICE: a
    // NEW checkpoint must never collide with a prior run's subdirs);
    // the same checkpoint across both runOnce() calls keeps one
    // namespace with consecutive micro-batch counters
    val ids = table.select("batch_id").distinct().as[String]
      .collect().toSet
    assert(ids.size == 2)
    val ns = ids.map(_.split("-")(1))
    assert(ns.size == 1 && ns.head.matches("[0-9a-f]{8}"))
    assert(ids.map(_.split("-")(2)) == Set("0", "1"))
    // re-delivered ids live only in their FIRST batch
    assert(table.filter(col("vec_id").isin(8L, 9L))
      .select("batch_id").distinct().as[String].collect().toSeq
      == Seq(s"stream-${ns.head}-0"))
    // streamed index == one-shot frozen-state encode of the distinct set
    val direct = ProductQuantizer.ivfPqEncodeWith(coarse, cents,
      emb(0L until 16L), dim = 8, m = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val streamed = table.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[Int]("sub"), r.getAs[Long]("code"))).toSet
    assert(streamed == direct)
  }
}
