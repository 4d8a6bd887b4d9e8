package graft.pipelines

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => T}
import graft.runner.ModelRegistry

/** End-to-end corpus curation over real documents through the model
  * registry: each stage shrinks (or keeps) the corpus, exact dedup
  * leaves unique fingerprints, near-dup dedup keeps exactly one doc
  * per LSH cluster, stats match the surviving set. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("registry run: monotone filtering, unique fps, one survivor per cluster") {
    val wh = new ModelRegistry.Warehouse(
      Files.createTempDirectory("graft_corpus_wh_").toString, spark)
    // seed the warehouse's `documents` source from testdata
    graft.ops.Upsert.overwriteAtomic(
      Tables(spark, sf("sf0.001"), "documents"), s"${wh.root}/documents")

    val res = ModelRegistry.run(spark, wh, CorpusPipeline.models(), "r1",
      auditTable = None)

    val nDocs = wh.read("documents").count()
    val nQuality = res("corpus_quality").count()
    val nEn = res("corpus_en").count()
    val nUnique = res("corpus_unique").count()
    val nCanonical = res("corpus_canonical").count()
    assert(nDocs >= nQuality && nQuality >= nEn && nEn >= nUnique &&
      nUnique >= nCanonical, s"$nDocs >= $nQuality >= $nEn >= $nUnique >= $nCanonical")
    assert(nCanonical > 0)

    // exact dedup: fingerprints unique among survivors
    val fps = res("corpus_unique")
      .select(T.fingerprint(col("text")).as("fp"))
    assert(fps.distinct().count() == nUnique)

    // near-dup: survivors share no LSH cluster — re-deriving pairs on
    // the canonical set and clustering again must change nothing
    val again = CorpusPipeline.dedupNear(res("corpus_canonical")).count()
    assert(again == nCanonical, s"dedupNear not idempotent: $again != $nCanonical")

    // stats row describes the canonical corpus
    val st = res("corpus_stats")
      .select("n_docs", "total_tokens").as[(Long, Long)].head()
    assert(st._1 == nCanonical && st._2 > 0)
  }

  test("curationFunnel: per-source counts shrink through the stages " +
      "for exactly the designed reasons") {
    val en = "the cat is sitting on a mat and the dog is of to in there"
    val docs = Seq(
      (1L, en, "s1"),            // survives everything
      (2L, en, "s1"),            // exact dup of 1: dies at dedup
      (3L, "x", "s1"),           // 1 token: dies at quality
      (4L, en + " extra", "s2")  // unique en: survives
    ).toDF("doc_id", "text", "source")
    val got = CorpusPipeline.curationFunnel(docs)
      .orderBy($"stage_ord", $"source")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (0, "raw", "s1", 3L), (0, "raw", "s2", 1L),
      (1, "quality", "s1", 2L), (1, "quality", "s2", 1L),
      (2, "lang", "s1", 2L), (2, "lang", "s2", 1L),
      (3, "dedup", "s1", 1L), (3, "dedup", "s2", 1L)))
  }

  test("ingestNew: first-seen across batches, earliest id within a batch") {
    val seen = Files.createTempDirectory("graft_seen_").toString + "/seen"
    val b1 = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val b2 = Seq((4L, "gamma"), (5L, "delta"))
      .toDF("doc_id", "text")

    val r1 = CorpusPipeline.ingestNew(spark, b1, seen, "b1")
    assert(r1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    val r2 = CorpusPipeline.ingestNew(spark, b2, seen, "b2")
    assert(r2.select("doc_id").as[Long].collect().toSeq == Seq(5L))

    // seen table holds one row per distinct fingerprint, tagged by claimer
    val st = seenState(seen)
    assert(st.count() == 3 && st.select("__fp").distinct().count() == 3)
  }

  private def seenState(seen: String) =
    graft.ops.Upsert.readBatchState(spark, seen, "",
      "__fp STRING, batch_id STRING").get

  test("ingestNew: replaying a completed batch re-emits the same rows") {
    val seen = Files.createTempDirectory("graft_seen_").toString + "/seen"
    val b1 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val b2 = Seq((3L, "beta"), (4L, "gamma")).toDF("doc_id", "text")

    CorpusPipeline.ingestNew(spark, b1, seen, "b1").count()
    val first = CorpusPipeline.ingestNew(spark, b2, seen, "b2")
      .select("doc_id").as[Long].collect().toSeq
    assert(first == Seq(4L))
    // the returned frame evaluates to the batch's claims after its own
    // state write — and a full replay is byte-identical
    val replay = CorpusPipeline.ingestNew(spark, b2, seen, "b2")
      .select("doc_id").as[Long].collect().toSeq
    assert(replay == Seq(4L), s"replay emitted $replay")
    assert(seenState(seen).count() == 3)
  }

  test("ingestNew: recovers a crashed batch-subdir swap before reading") {
    val seen = Files.createTempDirectory("graft_seen_").toString + "/seen"
    CorpusPipeline.ingestNew(spark,
      Seq((1L, "alpha")).toDF("doc_id", "text"), seen, "b1").count()
    // simulate the crash window on b1's subdir: renamed away, never
    // promoted back — the next reader must roll it forward
    val root = new org.apache.hadoop.fs.Path(seen)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(root, "b1"),
      new org.apache.hadoop.fs.Path(root, "b1__old")))
    val r = CorpusPipeline.ingestNew(spark,
      Seq((2L, "alpha"), (3L, "beta")).toDF("doc_id", "text"), seen, "b2")
    // pre-crash state was recovered, so "alpha" is still seen
    assert(r.select("doc_id").as[Long].collect().toSeq == Seq(3L))
    assert(seenState(seen).count() == 2)
  }

  test("writeShards: bounded rows per file, all rows present") {
    val out = Files.createTempDirectory("graft_shards_").toString + "/shards"
    val df = spark.range(1000).select(col("id"), (col("id") % 7).as("v"))
    CorpusPipeline.writeShards(df, out, rowsPerShard = 100, numWriters = 3)
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    val perFile = back.groupBy(input_file_name()).count()
      .select("count").as[Long].collect()
    assert(perFile.forall(_ <= 100), s"oversized shard: ${perFile.max}")
    assert(perFile.length >= 10)
  }

  test("writeShardsShuffled: byte-reproducible training order, seed reshuffles") {
    val base = Files.createTempDirectory("graft_shuf_").toString
    val df = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 13).as("v"))
    // per-file ordered contents, keyed by shard index in the file name
    def contents(path: String): Map[String, Seq[(Long, Long)]] = {
      val rows = spark.read.parquet(path)
        .select(input_file_name().as("f"), col("doc_id"), col("v"))
        .as[(String, Long, Long)].collect()
      rows.groupBy(r => r._1.replaceAll(".*/part-(\\d+)-.*", "$1"))
        .map { case (k, v) => k -> v.map(r => (r._2, r._3)).toSeq }
    }
    CorpusPipeline.writeShardsShuffled(df, s"$base/a", 64, 4, seed = 1)
    CorpusPipeline.writeShardsShuffled(df, s"$base/b", 64, 4, seed = 1)
    CorpusPipeline.writeShardsShuffled(df, s"$base/c", 64, 4, seed = 2)
    val a = contents(s"$base/a")
    // rerun with the same seed: identical shard assignment AND row order
    assert(a == contents(s"$base/b"), "same seed must reproduce shards exactly")
    // all rows present exactly once, bounded shard size
    assert(a.values.flatten.map(_._1).toSeq.sorted == (0L until 500L))
    assert(spark.read.parquet(s"$base/a")
      .groupBy(input_file_name()).count()
      .select("count").as[Long].collect().forall(_ <= 64))
    // a different seed is a genuine reshuffle (some order differs)
    assert(a != contents(s"$base/c"), "different seed must reshuffle")
  }

  test("containmentScores: graded overlap, full containment flags, " +
      "short docs score 0") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // identical -> containment 1
      (2L, "alpha beta gamma delta unrelated words here now"), // partial
      (3L, "totally different content with no overlap at all"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = graft.pipelines.CorpusPipeline
      .containmentScores(corpus, bench, n = 4, tau = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 3L, 1.0, true)))   // 3 of 3 grams contained
    assert(got(2L)._2 == 5L && got(2L)._3 == 1L && !got(2L)._5) // 1 of 5
    assert(got(3L)._3 == 0L && got(3L)._4 == 0.0 && !got(3L)._5)
    assert(got(4L) == ((4L, 0L, 0L, 0.0, false)))  // no grams -> unmeasurable
  }

  test("repetitionScores: repeated phrase dominates, prose scores low, " +
      "short docs score 0") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),   // "buy now"/"now buy" loop
      (2L, "the quick brown fox jumps over it"), // all 2-grams unique
      (3L, "word"),                              // too short for a 2-gram
      (4L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val got = CorpusPipeline.repetitionScores(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: grams = [buy now]x4 + [now buy]x3 -> top 4 of 7
    assert(got(1L)._2 == 4L && got(1L)._3 == 7L)
    assert(math.abs(got(1L)._4 - 4.0 / 7.0) < 1e-15)
    // doc 2: 6 distinct grams of 6 -> ratio 1/6
    assert(got(2L)._2 == 1L && got(2L)._3 == 6L)
    // doc 3: no grams -> 0
    assert(got(3L) == ((3L, 0L, 0L, 0.0)))
    // doc 4: [a b]x5, [b a]x4 -> 5/9
    assert(got(4L)._2 == 5L && got(4L)._3 == 9L)
  }

  test("spanCorruption: denoising round-trip, exact density, determinism") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = CorpusPipeline.spanCorruption(docs).cache()
    val orig = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val rows = out.select($"doc_id", $"n_tokens", $"n_masked",
      $"input_text", $"target_text")
      .as[(Long, Long, Long, String, String)].collect()
    assert(rows.length == orig.size)
    val sentinel = "<extra_id_(\\d+)>".r
    rows.foreach { case (id, nTok, nMask, input, target) =>
      val toks = orig(id).split(" ", -1)
      assert(nTok == toks.length)
      // exact density: each complete 20-token block masks exactly 3;
      // the final partial block masks between 0 and 3
      val full = toks.length / 20
      assert(nMask >= full * 3 && nMask <= full * 3 + 3,
        s"doc $id: $nMask masked of ${toks.length}")
      // ROUND-TRIP: splice each target span back over its sentinel in
      // the input -> the original text, exactly (the denoising
      // objective's defining property)
      val spans = sentinel.findAllMatchIn(target).toList
      val spanTok = spans.zip(spans.map(_.end).zip(
          spans.drop(1).map(_.start) :+ target.length))
        .map { case (m, (from, to)) =>
          m.group(1) -> target.substring(from, to).trim }.toMap
      val rebuilt = input.split(" ", -1).flatMap { t =>
        sentinel.findFirstMatchIn(t) match {
          case Some(m) => spanTok(m.group(1)).split(" ", -1)
          case None => Array(t)
        }
      }
      assert(rebuilt.sameElements(toks),
        s"doc $id: splice must rebuild the original")
    }
    // deterministic under re-run; a different seed moves the spans
    val again = CorpusPipeline.spanCorruption(docs)
      .select($"doc_id", $"input_text").as[(Long, String)].collect().toMap
    val seeded = CorpusPipeline.spanCorruption(docs, seed = 7)
      .select($"doc_id", $"input_text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, _, _, input, _) => assert(again(id) == input) }
    assert(rows.exists { case (id, _, _, input, _) => seeded(id) != input })
    out.unpersist()
  }

  test("exactSubstrSpans: known duplicates — cross-doc span, within-doc " +
      "repeat, merged maximal run, sub-k repeats invisible") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("dup", 10) // 10-token verbatim duplicate
    val docs = Seq(
      // doc 0 and 1 share a 10-token substring at different offsets
      (0L, words("a", 5) + " " + shared + " " + words("b", 4)),
      (1L, shared + " " + words("c", 7)),
      // doc 2 repeats an 8-token phrase WITHIN itself (occurrence
      // count semantics: no second document involved)
      (2L, words("x", 8) + " " + words("z", 3) + " " + words("x", 8)),
      // doc 3 repeats only a 7-token phrase — below k, invisible
      (3L, words("q", 7) + " " + words("r", 5) + " " + words("q", 7)),
      // doc 4: unique prose
      (4L, words("u", 30))
    ).toDF("doc_id", "text")
    val spans = CorpusPipeline.exactSubstrSpans(docs, k = 8)
      .as[(Long, Long, Long)].collect().toSet
    // 10-token shared substring => dup 8-gram starts {st, st+1, st+2}
    // merge into one maximal span of length 10 at each occurrence
    assert(spans.contains((0L, 5L, 10L)), spans.toString)
    assert(spans.contains((1L, 0L, 10L)))
    // within-doc repeat: both copies of the 8-token phrase reported
    assert(spans.contains((2L, 0L, 8L)) && spans.contains((2L, 11L, 8L)))
    // nothing from doc 3 (sub-k) or doc 4 (unique)
    assert(!spans.exists(s => s._1 == 3L || s._1 == 4L))
    assert(spans.size == 4)
  }

  test("exactSubstrRemove: covered tokens cut everywhere (all " +
      "occurrences), survivors re-joined, untouched docs intact") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("dup", 10)
    val docs = Seq(
      (0L, words("a", 5) + " " + shared + " " + words("b", 4)),
      (1L, shared + " " + words("c", 7)),
      (2L, words("u", 30))
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.exactSubstrRemove(docs, k = 8)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // BOTH occurrences of the shared 10-token substring are removed
    assert(out(0L) == ((0L, 19L, 10L,
      words("a", 5) + " " + words("b", 4))))
    assert(out(1L) == ((1L, 17L, 10L, words("c", 7))))
    assert(out(2L) == ((2L, 30L, 0L, words("u", 30))))
  }

  test("exactSubstrSpans: adjacent distinct duplicates merge into one " +
      "covered run; spans never overlap within a doc") {
    val p1 = (0 until 8).map(i => s"p$i").mkString(" ")
    val p2 = (0 until 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      // doc 0 carries p1 then p2 back-to-back; docs 1/2 carry them
      // separately — the [p1 p2] run in doc 0 is covered end to end
      (0L, p1 + " " + p2),
      (1L, p1 + " " + (0 until 6).map(i => s"f$i").mkString(" ")),
      (2L, (0 until 6).map(i => s"g$i").mkString(" ") + " " + p2)
    ).toDF("doc_id", "text")
    val spans = CorpusPipeline.exactSubstrSpans(docs, k = 8)
      .as[(Long, Long, Long)].collect()
    val byDoc = spans.groupBy(_._1)
    // doc 0: one merged 16-token run, not two 8-token spans
    assert(byDoc(0L).toSet == Set((0L, 0L, 16L)), spans.mkString(","))
    assert(byDoc(1L).toSet == Set((1L, 0L, 8L)))
    assert(byDoc(2L).toSet == Set((2L, 6L, 8L)))
    // invariant: within a doc, maximal spans are disjoint with gaps
    byDoc.values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) => assert(s2 > s1 + l1)
        case _ =>
      }
    }
  }
}
