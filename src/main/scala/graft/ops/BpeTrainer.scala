package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** BPE merge learning (Sennrich, Haddow, Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the actual
  * tokenizer-training loop, not a proxy: starting from characters,
  * repeatedly find the most frequent adjacent symbol pair across the
  * corpus and merge it everywhere. The learned merge table IS a BPE
  * tokenizer (apply merges in order to segment new text); q108's
  * pair statistics and q138's alphabet proxy become one end of this
  * loop's first iteration.
  *
  * BPE's classic trick makes this cheap at any corpus size: training
  * runs over WORD TYPES weighted by corpus counts, so every iteration
  * is vocabulary-bounded — the corpus is touched exactly once (the
  * type-count aggregation, map-side combined) and 100 TB of text
  * reduces to a vocab-sized table before the loop starts.
  *
  * Representation: a word's segmentation is a string of '|'-wrapped
  * symbols (`"ab"` → `"|a||b|"`). Merging pair (l, r) is then ONE
  * literal `replace(ws, '|l||r|', '|lr|')` — each symbol carries its
  * own delimiters, so left-to-right non-overlapping replacement is
  * exactly BPE's greedy merge ("aaa": `|a||a||a|` → `|aa||a|`, the
  * leftmost wins). Tokens containing '|' are excluded by contract
  * (delimiter reservation, documented loudly here; none exist in the
  * corpus). Everything is integer counts + string rewrites — no
  * floats anywhere, bit-identical on any engine.
  *
  * Determinism: the winning pair each round is (count DESC, left ASC,
  * right ASC) — the standard tie-break made total.
  */
object BpeTrainer {

  /** Learn `nMerges` merges: (iteration, merge_left, merge_right,
    * pair_count), iteration 1-based in learn order. Stops early if no
    * adjacent pair remains (every word fused to one symbol).
    *
    * SMALL-VOCAB FAST PATH (the [[Dedup.duplicateClusters]] move):
    * the merge loop runs over word TYPES, and when the type table
    * fits under `localVocabCap` rows (probed with one
    * limit(cap+1).collect() on the aggregated vocab — the
    * distributed loop's first round would materialize the same
    * table), the find-best/merge rounds run in memory on the driver —
    * which is precisely how production BPE trainers work: count
    * distributed, loop local. Identical semantics (Java
    * String.replace is the same literal leftmost non-overlapping
    * rewrite as SQL replace; winner ordering (count DESC, l, r)
    * unchanged — spec-pinned against the distributed path). The
    * collect is bounded by the cap (500k (count, segmentation) rows ≈
    * tens of MB — the working set every in-memory BPE trainer holds
    * anyway); a vocab over the cap keeps the distributed rounds, so
    * 100 TB behavior with a pathological vocabulary is unchanged. */
  def merges(docs: DataFrame, nMerges: Int, text: String = "text",
      localVocabCap: Int = 500000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    val spark = docs.sparkSession
    // corpus touched ONCE: word-type counts + initial char segmentation
    var vocab = Compute.spread(docs.select(col(text)))
      .select(explode(T.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("|"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), regexp_replace(col("w"), "(.)", "|$1|").as("ws"))
      .localCheckpoint()
    graft.CacheTracker.trackCheckpoint(vocab)
    if (localVocabCap > 0) {
      val sample = vocab.limit(localVocabCap + 1).collect()
      if (sample.length <= localVocabCap) {
        graft.CacheTracker.releaseCheckpoint(vocab)
        val out = mergesLocal(sample.map(r => (r.getLong(0), r.getString(1))),
          nMerges)
        import spark.implicits._
        return (if (out.isEmpty)
            Seq.empty[(Int, String, String, Long)].toDF(
              "iteration", "merge_left", "merge_right", "pair_count")
          else out.toSeq.toDF(
            "iteration", "merge_left", "merge_right", "pair_count"))
          .orderBy(col("iteration"))
      }
    }
    val found = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    var i = 1
    while (i <= nMerges && !done) {
      val syms = split(expr("substring(ws, 2, length(ws) - 2)"), "\\|\\|")
      val pairs = vocab
        .select(col("wc"), syms.as("__s"))
        .select(col("wc"), col("__s"),
          posexplode(col("__s")).as(Seq("__i", "l")))
        .filter(col("__i") < size(col("__s")) - 1)
        .select(col("wc"), col("l"),
          element_at(col("__s"), col("__i") + 2).as("r"))
      val best = pairs.groupBy(col("l"), col("r"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l"), col("r")).limit(1)
        .localCheckpoint() // 1 row; feeds the merge table AND the rewrite
      graft.CacheTracker.trackCheckpoint(best)
      if (best.isEmpty) done = true
      else {
        found += best.withColumn("iteration", lit(i))
        val next = vocab.crossJoin(broadcast(best)) // declared 1-row attach
          .withColumn("ws", expr(
            "replace(ws, '|' || l || '||' || r || '|', '|' || l || r || '|')"))
          .select(col("wc"), col("ws"))
          .localCheckpoint() // keep the per-iteration plan shallow
        graft.CacheTracker.releaseCheckpoint(vocab)
        graft.CacheTracker.trackCheckpoint(next)
        vocab = next
        i += 1
      }
    }
    graft.CacheTracker.releaseCheckpoint(vocab)
    found.map(_.select(col("iteration"),
        col("l").as("merge_left"), col("r").as("merge_right"),
        col("pair_count")))
      .reduceOption(_.unionByName(_))
      .getOrElse {
        // no merge ever found (degenerate corpus reaching the
        // distributed rounds): return the documented 4-column schema,
        // exactly as the local fast path's caller does — a 0-column
        // emptyDataFrame would throw on the orderBy below
        import spark.implicits._
        Seq.empty[(Int, String, String, Long)].toDF(
          "iteration", "merge_left", "merge_right", "pair_count")
      }
      .orderBy(col("iteration"))
  }

  /** In-memory merge loop over the collected (wc, ws) type table —
    * byte-identical semantics to the distributed rounds. */
  private def mergesLocal(types: Array[(Long, String)],
      nMerges: Int): Array[(Int, String, String, Long)] = {
    var vocab = types
    val found = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var i = 1
    var done = false
    while (i <= nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (wc, ws) =>
        val syms = ws.substring(1, ws.length - 1).split("\\|\\|", -1)
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.merge(k, wc, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        import scala.jdk.CollectionConverters._
        // winner: count DESC, left ASC, right ASC — the same total
        // order as the distributed orderBy. String ties break by CODE
        // POINT (Compute.codePointOrdering), not Java's UTF-16 order:
        // the distributed path and the DuckDB oracle both order
        // strings by UTF-8 binary, and the two diverge for
        // supplementary-plane symbols.
        implicit val cp: Ordering[String] = Compute.codePointOrdering
        val ((l, r), cnt) = counts.asScala.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        found += ((i, l, r, cnt))
        val find = s"|$l||$r|"
        val repl = s"|$l$r|"
        vocab = vocab.map { case (wc, ws) => (wc, ws.replace(find, repl)) }
        i += 1
      }
    }
    found.toArray
  }

  /** Segment text with a learned merge table: apply the merges IN
    * LEARN ORDER to each word, return per-doc subword token counts —
    * the "what would this tokenizer do" check that closes the loop
    * (fertility under the LEARNED tokenizer instead of q138's fixed
    * alphabet proxy). `mergeTable` is collected (it is nMerges rows
    * by contract — tokenizer merge lists are config-sized, 32k-64k in
    * production, never data-sized). */
  def segmentCounts(docs: DataFrame, mergeTable: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val ms = mergeTable.orderBy(col("iteration"))
      .select(col("merge_left"), col("merge_right"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val words = Compute.spread(docs.select(col(id), col(text)))
      .select(col(id), explode(T.tokens(col(text))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("|"))
      .withColumn("ws", regexp_replace(col("w"), "(.)", "|$1|"))
    val rewritten = ms.foldLeft(words) { case (df, (l, r)) =>
      // literal (non-regex, non-SQL-parsed) replace: symbols come from
      // corpus text and must never be interpolated into parsed SQL
      df.withColumn("ws",
        replace(col("ws"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
    }
    rewritten
      .select(col(id),
        (size(split(col("ws"), "\\|\\|"))).as("__n"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_subwords"))
      .select(col(id), col("n_words"), col("n_subwords"),
        (col("n_subwords").cast("double") / col("n_words").cast("double"))
          .as("fertility"))
      .orderBy(col(id))
  }
}
