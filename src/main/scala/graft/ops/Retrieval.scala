package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Lexical retrieval over the corpus: BM25 ranking (the Okapi
  * formulation — Robertson/Walker probabilistic relevance framework)
  * expressed as pure DataFrame algebra: a tf aggregation, a df
  * aggregation, a broadcast of the (tiny) query-term set, and one
  * shuffle join back to document length. Nothing is collected to the
  * driver; the corpus side is touched once.
  *
  * Two determinism-driven deviations from the textbook constants and
  * shape, both documented because they are load-bearing for the
  * bit-exact DuckDB oracle (the engine's correctness gate hashes
  * every value):
  *
  *  - **Odds-ratio idf, no log.** Standard BM25 takes
  *    `ln((N - df + 0.5)/(df + 0.5))`; `ln` is NOT exactly rounded
  *    (both java.lang.Math and libm guarantee <1 ulp, not =0.5 ulp),
  *    so two engines can legally disagree in the last bit. The
  *    rational odds ratio keeps every factor a quotient of exact
  *    integer-derived doubles — identical bits everywhere. `ln` is
  *    monotone, so per-term discrimination ordering is unchanged;
  *    the aggregate score weights rare terms more sharply than
  *    log-idf BM25 (documented variant, not an accident).
  *  - **Fixed-order summation.** A float sum's value depends on
  *    addend order, and shuffle merge order is nondeterministic. The
  *    per-term scores are collected, sorted ascending and left-folded
  *    — one deterministic order on both engines, independent of
  *    partitioning (and at 1000 executors, of scheduling).
  *
  * Constants k1 = 1.5, b = 0.75 are chosen exactly representable in
  * binary (1.2's classic default is not: `1.2 + 1.0` lands on a
  * round-to-even tie that engines may break per parser), so the
  * folded constants 2.5 and 0.25 are exact on both sides.
  */
object Retrieval {

  private val K1 = 1.5
  private val K1P1 = 2.5 // k1 + 1, exact
  private val OMB = 0.25 // 1 - b,  exact
  private val B = 0.75

  /** Top-k docs by BM25 score against the distinct tokens of
    * `queryDocId`'s text (query-by-document; any tokenized query
    * column works the same way). */
  def bm25TopK(docs: DataFrame, queryDocId: Long, k: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = Compute.spread(docs)
      .select(col(id), explode(T.tokens(col(text))).as("tok"))
    val tf = toks.groupBy(col(id), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val qterms = docs.filter(col(id) === queryDocId)
      .select(explode(T.tokens(col(text))).as("tok")).distinct()
    // restrict to query terms BEFORE computing df: tf covers every
    // doc, so per-term counts over the restricted table equal the
    // GLOBAL document frequency of those terms — df stays a corpus
    // property while the expensive full-token aggregation runs once
    // (tfq is pinned because it feeds both df and the scoring join;
    // unpinned, the whole explode+agg subtree would run twice).
    val tfq = graft.CacheTracker.track(
      tf.join(broadcast(qterms), Seq("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tfq.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("df"))
    val dl = docs.select(col(id),
      T.tokenCount(col(text)).cast("double").as("dl"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(T.tokenCount(col(text)).cast("long")).cast("double").as("tot_toks"))
    val termScore: Column = {
      val idf = ((col("n_docs") - col("df")) + 0.5) / (col("df") + 0.5)
      val norm = col("tf") +
        (lit(K1) * (lit(OMB) +
          ((lit(B) * col("dl")) / (col("tot_toks") / col("n_docs")))))
      idf * ((col("tf") * K1P1) / norm)
    }
    tfq
      .join(broadcast(dfreq), Seq("tok"))
      .join(dl, Seq(id))
      .crossJoin(broadcast(stats))
      .withColumn("term_score", termScore)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_matched_terms"),
        sort_array(collect_list(col("term_score"))).as("ss"))
      .withColumn("score", aggregate(col("ss"), lit(0.0), (acc, x) => acc + x))
      .select(col(id), col("n_matched_terms"), col("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }
}
