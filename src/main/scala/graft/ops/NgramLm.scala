package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** N-gram language-model QUALITY SCORING — the CCNet/Wenzek et al.
  * 2020 ("CCNet: Extracting High Quality Monolingual Datasets from
  * Web Crawl Data") fluency signal: score each document by the
  * average log-probability of its token transitions under a bigram
  * model with add-one smoothing trained on the corpus itself.
  * Low-scoring docs are the boilerplate/gibberish tail a perplexity
  * filter cuts; perplexity = e^(−avg_logp) is monotone in the score,
  * so the exp stays with the consumer and the whole pipeline remains
  * in the proven determinism channels.
  *
  * Exactness: counts are exact integers; each transition's
  * p = (C(w1,w2)+1)/(C(w1)+V) is ONE IEEE division of exact
  * operands; each ln goes through the DECIMAL(18,6) channel before
  * summation (the repo-wide float-sum rule: rounding to 6 decimals
  * absorbs the ≤2-ulp libm spread between engines — a divergence
  * needs ln values within 2 ulp of a 0.5e-6 grid line, ~1e-10 per
  * value), the decimal sum is exact in any order, and the final
  * average is one more IEEE division.
  *
  * Scale shape: one bigram-count aggregation (shuffle carries the
  * bigram VOCABULARY, not the token stream — map-side combine does
  * the heavy lifting), one unigram-count aggregation, a 1-row
  * vocabulary-size broadcast attach (declared scalar), then the
  * instance stream joins both count tables on their keys and
  * aggregates per doc. No data-sized windows, no all-pairs; at
  * 100 TB the bigram table is the only wide state and it is
  * vocabulary-bounded.
  */
object NgramLm {

  /** Transition instances (id, bg, w1) with multiplicity. */
  private def instances(docs: DataFrame, id: String,
      text: String): DataFrame =
    Compute.spread(docs.select(col(id), col(text)))
      .select(col(id), explode(T.shinglesOf(col(text), 2)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))

  /** Add-one bigram model of `train`: bigram counts, prefix unigram
    * counts, and the 1-row vocabulary size. */
  private def model(train: DataFrame, id: String, text: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val inst = instances(train, id, text)
    val bi = inst.groupBy(col("bg")).agg(count(lit(1)).as("c_bi"))
    val uni = Compute.spread(train.select(col(text)))
      .select(explode(T.tokens(col(text))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    (bi, uni, uni.agg(count(lit(1)).as("__v")))
  }

  /** Per-doc avg transition log-prob of `score` docs under the model
    * trained on `train` — LEFT joins, so transitions unseen in
    * training back off to the add-one floor 1/(0+V) (prefix unseen)
    * or 1/(c_uni+V) (prefix seen, continuation unseen): the standard
    * Laplace treatment, no silent row drop. */
  def crossScore(train: DataFrame, score: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val (bi, uni, v) = model(train, id, text)
    val inst = instances(score, id, text)
    val scored = inst
      .join(bi, Seq("bg"), "left")
      .join(uni, inst("w1") === uni("tok"), "left")
      .crossJoin(broadcast(v)) // declared 1-row scalar attach
      .select(col(id),
        log((coalesce(col("c_bi"), lit(0L)).cast("double") + lit(1.0)) /
          (coalesce(col("c_uni"), lit(0L)).cast("double") +
            col("__v").cast("double")))
          .cast("decimal(18,6)").as("__lp"))
    val per = scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
    score.select(col(id)).join(per, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("__slp").cast("double") /
            col("n_bigrams").cast("double")).as("avg_logp"))
      .orderBy(col(id))
  }

  /** Per-doc bigram-LM score: (doc_id, n_bigrams, avg_logp) under the
    * corpus' OWN model. Docs with < 2 tokens score 0.0 with
    * n_bigrams = 0 (no transitions to judge — the caller's length
    * filter owns those). */
  def bigramScore(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame =
    crossScore(docs, docs, id, text)

  /** Per-doc avg transition log-prob under an INTERPOLATED KNESER-NEY
    * bigram model (Kneser & Ney 1995; the modified-KN family is what
    * KenLM — and therefore the actual CCNet filter — ships): absolute
    * discount D = 3/4 moves mass from observed bigrams to a
    * CONTINUATION distribution p_cont(w2) ∝ "how many distinct
    * prefixes w2 follows" — the fix for add-one's overestimate of
    * frequent-but-contextually-rigid words.
    *
    *   p(w2|w1) = (max(c(w1w2) − D, 0) + D·N1+(w1·)·p'(w2)) / c(w1·)
    *   p'(w2)   = (N1+(·w2) + 1) / (N1+(··) + V)     (add-one floor,
    *              so unseen continuations stay positive and the model
    *              still sums to 1 over the V-word vocabulary)
    *
    * Exactness: D = 3/4 makes every probability a ratio of exact
    * int64 products — multiply through by 4·(N1+(··) + V):
    *   p = (max(4c−3, 0)·(nt+V) + 3·N1+(w1·)·(N1+(·w2)+1))
    *       / (4·c(w1·)·(nt+V))
    * — ONE IEEE division of exact integers, then the ln rides the
    * proven DECIMAL(18,6) channel. Exact while c·(nt+V) < 2⁶¹ (≈10⁹
    * occurrences of one bigram × 10⁹ types); past that the products
    * lift to the DECIMAL(38,0) channel unchanged.
    *
    * Scale shape: the count tables all live at VOCABULARY grain
    * (bigram types, prefix types, continuation types), built by
    * map-side-combined aggregations; the token stream joins them on
    * their keys exactly as [[crossScore]] does, plus one declared
    * 1-row (nt, V) broadcast attach. Unseen-prefix transitions back
    * off to p'(w2) (only reachable when scoring ≠ training corpus). */
  def kneserNeyScore(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val inst = instances(docs, id, text)
    val bi = inst.groupBy(col("bg")).agg(count(lit(1)).as("c_bi"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val pre = bi.groupBy(col("w1"))
      .agg(sum(col("c_bi")).as("c_pre"), count(lit(1)).as("n1"))
    val cont = bi.groupBy(col("w2")).agg(count(lit(1)).as("n2"))
    val uni = Compute.spread(docs.select(col(text)))
      .select(explode(T.tokens(col(text))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val totals = bi.agg(count(lit(1)).as("__nt"))
      .crossJoin(uni.agg(count(lit(1)).as("__v"))) // declared 1-row×1-row
    val scored = inst
      .join(bi.select(col("bg"), col("c_bi")), Seq("bg"), "left")
      .join(pre, Seq("w1"), "left")
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals)) // declared 1-row scalar attach
      .select(col(id), {
        val c = coalesce(col("c_bi"), lit(0L))
        val cpre = coalesce(col("c_pre"), lit(0L))
        val n1 = coalesce(col("n1"), lit(0L))
        val contNum = coalesce(col("n2"), lit(0L)) + lit(1L)
        val contDen = col("__nt") + col("__v")
        val p = when(cpre === 0L,
            contNum.cast("double") / contDen.cast("double"))
          .otherwise(
            (greatest(lit(4L) * c - lit(3L), lit(0L)) * contDen
              + lit(3L) * n1 * contNum).cast("double")
              / (lit(4L) * cpre * contDen).cast("double"))
        log(p).cast("decimal(18,6)").as("__lp")
      })
    val per = scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
    docs.select(col(id)).join(per, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("__slp").cast("double") /
            col("n_bigrams").cast("double")).as("avg_logp"))
      .orderBy(col(id))
  }

  /** CCNet's HEAD/MIDDLE/TAIL split (Wenzek et al. 2020 §4.3): within
    * each source, rank documents by LM score and cut at the terciles —
    * head = most fluent third, tail = the third a perplexity filter
    * drops; CCNet trains on head+middle (`kept`). Docs with no
    * transitions (n_bigrams = 0) are unrankable and come back with a
    * NULL bucket and kept = false — the length filter owns them, and
    * their defined-but-meaningless 0.0 score must not crowd the head.
    *
    * Exactness: ntile is pure rank arithmetic over the total order
    * (avg_logp DESC, doc_id) — engine-identical given the
    * decimal-channel scores. Scale shape: ONE window partitioned by
    * source (CCNet's own per-language-shard sort); if a single source
    * outgrows a partition, the cut swaps to sampled boundary
    * estimation — the rank semantics here are the exactness-preserving
    * form. */
  def perplexityBuckets(docs: DataFrame, id: String = "doc_id",
      text: String = "text", source: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = bigramScore(docs, id, text)
    val base = docs.select(col(id), col(source)).join(scores, Seq(id))
    val w = Window.partitionBy(col(source))
      .orderBy(desc("avg_logp"), col(id).asc)
    val ranked = base.where(col("n_bigrams") > 0L)
      .withColumn("bucket", ntile(3).over(w))
    val unranked = base.where(col("n_bigrams") === 0L)
      .withColumn("bucket", lit(null).cast("int"))
    ranked.unionByName(unranked)
      .select(col(id), col(source), col("n_bigrams"), col("avg_logp"),
        col("bucket"),
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === 2, lit("middle"))
          .when(col("bucket") === 3, lit("tail"))
          .otherwise(lit("unscored")).as("label"),
        coalesce(col("bucket") <= 2, lit(false)).as("kept"))
      .orderBy(col(id))
  }

  /** DSIR-style IMPORTANCE WEIGHT (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per doc,
    * avg_logp under a TARGET-domain model minus avg_logp under the
    * general corpus model — positive means the doc looks more like
    * the target than like the average corpus, the ranking key
    * importance resampling draws by. Both scores ride the same
    * decimal-channel LM, so the weight is engine-stable.
    *
    * Scale shape: two [[crossScore]] passes (each vocabulary-grain
    * shuffles) + one id equi-join. The target model's tables are
    * usually tiny (a hand-curated target set) and broadcast
    * naturally. */
  def importanceWeights(target: DataFrame, corpus: DataFrame,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val t = crossScore(target, corpus, id, text)
      .select(col(id), col("avg_logp").as("target_logp"))
    val c = crossScore(corpus, corpus, id, text)
      .select(col(id), col("n_bigrams"), col("avg_logp").as("corpus_logp"))
    t.join(c, Seq(id))
      .select(col(id), col("n_bigrams"), col("target_logp"),
        col("corpus_logp"),
        (col("target_logp") - col("corpus_logp")).as("importance"))
      .orderBy(col(id))
  }
}
