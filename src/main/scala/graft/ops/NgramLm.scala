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
