package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StringIndexer, IndexToString}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MODEL-BASED quality filtering — the classifier stage of LLM data
  * curation (the GPT-3/PaLM recipe: train a small text classifier to
  * separate reference-quality prose from crawl garbage, score the
  * corpus, keep by score). The heuristic rules ([[graft.pipelines
  * .CorpusPipeline.gopherRules]]) are the first pass; this is the
  * learned second pass that catches what rules can't express.
  *
  * Same distributed architecture as [[TicketClassifier]] (the §2.11
  * family): RegexTokenizer → HashingTF → IDF → LogisticRegression as
  * one spark.ml Pipeline, scoring via `model.transform` — executor-
  * parallel at any scale, no driver round-trip. The fit is
  * deterministic (fixed single-partition fixture corpus, alphabetic
  * label indexing, fixed tol), so fixture predictions are a constant
  * of the library — golden-gated by q153 the way q62 gates the
  * ticket model.
  */
object QualityClassifier {

  /** In-repo fixture corpus: curated "clean" prose vs the garbage
    * archetypes a crawl filter sees (keyword stuffing, symbol soup,
    * boilerplate, truncated fragments). Deliberately repo-owned (not
    * driver testdata) so the golden contract cannot drift. */
  val trainingData: Seq[(String, String)] = Seq(
    ("the committee published its findings after reviewing the evidence in detail", "clean"),
    ("researchers described a new method for measuring rainfall across the region", "clean"),
    ("the novel follows two families through a decade of quiet upheaval", "clean"),
    ("engineers tested the bridge design under repeated load cycles", "clean"),
    ("the recipe calls for slow cooking the onions until they caramelize", "clean"),
    ("students compared translations of the poem and debated word choices", "clean"),
    ("buy cheap buy cheap buy cheap best price best price click now", "garbage"),
    ("xz9 qq73 lorem asdf asdf asdf qwerty zzzz 9999 @@@@ ####", "garbage"),
    ("click here subscribe click here subscribe click here subscribe", "garbage"),
    ("free free free win win win prize prize prize claim claim", "garbage"),
    ("%%% $$$ !!! ??? ;;; ::: ||| ~~~ ^^^ &&&", "garbage"),
    ("home about contact privacy terms sitemap login register cart", "garbage"))

  final case class Model(pipeline: org.apache.spark.ml.PipelineModel) {
    /** Score `df`, adding `quality_pred` ('clean'/'garbage') from
      * `textCol`; empty text → 'garbage' (nothing to keep). */
    def score(df: DataFrame, textCol: String): DataFrame = {
      val prepared = df.withColumn("__text", coalesce(col(textCol), lit("")))
      pipeline.transform(prepared)
        .withColumn("quality_pred",
          when(trim(col(textCol)).isNull || trim(col(textCol)) === "",
            "garbage").otherwise(col("__predicted_label")))
        .drop("__text", "__tokens", "__tf", "__features", "rawPrediction",
          "probability", "prediction", "__predicted_label")
    }
  }

  private val defaultModels =
    new java.util.HashMap[SparkSession, Model]()
  def defaultModel(spark: SparkSession): Model =
    defaultModels.synchronized {
      defaultModels.keySet.removeIf(_.sparkContext.isStopped)
      var m = defaultModels.get(spark)
      if (m == null) { m = train(spark); defaultModels.put(spark, m) }
      m
    }

  def train(spark: SparkSession,
      data: Seq[(String, String)] = trainingData): Model = {
    import spark.implicits._
    val train = data.toDF("__text", "__label").coalesce(1).cache()
    val indexer = new StringIndexer()
      .setInputCol("__label").setOutputCol("label")
      .setStringOrderType("alphabetAsc")
    val tokenizer = new RegexTokenizer()
      .setInputCol("__text").setOutputCol("__tokens")
      .setPattern("\\W+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(1 << 12)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__features")
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("label")
      .setMaxIter(100).setTol(1e-4)
    val indexerModel = indexer.fit(train)
    val decode = new IndexToString()
      .setInputCol("prediction").setOutputCol("__predicted_label")
      .setLabels(indexerModel.labelsArray(0))
    val pipeline = new Pipeline().setStages(
      Array(indexerModel, tokenizer, tf, idf, lr, decode))
    Model(pipeline.fit(train))
  }
}
