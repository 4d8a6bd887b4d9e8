package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StringIndexer, IndexToString}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.11: the support-ticket classifier. The reference trains a
  * client-side sklearn `TfidfVectorizer → LogisticRegression` on 10
  * hard-coded labeled examples and applies it row-by-row in pandas
  * (`dags/4_logistics_ticket_classifier_full_dag.py:32-78`). Here the
  * same model family is a distributed `spark.ml` Pipeline
  * (RegexTokenizer → HashingTF → IDF → LogisticRegression) and scoring
  * is `model.transform(df)` — no driver round-trip, executor-parallel
  * at any scale. Empty/whitespace text falls back to "Unknown", as in
  * the reference.
  */
object TicketClassifier {

  /** The reference's training corpus, verbatim
    * (`dags/4_logistics_ticket_classifier_full_dag.py:31-42`). */
  val trainingData: Seq[(String, String)] = Seq(
    ("I want to cancel my order", "Order Cancellation"),
    ("The payment failed via UPI", "Payment Issue"),
    ("My product is delayed by 3 days", "Delivery Issue"),
    ("I need to return the item", "Return Request"),
    ("When does the sale start?", "General Inquiry"),
    ("Still waiting for delivery update", "Delivery Issue"),
    ("I paid but didn't get confirmation", "Payment Issue"),
    ("Want to exchange the item", "Return Request"),
    ("How to track my order?", "General Inquiry"),
    ("Please cancel immediately", "Order Cancellation"))

  final case class Model(pipeline: org.apache.spark.ml.PipelineModel) {
    /** Score `df`, adding `ticket_category` from `textCol`; empty text
      * → "Unknown" (the reference's fallback). */
    def classify(df: DataFrame, textCol: String): DataFrame = {
      val prepared = df.withColumn("__text", coalesce(col(textCol), lit("")))
      pipeline.transform(prepared)
        .withColumn("ticket_category",
          when(trim(col(textCol)).isNull || trim(col(textCol)) === "",
            "Unknown").otherwise(col("__predicted_label")))
        .drop("__text", "__tokens", "__tf", "__features", "rawPrediction",
          "probability", "prediction", "__predicted_label")
    }
  }

  /** The model over the hard-coded reference corpus is a CONSTANT of
    * the library (same 10 rows, deterministic fit) — train it once per
    * JVM and reuse, exactly as the reference's DAG trains once per run
    * and scores the whole table. Thread-safe lazy init; keyed by
    * session so a fresh session (new executors) retrains. */
  // NOTE: weak keys would be defeated here — the fitted model's
  // training summary strongly references its SparkSession, so a
  // value→key strong path would pin the entry forever. Evict stopped
  // sessions explicitly on each access instead.
  private val defaultModels =
    new java.util.HashMap[SparkSession, Model]()
  def defaultModel(spark: SparkSession): Model =
    defaultModels.synchronized {
      defaultModels.keySet.removeIf(_.sparkContext.isStopped)
      var m = defaultModels.get(spark)
      if (m == null) { m = train(spark); defaultModels.put(spark, m) }
      m
    }

  /** Train on the reference corpus (or any (text, label) set). */
  def train(spark: SparkSession,
      data: Seq[(String, String)] = trainingData): Model = {
    import spark.implicits._
    // one partition: the corpus is tiny, and every LBFGS iteration runs
    // a job over it — 16 mostly-empty tasks per iteration otherwise
    val train = data.toDF("__text", "__label").coalesce(1).cache()
    val indexer = new StringIndexer()
      .setInputCol("__label").setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic label ids
    val tokenizer = new RegexTokenizer()
      .setInputCol("__text").setOutputCol("__tokens")
      .setPattern("\\W+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(1 << 12)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__features")
    // sklearn's LogisticRegression defaults (the reference's model):
    // max_iter=100, tol=1e-4. Every LBFGS iteration is a Spark job, so
    // the looser-but-reference-faithful tolerance also halves the
    // fixed fit overhead on the 10-row corpus.
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
