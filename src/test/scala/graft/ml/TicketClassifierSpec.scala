package graft.ml

import graft.SparkSpec

class TicketClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("classifier: fits training corpus, Unknown fallback for empty text") {
    val model = TicketClassifier.train(spark)
    val tickets = (TicketClassifier.trainingData.map(_._1) ++
      Seq("", "   ", null)).zipWithIndex
      .map { case (t, i) => (s"T$i", t) }
      .toDF("ticket_id", "message_text")
    val scored = model.classify(tickets, "message_text")
      .select("ticket_id", "ticket_category").as[(String, String)]
      .collect().toMap

    // a 10-example training set must be separable for LR; the sklearn
    // reference likewise predicts its own training rows correctly
    TicketClassifier.trainingData.zipWithIndex.foreach { case ((_, label), i) =>
      assert(scored(s"T$i") == label, s"row $i")
    }
    assert(scored("T10") == "Unknown")
    assert(scored("T11") == "Unknown")
    assert(scored("T12") == "Unknown")
  }
}
