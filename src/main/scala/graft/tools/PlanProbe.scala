package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // materialize the star first (as bench/verify would via q51)
    graft.SparkEntry.queries("q51_edw_fact_sales")(spark, dir).count()
    args.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      println(s"===== $q =====")
      println(p)
    }
    spark.stop()
  }
}
