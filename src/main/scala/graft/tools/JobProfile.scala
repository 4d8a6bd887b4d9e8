// Per-job decomposition of a registered query: run it once (after a
// warm-up iteration) with a listener recording every Spark job's wall
// time, task count and description. The gap between query wall and
// sum-of-job wall is driver-side work (FS metadata, planning,
// marker IO) — the number the commit-floor optimization needs.
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.tools.JobProfile q240_mor_skipping"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object JobProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.ops.FastLocalFileSystem].getName)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class JobRec(id: Int, var desc: String = "", var start: Long = 0L,
      var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId)
        val graftFrame = e.stageInfos.headOption
          .map(_.details.split("\n").toSeq)
          .flatMap(_.find(l => l.contains("graft.") &&
            !l.contains("graft.tools")))
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(graftFrame.map(_.trim))
          .orElse(e.stageInfos.headOption.map(_.name))
          .getOrElse("")
        r.start = e.time
        r.stages = e.stageInfos.size
        r.tasks = e.stageInfos.map(_.numTasks).sum
        jobs.put(e.jobId, r)
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }

    // warm-up: absorb session/codegen/page-cache startup like Bench does
    try SparkEntryWarm.warm(spark, dir) catch { case _: Throwable => () }

    args.foreach { qname =>
      val fn = graft.SparkEntry.queries(qname)
      // one uncounted warm iteration (matches Bench's min-of-N posture)
      fn(spark, dir).count()
      graft.CacheTracker.releaseAll()

      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.CacheTracker.releaseAll()
      spark.sparkContext.removeSparkListener(listener)
      // drain listener bus
      Thread.sleep(500)

      import scala.jdk.CollectionConverters._
      val recs = order.asScala.flatMap(id => Option(jobs.get(id))).toSeq
      val jobSum = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"== $qname: wall ${wall}%.3f s, jobs ${recs.size}, " +
        f"job-time sum ${jobSum}%.3f s, driver gap ${wall - jobSum}%.3f s")
      recs.foreach { r =>
        val d = math.max(0L, r.end - r.start) / 1e3
        println(f"  job ${r.id}%4d ${d}%7.3f s  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d  ${r.desc.take(90)}")
      }
    }
    spark.stop()
  }
}

/** Shared warm-up: one pass over entry + all base tables. */
private object SparkEntryWarm {
  def warm(spark: SparkSession, dir: String): Unit = {
    graft.SparkEntry.entry(spark).count()
    graft.Tables.all.foreach { t =>
      try graft.Tables(spark, dir, t).count() catch { case _: Throwable => () }
    }
  }
}
