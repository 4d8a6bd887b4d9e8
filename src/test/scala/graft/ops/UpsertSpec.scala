package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    ("k1", "old1", 1), ("k2", "old2", 2), ("k3", "old3", 3)
  ).toDF("k", "v", "n")

  test("upsert: matched rows updated, unmatched kept, new rows inserted") {
    val source = Seq(("k2", "new2", 20), ("k4", "new4", 40)).toDF("k", "v", "n")
    val out = Upsert.upsert(target, source, Seq("k"))
      .orderBy("k").as[(String, String, Int)].collect()
    assert(out.toSeq == Seq(
      ("k1", "old1", 1), ("k2", "new2", 20), ("k3", "old3", 3), ("k4", "new4", 40)))
  }

  test("upsert: updateCols subset leaves other columns untouched") {
    val source = Seq(("k2", "new2", 20)).toDF("k", "v", "n")
    val out = Upsert.upsert(target, source, Seq("k"), Some(Seq("v")))
      .filter($"k" === "k2").as[(String, String, Int)].collect()
    assert(out.toSeq == Seq(("k2", "new2", 2))) // n keeps target value
  }

  test("upsert is idempotent: applying the same source twice is a no-op") {
    val source = Seq(("k2", "new2", 20), ("k4", "new4", 40)).toDF("k", "v", "n")
    val once = Upsert.upsert(target, source, Seq("k"))
    val twice = Upsert.upsert(once, source, Seq("k"))
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("upsert preserves key uniqueness") {
    val source = Seq(("k1", "a", 9), ("k9", "b", 9)).toDF("k", "v", "n")
    val out = Upsert.upsert(target, source, Seq("k"))
    assert(out.count() == out.select("k").distinct().count())
  }

  test("dedupLatest keeps the last writer per key") {
    val df = Seq(
      ("k1", 1L, "first"), ("k1", 3L, "last"), ("k1", 2L, "mid"),
      ("k2", 5L, "only")
    ).toDF("k", "ts", "v")
    val out = Upsert.dedupLatest(df, Seq("k"), Seq($"ts"))
      .orderBy("k").as[(String, Long, String)].collect()
    assert(out.toSeq == Seq(("k1", 3L, "last"), ("k2", 5L, "only")))
  }

  test("scd2FromChangelog builds contiguous versions with one current row per key") {
    val df = Seq(
      ("u1", 1L, "A"), ("u1", 2L, "A"), ("u1", 3L, "B"), ("u1", 4L, "A"),
      ("u2", 1L, "X")
    ).toDF("k", "ts", "status")
    val hist = Upsert.scd2FromChangelog(df, Seq("k"), Seq($"ts"), Seq("status"))
    val rows = hist.orderBy($"k", $"dbt_valid_from")
      .select($"k", $"status", $"dbt_valid_from", $"dbt_valid_to", $"is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(rows == Seq(
      ("u1", "A", 1L, Some(3L), false),
      ("u1", "B", 3L, Some(4L), false),
      ("u1", "A", 4L, None, true),
      ("u2", "X", 1L, None, true)))
    // exactly one current row per key
    val cur = hist.filter($"is_current").groupBy($"k").count()
      .filter($"count" =!= 1).count()
    assert(cur == 0)
  }

  test("scd2Merge chains dbt_valid_to across two snapshot runs") {
    // run 1 state: u1=A, u2=X, u3=Q ; run 2 state: u1=B (changed),
    // u2=X (unchanged), u4=N (new); u3 absent from run 2 (untouched)
    val s1 = Seq(("u1", 1L, "A"), ("u2", 1L, "X"), ("u3", 2L, "Q"))
      .toDF("k", "ts", "status")
    val s2 = Seq(("u1", 5L, "B"), ("u2", 6L, "X"), ("u4", 7L, "N"))
      .toDF("k", "ts", "status")
    val run1 = Upsert.scd2Merge(None, s1, Seq("k"), "ts", Seq("status"))
    val run2 = Upsert.scd2Merge(Some(run1), s2, Seq("k"), "ts", Seq("status"))
    val rows = run2.orderBy($"k", $"dbt_valid_from")
      .select($"k", $"status", $"dbt_valid_from", $"dbt_valid_to", $"is_current")
      .as[(String, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(rows == Seq(
      ("u1", "A", 1L, Some(5L), false), // closed: valid_to = successor's from
      ("u1", "B", 5L, None, true),
      ("u2", "X", 1L, None, true),      // unchanged: original row untouched
      ("u3", "Q", 2L, None, true),      // absent from run 2: untouched
      ("u4", "N", 7L, None, true)))     // new key: opened current
    // invariant: exactly one current row per key
    assert(run2.filter($"is_current").groupBy($"k").count()
      .filter($"count" =!= 1).count() == 0)
    // a third run with an identical state is a no-op
    val run3 = Upsert.scd2Merge(Some(run2), s2, Seq("k"), "ts", Seq("status"))
    assert(run3.orderBy($"k", $"dbt_valid_from").collect().toSeq ==
      run2.orderBy($"k", $"dbt_valid_from").collect().toSeq)
  }

  test("overwriteAtomic swaps without losing previous data on success") {
    val dir = java.nio.file.Files.createTempDirectory("graft-atomic").toString + "/t"
    Upsert.overwriteAtomic(Seq((1, "a")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
    Upsert.overwriteAtomic(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("overwriteAtomic recovers from a crash between the two renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-atomic").toString + "/t"
    Upsert.overwriteAtomic(Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    // simulate the crash window: dst renamed away to __old, new data
    // never promoted (staging may or may not survive — worst case kept)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    // next writer rolls the backup forward, then applies its own batch
    Upsert.overwriteAtomic(Seq((3, "c")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).as[(Int, String)].collect().toSeq ==
      Seq((3, "c")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__old")))
    // and a pure reader-side recovery restores the pre-crash table
    Upsert.overwriteAtomic(Seq((4, "d")).toDF("id", "v"), dir)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old")))
    Upsert.recoverAtomic(fs, new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old"))
    assert(spark.read.parquet(dir).as[(Int, String)].collect().toSeq ==
      Seq((4, "d")))
  }
}
