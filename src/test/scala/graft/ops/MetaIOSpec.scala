package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side parquet metadata IO ([[MetaIO]], round-15 optimization
  * layer): footer-derived schemas/stats/row counts and the no-fork
  * local filesystem must be EXACTLY equivalent to the Spark paths
  * they replace — these specs pin the equivalences. */
class MetaIOSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_metaio_").toString

  test("readParquet: footer-resolved schema equals inference, " +
      "rows identical") {
    val d = freshDir()
    spark.range(0, 100)
      .select($"id".as("k"), ($"id" * 2).cast("int").as("i"),
        concat(lit("s"), $"id").as("s"), ($"id" / 3.0).as("dbl"))
      .coalesce(2).write.parquet(s"$d/t")
    val inferred = spark.read.parquet(s"$d/t")
    val resolved = MetaIO.readParquet(spark, s"$d/t")
    assert(resolved.schema == inferred.schema)
    assert(resolved.orderBy("k").collect()
      .sameElements(inferred.orderBy("k").collect()))
  }

  test("schemaOf refuses hive-partitioned layouts (partition columns " +
      "must come from discovery, not a footer)") {
    val d = freshDir()
    spark.range(0, 20).select($"id", ($"id" % 2).as("p"))
      .write.partitionBy("p").parquet(s"$d/t")
    assert(MetaIO.schemaOf(spark,
      new org.apache.hadoop.fs.Path(s"$d/t")).isEmpty)
    // and the reader falls back to discovery: partition column present
    assert(MetaIO.readParquet(spark, s"$d/t").columns.contains("p"))
  }

  test("footerIntStats == the read-back aggregation for int dims, " +
      "including an all-null column; bails on strings") {
    val d = freshDir()
    spark.range(0, 500)
      .select($"id".as("x"), ($"id" % 37).cast("int").as("y"),
        lit(null).cast("long").as("z"), concat(lit("v"), $"id").as("s"))
      .coalesce(3).write.parquet(s"$d/t")
    val fs = new org.apache.hadoop.fs.Path(s"$d/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$d/t"))
      .map(_.getPath.toString)
      .filter(p => { val n = p.split('/').last
        !n.startsWith("_") && !n.startsWith(".") }).toSeq.sorted
    val got = MetaIO.footerIntStats(spark, files, "x", "y").get
      .map(r => r._1 -> r).toMap
    // ground truth: the Spark read-back aggregation per file
    val truth = spark.read.parquet(files: _*)
      .withColumn("__p", substring_index(input_file_name(), "/", -2))
      .groupBy("__p")
      .agg(count(lit(1)).as("n"),
        min($"x".cast("long")).as("mnx"), max($"x".cast("long")).as("mxx"),
        min($"y".cast("long")).as("mny"), max($"y".cast("long")).as("mxy"))
      .collect()
    assert(truth.nonEmpty && truth.length == got.size)
    truth.foreach { r =>
      val g = got(r.getString(0))
      assert(g._2 == r.getLong(1) && g._3 == r.getLong(2) &&
        g._4 == r.getLong(3) && g._5 == r.getLong(4) &&
        g._6 == r.getLong(5), s"footer stats diverge on ${r.getString(0)}")
    }
    // all-null int column: null bounds, exact row count
    val gz = MetaIO.footerIntStats(spark, files, "x", "z").get
    assert(gz.forall(t => t._5 == null && t._6 == null))
    // a string dim must bail (binary stats can be truncated)
    assert(MetaIO.footerIntStats(spark, files, "x", "s").isEmpty)
    // a missing column must bail
    assert(MetaIO.footerIntStats(spark, files, "x", "nope").isEmpty)
  }

  test("footerRowCount matches count()") {
    val d = freshDir()
    spark.range(0, 321).coalesce(2).write.parquet(s"$d/t")
    assert(MetaIO.footerRowCount(spark, s"$d/t") == 321L)
  }

  test("frameHead reads the first row's string/long/null fields " +
      "driver-side") {
    val d = freshDir()
    Seq(("a/b", 42L, null.asInstanceOf[String]))
      .toDF("path", "n_rows", "bloom_col")
      .coalesce(1).write.parquet(s"$d/f")
    val h = MetaIO.frameHead(spark, s"$d/f").get
    assert(h("path") == "a/b" && h("n_rows") == 42L &&
      h("bloom_col") == null)
  }

  test("FastLocalFileSystem: permissions land identically to stock " +
      "hadoop, without the fork") {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val fast = new FastLocalFileSystem
    fast.initialize(new java.net.URI("file:///"), conf)
    val d = freshDir()
    val p = new org.apache.hadoop.fs.Path(s"$d/x.bin")
    val out = fast.create(p)
    out.write(Array[Byte](1, 2, 3)); out.close()
    import org.apache.hadoop.fs.permission.FsPermission
    fast.setPermission(p, new FsPermission("640"))
    val st = fast.getFileStatus(p)
    assert(st.getPermission == new FsPermission("640"))
    // the checksum sidecar exists (checksum semantics preserved)
    assert(new java.io.File(s"$d/.x.bin.crc").exists())
    // read-back verifies through the checksum layer
    val in = fast.open(p)
    val buf = new Array[Byte](3)
    in.readFully(0, buf); in.close()
    assert(buf.toSeq == Seq[Byte](1, 2, 3))
  }

  test("copyFrame: nio copy is byte-identical, keeps .crc sidecars " +
      "valid, and the copied frame reads back equal") {
    val d = freshDir()
    Seq(("k1", 1L), ("k2", 2L)).toDF("path", "row_index")
      .coalesce(1).write.parquet(s"$d/src")
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ZTable.copyFrame(fs, s"$d/src", s"$d/dst")
    val a = spark.read.parquet(s"$d/src").orderBy("path").collect()
    val b = spark.read.parquet(s"$d/dst").orderBy("path").collect()
    assert(a.sameElements(b))
    // .crc sidecars rode along verbatim
    val crcs = new java.io.File(s"$d/dst").listFiles()
      .count(_.getName.endsWith(".crc"))
    assert(crcs >= 1, "checksum sidecars must survive the nio copy")
  }

  // ---- round-16: driver-side frame WRITES and filtered carries ----

  test("writeFrame: driver-written frame is read-equal AND " +
      "footer-schema-identical to the Spark write of the same rows") {
    val d = freshDir()
    val df = Seq(
      ("d1/a.parquet", 10L, Option(5L), Option(9L), "x", true, 1.5),
      ("d1/b.parquet", 0L, None, None, "y", false, -0.25))
      .toDF("path", "n_rows", "min_x", "max_x", "s", "b", "dbl")
    df.coalesce(1).write.parquet(s"$d/spark")
    MetaIO.writeFrame(spark, s"$d/driver", df.schema,
      df.collect().toIndexedSeq)
    val a = spark.read.parquet(s"$d/spark")
    val b = spark.read.parquet(s"$d/driver")
    // EXACT physical schema parity (required/optional flags included):
    // the two writers' footers must convert to the same Spark schema
    assert(MetaIO.schemaOf(spark,
        new org.apache.hadoop.fs.Path(s"$d/driver")).get ==
      MetaIO.schemaOf(spark,
        new org.apache.hadoop.fs.Path(s"$d/spark")).get)
    assert(b.orderBy("path").collect()
      .sameElements(a.orderBy("path").collect()))
    // and a .crc sidecar exists (written through the checksummed FS)
    assert(new java.io.File(s"$d/driver").listFiles()
      .exists(_.getName.endsWith(".crc")))
  }

  test("writeFrame append: a driver part file APPENDED into a " +
      "Spark-written frame dir reads as the union (mixed footers " +
      "compatible)") {
    val d = freshDir()
    val base = Seq(("p1", 1L), ("p2", 2L)).toDF("path", "row_index")
    base.coalesce(1).write.parquet(s"$d/f")
    MetaIO.writeFrame(spark, s"$d/f", base.schema,
      Seq(org.apache.spark.sql.Row("p3", 3L)), append = true)
    val got = MetaIO.readParquet(spark, s"$d/f")
      .orderBy("path").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("p1", 1L), ("p2", 2L), ("p3", 3L)))
  }

  test("writeFrame refuses a second create of the same frame " +
      "(errorifexists parity) and unsupported schemas") {
    val d = freshDir()
    val df = Seq(("a", 1L)).toDF("k", "v")
    MetaIO.writeFrame(spark, s"$d/f", df.schema, df.collect().toSeq)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      MetaIO.writeFrame(spark, s"$d/f", df.schema, df.collect().toSeq)
    }
    val arr = Seq((Seq(1, 2), 1L)).toDF("a", "v")
    assert(!MetaIO.frameWritable(arr.schema))
  }

  test("carryFrameFiltered == the broadcast semi-join carry; over-cap " +
      "frames decline (caller falls back)") {
    val d = freshDir()
    val dv = Seq(("d1/a", 0L), ("d1/a", 3L), ("d1/b", 1L), ("d2/c", 7L))
      .toDF("path", "row_index")
    dv.coalesce(1).write.parquet(s"$d/src")
    val keep = Set("d1/a", "d2/c")
    assert(MetaIO.carryFrameFiltered(spark, s"$d/src", s"$d/dst",
      "path", keep, capBytes = 1L << 20))
    val got = spark.read.parquet(s"$d/dst").orderBy("path", "row_index")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("d1/a", 0L), ("d1/a", 3L), ("d2/c", 7L)))
    // nothing survives → no dst (absent frame = "none", DV contract)
    assert(MetaIO.carryFrameFiltered(spark, s"$d/src", s"$d/none",
      "path", Set("zz"), capBytes = 1L << 20))
    assert(!new java.io.File(s"$d/none").exists())
    // writeEmpty = true keeps an (empty) frame dir — the `_bloom`
    // existence-probe contract
    assert(MetaIO.carryFrameFiltered(spark, s"$d/src", s"$d/empty",
      "path", Set("zz"), capBytes = 1L << 20, writeEmpty = true))
    assert(spark.read.parquet(s"$d/empty").count() == 0L)
    // over the cap: decline, write nothing
    assert(!MetaIO.carryFrameFiltered(spark, s"$d/src", s"$d/over",
      "path", keep, capBytes = 1L))
    assert(!new java.io.File(s"$d/over").exists())
  }

  test("frameRowsAs returns schema-attached rows in field order; " +
      "parallel frameRows equals the Spark read on a multi-file frame") {
    val d = freshDir()
    val df = spark.range(0, 500)
      .select(concat(lit("p"), $"id").as("path"), $"id".as("n"))
    df.repartition(5).write.parquet(s"$d/f")
    val schema = MetaIO.schemaOf(spark,
      new org.apache.hadoop.fs.Path(s"$d/f")).get
    val rows = MetaIO.frameRowsAs(spark, s"$d/f", schema).get
    assert(rows.size == 500)
    assert(rows.head.fieldIndex("path") == schema.fieldIndex("path"))
    val got = rows.map(r => (r.getAs[String]("path"), r.getAs[Long]("n")))
      .sortBy(_._2)
    val want = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._2).toSeq
    assert(got == want)
    // a requested field missing from the frame declines loudly-softly
    val other = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("nope",
        org.apache.spark.sql.types.StringType)))
    assert(MetaIO.frameRowsAs(spark, s"$d/f", other).isEmpty)
  }

  test("multi-path readParquet invariant: every footer of an unpinned " +
      "ref set agrees with the first (ADVICE r15 #4 — asserted here " +
      "so a violation fails loudly in CI, not silently in reads)") {
    val d = freshDir()
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$d/t1")
    Seq((2L, "b")).toDF("k", "v").write.parquet(s"$d/t2")
    val s1 = MetaIO.schemaOf(spark,
      new org.apache.hadoop.fs.Path(s"$d/t1")).get
    val s2 = MetaIO.schemaOf(spark,
      new org.apache.hadoop.fs.Path(s"$d/t2")).get
    assert(s1 == s2)
    val both = MetaIO.readParquet(spark, Seq(s"$d/t1", s"$d/t2"))
    assert(both.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
  }
}
