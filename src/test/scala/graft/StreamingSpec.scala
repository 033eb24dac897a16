package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.Streams
import graft.streaming.Streams.{Session, SessionGapUs}

class StreamingSpec extends SparkSpec with SlowSuite {

  test("sessionsOf splits at gaps > 30min and counts events") {
    val m = 60L * 1000 * 1000 // one minute in µs
    val us = Seq(0L, 10 * m, 29 * m + 10 * m, 100 * m, 200 * m)
    // gaps: 10m, 29m, 61m (split), 100m (split)
    assert(Streams.sessionsOf(7L, us) === Seq(
      Session(7L, 0L, 39 * m, 3L),
      Session(7L, 100 * m, 100 * m, 1L),
      Session(7L, 200 * m, 200 * m, 1L)))
  }

  test("sessionsOf properties: events conserved, gap invariants hold") {
    val genUs = Gen.listOf(Gen.chooseNum(0L, 10L * 3600 * 1000 * 1000)).map(_.sorted)
    (0 until 100).foreach { i =>
      val us = genUs.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val sessions = Streams.sessionsOf(1L, us)
      assert(sessions.map(_.n_events).sum === us.length)
      // consecutive sessions are separated by more than the gap
      sessions.sliding(2).foreach {
        case Seq(a, b) => assert(b.session_start_us - a.session_end_us > SessionGapUs)
        case _ =>
      }
      // within a session, start <= end and both are real event times
      sessions.foreach { sess =>
        assert(sess.session_start_us <= sess.session_end_us)
        assert(us.contains(sess.session_start_us) && us.contains(sess.session_end_us))
      }
    }
  }

  test("batch sessionize matches window-SQL formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(48 * 3600).toLong * 1000000L)
    }
    val events = rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val got = Streams.sessionizeBatch(events)
      .orderBy("user_id", "session_start_us").collect()

    events.createOrReplaceTempView("ev_tmp")
    val want = spark.sql(
      s"""WITH e AS (SELECT user_id, unix_micros(ts) AS us FROM ev_tmp),
         |x AS (SELECT user_id, us,
         |  CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
         |         OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > $SessionGapUs
         |       THEN 1 ELSE 0 END AS brk FROM e),
         |y AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id ORDER BY us
         |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
         |SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
         |       COUNT(*) AS n_events
         |FROM y GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin).collect()
    assert(got.toSeq === want.toSeq)
  }

  test("streaming sessionize emits closed sessions across microbatches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = 3600L * 1000 * 1000 // one hour in µs

    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"))

    val out = Streams.sessionizeStream(events, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    // Base offset: rows with ts <= the initial watermark (epoch 0) would be
    // dropped as late on arrival.
    val t0 = 1000L * h
    try {
      // batch 1: user 1 two close events; user 2 one event
      mem.addData((1L, t0), (1L, t0 + 600L * 1000000), (2L, t0))
      q.processAllAvailable()
      // batch 2: user 1 jumps 2h ahead → closes their first session on arrival;
      // the watermark (2h - 10min) also passes user 2's timeout (t0 + 30min).
      mem.addData((1L, t0 + 2 * h))
      q.processAllAvailable()
      // one more batch so the timeout for user 2 (armed in batch 1, watermark
      // advanced in batch 2) actually fires.
      mem.addData((3L, t0 + 4 * h))
      q.processAllAvailable()

      val got = spark.table("sess_test")
        .orderBy("user_id", "session_start_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.contains((1L, t0, t0 + 600L * 1000000, 2L)), s"user 1 closed session, got ${got.toSeq}")
      assert(got.contains((2L, t0, t0, 1L)), s"user 2 timed-out session, got ${got.toSeq}")
    } finally q.stop()
  }

  test("transformWithState sessionize matches the flatMapGroups semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = 3600L * 1000 * 1000
    val t0 = 1000L * h
    Streams.withRocksDBStateStore(spark) {
      val mem = MemoryStream[(Long, Long)]
      val events = mem.toDF()
        .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"))
      val out = Streams.sessionizeTws(events, watermarkDelay = "10 minutes")
      val q = out.writeStream.format("memory").queryName("sess_tws")
        .outputMode("append").start()
      try {
        mem.addData((1L, t0), (1L, t0 + 600L * 1000000), (2L, t0))
        q.processAllAvailable()
        mem.addData((1L, t0 + 2 * h)) // closes user 1's first session
        q.processAllAvailable()
        mem.addData((3L, t0 + 4 * h)) // advances watermark past user 2's timer
        q.processAllAvailable()
        val got = spark.table("sess_tws")
          .orderBy("user_id", "session_start_us").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(got.contains((1L, t0, t0 + 600L * 1000000, 2L)),
          s"user 1 closed session, got ${got.toSeq}")
        assert(got.contains((2L, t0, t0, 1L)),
          s"user 2 timed-out session, got ${got.toSeq}")
      } finally q.stop()
    }
  }

  test("foreachBatch parquet sink is idempotent under batch replay") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_febatch").toString + "/t"
    val src = graft.engine.Catalog.path(dir, "events")
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .select("event_id", "user_id")
    val q = Streams.foreachBatchParquetSink(stream, out)
    q.awaitTermination()
    val expected = spark.read.parquet(src).count()
    def sunk() = spark.read.parquet(out).select("event_id").distinct().count()
    assert(sunk() == expected)
    // replay batch 0 (failure-recovery path): same directory is rewritten,
    // no duplicates appear. Materialize the batch's rows first — the replay
    // overwrites the directory it was read from.
    val b0Path = s"$out/batch=0"
    val b0Schema = spark.read.parquet(b0Path).schema
    val b0Rows = java.util.Arrays.asList(spark.read.parquet(b0Path).collect(): _*)
    Streams.writeBatch(spark.createDataFrame(b0Rows, b0Schema), out, 0L)
    assert(sunk() == expected)
    assert(spark.read.parquet(out).count() == spark.read.parquet(out)
      .select("event_id").distinct().count())
  }

  test("foreachBatch sink resumes from checkpoint: only new files process on restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_resume")
    val src = root.resolve("src"); val staged = root.resolve("staged")
    val sink = root.toString + "/sink"; val ckpt = root.toString + "/ckpt"
    java.nio.file.Files.createDirectories(src)

    def addFile(tag: String, ids: Range): Unit = {
      val tmp = staged.resolve(tag).toString
      ids.map(_.toLong).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, src.resolve(s"$tag.parquet"))
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
        .parquet(src.toString)
      Streams.foreachBatchParquetSink(stream, sink, Some(ckpt)).awaitTermination()
    }

    addFile("a", 0 until 100)
    drain()
    assert(spark.read.parquet(sink).count() === 100)

    addFile("b", 100 until 150)
    drain() // restart from the same checkpoint
    val all = spark.read.parquet(sink)
    assert(all.count() === 150) // a processed once, b appended
    assert(all.select("id").distinct().count() === 150)
    // the resumed run emitted ONLY file b (no reprocessing of a)
    val batches = all.select("batch").distinct().as[Int].collect().sorted
    assert(batches.length === 2, batches.toSeq)
    val second = all.filter(col("batch") === batches.max)
    assert(second.count() === 50 &&
      second.agg(min("id")).head.getLong(0) === 100L)
  }

  test("streaming incremental dedup accumulates kept docs across microbatches") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_incr_stream")
    val src = root.resolve("src"); val staged = root.resolve("staged")
    val corpus = root.toString + "/corpus"
    java.nio.file.Files.createDirectories(src)

    val hText = "the quick brown fox jumps over the lazy dog near the river bank"
    val kText = "fresh unrelated content mentioning catalyst plans and tungsten codegen stages"
    // Seed the corpus with history doc 0.
    graft.streaming.Streams.writeBatch(
      Seq((0L, hText)).toDF("doc_id", "text"), corpus, -1L)

    def addFile(tag: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = staged.resolve(tag).toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, src.resolve(s"$tag.parquet"))
    }
    // batch a: doc 10 duplicates history → dropped; doc 11 is fresh → kept.
    addFile("a", Seq((10L, hText), (11L, kText)))
    // batch b (arrives AFTER a's kept docs joined the corpus): doc 20
    // near-dups batch-a's KEPT doc 11 → dropped against the accumulated
    // corpus, not just the seed; doc 21 is fresh → kept.
    addFile("b", Seq(
      (20L, kText.replace("stages", "pages")),
      (21L, "completely different words about spark shuffles and parquet files here")))
    // one file per microbatch, ordered: a (older mtime) before b
    java.nio.file.Files.setLastModifiedTime(src.resolve("a.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(1000000))

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    graft.streaming.Streams.incrementalDedupSink(stream, corpus, n = 3, threshold = 0.5)
      .awaitTermination()

    val kept = spark.read.parquet(corpus)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(0L, 11L, 21L))
  }

  test("streaming MV refresh across microbatches equals the full aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val root = java.nio.file.Files.createTempDirectory("graft_smv_spec")
    val src = root.resolve("src"); val staged = root.resolve("staged")
    java.nio.file.Files.createDirectories(src)
    val agg: DataFrame => DataFrame =
      df => df.groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    // seed: keys 0..2
    val seed = Seq((0L, 0L, 10L), (1L, 1L, 20L), (2L, 2L, 30L))
      .toDF("id", "k", "v")
    Streams.writeBatch(seed, root.toString + "/base", -1L)
    agg(spark.read.parquet(root.toString + "/base"))
      .write.parquet(root.toString + "/mv")

    def addFile(tag: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = staged.resolve(tag).toString
      rows.toDF("id", "k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, src.resolve(s"$tag.parquet"))
      java.nio.file.Files.setLastModifiedTime(src.resolve(s"$tag.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // batch a touches existing key 1 and new key 7; batch b touches key 7
    // again (must see batch a's rows in the accumulated base) and key 0
    addFile("a", Seq((10L, 1L, 5L), (11L, 7L, 1L)), 1000000)
    addFile("b", Seq((12L, 7L, 2L), (13L, 0L, 4L)), 2000000)

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    Streams.mvRefreshSink(stream, root.toString + "/base",
        root.toString + "/mv", "k", agg)
      .awaitTermination()

    val got = spark.read.parquet(root.toString + "/mv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full aggregate over seed + both batches
    val want = Set((0L, 2L, 14L), (1L, 2L, 25L), (2L, 1L, 30L), (7L, 2L, 3L))
    assert(got === want)
  }

  test("partitioned MV refresh rewrites ONLY the touched bucket partitions") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val root = java.nio.file.Files.createTempDirectory("graft_smvp_spec")
    val src = root.resolve("src"); val staged = root.resolve("staged")
    java.nio.file.Files.createDirectories(src)
    val B = 8
    val agg: DataFrame => DataFrame =
      df => df.groupBy("k").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    // seed keys 0..7 — at B=8 with Murmur3 these spread over several buckets
    val seed = (0L until 8L).map(k => (k, k, k * 10L)).toDF("id", "k", "v")
    Streams.writeBatch(seed, root.toString + "/base", -1L)
    agg(spark.read.parquet(root.toString + "/base"))
      .withColumn("mv_bucket", Streams.mvBucket(col("k"), B))
      .write.partitionBy("mv_bucket").parquet(root.toString + "/mv")

    def addFile(tag: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = staged.resolve(tag).toString
      rows.toDF("id", "k", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, src.resolve(s"$tag.parquet"))
      java.nio.file.Files.setLastModifiedTime(src.resolve(s"$tag.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def drain(): Unit =
      Streams.mvRefreshSinkPartitioned(
          spark.readStream.schema(schema).parquet(src.toString),
          root.toString + "/base", root.toString + "/mv", "k", B, agg,
          checkpoint = Some(root.toString + "/ckpt"))
        .awaitTermination()

    addFile("a", Seq((10L, 1L, 5L), (11L, 7L, 1L)), 1000000)
    drain()
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(root.toString + "/mv").listFiles()
        .filter(_.getName.startsWith("mv_bucket=")).map { d =>
          d.getName -> d.listFiles().map(f => f.getName + ":" + f.lastModified())
            .toSet
        }.toMap
    val before = bucketFiles()
    // batch b touches ONLY key 2 — exactly one bucket may change
    addFile("b", Seq((12L, 2L, 4L)), 2000000)
    drain()
    val after = bucketFiles()
    val changed = (before.keySet ++ after.keySet)
      .filter(d => before.get(d) != after.get(d))
    assert(changed.size === 1, s"changed=$changed")
    // and the MV still equals the full aggregate
    val got = spark.read.parquet(root.toString + "/mv")
      .select("k", "n", "sv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = agg(spark.read.parquet(root.toString + "/base"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("streaming ANN serve across microbatches equals the one-shot batch serve") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sann_spec")
    val src = root.resolve("src"); val staged = root.resolve("staged")
    java.nio.file.Files.createDirectories(src)
    // 20 corpus vectors in 4 labelled cells, deterministic coords
    val vecs = (0L until 20L).map(i => (i,
      Array((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat),
      (i % 4).toInt)).toDF("vec_id", "embedding", "label")
    graft.ops.Similarity.writeIvfIndex(vecs, "vec_id", "embedding", "label",
      root.toString + "/index")

    def addFile(tag: String, ids: Seq[Long], mtime: Long): Unit = {
      val tmp = staged.resolve(tag).toString
      vecs.filter(col("vec_id").isin(ids: _*)).select("vec_id", "embedding")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, src.resolve(s"$tag.parquet"))
      java.nio.file.Files.setLastModifiedTime(src.resolve(s"$tag.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    addFile("a", Seq(0L, 5L), 1000000)
    addFile("b", Seq(10L, 15L), 2000000)

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    Streams.annServeSink(stream, root.toString + "/index",
        root.toString + "/hits", "vec_id", "embedding", "label",
        nprobe = 2, k = 3)
      .awaitTermination()

    val streamed = spark.read.parquet(root.toString + "/hits")
      .select("q_vec", "rank", "neighbor", "cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val oneShot = graft.ops.Similarity.knnIvfPersisted(spark,
        root.toString + "/index",
        vecs.filter(col("vec_id").isin(0L, 5L, 10L, 15L)),
        "vec_id", "embedding", "label", nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty && streamed.toSeq === oneShot.toSeq)
    // two microbatches → two idempotent batch dirs
    assert(new java.io.File(root.toString + "/hits").listFiles()
      .count(_.getName.startsWith("batch=")) === 2)
  }

  test("RocksDB state store yields identical windowed aggregates") {
    val dir = "/root/testdata/sf0.001"
    val default = Streams.tumblingAgg(spark, dir).collect().map(_.toSeq).toSeq
    val rocks = Streams.withRocksDBStateStore(spark) {
      Streams.tumblingAgg(spark, dir)
    }.collect().map(_.toSeq).toSeq
    assert(rocks == default)
    assert(rocks.nonEmpty)
  }

  test("watermark drops a too-late event: finalized windows never reopen") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = 3600L * 1000 * 1000
    val t0 = 2000L * h
    val mem = MemoryStream[(Long, Long)]
    val agg = mem.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))
    val q = agg.writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      mem.addData((1L, t0), (1L, t0 + 60L * 1000000)) // two events in window W0
      q.processAllAvailable()
      mem.addData((1L, t0 + 3 * h)) // watermark → t0+2h: W0 finalizes (cnt=2)
      q.processAllAvailable()
      mem.addData((1L, t0 + 120L * 1000000)) // LATE into W0 — must be dropped
      mem.addData((1L, t0 + 6 * h)) // advance watermark past W3 too
      q.processAllAvailable()
      val rows = spark.table("late_drop").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      // W0 emitted exactly once with the pre-watermark count; the late
      // event neither reopened it nor produced a duplicate row
      assert(rows(t0 / 1000) === 2L, rows)
      assert(rows(t0 / 1000 + 3 * h / 1000) === 1L, rows)
      assert(spark.table("late_drop").count() === 2, rows)
    } finally q.stop()
  }

  test("left-outer stream-stream join pads an unmatched purchase after expiry") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = 60L * 1000000 // one minute in µs
    val t0 = 120000L * m
    val clicksMem = MemoryStream[(Long, Long, Long)]
    val purchMem = MemoryStream[(Long, Long, Long)]
    val clicks = clicksMem.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("c_ts"),
        col("_3").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = purchMem.toDF()
      .select(col("_1").as("p_user"), timestamp_micros(col("_2")).as("p_ts"),
        col("_3").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    val out = graft.streaming.Streams.joinPurchasesToClicks(
      purchases, clicks, "left_outer")
    val q = out.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      // batch 1: purchase 900 (user 1) has click 100 in-window; purchase
      // 901 (user 2) has NO click — its null row must wait for eviction.
      clicksMem.addData((1L, t0 - 5 * m, 100L))
      purchMem.addData((1L, t0, 900L), (2L, t0, 901L))
      q.processAllAvailable()
      val eager = spark.table("ssj_outer").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // inner match emits eagerly; the unmatched purchase must NOT have
      // been padded yet — no future-click proof exists at this watermark
      assert(eager.contains((900L, 100L)), eager)
      assert(!eager.exists(_._1 == 901L), eager)
      // batches 2+3: advance BOTH watermarks far past t0 (+30min window
      // +10min delay), then one more batch so eviction fires post-advance.
      clicksMem.addData((9L, t0 + 120 * m, 101L))
      purchMem.addData((9L, t0 + 120 * m, 902L))
      q.processAllAvailable()
      clicksMem.addData((9L, t0 + 300 * m, 102L))
      purchMem.addData((9L, t0 + 300 * m, 903L))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((901L, -1L)), rows) // null-padded after expiry
      assert(rows.contains((900L, 100L)), rows)
      assert(!rows.contains((901L, 100L)), rows)
    } finally q.stop()
  }

  test("quarantine sink splits batches losslessly and replays idempotently") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_quar").toString + "/t"
    val src = graft.engine.Catalog.path(dir, "events")
    val schema = spark.read.parquet(src).schema
    val ev = graft.engine.Catalog.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      // plant failures: every 7th event "corrupt"
      .withColumn("value",
        when(col("event_id") % 7 === 0, -col("value") - 1.0).otherwise(col("value")))
    val good = col("value") >= 0.0
    val q = Streams.quarantineSink(ev, good, out)
    q.awaitTermination()
    val clean = spark.read.parquet(s"$out/clean")
    val quar = spark.read.parquet(s"$out/quarantine")
    val total = spark.read.parquet(src).count()
    // lossless split
    assert(clean.count() + quar.count() === total)
    assert(clean.filter(col("value") < 0).count() === 0)
    assert(quar.filter(col("value") >= 0).count() === 0)
    assert(quar.count() > 0)
    // replaying batch 0 rewrites itself on both sides (no duplication);
    // materialize the rows first — the replay overwrites the very files a
    // lazy plan would still be reading
    val b0 = spark.read.parquet(s"$out/clean/batch=0")
      .unionByName(spark.read.parquet(s"$out/quarantine/batch=0"))
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(b0.collect(): _*), b0.schema)
    Streams.writeBatch(batch.filter(col("value") >= 0), s"$out/clean", 0L)
    Streams.writeBatch(batch.filter(col("value") < 0), s"$out/quarantine", 0L)
    assert(spark.read.parquet(s"$out/clean").count() +
      spark.read.parquet(s"$out/quarantine").count() === total)
  }

  test("streaming rolling anomaly equals the batch operator under one drain") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = Streams.withRocksDBStateStore(spark) {
      Streams.anomalyStream(spark, dir)
    }.select("event_id", "user_id", "cents", "n_prev", "dev_sq", "bound")
      .collect().map(_.toSeq).toSeq
    val batch = graft.ops.Pipeline.rollingAnomaly(
        graft.engine.Catalog.load(spark, dir, "events"),
        "user_id", "ts", "event_id", "value", lookback = 20, minPrev = 10, zSq = 9)
      .filter(col("is_anomaly"))
      .select("event_id", "user_id", "cents", "n_prev", "dev_sq", "bound")
      .orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
