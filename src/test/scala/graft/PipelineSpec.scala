package graft

import org.apache.spark.sql.functions._

import graft.ops.Pipeline

class PipelineSpec extends SparkSpec with SlowSuite {

  test("funnel enforces strict stage ordering and deepest-stage semantics") {
    import spark.implicits._
    // user 1: full funnel; user 2: click before view (doesn't count) then
    // view only; user 3: view+purchase but no click → stage 1.
    val events = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 50L, "click"), (2L, 100L, "view"),
      (3L, 10L, "view"), (3L, 20L, "purchase")
    ).toDF("user_id", "us", "t")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("t"))

    val out = Pipeline.funnel(events, "user_id", "ts", "t",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "t_view_us", "t_click_us", "t_purchase_us", "stage_reached")
      .collect()

    assert(out(0).getLong(1) === 100L && out(0).getLong(2) === 200L &&
      out(0).getLong(3) === 300L && out(0).getInt(4) === 3)
    assert(out(1).getLong(1) === 100L && out(1).isNullAt(2) &&
      out(1).isNullAt(3) && out(1).getInt(4) === 1)
    assert(out(2).getLong(1) === 10L && out(2).isNullAt(2) &&
      out(2).isNullAt(3) && out(2).getInt(4) === 1)
  }

  test("scd2 intervals tile the key's timeline with one open current row") {
    val events = graft.engine.Catalog.load(spark, "/root/testdata/sf0.001", "events")
    val scd = Pipeline.scd2(events, "user_id", "ts", "event_id", "event_type")
      .persist()
    // exactly one current row per key
    val perKey = scd.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("is_current").cast("long")).as("cur"))
    assert(perKey.filter(col("cur") =!= 1L).count() === 0)
    // each interval's valid_to equals the next interval's valid_from (tiling)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("valid_from_us").asc, col("event_id").asc)
    val bad = scd
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us").isNotNull &&
        col("valid_to_us") =!= col("next_from"))
    assert(bad.count() === 0)
    assert(scd.count() === events.count())
    scd.unpersist()
  }

  test("canonicalizeUrl is idempotent and strips utm/fragment/case/slash") {
    import spark.implicits._
    val cases = Seq(
      "https://WWW.Ex.COM/A/?utm_source=x&id=1&utm_b=2#f" ->
        "https://www.ex.com/A?id=1",
      "http://H.io/p/" -> "http://h.io/p",
      "https://h.io/?utm_only=1" -> "https://h.io",
      "https://h.io/x?a=1&utm_z=9" -> "https://h.io/x?a=1")
    val df = cases.map(_._1).toDF("url")
      .withColumn("c1", Pipeline.canonicalizeUrl(col("url")))
      .withColumn("c2", Pipeline.canonicalizeUrl(col("c1")))
    val rows = df.collect()
    rows.zip(cases).foreach { case (r, (_, want)) =>
      assert(r.getString(1) === want, s"canon(${r.getString(0)})")
      assert(r.getString(2) === r.getString(1), "idempotence")
    }
  }

  test("withQuantileBin partitions rows into ordered, boundary-respecting bins") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val binned = Pipeline.withQuantileBin(li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
      .persist()
    assert(binned.count() === li.count())
    assert(binned.filter(col("bin") < 1 || col("bin") > 4).count() === 0)
    // bins are ordered: max of bin i never exceeds min of bin i+2's values
    val stats = binned.groupBy("bin")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .orderBy("bin").collect()
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(2), s"bin ${a.getInt(0)} vs ${b.getInt(0)}")
    }
    binned.unpersist()
  }

  test("winsorize clamps into [lo_cut, hi_cut] and flags match comparisons") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val w = Pipeline.winsorize(li, "l_extendedprice", 0.05, 0.95).persist()
    assert(w.filter(col("l_extendedprice_w") < col("_lo") ||
      col("l_extendedprice_w") > col("_hi")).count() === 0)
    assert(w.filter(col("clamped_low") =!=
      (col("l_extendedprice") < col("_lo"))).count() === 0)
    // roughly 5% clamped each side on continuous data
    val n = w.count()
    val nLo = w.filter(col("clamped_low")).count()
    assert(nLo > n / 40 && nLo < n / 10, s"nLo=$nLo of $n")
    w.unpersist()
  }

  test("rollingAnomaly flags a spike and not the stable regime") {
    import spark.implicits._
    val base = (1L to 15L).map(i => (1L, i * 1000L, i, 10.0 + (i % 3) * 0.5))
    val rows = base :+ ((1L, 16000L, 16L, 900.0)) // spike
    val df = rows.toDF("user_id", "us", "event_id", "value")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("value"))
    val out = Pipeline.rollingAnomaly(df, "user_id", "ts", "event_id", "value",
        lookback = 20, minPrev = 10, zSq = 9)
      .filter(col("is_anomaly")).select("event_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(16L))
  }

  test("distributed exact percentiles equal the built-in exact aggregate") {
    import graft.ops.Quantiles
    val cents = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = Quantiles.exactPercentiles(cents, "cents", probs).head
    val want = cents.agg(
      expr(s"percentile(cents, array(${probs.mkString(",")}))")).head
      .getSeq[Double](0)
    // The operator spells lo + g·(hi − lo) exactly as the DuckDB oracle
    // does (the conformance row is bit-exact); Spark's built-in aggregate
    // associates its interpolation differently and can differ by 1 ulp.
    probs.indices.foreach { i =>
      val (g, w) = (got.getDouble(i), want(i))
      assert(math.abs(g - w) <= math.ulp(w), s"p=${probs(i)}: $g vs $w")
    }
  }

  test("grouped distributed percentiles match the built-in per group") {
    import graft.ops.Quantiles
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val got = Quantiles.exactPercentilesByGroup(df, "l_returnflag", "cents",
        Seq(0.25, 0.75))
      .orderBy("l_returnflag").collect()
    val want = df.groupBy("l_returnflag")
      .agg(expr("percentile(cents, array(0.25, 0.75))").as("ps"))
      .orderBy("l_returnflag").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      val ps = w.getSeq[Double](1)
      Seq(1, 2).zip(ps).foreach { case (i, exp) =>
        assert(math.abs(g.getDouble(i) - exp) <= math.ulp(exp),
          s"${g.getString(0)} p$i: ${g.getDouble(i)} vs $exp")
      }
    }
  }

  test("distributed percentiles handle duplicates and tiny inputs") {
    import spark.implicits._
    import graft.ops.Quantiles
    val df = Seq(5L, 5L, 5L, 1L, 9L).toDF("k")
    val r = Quantiles.exactPercentiles(df, "k", Seq(0.0, 0.5, 1.0)).head
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 5.0 && r.getDouble(2) === 9.0)
    val one = Seq(7L).toDF("k")
    val r1 = Quantiles.exactPercentiles(one, "k", Seq(0.25)).head
    assert(r1.getDouble(0) === 7.0)
  }

  test("percentiles served from a shared ranked table equal the one-shot path") {
    // The round-8 split (rankedCounts + percentilesFromRanked) lets the
    // whole percentile family amortize ONE cached build; the serve must be
    // bit-identical to exactPercentiles for every probs set asked of the
    // same ranked table, including probes the table was never "built for".
    import graft.ops.Quantiles
    val cents = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val ranked = Quantiles.rankedCounts(cents, "cents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Seq(Seq(0.25, 0.5, 0.75), Seq(0.05, 0.95), Seq(0.5)).foreach { probs =>
        val shared = Quantiles.percentilesFromRanked(ranked, "cents", probs).head
        val oneShot = Quantiles.exactPercentiles(cents, "cents", probs).head
        probs.indices.foreach { i =>
          assert(shared.getDouble(i) === oneShot.getDouble(i),
            s"probs=$probs p$i: ${shared.getDouble(i)} vs ${oneShot.getDouble(i)}")
        }
      }
    } finally ranked.unpersist()
  }

  test("grouped percentiles from a shared grouped ranked table equal the one-shot path") {
    // Round-9: the grouped family gets the same split
    // (groupedRankedCounts + percentilesByGroupFromRanked) so grouped
    // reporting and grouped winsorization amortize ONE cached build; the
    // serve must be bit-identical to exactPercentilesByGroup for every
    // probs set, including ones the table was never "built for".
    import graft.ops.Quantiles
    val cents = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val ranked = Quantiles.groupedRankedCounts(cents, "l_returnflag", "cents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Seq(Seq(0.25, 0.5, 0.75), Seq(0.05, 0.95), Seq(0.5)).foreach { probs =>
        val shared = Quantiles.percentilesByGroupFromRanked(
          ranked, "l_returnflag", "cents", probs).orderBy("l_returnflag").collect()
        val oneShot = Quantiles.exactPercentilesByGroup(
          cents, "l_returnflag", "cents", probs).orderBy("l_returnflag").collect()
        assert(shared.length === oneShot.length && shared.nonEmpty)
        shared.zip(oneShot).foreach { case (g, w) =>
          assert(g.getString(0) === w.getString(0))
          probs.indices.foreach { i =>
            assert(g.getDouble(i + 1) === w.getDouble(i + 1),
              s"${g.getString(0)} probs=$probs p$i")
          }
        }
      }
    } finally ranked.unpersist()
  }

  test("hashVectorize preserves token mass and stays within dim") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v = Pipeline.hashVectorize(docs, "doc_id", "text", dim = 64).persist()
    assert(v.filter(col("bucket") < 0 || col("bucket") >= 64).count() === 0)
    val mass = v.agg(sum("tf")).head.getLong(0)
    val tokens = docs.select(explode(split(col("text"), " "))).count()
    assert(mass === tokens)
    v.unpersist()
  }

  test("windowed collect_set: degenerate cardinality is frame-bounded and exact") {
    // The w7 pattern's contract (queries/Extended.scala): per-row memory is
    // O(distinct values IN FRAME). Worst case — every value UNIQUE — the set
    // grows with the frame, never the column: 5000 unique values under a
    // trailing RANGE frame of width 100 peak at 100 entries and the counts
    // stay exact.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 5000L).map(i => (1L, i, s"t$i")).toDF("k", "pos", "typ")
    val w = Window.partitionBy("k").orderBy(col("pos")).rangeBetween(-99, 0)
    val got = df.select(col("pos"),
        size(collect_set(col("typ")).over(w)).as("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.length === 5000)
    assert(got.forall { case (pos, d) => d == math.min(pos + 1, 100L) })
  }

  test("linearInterpolate fills gaps on the line, keeps observations exact") {
    import spark.implicits._
    // key 1: observations at t=0 (v=10) and t=30 (v=40), step 10 → the two
    // gap points sit at 20 and 30; key 2: single point → no gaps.
    val obs = Seq((1L, 0L, 10.0), (1L, 30L, 40.0), (2L, 5L, 7.0))
      .toDF("k", "t", "v")
    val got = graft.ops.TimeSeries.linearInterpolate(obs, "k", "t", "v", 10L)
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 10.0, true), (1L, 10L, 20.0, false), (1L, 20L, 30.0, false),
      (1L, 30L, 40.0, true), (2L, 5L, 7.0, true)))
  }
}
