package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.streaming.Streams

/** Oracle-checked streaming / event-pipeline queries. The streaming variants
  * drain the parquet-backed stream with `Trigger.AvailableNow`, so results
  * are deterministic and comparable to batch SQL. */
object StreamQ {

  val all: Seq[Q] = Seq(

    // Structured Streaming: tumbling 1h event-time windows with watermark.
    Q("stream_tumbling_agg",
      (s, dir) => Streams.tumblingAgg(s, dir),
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin)),

    // Stream-static enrichment: broadcast dimension join inside the
    // microbatch plan (stateless), then watermarked tumbling windows.
    Q("stream_static_enrich",
      (s, dir) => Streams.staticEnrichAgg(s, dir),
      Some("""SELECT date_trunc('hour', ts) AS ws,
             |  coalesce(c_mktsegment, 'UNKNOWN') AS segment,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM events LEFT JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2 ORDER BY ws, segment""".stripMargin)),

    // Sessionization via typed flatMapGroups (custom per-key state logic);
    // the oracle derives the same sessions with lag + cumulative-sum SQL.
    Q("sessionize_events",
      (s, dir) =>
        Streams.sessionizeBatch(Catalog.load(s, dir, "events"))
          .orderBy("user_id", "session_start_us"),
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              |x AS (SELECT user_id, us,
              |  CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              |         OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > ${Streams.SessionGapUs}
              |       THEN 1 ELSE 0 END AS brk FROM e),
              |y AS (SELECT user_id, us,
              |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
              |                 ROWS UNBOUNDED PRECEDING) AS sid FROM x)
              |SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
              |       COUNT(*) AS n_events
              |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin)),

    // The BUILT-IN session_window grouping beside the hand-rolled stateful
    // sessionization above — same 30-minute gap, but Spark's native session
    // windows split at diff >= gap (an event landing exactly at
    // previous + gap starts a new session), where the custom operator used
    // the reference-free > convention; the oracle mirrors >=.
    Q("sessionize_window_builtin",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(min(unix_micros(col("ts"))).as("session_start_us"),
            max(unix_micros(col("ts"))).as("session_end_us"),
            count(lit(1)).as("n_events"))
          .select("user_id", "session_start_us", "session_end_us", "n_events")
          .orderBy("user_id", "session_start_us"),
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
              |x AS (SELECT user_id, us,
              |  CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              |         OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) >= ${Streams.SessionGapUs}
              |       THEN 1 ELSE 0 END AS brk FROM e),
              |y AS (SELECT user_id, us,
              |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
              |                 ROWS UNBOUNDED PRECEDING) AS sid FROM x)
              |SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
              |       COUNT(*) AS n_events
              |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin)),

    // Stream-stream inner join with two-sided watermarks + time-range bound.
    Q("stream_stream_join",
      (s, dir) => Streams.purchaseClickJoin(s, dir),
      Some("""WITH c AS (SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS p_id
             |      FROM events WHERE event_type = 'purchase')
             |SELECT p_id, click_id FROM p JOIN c ON p.user_id = c.user_id
             |  AND c_us >= p_us - 1800000000 AND c_us <= p_us
             |ORDER BY p_id, click_id""".stripMargin)),

    // Salted two-phase aggregation over a 3-distinct-key (maximally skewed)
    // grouping — result identical to the direct GROUP BY, which is the oracle.
    Q("skew_salted_agg",
      (s, dir) =>
        graft.ops.Skew.saltedCountSum(
            Catalog.load(s, dir, "lineitem"),
            col("l_returnflag"), col("l_quantity"), salts = 32)
          .orderBy("k"),
      Some("""SELECT l_returnflag AS k, COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM lineitem GROUP BY l_returnflag ORDER BY k""".stripMargin)),

    // Salted equi-join over a 5-distinct-key (maximally skewed) join — each
    // event_type routes across 32 salt replicas of its dimension row; the
    // shuffle_hash hint keeps the exercise on the shuffle path (a broadcast
    // join needs no salting). Result identical to the plain join = the oracle.
    Q("skew_salted_join",
      (s, dir) => {
        val ev = Catalog.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("user_id"))
        val dim = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("type_n"))
          .select(col("event_type").as("et"), col("type_n"))
        graft.ops.Skew.saltedEquiJoin(ev, dim.hint("shuffle_hash"),
            "event_type", "et", saltOn = col("event_id"), salts = 32)
          .select(col("event_id"), col("event_type"), col("type_n"))
          .orderBy("event_id")
      },
      Some("""WITH dim AS (SELECT event_type AS et, COUNT(*) AS type_n
             |            FROM events GROUP BY event_type)
             |SELECT event_id, event_type, type_n
             |FROM events e JOIN dim ON e.event_type = dim.et
             |ORDER BY event_id""".stripMargin)),

    // Sketch aggregates (HLL distinct, percentile_approx) with a BOUNDED-
    // ERROR oracle: the raw sketch values are approximate by design, so the
    // checked output is (exact value, within-published-bound booleans) — the
    // booleans are computed in Spark against exact aggregates over the same
    // data (HLL at rsd=0.05 checked at 3σ = 15%; percentile_approx at
    // accuracy 10000 ⇒ rank error 1e-4, checked against the exact 49th/51st
    // percentiles), and the oracle asserts them TRUE. A sketch regression now
    // fails the hash compare instead of slipping through a rows-only check.
    Q("sketch_approx_stats",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.05).as("au"),
            percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
            expr("percentile(value, 0.49)").as("p49"),
            expr("percentile(value, 0.51)").as("p51"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("au") - col("exact_users")) <=
              col("exact_users") * lit(0.15)).as("approx_users_ok"),
            (col("p50") >= col("p49") && col("p50") <= col("p51")).as("p50_ok"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_users_ok, TRUE AS p50_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // End-to-end incremental ingest: file-stream source → stateless
    // filter/project → exactly-once foreachBatch parquet sink (idempotent
    // batch=<id> overwrite dirs) → read the sink back and aggregate. The
    // oracle is a straight batch recompute over the source table, so this
    // closes the loop the sink replay test and the reaggregable-partial
    // merge (incremental_agg_merge) each proved half of: rows that flowed
    // through the incremental path equal the batch path, exactly once.
    Q("stream_e2e_incremental",
      (s, dir) => {
        val sinkDir =
          graft.engine.TempDirs.create("graft_e2e") + "/bronze"
        val ev = Streams.eventStream(s, dir)
          .filter(col("value") > 0)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        Streams.foreachBatchParquetSink(ev, sinkDir).awaitTermination()
        s.read.parquet(sinkDir) // batch=<id> dirs surface as a partition col
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("user_id")).as("users"),
            graft.ops.Relational.sumExact(col("value")).as("sum_val"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS cnt,
             |  COUNT(DISTINCT user_id) AS users,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM events WHERE value > 0
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // SpaceSaving heavy hitters (custom TypedImperativeAggregate, k=16
    // counters) over a deliberately skewed key (70% of events on 3 heavy
    // keys + a long per-user tail that forces constant eviction). Raw
    // sketch counts are partition-order-dependent, so the checked output is
    // the sketch's DETERMINISTIC guarantees against exact aggregates:
    // every key with true freq > n/k is captured, with
    // count >= exact >= count - err. The oracle asserts the booleans.
    Q("sketch_heavy_hitters",
      (s, dir) => {
        import graft.expressions.FreqSketchAggregate.heavyHitters
        val keyed = Catalog.load(s, dir, "events")
          .selectExpr("CASE WHEN user_id % 10 < 7 THEN concat('heavy_', user_id % 3) " +
            "ELSE concat('u', user_id) END AS k")
        val sk = keyed.agg(heavyHitters(col("k"), 16).as("sk"))
        val exact = keyed.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
        val tot = keyed.agg(count(lit(1)).as("n"))
        exact.crossJoin(broadcast(tot))
          .filter(col("exact_cnt") > col("n") / 16.0)
          .crossJoin(broadcast(sk))
          .select(col("k"), col("exact_cnt"),
            expr("filter(sk, x -> x.item = k)").as("hit"))
          .select(col("k"), col("exact_cnt"),
            (size(col("hit")) === 1).as("captured"),
            expr("size(hit) = 1 AND hit[0].cnt >= exact_cnt " +
              "AND hit[0].cnt - hit[0].err <= exact_cnt").as("bounds_ok"))
          .orderBy("k")
      },
      Some("""WITH kk AS (SELECT CASE WHEN user_id % 10 < 7
             |              THEN 'heavy_' || CAST(user_id % 3 AS VARCHAR)
             |              ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
             |            FROM events),
             |e AS (SELECT k, COUNT(*) AS exact_cnt FROM kk GROUP BY k),
             |t AS (SELECT COUNT(*) AS n FROM kk)
             |SELECT k, exact_cnt, TRUE AS captured, TRUE AS bounds_ok
             |FROM e, t WHERE exact_cnt > n / 16.0 ORDER BY k""".stripMargin)),

    // Streaming dedup with watermark-bounded state.
    Q("stream_dedup_events",
      (s, dir) => Streams.dedupStream(s, dir),
      Some("""SELECT event_type,
             |  COUNT(DISTINCT (user_id, date_trunc('hour', ts))) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Sliding event-time windows (1h length, 30m slide — every event lands in
    // exactly two windows); the oracle materializes both window anchors per
    // event in integer microseconds.
    Q("stream_sliding_agg",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_micros(col("window.start")).as("ws_us"), col("event_type"), col("cnt"))
          .orderBy("ws_us", "event_type"),
      Some("""WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
             |x AS (SELECT us - (us % 1800000000) - 1800000000 AS w0,
             |             us - (us % 1800000000) AS w1, event_type FROM e),
             |w AS (SELECT w0 AS ws_us, event_type FROM x
             |      UNION ALL SELECT w1, event_type FROM x)
             |SELECT ws_us, event_type, COUNT(*) AS cnt FROM w
             |GROUP BY ws_us, event_type ORDER BY ws_us, event_type""".stripMargin)),

    // Time-series regularization: hourly per-user value sums gap-filled onto
    // a dense grid with forward-fill (per-key sequence+explode, one window
    // pass — no driver loop).
    Q("ts_gapfill_hourly",
      (s, dir) => {
        val hourly = Catalog.load(s, dir, "events")
          .filter(col("user_id") < 5)
          .groupBy(col("user_id"),
            unix_micros(date_trunc("hour", col("ts"))).as("h"))
          .agg(graft.ops.Relational.sumExact(col("value")).as("v"))
        graft.ops.TimeSeries.gapFill(hourly, "user_id", "h", "v", 3600000000L)
          .select("user_id", "h", "v", "observed")
          .orderBy("user_id", "h")
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, epoch_us(date_trunc('hour', ts)) AS h,
             |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
             |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
             |bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1),
             |grid AS (SELECT user_id, unnest(range(mn, mx + 3600000000, 3600000000)) AS h
             |         FROM bounds),
             |j AS (SELECT g.user_id, g.h, hourly.v, hourly.v IS NOT NULL AS observed
             |      FROM grid g LEFT JOIN hourly USING (user_id, h))
             |SELECT user_id, h,
             |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
             |  observed
             |FROM j ORDER BY user_id, h""".stripMargin)),

    // Linear interpolation over the same hourly grid — gap points take the
    // straight line between bracketing observations (sensor/metric series
    // where carry-forward biases downstream features). No commutative float
    // folds anywhere: bracket lookup is order-pinned last/first IGNORE
    // NULLS, and both engines evaluate the interpolation in the identical
    // IEEE op order, so the DOUBLEs hash-match unrounded.
    Q("ts_interpolate_linear",
      (s, dir) => {
        val hourly = Catalog.load(s, dir, "events")
          .filter(col("user_id") < 5)
          .groupBy(col("user_id"),
            unix_micros(date_trunc("hour", col("ts"))).as("h"))
          .agg(graft.ops.Relational.sumExact(col("value")).as("v"))
        graft.ops.TimeSeries.linearInterpolate(hourly, "user_id", "h", "v",
            3600000000L)
          .select("user_id", "h", "v", "observed")
          .orderBy("user_id", "h")
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, epoch_us(date_trunc('hour', ts)) AS h,
             |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
             |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
             |bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1),
             |grid AS (SELECT user_id, unnest(range(mn, mx + 3600000000, 3600000000)) AS h
             |         FROM bounds),
             |j AS (SELECT g.user_id, g.h, hourly.v, hourly.v IS NOT NULL AS observed
             |      FROM grid g LEFT JOIN hourly USING (user_id, h)),
             |b AS (SELECT user_id, h, v, observed,
             |  last_value(CASE WHEN observed THEN h END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             |  last_value(v IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |  first_value(CASE WHEN observed THEN h END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
             |  first_value(v IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
             |  FROM j)
             |SELECT user_id, h,
             |  CASE WHEN observed THEN v
             |       ELSE pv + (nv - pv) * (CAST(h - pt AS DOUBLE) /
             |                              CAST(nt - pt AS DOUBLE)) END AS v,
             |  observed
             |FROM b ORDER BY user_id, h""".stripMargin)),

    // Current EWMA per entity (α = 1/2): the serving-side smoothed metric.
    // The recurrence runs in fixed-point integer cents with floor division
    // — floor((acc + x) / 2), spelled shiftright in Spark and // in DuckDB
    // (identical at all signs, where Spark's `div` would truncate) — folded
    // over the time-ordered hourly series, so any engine reproduces it
    // bit-for-bit (the PageRank discipline; a DOUBLE EWMA dies on
    // cross-engine summation order). The fold is an in-row array aggregate
    // after one hash shuffle per key; the fits-per-key assumption is the
    // same one sessionization makes.
    Q("ts_ewma_current",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .filter(col("user_id") < 20)
          .groupBy(col("user_id"),
            unix_micros(date_trunc("hour", col("ts"))).as("h"))
          .agg(sum(round(col("value") * 100).cast("long")).as("c"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_points"),
            collect_list(struct(col("h"), col("c"))).as("_arr"))
          .withColumn("_cs", expr("transform(sort_array(_arr), e -> e.c)"))
          .withColumn("ewma_c",
            expr("aggregate(slice(_cs, 2, size(_cs) - 1), element_at(_cs, 1), " +
              "(acc, x) -> shiftright(acc + x, 1))"))
          .withColumn("ewma", expr("CAST(ewma_c AS DOUBLE) / 100.0"))
          .select("user_id", "n_points", "ewma_c", "ewma")
          .orderBy("user_id"),
      Some("""WITH hourly AS (
             |  SELECT user_id, epoch_us(date_trunc('hour', ts)) AS h,
             |         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
             |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
             |s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
             |        list(c ORDER BY h) AS cs
             |      FROM hourly GROUP BY user_id)
             |SELECT user_id, n_points,
             |  list_reduce(cs, (acc, x) -> (acc + x) // 2) AS ewma_c,
             |  CAST(list_reduce(cs, (acc, x) -> (acc + x) // 2) AS DOUBLE)
             |    / 100.0 AS ewma
             |FROM s ORDER BY user_id""".stripMargin)),

    // MERGE/upsert + compaction round trip: seed a table, upsert a mix of
    // updated and brand-new rows, compact, read back. Oracle recomputes the
    // merge over the sources.
    Q("s10_merge_sink",
      (s, dir) => {
        val tmp = graft.engine.TempDirs.create("graft_s10") + "/t"
        val c = Catalog.load(s, dir, "customer")
        graft.ops.Relational.insertInto(
          c.filter(col("c_custkey") < 300).select("c_custkey", "c_name", "c_acctbal"), tmp)
        val updates = c.filter(col("c_custkey") >= 200)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + 1000.0).as("c_acctbal"))
        graft.ops.Relational.mergeInto(s, tmp, updates, "c_custkey")
        graft.ops.Relational.compact(s, tmp, numFiles = 4, sortCols = Seq("c_custkey"))
        s.read.parquet(tmp).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  CASE WHEN c_custkey >= 200 THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal
             |FROM customer WHERE c_custkey < 300 OR c_custkey >= 200
             |ORDER BY c_custkey""".stripMargin)),

    // CDC changelog apply: latest-op-per-key collapse (seq desc), deletes
    // anti-joined out, I/U rows unioned in. The probe mixes all three ops
    // plus a same-key U-then-D conflict that must net to a delete.
    Q("s11_cdc_apply",
      (s, dir) => {
        val c = Catalog.load(s, dir, "customer")
        val cols = c.columns.map(col)
        def log(df: org.apache.spark.sql.DataFrame, op: String, seq: Long) =
          df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
        val changelog =
          log(c.filter(col("c_custkey") % 10 === 0), "D", 1L)
            .unionByName(log(c.filter(col("c_custkey") % 10 === 1)
              .withColumn("c_acctbal", col("c_acctbal") + 100.0), "U", 1L))
            .unionByName(log(c.filter(col("c_custkey") % 10 === 2)
              .select((col("c_custkey") + 100000L).as("c_custkey"),
                concat(lit("NEW#"), col("c_custkey").cast("string")).as("c_name"),
                col("c_nationkey"),
                (col("c_custkey") % 100).cast("double").as("c_acctbal"),
                lit("NEW").as("c_mktsegment")), "I", 1L))
            .unionByName(log(c.filter(col("c_custkey") % 10 === 3)
              .withColumn("c_acctbal", col("c_acctbal") + 999.0), "U", 1L))
            .unionByName(log(c.filter(col("c_custkey") % 10 === 3), "D", 2L))
        graft.ops.Relational.applyCdc(c, changelog, "c_custkey", "op", "seq")
          .select(cols: _*)
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
             |  CASE WHEN c_custkey % 10 = 1 THEN c_acctbal + 100.0
             |       ELSE c_acctbal END AS c_acctbal,
             |  c_mktsegment
             |FROM customer WHERE c_custkey % 10 NOT IN (0, 3)
             |UNION ALL
             |SELECT c_custkey + 100000, 'NEW#' || CAST(c_custkey AS VARCHAR),
             |  c_nationkey, CAST(c_custkey % 100 AS DOUBLE), 'NEW'
             |FROM customer WHERE c_custkey % 10 = 2
             |ORDER BY c_custkey""".stripMargin)),

    // CDC GENERATION — snapshot diff, the inverse of s11_cdc_apply: two
    // table versions full-outer-joined on the key, classified I (after
    // only) / D (before only, carrying before-values) / U (non-key columns
    // differ null-safely); identical rows emit nothing. The round-trip
    // applyCdc(before, snapshotDiff(before, after)) == after is pinned in
    // PropertySpec.
    Q("s12_snapshot_diff",
      (s, dir) => {
        val c = Catalog.load(s, dir, "customer")
        val after = c.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 7 === 1, col("c_acctbal") + 50.0)
              .otherwise(col("c_acctbal")))
          .unionByName(c.filter(col("c_custkey") % 7 === 2)
            .withColumn("c_custkey", col("c_custkey") + 500000L))
        graft.ops.Relational.snapshotDiff(c, after, "c_custkey")
          .drop("seq")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             |       c_mktsegment, 'D' AS op
             |FROM customer WHERE c_custkey % 7 = 0
             |UNION ALL
             |SELECT c_custkey, c_name, c_nationkey, c_acctbal + 50.0,
             |       c_mktsegment, 'U'
             |FROM customer WHERE c_custkey % 7 = 1
             |UNION ALL
             |SELECT c_custkey + 500000, c_name, c_nationkey, c_acctbal,
             |       c_mktsegment, 'I'
             |FROM customer WHERE c_custkey % 7 = 2
             |ORDER BY c_custkey""".stripMargin)),

    // Incremental MV maintenance, affected-groups form: a per-customer
    // revenue aggregate is refreshed after a CDC delta (deletes/updates/
    // inserts on orders) by recomputing ONLY the touched customer groups
    // and carrying every other MV row over verbatim — the oracle is the
    // FULL recompute over the delta-applied base, so a stale, duplicated,
    // or ghost-deleted group hash-mismatches. The delta is key-bounded:
    // both the anti and semi probes broadcast at scale, and the MV itself
    // is never re-aggregated.
    Q("mv_affected_group_refresh",
      (s, dir) => {
        val o = Catalog.load(s, dir, "orders")
        def log(df: org.apache.spark.sql.DataFrame, op: String, seq: Long) =
          df.withColumn("op", lit(op)).withColumn("seq", lit(seq))
        val changelog =
          log(o.filter(col("o_orderkey") % 50 === 0), "D", 1L)
            .unionByName(log(o.filter(col("o_orderkey") % 50 === 1)
              .withColumn("o_totalprice", col("o_totalprice") + 10.0), "U", 1L))
            .unionByName(log(o.filter(col("o_orderkey") % 50 === 2)
              .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
              .withColumn("o_totalprice",
                (col("o_custkey") % 500).cast("double")), "I", 1L))
        val agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          df => df.groupBy("o_custkey").agg(
            count(lit(1)).as("n_orders"),
            graft.ops.Relational.sumExact(col("o_totalprice")).as("revenue"),
            min(col("o_orderdate")).as("first_order"),
            max(col("o_orderdate")).as("last_order"))
        val updated = graft.ops.Relational.applyCdc(
          o, changelog, "o_orderkey", "op", "seq")
        graft.ops.Relational.refreshAffectedGroups(
            agg(o), updated, changelog.select("o_custkey"), "o_custkey")(agg)
          .orderBy("o_custkey")
      },
      Some("""WITH nb AS (
             |  SELECT o_custkey,
             |    CASE WHEN o_orderkey % 50 = 1 THEN o_totalprice + 10.0
             |         ELSE o_totalprice END AS o_totalprice,
             |    o_orderdate
             |  FROM orders WHERE o_orderkey % 50 <> 0
             |  UNION ALL
             |  SELECT o_custkey, CAST(o_custkey % 500 AS DOUBLE), o_orderdate
             |  FROM orders WHERE o_orderkey % 50 = 2)
             |SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
             |FROM nb GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // The MV maintenance loop in STREAMING form: the base is seeded with
    // 4/5 of the events and its per-user aggregate written as the MV;
    // the remaining events stream through Streams.mvRefreshSink, which
    // appends each microbatch to the base and refreshes ONLY the touched
    // user groups (untouched MV rows carry over verbatim through the
    // rewrite-and-swap). After the drain the MV must equal the full
    // aggregate over ALL events — the oracle.
    Q("stream_mv_refresh",
      (s, dir) => {
        val root = graft.engine.TempDirs.create("graft_smv")
        val agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          df => df.groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            graft.ops.Relational.sumExact(col("value")).as("sum_value"),
            max(col("event_id")).as("last_event"))
        val cols = Seq("event_id", "user_id", "value")
        Streams.writeBatch(
          Catalog.load(s, dir, "events")
            .filter(col("user_id") % 5 =!= 0).select(cols.map(col): _*),
          s"$root/base", -1L)
        agg(s.read.parquet(s"$root/base")).write.parquet(s"$root/mv")
        val stream = Streams.tableStream(s, dir, "events")
          .filter(col("user_id") % 5 === 0).select(cols.map(col): _*)
        Streams.mvRefreshSink(stream, s"$root/base", s"$root/mv",
            "user_id", agg)
          .awaitTermination()
        s.read.parquet(s"$root/mv").orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  MAX(event_id) AS last_event
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // The partitioned-MV variant: the aggregate lives bucket-partitioned
    // on disk (mv_bucket = pmod(hash(key), 16)) and each microbatch
    // rewrites ONLY the bucket partitions its keys touch via dynamic
    // partition overwrite — untouched buckets are neither read nor
    // rewritten (file-level pin in StreamingSpec). Same full-aggregate
    // oracle as the whole-MV form.
    Q("stream_mv_refresh_partitioned",
      (s, dir) => {
        val root = graft.engine.TempDirs.create("graft_smvp")
        val agg: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          df => df.groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            graft.ops.Relational.sumExact(col("value")).as("sum_value"),
            max(col("event_id")).as("last_event"))
        val cols = Seq("event_id", "user_id", "value")
        Streams.writeBatch(
          Catalog.load(s, dir, "events")
            .filter(col("user_id") % 5 =!= 0).select(cols.map(col): _*),
          s"$root/base", -1L)
        agg(s.read.parquet(s"$root/base"))
          .withColumn("mv_bucket", Streams.mvBucket(col("user_id"), 16))
          .write.partitionBy("mv_bucket").parquet(s"$root/mv")
        val stream = Streams.tableStream(s, dir, "events")
          .filter(col("user_id") % 5 === 0).select(cols.map(col): _*)
        Streams.mvRefreshSinkPartitioned(stream, s"$root/base", s"$root/mv",
            "user_id", 16, agg)
          .awaitTermination()
        s.read.parquet(s"$root/mv")
          .select("user_id", "n_events", "sum_value", "last_event")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  MAX(event_id) AS last_event
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // S-UPDATE (parser/UpdateQuery.java — parsed, never executed by the
    // reference): copy-on-write column rewrite on a Parquet table.
    Q("s9_update_sink",
      (s, dir) => {
        val tmp = graft.engine.TempDirs.create("graft_s9") + "/t"
        graft.ops.Relational.insertInto(
          Catalog.load(s, dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderpriority"), tmp)
        graft.ops.Relational.updateWhere(s, tmp,
          col("o_totalprice") > 400000.0,
          Map("o_orderpriority" -> lit("0-IMMEDIATE")))
        s.read.parquet(tmp).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CASE WHEN o_totalprice > 400000 THEN '0-IMMEDIATE'
             |       ELSE o_orderpriority END AS o_orderpriority
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Semi-structured props extraction (regex-based, engine-portable) +
    // per-key exact aggregation.
    Q("events_props_extract",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .select(col("event_type"),
            expr("CAST(regexp_extract(props, '\"k\": (-?[0-9]+)', 1) AS INT)").as("k"),
            col("value"))
          .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("cnt"),
            graft.ops.Relational.sumExact(col("value")).as("sum_val"))
          .orderBy("event_type", "k_bucket"),
      Some("""SELECT event_type,
             |  CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER) % 10 AS k_bucket,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
             |FROM events GROUP BY 1, 2 ORDER BY event_type, k_bucket""".stripMargin))
  )
}
