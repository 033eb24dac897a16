package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.engine.Catalog
import graft.ops.{AsOfJoin, RangeJoin, Relational}

/** Relational surface beyond the reference's inventory (SURVEY.md §2.3/§2.6
  * list these as absent): set operations, outer/semi/anti joins, window
  * functions, DISTINCT, LIMIT/top-k, ROLLUP/CUBE, PIVOT, correlated and
  * scalar subqueries, and an as-of join. A user of the reference switching to
  * this engine gets all of them; each is oracle-checked. */
object Extended {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(s, dir, name)

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------- set ops
    Q("set_union",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .union(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .distinct()
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |UNION
             |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |ORDER BY c_custkey""".stripMargin)),

    Q("set_intersect",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |INTERSECT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |ORDER BY c_custkey""".stripMargin)),

    Q("set_except",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .except(c.filter(col("c_acctbal") > 5000).select("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |EXCEPT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
             |ORDER BY c_custkey""".stripMargin)),

    // Multiset set ops: INTERSECT ALL keeps min(m,n) copies per value,
    // EXCEPT ALL keeps m−n — bag semantics the distinct-set rows above
    // can't see. Output is the per-key multiplicity so the contract is
    // pinned exactly and the result stays compact.
    Q("set_ops_all",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val a = li.filter(col("l_quantity") <= 25).select("l_partkey")
        val b = li.filter(col("l_discount") > 0.05).select("l_partkey")
        a.intersectAll(b).groupBy("l_partkey")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
          .union(a.exceptAll(b).groupBy("l_partkey")
            .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
          .select("op", "l_partkey", "n")
          .orderBy("op", "l_partkey")
      },
      Some("""WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity <= 25),
             |b AS (SELECT l_partkey FROM lineitem WHERE l_discount > 0.05),
             |ia AS (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b),
             |ea AS (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
             |SELECT 'intersect_all' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
             |FROM ia GROUP BY l_partkey
             |UNION ALL
             |SELECT 'except_all' AS op, l_partkey, CAST(count(*) AS BIGINT) AS n
             |FROM ea GROUP BY l_partkey
             |ORDER BY op, l_partkey""".stripMargin)),

    // -------------------------------------------------- outer / semi / anti
    Q("join_left_outer",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("join_full_outer",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val b = c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("bk"))
        val h = c.filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("hk"))
        b.join(h, col("bk") === col("hk"), "full_outer")
          .select(
            coalesce(col("bk"), col("hk")).as("c_custkey"),
            col("bk").isNotNull.as("in_building"),
            col("hk").isNotNull.as("in_highbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT COALESCE(b.bk, h.hk) AS c_custkey,
             |       b.bk IS NOT NULL AS in_building,
             |       h.hk IS NOT NULL AS in_highbal
             |FROM (SELECT c_custkey AS bk FROM customer WHERE c_mktsegment = 'BUILDING') b
             |FULL OUTER JOIN
             |     (SELECT c_custkey AS hk FROM customer WHERE c_acctbal > 5000) h
             |ON b.bk = h.hk
             |ORDER BY c_custkey""".stripMargin)),

    Q("join_semi",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    Q("join_anti",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // Bloom semi-join reduction: fact side pre-filtered at the scan by a
    // sketch of the dimension keys (graft.ops.BloomJoin); result identical
    // to the plain semi join, which is exactly what the oracle checks.
    Q("bloom_semi_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val smallParts = t(s, dir, "part").filter(col("p_size") === 1)
        graft.ops.BloomJoin
          .semiJoinReduce(li, smallParts, "l_partkey", "p_partkey",
            expectedItems = 1L << 16, fpp = 0.01)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // --------------------------------------------------------------- windows
    Q("w1_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) x
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    Q("w2_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("run_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // RANGE-frame window over EVENT TIME: per-user trailing-hour sum/count
    // by timestamp value (ties all included — RANGE semantics), beside the
    // ROWS frames of w2. Exact-decimal sum keeps the oracle bit-stable.
    Q("w5_trailing_hour_range",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0)
        Catalog.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .select(col("event_id"), col("user_id"), col("us"),
            sum(col("value").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType).as("hr_sum"),
            count(lit(1)).over(w).as("hr_cnt"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value
             |           FROM events)
             |SELECT event_id, user_id, us,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
             |       OVER (PARTITION BY user_id ORDER BY us
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |       AS DOUBLE) AS hr_sum,
             |  COUNT(*) OVER (PARTITION BY user_id ORDER BY us
             |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |    AS hr_cnt
             |FROM e ORDER BY event_id""".stripMargin)),

    // Trailing-hour DISTINCT count per event: Spark has no windowed
    // COUNT(DISTINCT) — size(collect_set) over the RANGE frame is the
    // equivalent. CONTRACT (pinned by PipelineSpec "windowed collect_set"):
    // the per-row buffer is O(distinct values IN FRAME), so this pattern is
    // only safe when the collected column's in-frame cardinality is bounded
    // (event types here — a handful). For a high-cardinality column (user
    // ids, event ids) bound the frame tightly or use a two-pass
    // distinct-then-count instead; an unbounded frame over an unbounded
    // column is an executor-memory landmine.
    Q("w7_distinct_types_trailing",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0)
        Catalog.load(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"), col("event_type"))
          .select(col("event_id"), col("user_id"),
            size(collect_set(col("event_type")).over(w)).cast("long")
              .as("distinct_types"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
             |           FROM events)
             |SELECT event_id, user_id,
             |  COUNT(DISTINCT event_type) OVER (PARTITION BY user_id ORDER BY us
             |        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |    AS distinct_types
             |FROM e ORDER BY event_id""".stripMargin)),

    // Min-max feature normalization per class — groupBy stats + broadcast
    // join back (NOT a whole-partition window, which would put each class
    // in one task at 100 TB). Fixed-order double arithmetic; degenerate
    // zero-spread classes pin to 0.5 in both engines.
    Q("feature_minmax_norm",
      (s, dir) => {
        val e = Catalog.load(s, dir, "events")
        val stats = e.groupBy("event_type")
          .agg(min("value").as("mn"), max("value").as("mx"))
        e.join(broadcast(stats), "event_type")
          .selectExpr("event_id", "event_type", "value",
            "CASE WHEN mx = mn THEN CAST(0.5 AS DOUBLE) " +
              "ELSE (value - mn) / (mx - mn) END AS norm")
          .orderBy("event_id")
      },
      Some("""WITH s AS (SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
             |           FROM events GROUP BY event_type)
             |SELECT event_id, events.event_type, value,
             |  CASE WHEN mx = mn THEN CAST(0.5 AS DOUBLE)
             |       ELSE (value - mn) / (mx - mn) END AS norm
             |FROM events JOIN s ON events.event_type = s.event_type
             |ORDER BY event_id""".stripMargin)),

    Q("w3_rank_lag",
      (s, dir) => {
        val wRank = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val wSeq = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(wRank).as("price_rank"),
            lag(col("o_totalprice"), 1).over(wSeq).as("prev_price"),
            lead(col("o_totalprice"), 1).over(wSeq).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
             |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS prev_price,
             |  LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS next_price
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ------------------------------------------------- distinct / top-k
    Q("distinct_pairs",
      (s, dir) =>
        t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
          .distinct()
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("topk_limit",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ------------------------------------------------- rollup / cube / pivot
    Q("rollup_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
             |  COUNT(*) AS cnt,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    Q("cube_agg",
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("int").as("g_st"),
            grouping(col("o_orderpriority")).cast("int").as("g_pr"),
            count(lit(1)).as("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
             |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr,
             |  COUNT(*) AS cnt
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Q("pivot_priority_counts",
      (s, dir) => {
        val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val renames = Map(
          "1-URGENT" -> "p_urgent", "2-HIGH" -> "p_high", "3-MEDIUM" -> "p_medium",
          "4-NOT SPECIFIED" -> "p_notspec", "5-LOW" -> "p_low")
        val pivoted = t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", priorities)
          .agg(count(lit(1)))
        val safe = renames.foldLeft(pivoted) { case (df, (from, to)) =>
          df.withColumnRenamed(from, to) }
        // absent (status, priority) combos pivot to null; the oracle's
        // conditional COUNT yields 0 — normalize
        safe.select(col("o_orderstatus") +:
          renames.values.toSeq.sorted.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
             |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
             |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
             |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
             |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_notspec,
             |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Bounded top-k per key via the custom TypedImperativeAggregate: same
    // answer as w1_topk_per_group's window formulation, but partial buffers
    // cap at k so the shuffle carries |keys|·k rows, not every row.
    Q("w1b_topk_agg",
      (s, dir) => {
        import graft.expressions.TopKAggregate.topK
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(topK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rn"),
            col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
             |  FROM orders) x
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ------------------------------------------ subqueries via the SQL front
    // P3 FilterCorrelated (OperatorFactory.java:209-217): Catalyst
    // decorrelates the EXISTS into a semi-join.
    Q("p3_correlated_exists",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT c_custkey, c_name FROM customer c
                |WHERE EXISTS (SELECT 1 FROM orders o
                |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    Q("scalar_subquery",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                |                                 / COUNT(*) FROM orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |                                 / COUNT(*) FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // GROUPING SETS (the general form behind rollup/cube) via the SQL front.
    Q("grouping_sets_agg",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
                |  COUNT(*) AS cnt
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
             |  COUNT(*) AS cnt
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Three-valued logic / NULL semantics — the documented divergence from
    // the reference's sentinel encoding (SURVEY §1.2): reference NULLs are
    // in-domain sentinels; this engine uses SQL NULLs. Null-producing outer
    // join, IS NULL counts, null-safe equality, and NULL propagation through
    // comparisons and aggregates.
    Q("null_semantics",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_nonnull"),
            sum(col("o_orderkey").isNull.cast("int")).as("n_null"),
            sum((col("o_orderstatus") === "F").cast("int")).as("cmp_true"),
            sum((col("o_orderstatus") <=> "F").cast("int")).as("nullsafe_true"),
            min(col("o_totalprice")).as("min_ignoring_nulls"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |  COUNT(*) AS n_rows,
             |  COUNT(o_orderkey) AS n_nonnull,
             |  CAST(SUM(CAST(o_orderkey IS NULL AS INTEGER)) AS BIGINT) AS n_null,
             |  CAST(SUM(CAST(o_orderstatus = 'F' AS INTEGER)) AS BIGINT) AS cmp_true,
             |  CAST(SUM(CAST(o_orderstatus IS NOT DISTINCT FROM 'F' AS INTEGER)) AS BIGINT) AS nullsafe_true,
             |  MIN(o_totalprice) AS min_ignoring_nulls
             |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
             |  ON c_custkey = o_custkey
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ------------------------------------------------------------ as-of join
    // For each purchase event, the most recent prior-or-same-instant click by
    // the same user (ns→µs via unix_micros/epoch_us keeps both engines on the
    // same clock).
    Q("asof_purchase_click",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_event"),
            unix_micros(col("ts")).as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
        AsOfJoin.priorJoin(purchases, clicks,
            key = "user_id", ts = "us", tieBreak = "event_id",
            payload = Seq("event_id", "value"))
          .orderBy("user_id", "p_event")
      },
      Some("""WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
             |           FROM events WHERE event_type = 'click'),
             |     p AS (SELECT user_id, event_id AS p_event, epoch_us(ts) AS us
             |           FROM events WHERE event_type = 'purchase'),
             |     m AS (SELECT p.user_id, p.p_event, p.us,
             |                  (SELECT MAX(c.us) FROM c
             |                   WHERE c.user_id = p.user_id AND c.us <= p.us) AS right_us
             |           FROM p),
             |     m2 AS (SELECT m.*,
             |                   (SELECT MAX(c.event_id) FROM c
             |                    WHERE c.user_id = m.user_id AND c.us = m.right_us) AS right_event_id
             |            FROM m)
             |SELECT m2.user_id, m2.p_event, m2.us, m2.right_event_id,
             |       (SELECT c.value FROM c
             |        WHERE c.user_id = m2.user_id AND c.us = m2.right_us
             |          AND c.event_id = m2.right_event_id) AS right_value,
             |       m2.right_us
             |FROM m2 ORDER BY user_id, p_event""".stripMargin)),

    // Bounded time-range (interval) join: error events paired with purchase
    // events of the same user within ±10 minutes. Temporal bucketing turns
    // the non-equi condition into an equi-join on (user, bucket) — see
    // RangeJoin scaladoc; integer-µs math keeps both engines bit-identical.
    Q("range_join_events",
      (s, dir) => {
        val ev = Catalog.load(s, dir, "events")
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"),
            unix_micros(col("ts")).as("err_us"))
        val purs = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pur_id"),
            unix_micros(col("ts")).as("pur_us"))
        RangeJoin.timeRangeJoin(errs, purs, "user_id",
            col("err_us"), col("pur_us"), radiusUs = 600000000L)
          .orderBy("err_id", "pur_id")
      },
      Some("""WITH e AS (SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us
             |           FROM events WHERE event_type = 'error'),
             |     p AS (SELECT user_id, event_id AS pur_id, epoch_us(ts) AS pur_us
             |           FROM events WHERE event_type = 'purchase')
             |SELECT e.user_id, err_id, err_us, pur_id, pur_us
             |FROM e JOIN p ON e.user_id = p.user_id
             |  AND abs(pur_us - err_us) <= 600000000
             |ORDER BY err_id, pur_id""".stripMargin)),

    // Gaps-and-islands (streak detection): maximal runs of SAME-TYPE
    // consecutive events per user via the double-rank-difference trick
    // (row_number over user minus row_number over (user, type) is constant
    // within a streak) — one exchange on the user key, the classic
    // sequence segmentation every event pipeline eventually needs.
    // Surfaced: error streaks of length ≥ 3.
    Q("islands_error_streaks",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wAll = Window.partitionBy("user_id").orderBy("event_id")
        val wTyp = Window.partitionBy("user_id", "event_type").orderBy("event_id")
        Catalog.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("island",
            row_number().over(wAll) - row_number().over(wTyp))
          .filter(col("event_type") === "error")
          .groupBy("user_id", "island")
          .agg(min(col("event_id")).as("first_id"),
            max(col("event_id")).as("last_id"),
            count(lit(1)).as("streak_len"))
          .filter(col("streak_len") >= 3)
          .select("user_id", "first_id", "last_id", "streak_len")
          .orderBy("user_id", "first_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, event_type,
             |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
             |  - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |         ORDER BY event_id) AS island
             |  FROM events),
             |g AS (SELECT user_id, island, MIN(event_id) AS first_id,
             |        MAX(event_id) AS last_id, CAST(COUNT(*) AS BIGINT) AS streak_len
             |      FROM x WHERE event_type = 'error' GROUP BY user_id, island)
             |SELECT user_id, first_id, last_id, streak_len
             |FROM g WHERE streak_len >= 3 ORDER BY user_id, first_id""".stripMargin)),

    // median + deterministic mode aggregates. median interpolates the two
    // middle order statistics ((a+b)/2 in both engines — identical doubles
    // for identical inputs); mode(col, true) is Spark 4's deterministic
    // variant (greatest frequency, ties -> smallest value), which the
    // oracle reproduces as an explicit count-desc/value-asc rank so the
    // tie-break contract is pinned, not assumed. One grouped pass on the
    // Spark side; both aggregates partial-merge (no single-reducer funnel).
    Q("agg_median_mode",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("median(l_quantity)").as("med_qty"),
            expr("median(l_extendedprice)").as("med_price"),
            expr("mode(l_linestatus, true)").as("mode_status"))
          .orderBy("l_returnflag"),
      Some("""WITH m AS (SELECT l_returnflag,
             |    median(l_quantity) AS med_qty,
             |    median(l_extendedprice) AS med_price
             |  FROM lineitem GROUP BY l_returnflag),
             |c AS (SELECT l_returnflag, l_linestatus, count(*) AS n
             |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
             |r AS (SELECT l_returnflag, l_linestatus,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY n DESC, l_linestatus ASC) AS rn
             |  FROM c)
             |SELECT m.l_returnflag, m.med_qty, m.med_price,
             |       r.l_linestatus AS mode_status
             |FROM m JOIN r ON m.l_returnflag = r.l_returnflag AND r.rn = 1
             |ORDER BY m.l_returnflag""".stripMargin)),

    // Ordered string concatenation (Spark 4 listagg WITHIN GROUP ≍ DuckDB
    // string_agg ORDER BY): each aggregate sorts by ITS OWN value — the
    // synthetic lineitem has duplicate linenumbers within an order, so any
    // other sort key would leave ties and the concat order of tied rows is
    // partition-order, never oracle-checkable. Same ordered-fold shape as
    // RAG context assembly (`rag_assemble_context`).
    Q("agg_listagg_ordered",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """SELECT l_orderkey,
            |  listagg(CAST(l_linenumber AS STRING), ',')
            |    WITHIN GROUP (ORDER BY l_linenumber) AS line_list,
            |  listagg(l_linestatus, '')
            |    WITHIN GROUP (ORDER BY l_linestatus) AS status_seq
            |FROM lineitem WHERE l_orderkey < 1000
            |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
      },
      Some("""SELECT l_orderkey,
             |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_list,
             |  string_agg(l_linestatus, '' ORDER BY l_linestatus) AS status_seq
             |FROM lineitem WHERE l_orderkey < 1000
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // Boolean / bitwise aggregate surface: count_if, bool_and/bool_or,
    // bit_or/bit_and/bit_xor — one grouped pass.
    Q("agg_bool_bit_surface",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("count_if(l_discount > 0.05)").as("n_discounted"),
            expr("bool_and(l_quantity >= 1)").as("all_qty_pos"),
            expr("bool_or(l_quantity >= 49)").as("any_qty_high"),
            expr("bit_or(CAST(l_linenumber AS BIGINT))").as("ln_or"),
            expr("bit_and(CAST(l_linenumber AS BIGINT))").as("ln_and"),
            expr("bit_xor(CAST(l_orderkey AS BIGINT))").as("ok_xor"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(COUNT(*) FILTER (l_discount > 0.05) AS BIGINT) AS n_discounted,
             |  bool_and(l_quantity >= 1) AS all_qty_pos,
             |  bool_or(l_quantity >= 49) AS any_qty_high,
             |  bit_or(CAST(l_linenumber AS BIGINT)) AS ln_or,
             |  bit_and(CAST(l_linenumber AS BIGINT)) AS ln_and,
             |  bit_xor(CAST(l_orderkey AS BIGINT)) AS ok_xor
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact simple linear regression (price-in-cents on quantity): every
    // moment is an exact INTEGER (the engine-native regr_* aggregates
    // accumulate doubles in partition order — not reproducible). The
    // Σy²-cents sum exceeds 2^53, where DECIMAL→DOUBLE casts themselves
    // diverge across engines (Spark shortest-string vs DuckDB scaled
    // binary — found by the sf0.1 certification), so y is cast to DECIMAL
    // BEFORE squaring (a BIGINT y·y overflows at |y| ≈ 3e9 cents) and the
    // n·Σy² product is formed exactly in DECIMAL/HUGEINT, then split by
    // integral division into THREE sub-2^53 pieces (h2·10¹⁸ + h1·10⁹ + h0)
    // recombined with the shared IEEE sequence; slope, intercept and r²
    // are then fixed IEEE ops on sub-2^53 integers — deterministic at any
    // scale (n·Σy² ≤ ~4e33 at sf1000, far inside DECIMAL(38,0)/HUGEINT).
    Q("stats_regression_exact",
      (s, dir) => {
        val li = Catalog.load(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("y"))
        val agg = li.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy_c"),
          sum(col("x") * col("y")).as("sxy_c"),
          sum(col("x") * col("x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))")).as("syy_dec"))
        agg
          .withColumn("nsyy", expr("syy_dec * n"))
          .withColumn("h2", expr("CAST(nsyy div 1000000000000000000 AS BIGINT)"))
          .withColumn("h1", expr(
            "CAST((nsyy % 1000000000000000000) div 1000000000 AS BIGINT)"))
          .withColumn("h0", expr("CAST(nsyy % 1000000000 AS BIGINT)"))
          .withColumn("cov_n", expr(
            "CAST(n AS DOUBLE) * CAST(sxy_c AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE)"))
          .withColumn("varx_n", expr(
            "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
              " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
          .withColumn("vary_n", expr(
            "(CAST(h2 AS DOUBLE) * 1e18 + CAST(h1 AS DOUBLE) * 1e9 + CAST(h0 AS DOUBLE))" +
              " - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE)"))
          .withColumn("slope_cents", col("cov_n") / col("varx_n"))
          .withColumn("intercept_cents",
            (col("sy_c") - col("slope_cents") * col("sx")) / col("n"))
          .withColumn("r2",
            (col("cov_n") * col("cov_n")) / (col("varx_n") * col("vary_n")))
          .select("n", "sx", "sy_c", "cov_n", "varx_n", "vary_n",
            "slope_cents", "intercept_cents", "r2")
      },
      Some("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy_c,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)
             |       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sxy_c,
             |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
             |       AS BIGINT) AS sxx,
             |  SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
             |      * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS syy_hug
             |  FROM lineitem),
             |b AS (SELECT n, sx, sy_c, sxy_c, sxx,
             |        CAST(n AS HUGEINT) * syy_hug AS nsyy
             |      FROM a),
             |b2 AS (SELECT n, sx, sy_c, sxy_c, sxx,
             |        CAST(nsyy // 1000000000000000000 AS BIGINT) AS h2,
             |        CAST((nsyy % 1000000000000000000) // 1000000000 AS BIGINT) AS h1,
             |        CAST(nsyy % 1000000000 AS BIGINT) AS h0
             |      FROM b),
             |c AS (SELECT n, sx, sy_c,
             |  CAST(n AS DOUBLE) * CAST(sxy_c AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sy_c AS DOUBLE) AS cov_n,
             |  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
             |  (CAST(h2 AS DOUBLE) * 1e18 + CAST(h1 AS DOUBLE) * 1e9 + CAST(h0 AS DOUBLE))
             |    - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE) AS vary_n
             |  FROM b2)
             |SELECT n, sx, sy_c, cov_n, varx_n, vary_n,
             |  cov_n / varx_n AS slope_cents,
             |  (sy_c - (cov_n / varx_n) * sx) / n AS intercept_cents,
             |  (cov_n * cov_n) / (varx_n * vary_n) AS r2
             |FROM c""".stripMargin)),

    // Null-safe equi-join (<=>): NULL keys MATCH each other instead of
    // vanishing — the semantics MERGE keys and dedup digests need. The
    // probe nulls a key slice on both sides; inner-join row counts prove
    // the null-bucket join happened.
    Q("join_null_safe",
      (s, dir) => {
        val o = Catalog.load(s, dir, "orders")
          .select(when(col("o_custkey") % 50 === 0, lit(null))
            .otherwise(col("o_custkey")).as("k"), col("o_orderkey"))
        val c = Catalog.load(s, dir, "customer")
          .select(when(col("c_custkey") % 50 === 0, lit(null))
            .otherwise(col("c_custkey")).as("ck"), col("c_custkey"))
        o.join(c, col("k") <=> col("ck"))
          .groupBy(col("k").isNull.as("null_bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy("null_bucket")
      },
      Some("""WITH o AS (SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL
             |                  ELSE o_custkey END AS k, o_orderkey FROM orders),
             |c AS (SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL
             |             ELSE c_custkey END AS ck, c_custkey FROM customer)
             |SELECT k IS NULL AS null_bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
             |FROM o JOIN c ON k IS NOT DISTINCT FROM ck
             |GROUP BY 1 ORDER BY null_bucket""".stripMargin)),

    // Market-basket pair mining: parts co-purchased within an order —
    // the self-join is BLOCKED BY the order key, so pair volume is
    // Σ C(items_per_order, 2), never corpus-quadratic; top 20 pairs.
    // The distinct basket table persists PRE-PARTITIONED on the order key
    // (the containment-postings discipline): without it the plan computed
    // the distinct TWICE from two full fact scans and BROADCAST one whole
    // copy — a build side that grows with the fact table, not a bounded
    // dimension, i.e. an OOM plan at 100 TB. Pinned co-partitioned, the
    // serve's only exchanges are the pair-count aggregate's + top-k.
    Q("basket_part_pairs",
      (s, dir) => {
        val li = graft.ops.CacheRegistry.track(
          Catalog.load(s, dir, "lineitem")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
            .repartition(s.sessionState.conf.numShufflePartitions, col("ok"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val l = li.select(col("ok"), col("pk").as("p1")).hint("shuffle_hash")
        val r = li.select(col("ok"), col("pk").as("p2")).hint("shuffle_hash")
        l.join(r, Seq("ok")).filter(col("p1") < col("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc)
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |            FROM lineitem)
             |SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS n_orders
             |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
             |GROUP BY 1, 2 ORDER BY n_orders DESC, p1 ASC, p2 ASC
             |LIMIT 20""".stripMargin)),

    // Missing-value handling surface (DataFrameNaFunctions): the probe
    // blanks error-event values, then na.fill patches them and na.drop's
    // row filter is mirrored as a kept flag — the cleaning API compiles to
    // the same coalesce/filter the oracle spells.
    Q("clean_na_fill",
      (s, dir) => {
        val e = Catalog.load(s, dir, "events")
          .select(col("event_id"),
            when(col("event_type") === "error", lit(null).cast("double"))
              .otherwise(col("value")).as("v"),
            col("event_type"))
        e.na.fill(Map("v" -> -1.0))
          .withColumn("was_missing", col("event_type") === "error")
          .select("event_id", "v", "was_missing")
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE value END,
             |           -1.0) AS v,
             |  event_type = 'error' AS was_missing
             |FROM events ORDER BY event_id""".stripMargin)),

    // The SAME radius-bucket machinery on a NON-TIME axis: match purchases
    // to same-user clicks within ±500 cents of spend — the band join works
    // on any integer domain (value similarity, score proximity), proving
    // the operator isn't hardwired to timestamps.
    Q("value_band_join",
      (s, dir) => {
        val ev = Catalog.load(s, dir, "events")
        val purs = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            round(col("value") * 100).cast("long").as("p_cents"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            round(col("value") * 100).cast("long").as("c_cents"))
        RangeJoin.timeRangeJoin(purs, clicks, "user_id",
            col("p_cents"), col("c_cents"), radiusUs = 500L)
          .orderBy("p_id", "c_id")
      },
      Some("""WITH p AS (SELECT user_id, event_id AS p_id,
             |             CAST(ROUND(value * 100) AS BIGINT) AS p_cents
             |           FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, event_id AS c_id,
             |             CAST(ROUND(value * 100) AS BIGINT) AS c_cents
             |           FROM events WHERE event_type = 'click')
             |SELECT p.user_id, p_id, p_cents, c_id, c_cents
             |FROM p JOIN c ON p.user_id = c.user_id
             |  AND abs(c_cents - p_cents) <= 500
             |ORDER BY p_id, c_id""".stripMargin)),

    // Interval-overlap join: 30-minute click windows × 5-minute error
    // windows per user — overlap semantics (not point proximity), bucketized
    // so each pair is emitted exactly once at the bucket containing the
    // later start. Asymmetric lengths keep it distinct from the ±radius
    // range join above.
    Q("interval_overlap_events",
      (s, dir) => {
        val ev = Catalog.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            unix_micros(col("ts")).as("c_s"),
            (unix_micros(col("ts")) + 1800000000L).as("c_e"))
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("e_id"),
            unix_micros(col("ts")).as("e_s"),
            (unix_micros(col("ts")) + 300000000L).as("e_e"))
        RangeJoin.intervalOverlapJoin(clicks, errs, "user_id",
            col("c_s"), col("c_e"), col("e_s"), col("e_e"),
            bucketUs = 1800000000L)
          .orderBy("c_id", "e_id")
      },
      Some("""WITH c AS (SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_s,
             |                  epoch_us(ts) + 1800000000 AS c_e
             |           FROM events WHERE event_type = 'click'),
             |     e AS (SELECT user_id, event_id AS e_id, epoch_us(ts) AS e_s,
             |                  epoch_us(ts) + 300000000 AS e_e
             |           FROM events WHERE event_type = 'error')
             |SELECT c.user_id, c_id, c_s, c_e, e_id, e_s, e_e
             |FROM c JOIN e ON c.user_id = e.user_id
             |  AND c_s <= e_e AND e_s <= c_e
             |ORDER BY c_id, e_id""".stripMargin)),

    // Scalar string surface (beyond the reference's comparison-only strings,
    // SURVEY §2.7): upper/substr/length/concat/replace/LIKE/regexp — all
    // codegen'd built-ins, and the dialect aligns with ANSI so the oracle SQL
    // is near-identical.
    Q("scalar_string_funcs",
      (s, dir) =>
        Catalog.load(s, dir, "part").selectExpr(
            "p_partkey",
            "upper(p_name) AS up_name",
            "substr(p_name, 1, 5) AS pre5",
            "length(p_name) AS name_len",
            "concat(p_brand, '-', p_type) AS brand_type",
            "replace(p_name, 'widget', 'gadget') AS renamed",
            "CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt",
            "regexp_extract(p_name, '([a-z]+)$', 1) AS last_word")
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up_name,
             |  substr(p_name, 1, 5) AS pre5,
             |  CAST(length(p_name) AS INT) AS name_len,
             |  concat(p_brand, '-', p_type) AS brand_type,
             |  replace(p_name, 'widget', 'gadget') AS renamed,
             |  CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt,
             |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Map-typed scalar surface: construction, element access, cardinality,
    // key enumeration. DuckDB map access yields a LIST (unwrap with [1])
    // where Spark yields the value — the dialect glue lives in the oracle.
    Q("scalar_map_funcs",
      (s, dir) =>
        Catalog.load(s, dir, "events").selectExpr(
            "event_id",
            "map('type', event_type, 'uid', CAST(user_id AS STRING))" +
              "['type'] AS m_type",
            "size(map('type', event_type, 'uid', CAST(user_id AS STRING)))" +
              " AS n_keys",
            "array_join(sort_array(map_keys(" +
              "map('type', event_type, 'uid', CAST(user_id AS STRING)))), ',')" +
              " AS keys_csv")
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  MAP(['type','uid'], [event_type, CAST(user_id AS VARCHAR)])
             |    ['type'][1] AS m_type,
             |  CAST(cardinality(MAP(['type','uid'],
             |    [event_type, CAST(user_id AS VARCHAR)])) AS INT) AS n_keys,
             |  array_to_string(list_sort(map_keys(MAP(['type','uid'],
             |    [event_type, CAST(user_id AS VARCHAR)]))), ',') AS keys_csv
             |FROM events ORDER BY event_id""".stripMargin)),

    // Map-typed higher-order lambdas (map_filter / transform_values /
    // map_keys projection): both engines preserve literal entry order, so
    // joined-CSV projections of keys/values compare exactly. DuckDB has no
    // map lambdas — its oracle lowers every operation onto
    // map_entries + list_filter/list_transform, which is the same relation.
    // Values are integered (cents via round) before the lambdas so the
    // arithmetic inside is exact in both engines.
    Q("scalar_map_lambdas",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .selectExpr("event_id",
            "map('uid', user_id, 'cents', CAST(round(value * 100) AS BIGINT)," +
              " 'tlen', CAST(length(event_type) AS BIGINT)) AS m")
          .selectExpr(
            "event_id",
            "array_join(map_keys(map_filter(m, (k, v) -> v > 20)), ',') AS keys_big",
            "CAST(size(map_filter(m, (k, v) -> v % 2 = 0)) AS INT) AS n_even",
            "array_join(transform(map_values(" +
              "transform_values(m, (k, v) -> v + length(k))), " +
              "x -> CAST(x AS STRING)), ',') AS shifted_vals")
          .orderBy("event_id"),
      Some("""WITH m0 AS (SELECT event_id,
             |    MAP(['uid','cents','tlen'],
             |        [user_id,
             |         CAST(round(value * 100) AS BIGINT),
             |         CAST(length(event_type) AS BIGINT)]) AS m
             |  FROM events)
             |SELECT event_id,
             |  -- array_to_string over an empty list yields NULL in DuckDB
             |  -- where Spark's array_join yields '' — normalize to ''.
             |  COALESCE(array_to_string(list_transform(
             |    list_filter(map_entries(m), x -> x.value > 20),
             |    x -> x.key), ','), '') AS keys_big,
             |  CAST(len(list_filter(map_entries(m), x -> x.value % 2 = 0))
             |    AS INT) AS n_even,
             |  array_to_string(list_transform(map_entries(m),
             |    x -> CAST(x.value + length(x.key) AS VARCHAR)), ',')
             |    AS shifted_vals
             |FROM m0 ORDER BY event_id""".stripMargin)),

    // Scalar math surface: IEEE-exact functions only (abs/floor/ceil/sqrt/
    // mod) — transcendentals (ln, exp) are libm-dependent and would not be
    // bit-stable across engines, so they stay out of hashed conformance.
    Q("scalar_math_funcs",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem").selectExpr(
            "l_orderkey", "l_linenumber",
            "abs(l_quantity - 25) AS qdev",
            "floor(l_extendedprice / 100) AS price_floor",
            "ceil(l_extendedprice / 100) AS price_ceil",
            "sqrt(l_quantity) AS qroot",
            "l_orderkey % 7 AS okmod")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_quantity - 25) AS qdev,
             |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor,
             |  CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil,
             |  sqrt(l_quantity) AS qroot,
             |  l_orderkey % 7 AS okmod
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Scalar date surface: year/month/day/quarter extraction + month
    // truncation (the group-by-time-bucket primitives of any reporting
    // workload; all deterministic calendar arithmetic, no timezone traps —
    // sessions pin UTC).
    Q("scalar_date_funcs",
      (s, dir) =>
        Catalog.load(s, dir, "orders").selectExpr(
            "o_orderkey",
            "year(o_orderdate) AS oy",
            "month(o_orderdate) AS om",
            "day(o_orderdate) AS od",
            "quarter(o_orderdate) AS oq",
            "date_trunc('month', o_orderdate) AS omonth")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS oy,
             |  CAST(month(o_orderdate) AS INT) AS om,
             |  CAST(day(o_orderdate) AS INT) AS od,
             |  CAST(quarter(o_orderdate) AS INT) AS oq,
             |  date_trunc('month', o_orderdate) AS omonth
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Window surface beyond rank/lag/running-sum: ntile quartiles,
    // first/last value with the default up-to-current-row frame, lead —
    // all over a UNIQUE (ts, id) order so ties can't perturb the hash.
    Q("w4_window_extras",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").asc, col("event_id").asc)
        Catalog.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .select(col("event_id"), col("user_id"),
            ntile(4).over(w).as("qtile"),
            first(col("event_id")).over(w).as("first_ev"),
            last(col("event_id")).over(w).as("last_ev"),
            lead(col("event_id"), 1).over(w).as("next_ev"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(ntile(4) OVER w AS INT) AS qtile,
             |  first_value(event_id) OVER w AS first_ev,
             |  last_value(event_id) OVER w AS last_ev,
             |  lead(event_id, 1) OVER w AS next_ev
             |FROM (SELECT event_id, user_id, epoch_us(ts) AS us FROM events) t
             |WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
             |ORDER BY event_id""".stripMargin)),

    // Rank-distribution window surface: percent_rank / cume_dist — the
    // rank-based feature-normalization transform (ties keep identical
    // values in both engines; the outputs are rank arithmetic, so doubles
    // are bit-exact).
    Q("w6_percent_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").asc)
        Catalog.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .select(col("o_custkey"), col("o_orderkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC)
             |ORDER BY o_orderkey""".stripMargin)),

    // UNPIVOT (wide → long), the inverse of pivot_priority_counts: per-flag
    // aggregates unpivoted into (metric, val) rows via stack() — a generator,
    // so no shuffle beyond the aggregation itself.
    Q("unpivot_metrics",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            graft.ops.Relational.sumExact(col("l_quantity")).as("sum_qty"),
            graft.ops.Relational.sumExact(col("l_extendedprice")).as("sum_price"))
          .selectExpr("l_returnflag",
            "stack(2, 'qty', sum_qty, 'price', sum_price) AS (metric, val)")
          .orderBy("l_returnflag", "metric"),
      Some("""WITH a AS (SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, 'qty' AS metric, sum_qty AS val FROM a
             |UNION ALL
             |SELECT l_returnflag, 'price' AS metric, sum_price AS val FROM a
             |ORDER BY l_returnflag, metric""".stripMargin)),

    // Exact second moments: mean/variance/stddev derived from DECIMAL-exact
    // Σx and Σx² (2-decimal quantities square to exact 4-decimal values),
    // finished with an identical IEEE sequence in both engines. Engine-native
    // variance aggregates use incremental float updates whose low bits
    // differ across engines/partitionings — this formulation is the
    // order-independent, reproducible-at-100TB alternative.
    Q("stats_variance_exact",
      (s, dir) => {
        val l = Catalog.load(s, dir, "lineitem")
        l.groupBy(col("l_returnflag"))
          .agg(count(col("l_quantity")).as("n"),
            graft.ops.Relational.sumExact(col("l_quantity")).as("s"),
            graft.ops.Relational.sumExactScaled(col("l_quantity") * col("l_quantity"), 4).as("ss"))
          .select(col("l_returnflag"), col("n"),
            (col("s") / col("n")).as("mean"),
            ((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("var_samp"),
            sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)).as("stddev"))
          .orderBy("l_returnflag")
      },
      Some("""WITH a AS (SELECT l_returnflag, COUNT(l_quantity) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
             |  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS ss
             |FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n, s / n AS mean,
             |  (ss - s * s / n) / (n - 1) AS var_samp,
             |  sqrt((ss - s * s / n) / (n - 1)) AS stddev
             |FROM a ORDER BY l_returnflag""".stripMargin)),

    // Incremental aggregation: per-batch partial states (count + DECIMAL
    // sum) merged by re-aggregation — the reaggregable-state pattern that
    // lets a 100 TB pipeline fold in a day's delta without rescanning
    // history. States stay DECIMAL until ONE final cast, so merge order
    // cannot perturb the result; the oracle aggregates the union directly.
    Q("incremental_agg_merge",
      (s, dir) => {
        val l = Catalog.load(s, dir, "lineitem")
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("l_returnflag"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_quantity").cast(DecimalType(18, 2))).as("s_qty"))
        val batch1 = partial(l.filter(col("l_linenumber") % 2 === 0))
        val batch2 = partial(l.filter(col("l_linenumber") % 2 === 1))
        batch1.unionByName(batch2)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("cnt")).as("n"),
            sum(col("s_qty")).cast(DoubleType).as("sum_qty"))
          .withColumn("avg_qty", col("sum_qty") / col("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Exact interpolated percentiles: Spark `percentile` and DuckDB
    // `quantile_cont` share the (1−g)·lower + g·upper definition; over
    // 2-decimal doubles the index arithmetic and interpolation are the same
    // IEEE ops, so even these hash-match.
    Q("stats_percentiles",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_quantity, 0.9)").as("p90_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
