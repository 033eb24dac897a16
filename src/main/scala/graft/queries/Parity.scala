package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.Relational._

/** Conformance queries replicating the reference's operator test corpus
  * (SURVEY.md §2/§5, FIXTURES.md §3) over the driver's TPC-H-ish tables.
  * Reference plans cited per query. */
object Parity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(s, dir, name)

  val all: Seq[Q] = Seq(

    // S1 TableScan w/ conjunctive predicates + duplicate-column projection
    // (TestPhysicalOperatorsIStudents.java:181)
    Q("s1_scan_filter_project",
      (s, dir) => {
        val li = tableScan(s, dir, "lineitem",
          predicates = Seq(col("l_quantity") <= 25, col("l_returnflag") === "R"))
        project(li, Seq(
          col("l_orderkey") -> "l_orderkey",
          col("l_linenumber") -> "l_linenumber",
          col("l_quantity") -> "l_quantity",
          col("l_extendedprice") -> "l_extendedprice",
          col("l_returnflag") -> "l_returnflag",
          col("l_quantity") -> "l_quantity_dup"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |       l_returnflag, l_quantity AS l_quantity_dup
             |FROM lineitem WHERE l_quantity <= 25 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // S2 IndexScan: key range over the "index" (TestPhysicalOperatorsIStudents.java:370)
    Q("s2_index_range_scan",
      (s, dir) =>
        indexRangeScan(t(s, dir, "part"), "p_partkey", 100L, true, 300L, true)
          .select("p_partkey").orderBy("p_partkey"),
      Some("SELECT p_partkey FROM part WHERE p_partkey BETWEEN 100 AND 300 ORDER BY p_partkey")),

    // S3 IndexLookup equality + S6 Fetch (TestPhysicalOperatorsIIStudents.java:263)
    Q("s3_index_point_lookup",
      (s, dir) => indexPointLookup(t(s, dir, "part"), "p_partkey", 101L)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      Some("""SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
             |FROM part WHERE p_partkey = 101""".stripMargin)),

    // S4 IndexLookup between with open/closed bounds (TestPhysicalOperatorsIIStudents.java:299)
    Q("s4_index_range_open",
      (s, dir) =>
        indexRangeScan(t(s, dir, "orders"), "o_orderkey", 100L, false, 500L, true)
          .select("o_orderkey", "o_totalprice").orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_orderkey > 100 AND o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin)),

    // S5 IndexCorrelatedLookup as equi-join + extra local predicates
    // (index-NLJ w/ filter, TestPhysicalOperatorsIIStudents.java:368,411)
    Q("s5_correlated_lookup_join",
      (s, dir) => {
        val o = filterOp(t(s, dir, "orders"), col("o_orderpriority") === "1-URGENT")
        val li = filterOp(t(s, dir, "lineitem"), col("l_quantity") > 45)
        correlatedLookupJoin(o, li, col("o_orderkey") === col("l_orderkey"))
          .select("o_orderkey", "l_linenumber", "o_totalprice", "l_extendedprice", "l_quantity")
          .orderBy("o_orderkey", "l_linenumber")
      },
      Some("""SELECT o_orderkey, l_linenumber, o_totalprice, l_extendedprice, l_quantity
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND l_quantity > 45
             |ORDER BY o_orderkey, l_linenumber""".stripMargin)),

    // P2 Filter: conjunctive predicate tree incl. timestamp comparison
    // (FilterOperatorImpl; OperatorFactory.java:188-195)
    Q("p2_filter_conjunctive",
      (s, dir) =>
        filterOp(t(s, dir, "orders"),
          col("o_orderstatus") === "O" &&
            col("o_totalprice") < 50000.0 &&
            col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
             |FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice < 50000
             |  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
             |ORDER BY o_orderkey""".stripMargin)),

    // P5 arithmetic expression tree in SELECT (parser/Expression.java:13-36);
    // per-row IEEE double ops are deterministic and engine-portable.
    Q("p5_arithmetic_expr",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("disc_price"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1 - l_discount) AS disc_price,
             |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
             |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // J1 NestedLoopJoin: θ-join (non-equi ⇒ BroadcastNestedLoopJoin)
    // (NestedLoopJoinOperatorImpl.java:110-174)
    Q("j1_theta_nlj",
      (s, dir) =>
        nestedLoopJoin(t(s, dir, "region"), t(s, dir, "nation"),
          Some(col("n_regionkey") > col("r_regionkey")))
          .select("r_regionkey", "r_name", "n_nationkey", "n_name")
          .orderBy("r_regionkey", "n_nationkey"),
      Some("""SELECT r_regionkey, r_name, n_nationkey, n_name
             |FROM region JOIN nation ON n_regionkey > r_regionkey
             |ORDER BY r_regionkey, n_nationkey""".stripMargin)),

    // J1 Cartesian variant (predicate-less NLJ)
    Q("j1_cross_join",
      (s, dir) =>
        nestedLoopJoin(t(s, dir, "region").select("r_name"),
          t(s, dir, "nation").select("n_name"), None)
          .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    // J2 MergeJoin: sort-merge equi-join, strategy pinned via hint
    // (OperatorFactory.java:305-315; TestPhysicalOperatorsIIIStudents.java:405)
    Q("j2_merge_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        mergeJoin(c, o, c("c_custkey") === o("o_custkey"))
          .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    // J2 with a MULTI-COLUMN key — the reference's MergeJoin contract takes
    // key ARRAYS on both sides (qexec/OperatorFactory.java:305-315); this
    // exercises the two-key form through the same combinator: each lineitem
    // merge-joined on (partkey, suppkey) to the per-(part, supplier) minimum
    // observed price. Both sort orders cover both keys; SMJ is pinned in
    // PlanShapeSpec.
    Q("j2b_merge_join_multikey",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val ps = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
          .agg(min(col("l_extendedprice")).as("min_price"))
        mergeJoin(l, ps,
            l("l_partkey") === col("ps_partkey") && l("l_suppkey") === col("ps_suppkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("min_price"))
          // (orderkey, linenumber) is NOT unique in the synthetic data —
          // order by every column so the order is total up to identical rows
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "min_price")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             |         MIN(l_extendedprice) AS min_price
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, min_price
             |FROM lineitem JOIN ps
             |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, min_price""".stripMargin)),

    // J3 index-NLJ ⇒ broadcast-hash join of dims; 5-way multiway join chain
    // (TestPhysicalOperatorsIIStudents.java:488-560, re-targeted per FIXTURES.md)
    Q("j3_multiway_join",
      (s, dir) => {
        val r = filterOp(t(s, dir, "region"), col("r_name") === "AFRICA")
        val n = t(s, dir, "nation")
        val su = t(s, dir, "supplier")
        val li = t(s, dir, "lineitem")
        val p = filterOp(t(s, dir, "part"), col("p_brand") === "Brand#13")
        indexNestedLoopJoin(
          indexNestedLoopJoin(
            li,
            broadcastChain(r, n, su), col("l_suppkey") === col("s_suppkey")),
          p, col("l_partkey") === col("p_partkey"))
          .select("n_name", "s_name", "p_partkey", "p_brand",
            "l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT n_name, s_name, p_partkey, p_brand,
             |       l_orderkey, l_linenumber, l_quantity
             |FROM region
             |JOIN nation   ON n_regionkey = r_regionkey
             |JOIN supplier ON s_nationkey = n_nationkey
             |JOIN lineitem ON l_suppkey = s_suppkey
             |JOIN part     ON l_partkey = p_partkey
             |WHERE r_name = 'AFRICA' AND p_brand = 'Brand#13'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A1 GroupBy with all 5 reference aggregates — the flagship pipeline
    // (TestPhysicalOperatorsIIIStudents.java:231-301): scan→join→agg→sort.
    Q("a1_groupby_5agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        groupByAgg(
          indexNestedLoopJoin(c, n, col("c_nationkey") === col("n_nationkey")),
          Seq(col("n_name")),
          Seq(
            count(col("c_acctbal")).as("cnt_bal"),
            sumExact(col("c_acctbal")).as("sum_bal"),
            avgExact(col("c_acctbal")).as("avg_bal"),
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal")))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  COUNT(c_acctbal) AS cnt_bal,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
             |  MIN(c_acctbal) AS min_bal,
             |  MAX(c_acctbal) AS max_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // A2 global aggregation, no grouping (TestPhysicalOperatorsIIIStudents.java:203)
    Q("a2_global_agg",
      (s, dir) =>
        groupByAgg(t(s, dir, "lineitem"), Nil, Seq(
          count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_q"),
          min(col("l_quantity")).as("min_q"),
          max(col("l_quantity")).as("max_q"),
          min(col("l_shipdate")).as("min_sd"),
          max(col("l_shipdate")).as("max_sd"))),
      Some("""SELECT COUNT(*) AS cnt, COUNT(l_quantity) AS cnt_q,
             |  MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
             |  MIN(l_shipdate) AS min_sd, MAX(l_shipdate) AS max_sd
             |FROM lineitem""".stripMargin)),

    // A2 empty-input semantics: global agg ⇒ one row (COUNT 0, MIN/MAX NULL)
    // (golden OperatorsIII_testAggregateCustomersEmpty.dat)
    Q("a2_empty_global_agg",
      (s, dir) =>
        groupByAgg(t(s, dir, "lineitem").filter(col("l_quantity") < 0), Nil, Seq(
          count(lit(1)).as("cnt"),
          count(col("l_quantity")).as("cnt_q"),
          min(col("l_quantity")).as("min_q"),
          max(col("l_quantity")).as("max_q"))),
      Some("""SELECT COUNT(*) AS cnt, COUNT(l_quantity) AS cnt_q,
             |  MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q
             |FROM lineitem WHERE l_quantity < 0""".stripMargin)),

    // A1 empty-input grouped ⇒ zero rows
    Q("a2_empty_grouped_agg",
      (s, dir) =>
        groupByAgg(t(s, dir, "lineitem").filter(col("l_quantity") < 0),
          Seq(col("l_returnflag")), Seq(count(lit(1)).as("cnt")))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
             |WHERE l_quantity < 0 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A3 HadoopGroupBy analog: partial (map-side) + final aggregation, the
    // TPC-H Q1 shape (mapred/qexec; AbstractExtensionFactory.java:614-620)
    Q("a3_partial_agg_q1",
      (s, dir) =>
        groupByAgg(t(s, dir, "lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(
            sumExact(col("l_quantity")).as("sum_qty"),
            sumExact(col("l_extendedprice")).as("sum_base_price"),
            avgExact(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order")))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // HAVING as post-aggregation filter (semantics/AnalyzedSelectQuery.java:41-46)
    Q("a4_having",
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"), sumExact(col("c_acctbal")).as("sum_bal"))
          .filter(col("n_cust") > 60)
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS n_cust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
             |FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 60
             |ORDER BY c_nationkey""".stripMargin)),

    // O1 multi-column asc/desc external sort (TestPhysicalOperatorsIIIStudents.java:133-201)
    Q("o1_sort_multicol",
      (s, dir) =>
        sortOp(
          t(s, dir, "lineitem").filter(col("l_quantity") < 10)
            .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
          Seq(("l_returnflag", true), ("l_quantity", false),
            ("l_orderkey", true), ("l_linenumber", true))),
      Some("""SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber
             |FROM lineitem WHERE l_quantity < 10
             |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey, l_linenumber""".stripMargin)),

    // S7 Insert sink (AbstractExtensionFactory.java:274-293): append two
    // batches to a fresh Parquet table, read back — the round trip IS the
    // conformance check (the oracle recomputes the appended multiset).
    Q("s7_insert_sink",
      (s, dir) => {
        val tmp = graft.engine.TempDirs.create("graft_s7") + "/t"
        val c = t(s, dir, "customer")
        insertInto(c.filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_acctbal"), tmp)
        insertInto(c.filter(col("c_acctbal") > 9000)
          .select("c_custkey", "c_acctbal"), tmp)
        s.read.parquet(tmp)
          .groupBy("c_custkey").agg(count(lit(1)).as("cnt"))
          .orderBy("c_custkey")
      },
      Some("""WITH w AS (
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             |  UNION ALL SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
             |SELECT c_custkey, COUNT(*) AS cnt FROM w
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // S8 Delete sink (TablePage.deleteTuple tombstones → copy-on-write
    // rewrite on immutable Parquet; the reference specs DML but never
    // executes it, QueryProcessor.java:162-172).
    Q("s8_delete_sink",
      (s, dir) => {
        val tmp = graft.engine.TempDirs.create("graft_s8") + "/t"
        insertInto(t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice"), tmp)
        deleteWhere(s, tmp, col("o_totalprice") < 100000.0)
        s.read.parquet(tmp).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE NOT (o_totalprice < 100000) ORDER BY o_orderkey""".stripMargin)),

    // Nested sub-query in FROM, re-joined on its aggregate
    // (TestJoinOrderOptimizerStudents.java:476-501, re-targeted per FIXTURES.md §3.10).
    // Runs through the SQL front: the reference dialect is a subset of Spark SQL.
    // WITH RECURSIVE through the SQL front (Spark 4 supports recursive
    // CTEs): a generated series anchored-and-recursed, joined to a real
    // table — pins the SQL surface the reference's dialect lacks entirely.
    Q("sql_recursive_cte",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """WITH RECURSIVE t(n) AS (
            |  SELECT 0
            |  UNION ALL
            |  SELECT n + 1 FROM t WHERE n < 24)
            |SELECT n, n_name FROM t JOIN nation ON n = n_nationkey
            |ORDER BY n""".stripMargin)
      },
      Some("""WITH RECURSIVE t(n) AS (
             |  SELECT 0
             |  UNION ALL
             |  SELECT n + 1 FROM t WHERE n < 24)
             |SELECT CAST(n AS INT) AS n, n_name
             |FROM t JOIN nation ON n = n_nationkey
             |ORDER BY n""".stripMargin)),

    // ANSI-mode null-safety surface: try_divide / try_cast return NULL
    // instead of raising; nullif/coalesce complete the family. DuckDB has
    // no try_divide — the oracle spells out the CASE. (Cast trap: DuckDB
    // double→INT rounds, Spark truncates — go through FLOOR in both.)
    Q("null_safety_try_funcs",
      (s, dir) =>
        t(s, dir, "lineitem").selectExpr(
            "l_orderkey", "l_linenumber", "l_partkey",
            "try_divide(l_extendedprice, CAST(FLOOR(l_quantity) AS INT) % 3) AS d",
            "try_cast(l_returnflag AS INT) AS rc",
            "nullif(l_linestatus, 'O') AS ns",
            "coalesce(nullif(l_returnflag, 'N'), '-') AS rf")
          // total order incl. null columns; Spark sorts NULLS FIRST by
          // default where DuckDB defaults NULLS LAST — the oracle says so
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "d", "ns", "rf"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey,
             |  CASE WHEN CAST(FLOOR(l_quantity) AS INT) % 3 = 0 THEN NULL
             |       ELSE l_extendedprice / (CAST(FLOOR(l_quantity) AS INT) % 3)
             |  END AS d,
             |  TRY_CAST(l_returnflag AS INT) AS rc,
             |  NULLIF(l_linestatus, 'O') AS ns,
             |  COALESCE(NULLIF(l_returnflag, 'N'), '-') AS rf
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey,
             |  d NULLS FIRST, ns NULLS FIRST, rf""".stripMargin)),

    // SQL hint surface: the /*+ BROADCAST */ hint through the SQL front
    // must produce the same rows as the unhinted plan (the hint moves the
    // physical strategy, never the semantics; PlanShapeSpec pins the
    // broadcast effect itself elsewhere).
    Q("sql_broadcast_hint",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT /*+ BROADCAST(n) */ n.n_name,
                |  COUNT(*) AS n_custs, SUM(CAST(c.c_acctbal AS DECIMAL(18,2)))
                |    AS bal_sum_d
                |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
          .selectExpr("n_name", "n_custs", "CAST(bal_sum_d AS DOUBLE) AS bal_sum")
      },
      Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // The injectFunction natives exercised END-TO-END through the SQL
    // front: graft_polyhash / graft_lev_bounded called from SQL text over
    // a registered view, checked against the dual-dialect oracle
    // arithmetic (graft_zorder's value convention is pinned in
    // ZOrderSpec/PropertySpec; its sign-flip encoding has no clean DuckDB
    // spelling).
    Q("sql_native_functions",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""SELECT doc_id,
                |  graft_polyhash(text) AS h,
                |  graft_lev_bounded(substr(text, 1, 12), lang, 6) AS lev,
                |  graft_jaro_winkler(substr(text, 1, 12), lang) AS jw
                |FROM documents ORDER BY doc_id""".stripMargin)
      },
      Some(s"""SELECT doc_id, ${graft.functions.Hashing.polyHashDuck("text")} AS h,
              |  CAST(least(levenshtein(substr(text, 1, 12), lang), 7) AS INT) AS lev,
              |  jaro_winkler_similarity(substr(text, 1, 12), lang) AS jw
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // §1.2 TIME type conformance — the one reference type with no Spark
    // equivalent. The reference codes TIME as a 64-bit long: millis since
    // midnight in the low 32 bits plus a timezone offset in the high 32
    // (minidbs-core/src/de/tuberlin/dima/minidb/core/TimeField.java:11-18,
    // DataType.java:518-521). The documented mapping here is LongType
    // millis-since-midnight with offset 0 (sessions run UTC — CONFORMANCE
    // .md); this query exercises the full TIME surface: derivation from a
    // timestamp, hour/minute/second extraction, wrap-around time-of-day
    // arithmetic (+90 min mod day) and a time-of-day range predicate.
    Q("type_time_of_day",
      (s, dir) =>
        Catalog.load(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("tod_ms", expr("(us % 86400000000) div 1000"))
          .withColumn("hh", expr("CAST(tod_ms div 3600000 AS INT)"))
          .withColumn("mi", expr("CAST((tod_ms % 3600000) div 60000 AS INT)"))
          .withColumn("ss", expr("CAST((tod_ms % 60000) div 1000 AS INT)"))
          .withColumn("shift90_ms", expr("(tod_ms + 5400000) % 86400000"))
          .withColumn("in_business_hours", expr("hh >= 9 AND hh < 17"))
          .select("event_id", "tod_ms", "hh", "mi", "ss", "shift90_ms",
            "in_business_hours")
          .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
             |t AS (SELECT event_id, (us % 86400000000) // 1000 AS tod_ms FROM e),
             |x AS (SELECT event_id, tod_ms,
             |        CAST(tod_ms // 3600000 AS INT) AS hh,
             |        CAST((tod_ms % 3600000) // 60000 AS INT) AS mi,
             |        CAST((tod_ms % 60000) // 1000 AS INT) AS ss,
             |        (tod_ms + 5400000) % 86400000 AS shift90_ms
             |      FROM t)
             |SELECT event_id, tod_ms, hh, mi, ss, shift90_ms,
             |       hh >= 9 AND hh < 17 AS in_business_hours
             |FROM x ORDER BY event_id""".stripMargin)),

    // LATERAL correlated subquery through the SQL front (top-2 orders per
    // customer). Catalyst decorrelates this into ONE equi-join against a
    // per-customer ranked slice, with WindowGroupLimit pushing the k=2 cut
    // BELOW the rank shuffle (each map task keeps its local top-2 per key
    // before exchanging) — no per-customer subquery execution anywhere, so
    // the shape survives a 1000-executor fan-out unchanged.
    Q("sql_lateral_topk",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
            |FROM customer c,
            |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
            |         WHERE o_custkey = c.c_custkey
            |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
            |ORDER BY c_custkey, o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             |         WHERE o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
             |ORDER BY c_custkey, o_orderkey""".stripMargin)),

    // SQL-defined scalar function (CREATE TEMPORARY FUNCTION ... RETURN
    // expr): the declarative-UDF path — the body is inlined into the plan
    // as a plain Catalyst expression at resolution time, so unlike a Scala/
    // Python UDF it stays inside whole-stage codegen and the oracle can
    // evaluate the identical arithmetic. DuckDB has CREATE MACRO but the
    // driver runs one statement per oracle, so the body is inlined there —
    // same expression tree, same IEEE evaluation order.
    Q("sql_udf_front",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
                |RETURNS DOUBLE RETURN p * (1 - d)""".stripMargin)
        s.sql(
          """SELECT l_orderkey, l_linenumber,
            |       disc_price(l_extendedprice, l_discount) AS disc
            |FROM lineitem
            |ORDER BY l_orderkey, l_linenumber""".stripMargin)
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1 - l_discount) AS disc
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // VARIANT semi-structured ingestion (Spark 4): parse_json once into the
    // binary VARIANT encoding, then typed variant_get extraction — the
    // shredded-JSON path a 100 TB event store wants (parse cost paid once
    // per row, extraction is a codegen'd byte-offset read, no per-access
    // re-tokenizing). Aggregates stay in exact BIGINT. DuckDB oracle
    // extracts the same path with ->> and casts.
    Q("sql_variant_extract",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """WITH v AS (
            |  SELECT event_type,
            |         variant_get(parse_json(props), '$.k', 'bigint') AS k
            |  FROM events)
            |SELECT event_type,
            |       sum(k) AS sum_k,
            |       count(CASE WHEN k > 50 THEN 1 END) AS n_big,
            |       count(k) AS n_present
            |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k
             |  FROM events)
             |SELECT event_type,
             |       CAST(sum(k) AS BIGINT) AS sum_k,
             |       count(CASE WHEN k > 50 THEN 1 END) AS n_big,
             |       count(k) AS n_present
             |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Array unnesting with ordinality through the SQL front (LATERAL VIEW
    // posexplode): one generator per row, no join — the streaming-friendly
    // explode shape (generator output is pipelined, never materialized per
    // row). DuckDB has no WITH ORDINALITY; the oracle indexes the split
    // list through a LATERAL generate_series, which is the same relation.
    Q("sql_unnest_posexplode",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """SELECT doc_id, pos, word
            |FROM documents
            |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
            |WHERE pos < 5
            |ORDER BY doc_id, pos""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  CAST(unnest(generate_series(1, least(5, len(parts)))) - 1 AS INT) AS pos,
             |  unnest(list_slice(parts, 1, 5)) AS word
             |FROM (SELECT doc_id, string_split(text, ' ') AS parts
             |      FROM documents)
             |ORDER BY doc_id, pos""".stripMargin)),

    // GROUP BY ALL dialect sugar (every non-aggregate select item becomes
    // a key) — same clause in both engines; sums ride the exact-DECIMAL
    // path as everywhere.
    Q("sql_group_by_all",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        s.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            |FROM lineitem
            |GROUP BY ALL
            |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY ALL
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("subq_min_retail",
      (s, dir) => {
        Catalog.registerAll(s, dir)
        // BROADCAST(pCalc) (round 17, guide §3.1): pCalc aggregates to at
        // most |region|×|brand| rows (25 brands × 5 regions — bounded by
        // the group-key domain at ANY scale), but Catalyst's size estimate
        // of an aggregate over a 5-way join is far above the auto-broadcast
        // threshold, so the planner sort-merge-joined it — exchanging and
        // sorting the ENTIRE outer 5-way-joined lineitem on
        // (retailprice, brand, r_name). The hint is advisory-only (zero
        // semantic change; the oracle text below is identical modulo the
        // hint comment) and drops the plan from 3 exchanges to the single
        // ORDER BY range exchange.
        s.sql(
          """SELECT /*+ BROADCAST(pCalc) */
            |  r.r_name, p.p_brand, s.s_name, p.p_retailprice
            |FROM supplier s, nation n, region r, lineitem l, part p,
            |  (SELECT r2.r_name AS r_name, p2.p_brand AS p_brand,
            |          MIN(p2.p_retailprice) AS min_retail
            |   FROM supplier s2, nation n2, region r2, lineitem l2, part p2
            |   WHERE s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
            |     AND l2.l_suppkey = s2.s_suppkey AND l2.l_partkey = p2.p_partkey
            |   GROUP BY r2.r_name, p2.p_brand) pCalc
            |WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
            |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
            |  AND pCalc.min_retail = p.p_retailprice
            |  AND pCalc.p_brand = p.p_brand AND pCalc.r_name = r.r_name
            |ORDER BY r.r_name, p.p_brand, s.s_name, p.p_retailprice""".stripMargin)
      },
      Some("""SELECT r.r_name, p.p_brand, s.s_name, p.p_retailprice
             |FROM supplier s, nation n, region r, lineitem l, part p,
             |  (SELECT r2.r_name AS r_name, p2.p_brand AS p_brand,
             |          MIN(p2.p_retailprice) AS min_retail
             |   FROM supplier s2, nation n2, region r2, lineitem l2, part p2
             |   WHERE s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
             |     AND l2.l_suppkey = s2.s_suppkey AND l2.l_partkey = p2.p_partkey
             |   GROUP BY r2.r_name, p2.p_brand) pCalc
             |WHERE s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
             |  AND l.l_suppkey = s.s_suppkey AND l.l_partkey = p.p_partkey
             |  AND pCalc.min_retail = p.p_retailprice
             |  AND pCalc.p_brand = p.p_brand AND pCalc.r_name = r.r_name
             |ORDER BY r.r_name, p.p_brand, s.s_name, p.p_retailprice""".stripMargin))
  )

  /** region→nation→supplier dim chain, pre-joined then broadcast (all tiny). */
  private def broadcastChain(r: DataFrame, n: DataFrame, su: DataFrame): DataFrame =
    broadcast(
      r.join(n, col("n_regionkey") === col("r_regionkey"))
        .join(su, col("s_nationkey") === col("n_nationkey")))
}
