package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.engine.Catalog
import graft.ops.Relational.{avgExact, sumExact, sumExactScaled}

/** TPC-H-shaped flagship pipelines adapted to the driver's schema — the
  * multi-join + aggregate + sort workloads a relational engine is judged on.
  * All money sums go through exact DECIMAL accumulation (order-independent
  * under partial aggregation), and every output is totally ordered. */
object Flagship {

  val all: Seq[Q] = Seq(

    // Q3-shape: top unshipped orders by revenue within a market segment.
    Q("tpch_q3_shipping_priority",
      (s, dir) => {
        val c = Catalog.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Catalog.load(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        val l = Catalog.load(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sumExactScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // Q5-shape: revenue by nation where customer and supplier share the
    // nation, within one region.
    Q("tpch_q5_local_supplier",
      (s, dir) => {
        val r = Catalog.load(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = Catalog.load(s, dir, "nation")
        val c = Catalog.load(s, dir, "customer")
        val o = Catalog.load(s, dir, "orders")
        val l = Catalog.load(s, dir, "lineitem")
        val su = Catalog.load(s, dir, "supplier")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sumExactScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name ORDER BY revenue DESC, n_name ASC""".stripMargin)),

    // Q10-shape: customers who returned items, ranked by lost revenue.
    Q("tpch_q10_returned_items",
      (s, dir) => {
        val c = Catalog.load(s, dir, "customer")
        val o = Catalog.load(s, dir, "orders")
        val l = Catalog.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val n = Catalog.load(s, dir, "nation")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sumExactScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // Q1-shape full version (a3 covers the partial-agg skeleton): all five
    // aggregates per (returnflag, linestatus) after a date cutoff.
    Q("tpch_q1_pricing_summary",
      (s, dir) =>
        Catalog.load(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumExact(col("l_quantity")).as("sum_qty"),
            sumExact(col("l_extendedprice")).as("sum_base_price"),
            sumExactScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
            sumExactScaled(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
            avgExact(col("l_quantity")).as("avg_qty"),
            avgExact(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )
}
