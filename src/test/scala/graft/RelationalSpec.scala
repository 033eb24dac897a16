package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Relational._

class RelationalSpec extends SparkSpec {

  test("groupByAgg: global aggregation over empty input yields one row (COUNT 0, MIN/MAX null)") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    val out = groupByAgg(empty, Nil,
      Seq(count(lit(1)).as("cnt"), min(col("v")).as("mn"), max(col("v")).as("mx")))
      .collect()
    assert(out.toSeq === Seq(Row(0L, null, null)))
  }

  test("groupByAgg: grouped aggregation over empty input yields zero rows") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    val out = groupByAgg(empty, Seq(col("g")), Seq(count(lit(1)).as("cnt"))).collect()
    assert(out.isEmpty)
  }

  test("sumExact is order-independent where double sum is not") {
    import spark.implicits._
    // 2-decimal values whose double sum depends on order
    val vals = Seq(0.01, 1e15, -1e15, 0.02).map(v => Tuple1(v)).toDF("v")
    val exact = vals.agg(sumExact(col("v")).as("s")).collect()(0).getDouble(0)
    assert(exact === 0.03)
  }

  test("project allows duplicate source columns under distinct aliases") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("x", "y")
    val out = project(df, Seq(col("x") -> "x1", col("x") -> "x2", col("y") -> "y"))
    assert(out.columns.toSeq === Seq("x1", "x2", "y"))
    assert(out.collect()(0) === Row(1, 1, "a"))
  }

  test("sortOp orders by multiple keys with per-key direction") {
    import spark.implicits._
    val df = Seq((1, 2), (1, 1), (0, 5)).toDF("a", "b")
    val out = sortOp(df, Seq(("a", true), ("b", false))).collect()
    assert(out.toSeq === Seq(Row(0, 5), Row(1, 2), Row(1, 1)))
  }
}
