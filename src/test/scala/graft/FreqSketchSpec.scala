package graft

import org.apache.spark.sql.functions._

import graft.expressions.FreqSketchAggregate.heavyHitters

/** SpaceSaving heavy-hitters aggregate: exactness below capacity, the
  * deterministic n/k capture + bound guarantees under heavy eviction and
  * distributed merge, and single-partition determinism. */
class FreqSketchSpec extends SparkSpec with SlowSuite {

  test("below capacity the sketch is exact with zero error") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => s"item${i % 5}").toDF("k")
    val sk = df.agg(heavyHitters(col("k"), 16).as("sk"))
      .selectExpr("explode(sk) AS h").selectExpr("h.item", "h.cnt", "h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sk.length === 5)
    assert(sk.forall { case (_, c, e) => c === 20L && e === 0L })
  }

  test("heavy hitters survive eviction and merge with valid bounds") {
    import spark.implicits._
    // 40% on one key, long distinct tail, k=8, many partitions → constant
    // eviction and multi-buffer merges.
    val rows = (0 until 2000).map { i =>
      if (i % 5 < 2) "HH" else s"tail$i"
    }
    val df = rows.toDF("k").repartition(13)
    val exact = rows.count(_ == "HH").toLong
    val sk = df.agg(heavyHitters(col("k"), 8).as("sk"))
      .selectExpr("filter(sk, x -> x.item = 'HH') AS h")
      .selectExpr("h[0].cnt AS cnt", "h[0].err AS err")
      .collect().head
    val (cnt, err) = (sk.getLong(0), sk.getLong(1))
    assert(cnt >= exact, s"overestimate invariant: $cnt >= $exact")
    assert(cnt - err <= exact, s"lower bound invariant: $cnt - $err <= $exact")
  }

  test("single-partition sketch is fully deterministic") {
    import spark.implicits._
    val rows = (0 until 500).map(i => s"k${i % 37}")
    def run() = rows.toDF("k").coalesce(1)
      .agg(heavyHitters(col("k"), 12).as("sk"))
      .selectExpr("explode(sk) AS h").selectExpr("h.item", "h.cnt", "h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run() === run())
  }
}
