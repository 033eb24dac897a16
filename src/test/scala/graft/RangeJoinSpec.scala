package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed time-range join equals the naive non-equi join") {
    val ev = Catalog.load(spark, dir, "events")
    val l = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("lid"), unix_micros(col("ts")).as("lus"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("rid"), unix_micros(col("ts")).as("rus"))
    val radius = 600000000L

    val bucketed = RangeJoin.timeRangeJoin(l, r, "user_id",
        col("lus"), col("rus"), radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    val naive = l.join(r, l("user_id") === r("user_id") &&
        abs(r("rus") - l("lus")) <= radius)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("interval overlap join equals the naive formulation, no duplicates") {
    val ev = Catalog.load(spark, dir, "events")
    val l = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("lid"),
        unix_micros(col("ts")).as("ls"),
        (unix_micros(col("ts")) + 1800000000L).as("le"))
    val r = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("rid"),
        unix_micros(col("ts")).as("rs"),
        (unix_micros(col("ts")) + 300000000L).as("re"))
    // bucket deliberately NOT a divisor of either interval length
    val got = RangeJoin.intervalOverlapJoin(l, r, "user_id",
        col("ls"), col("le"), col("rs"), col("re"), bucketUs = 700000001L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    val naive = l.join(r, l("user_id") === r("user_id") &&
        l("ls") <= r("re") && r("rs") <= l("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size) // emitted once per pair
    assert(got.toSet == naive.toSet)
    assert(naive.nonEmpty)
  }

  test("radius boundary is inclusive and replication emits no duplicate pairs") {
    import spark.implicits._
    // hand-crafted: pairs exactly at, just inside, and just outside the radius
    val l = Seq((1L, 10L, 1000000L)).toDF("user_id", "lid", "lus")
    val r = Seq(
      (1L, 20L, 1000000L + 500L),   // inside
      (1L, 21L, 1000000L + 1000L),  // exactly at radius → included
      (1L, 22L, 1000000L + 1001L),  // outside
      (1L, 23L, 1000000L - 1000L),  // exactly at -radius → included
      (2L, 24L, 1000000L)           // other key
    ).toDF("user_id", "rid", "rus")
    val got = RangeJoin.timeRangeJoin(l, r, "user_id", col("lus"), col("rus"), 1000L)
      .select("rid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(20L, 21L, 23L))
  }
}
