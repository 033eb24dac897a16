package graft

import org.apache.spark.sql.Row

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("priorJoin attaches most recent at-or-before right row, max tie-break on equal ts") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // before any right row
      (1L, 200L, "p2"), // exactly at right ts 200 → same-instant visible
      (1L, 350L, "p3"), // between 300 and future
      (2L, 500L, "p4")  // other key
    ).toDF("user_id", "us", "p")

    val right = Seq(
      (1L, 150L, 10L, 1.0),
      (1L, 200L, 20L, 2.0),
      (1L, 200L, 21L, 3.0), // tie on ts → greater event_id (21) wins
      (1L, 300L, 30L, 4.0),
      (2L, 999L, 40L, 5.0)  // after left's ts → invisible
    ).toDF("user_id", "us", "event_id", "value")

    val out = AsOfJoin.priorJoin(left, right,
        key = "user_id", ts = "us", tieBreak = "event_id",
        payload = Seq("event_id", "value"))
      .orderBy("user_id", "us")
      .select("user_id", "us", "p", "right_event_id", "right_value", "right_us")
      .collect()

    assert(out(0) === Row(1L, 100L, "p1", null, null, null))
    assert(out(1) === Row(1L, 200L, "p2", 21L, 3.0, 200L))
    assert(out(2) === Row(1L, 350L, "p3", 30L, 4.0, 300L))
    assert(out(3) === Row(2L, 500L, "p4", null, null, null))
  }

  test("priorJoin matches the naive join+rank specification on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 300).map(i => (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble()))
      .toDF("k", "t", "event_id", "value")

    val got = AsOfJoin.priorJoin(left, right, "k", "t", "event_id", Seq("event_id", "value"))
      .select("lid", "right_event_id", "right_value", "right_t")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .sortBy(_._1)

    // Naive spec: join all at-or-before rights, keep max (t, event_id).
    val w = Window.partitionBy("lid")
      .orderBy(col("r_t").desc_nulls_last, col("r_eid").desc_nulls_last)
    val want = left.join(right.select(col("k").as("rk"), col("t").as("r_t"),
          col("event_id").as("r_eid"), col("value").as("r_val")),
        col("k") === col("rk") && col("r_t") <= col("t"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("lid", "r_eid", "r_val", "r_t")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .sortBy(_._1)

    assert(got.toSeq === want.toSeq)
  }

  test("priorJoin carries whole right rows, never mixes columns across rows") {
    import spark.implicits._
    // Right row at ts 20 has a null value; a per-column carry would leak 1.0
    // from ts 10 into the ts-20 match.
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, 100L, Some(1.0)), (1L, 20L, 200L, None))
      .toDF("k", "t", "event_id", "value")
    val out = AsOfJoin.priorJoin(left, right, "k", "t", "event_id", Seq("event_id", "value"))
      .select("right_event_id", "right_value").collect()
    assert(out(0) === Row(200L, null))
  }
}
