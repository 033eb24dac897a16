package graft

import org.apache.spark.sql.functions._

/** Pin Spark's runtime skew-join handling — the 100 TB defense for skewed
  * JOIN keys (the aggregation-side defense is [[graft.ops.Skew]] salting,
  * and the single-key LSH defense is bucket capping; this is the third leg).
  * Thresholds are sized for real clusters; scale them down to prove the
  * mechanism fires locally: a join partition 2× the median and over 32 KB
  * must be split into parallel sub-partitions by OptimizeSkewedJoin. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      // The session pins the ADAPTIVE threshold separately (GraftSession's
      // conservative 8m cap), so the static -1 alone no longer disables
      // AQE's runtime broadcast conversion — pin both to keep the SMJ.
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows piled on key 0 (plus a sprinkle of spread keys) joined to
      // a uniform right side: one shuffle partition dwarfs the median.
      val left = spark.range(200000)
        .select(when(col("id") % 20 === 0, col("id") % 100).otherwise(lit(0L)).as("k"),
          col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // materialize THIS dataset's own query execution (count() would build
      // and execute a different plan, leaving j's adaptive plan unfinalized)
      assert(j.collect().length > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
