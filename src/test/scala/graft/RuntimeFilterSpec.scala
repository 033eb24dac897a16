package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog

/** Pins Spark's runtime bloom-filter join pruning (InjectRuntimeFilter): a
  * selective filter on the small (creation) side plants a bloom filter that
  * prunes the big (application) side's scan BEFORE the shuffle — the runtime
  * analog of static partition pruning, and the lever that keeps a
  * fact-to-filtered-dim join from shuffling the whole fact table at 100 TB.
  * Default thresholds need multi-GB scans; scaled down here to fire locally,
  * same as AqeSkewSpec does for skew. */
class RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects bloom_filter on the fact-side scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
      // force a shuffle join — a broadcast join already ships the dim to every
      // task and DPP/bloom adds nothing
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val orders = Catalog.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val li = Catalog.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      // and the filter lands on the application (lineitem) side
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
