package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered) table layouts — the on-disk co-location strategy
  * for joins that repeat on the same key.
  *
  * The reference co-locates nothing: its only physical layout is row pages in
  * insertion order plus secondary B-trees (`io/tables/TablePage.java`,
  * `io/index/BTreeIndex.java:24-125`), and every join repeatedly re-walks an
  * index (`PhysicalPlanGeneratorUtils.createIndexNestedLoopJoinInner`,
  * `optimizer/generator/util/PhysicalPlanGeneratorUtils.java:432`). The
  * Spark-native analog of "build a persistent access structure so future
  * queries skip work" is bucketing: hash-partition the FILES by the join key
  * at write time so every later join/aggregation on that key runs with zero
  * Exchange — the shuffle is paid once, at layout time, not per query.
  *
  * At 100 TB this is the difference between re-shuffling the fact table for
  * every query in a workload and never shuffling it again: a 1000-executor
  * cluster joining two tables bucketed into the same key/count reads bucket i
  * of both on the same task. Bucket count should be chosen so one bucket of
  * the big table ≈ one task's worth (hundreds of MB) — thousands of buckets
  * at 100 TB; small here only because the test data is small.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table, replacing any
    * previous incarnation. Files land under `path`; metadata (bucket spec) in
    * the session catalog — readers get the hash-distribution guarantee from
    * the catalog, which is what lets the planner drop the Exchange.
    *
    * The pre-write `repartition(numBuckets, bucketCol)` uses the same
    * murmur3 pmod as the bucket-id assignment, so each write task owns
    * exactly one bucket → ONE file per bucket. That single-file invariant is
    * what lets the scan ALSO report the per-bucket sort order (Spark drops
    * the sort metadata when a bucket spans files, since concatenated sorted
    * files aren't sorted) — downstream SortMergeJoins then skip their Sort
    * entirely instead of re-sorting the fact table per join.
    *
    * zstd, not snappy: a layout table is written once and served many
    * times, so the write-side CPU for the denser codec amortizes to zero
    * while every serve pays less cold-read I/O (the dominant variance
    * source measured on the 100× replica, where the fact table no longer
    * fits page cache). */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      numBuckets: Int,
      bucketCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(numBuckets, col(bucketCol))
      .write
      .mode("overwrite")
      .option("path", path)
      .option("compression", "zstd")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Equi-join two tables bucketed on their join keys with equal bucket
    * counts. The merge hint forces the sort-merge path (a broadcast would
    * hide the co-location); with both sides bucket-distributed the planner
    * emits SortMergeJoin with NO ShuffleExchange on either side — pinned by
    * PlanShapeSpec. */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
