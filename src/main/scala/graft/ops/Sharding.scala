package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic shard writer for training-data exports — the "global
  * shuffle" step of a corpus build, with no sampling nondeterminism:
  * shard = hash(id) mod n, and the row order WITHIN a shard is the
  * (hash, id) permutation, so any engine (and any re-run) reproduces both
  * the placement and the read-back order bit-for-bit.
  *
  * Scale shape: ONE hash-partition shuffle on the shard key + a sort within
  * each partition (no global sort). `repartition(n, shard)` aligns Spark
  * partitions 1:1 with shards, so each hive `shard=k/` directory receives
  * exactly one file — the layout a streaming training loader wants.
  */
object Sharding {

  /** Multiplicative id hash — same SQL text both dialects (see shard_assign
    * oracle). */
  def shardHash(id: String): String = s"(($id * 1000003 + 12345) % 1000000007)"

  /** Adds `shard` (0..n-1, INT) to `df` by hashing `idCol`. */
  def assignShards(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("_h", expr(shardHash(idCol)))
      .withColumn("shard", expr(s"CAST(_h % $n AS INT)"))

  /** Writes `df` as `path/shard=k/` parquet, one file per shard, rows inside
    * each file in deterministic (hash, id) training order. */
  def writeShards(df: DataFrame, idCol: String, n: Int, path: String): Unit =
    assignShards(df, idCol, n)
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("_h"), col(idCol))
      .drop("_h")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
