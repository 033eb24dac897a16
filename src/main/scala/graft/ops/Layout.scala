package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.ZOrderValue

/** Physical-layout writers beyond hash bucketing ([[Bucketing]]): Z-order
  * clustering for multi-dimensional pruning. */
object Layout {

  /** Write `df` as Parquet clustered on the Z-order (Morton) value of two
    * int dimensions: range-partition by the z-value (file = contiguous curve
    * segment), sort within partitions, drop the helper column. Every output
    * file then covers a bounded range of BOTH dimensions, so engine-native
    * min/max statistics (file and row-group level) prune 2-D box predicates
    * on read — no index structure, just ordering. `numFiles` should target
    * the cluster's preferred file size (hundreds of MB); small here only
    * because the test corpus is.
    *
    * Dimensions are first quantized to equal-width 16-bit codes over their
    * actual [min, max] — raw-bit interleaving clusters only dimensions of
    * similar bit width (a 4-bit domain drowns under a 20-bit one: the top
    * interleaved bits would all come from the wide column and the curve
    * degenerates to a single-column sort). The min/max pass is one cheap
    * column-stats aggregate. */
  def writeZOrdered(
      df: DataFrame, path: String, x: Column, y: Column, numFiles: Int): Unit = {
    val b = df.agg(
      min(x).cast("long"), max(x).cast("long"),
      min(y).cast("long"), max(y).cast("long")).head
    def code(c: Column, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo, 1L)
      // 16-bit rank within [lo, hi]; 65535L * offset fits in long for any
      // int-typed dimension
      ((c.cast("long") - lo) * 65535L / span).cast("int")
    }
    val z = ZOrderValue.zorder(
      code(x, b.getLong(0), b.getLong(1)),
      code(y, b.getLong(2), b.getLong(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
