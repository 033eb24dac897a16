package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize a keyed series onto a fixed-step grid
  * and forward-fill gaps. The grid is generated per key with
  * `sequence`+`explode` (distributed, no driver loop), the carry is one
  * window pass per key — same shuffle budget as a group-by.
  */
object TimeSeries {

  /** For each key: a row every `stepUs` microseconds from the key's first to
    * last observation; `v` forward-filled from the most recent observed
    * value, `observed` marking real points. Input columns: keyCol,
    * tsUsCol (µs), valueCol (one observation per (key, grid point) — pre-
    * aggregate first). */
  def gapFill(
      df: DataFrame, keyCol: String, tsUsCol: String, valueCol: String,
      stepUs: Long): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsUsCol)).as("_mn"), max(col(tsUsCol)).as("_mx"))
    val grid = bounds.select(col(keyCol),
      explode(expr(s"sequence(_mn, _mx, $stepUs)")).as(tsUsCol))
    val w = Window.partitionBy(keyCol).orderBy(col(tsUsCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(df, Seq(keyCol, tsUsCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** [[gapFill]]'s linear sibling: gap points take the straight line between
    * the bracketing observations instead of the carry-forward. Two
    * order-pinned window passes per key (last/first IGNORE NULLS — no
    * commutative float folds, so cross-engine results are bit-identical
    * when the interpolation is spelled in the same op order); the grid
    * spans first..last observation per key, so every gap point has both
    * brackets by construction. Output adds `observed`. */
  def linearInterpolate(
      df: DataFrame, keyCol: String, tsUsCol: String, valueCol: String,
      stepUs: Long): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tsUsCol)).as("_mn"), max(col(tsUsCol)).as("_mx"))
    val grid = bounds.select(col(keyCol),
      explode(expr(s"sequence(_mn, _mx, $stepUs)")).as(tsUsCol))
    val back = Window.partitionBy(keyCol).orderBy(col(tsUsCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy(col(tsUsCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(df, Seq(keyCol, tsUsCol), "left")
      .withColumn("observed", col(valueCol).isNotNull)
      .withColumn("_pt",
        last(when(col("observed"), col(tsUsCol)), ignoreNulls = true).over(back))
      .withColumn("_pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("_nt",
        first(when(col("observed"), col(tsUsCol)), ignoreNulls = true).over(fwd))
      .withColumn("_nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      // Fixed IEEE op order — the oracle spells the identical expression.
      .withColumn(valueCol,
        when(col("observed"), col(valueCol)).otherwise(
          expr(s"_pv + (_nv - _pv) * (CAST($tsUsCol - _pt AS DOUBLE) / " +
            "CAST(_nt - _pt AS DOUBLE))")))
      .drop("_pt", "_pv", "_nt", "_nv")
  }
}
