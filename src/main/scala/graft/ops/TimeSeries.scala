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
}
