package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-handling aggregation: two-phase salted aggregate for keys whose
  * groups dwarf a single reducer (the 100 TB failure mode AQE's skew-join
  * handles for joins, handled here for aggregation).
  *
  * Phase 1 aggregates on (key, salt) — fan-out `salts` × |keys| partials —
  * then phase 2 merges partials per key. Correctness requires associative,
  * order-insensitive partials: COUNT and exact-DECIMAL SUM qualify (double
  * SUM would not — that is exactly why [[Relational.sumExact]] exists).
  * The salt is only a routing key; any per-row assignment yields the same
  * final result.
  */
object Skew {

  /** Salted COUNT + exact SUM per key. */
  def saltedCountSum(
      df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(
        count(lit(1)).as("_pc"),
        sum(value.cast(DecimalType(18, 2))).as("_ps"))
      .groupBy(col("k"))
      .agg(
        sum(col("_pc")).as("cnt"),
        sum(col("_ps")).cast(DoubleType).as("sum_val"))
}
