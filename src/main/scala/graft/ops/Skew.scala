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

  /** Measured broadcast: materialize the (already-persisted) `df`, read its
    * ACTUAL in-memory size from the cached relation, and mark it broadcast
    * iff it fits `maxBytes` — else hand it back untouched for the planner's
    * shuffle path.
    *
    * Why not leave this to AQE: the adaptive threshold judges a stage by
    * COMPRESSED shuffle bytes (undercounting the hash relation 5–10×, the
    * q21-at-100× OOM — see GraftSession), so the session caps it at 8m.
    * That cap also stops AQE from rescuing candidate-verify joins whose
    * build side is a modest cached table but whose SHUFFLE KEYS are
    * low-entropy blocking keys — hash-partitioning those sends whole blocks
    * to single reducers and serializes the expensive verify expression
    * behind one task (measured: editDistancePairs 10× went 15 s → 100 s on
    * the capped session). The op, unlike AQE, can decide from the true
    * deserialized size: under the bound it broadcasts (verify runs at the
    * probe side's full parallelism, no key-skew exposure); over it — the
    * 100 TB case — the shuffle plan stands and the bucket caps bound skew.
    *
    * The caller must have persisted `df`; the count here is the one
    * materialization its consumers would pay anyway. */
  def broadcastIfBounded(df: DataFrame, maxBytes: Long = 512L << 20): DataFrame = {
    df.count()
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes <= maxBytes) broadcast(df) else df
  }

  /** Hot-bucket defense for LSH/blocking candidate self-joins: keep at most
    * `cap` members per bucket key (smallest `idCol` first — deterministic),
    * drop the rest. A web-scale corpus has boilerplate families — thousands
    * of documents sharing one band signature — and a bucket equi-join is
    * QUADRATIC in the bucket (AQE's skew handling splits partitions, not a
    * single key group), so membership must be bounded before the join. The
    * row_number pass is linear in bucket size (one sort task for the hottest
    * bucket), replacing the quadratic join blow-up; capping trades recall
    * only in overflow buckets, which LSH — approximate by design — accepts.
    * Dropped volume is surfaced without an extra job via `Dataset.observe`
    * (metric `<metric>`: dropped_rows, max_bucket), readable from a
    * `QueryExecutionListener` or `df.collectResult`-adjacent APIs; Spark
    * permits the exact-duplicate CollectMetrics nodes a self-join creates. */
  def capBuckets(
      df: DataFrame, keys: Seq[String], idCol: String, cap: Int,
      metric: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("_bn", row_number().over(w))
      .observe(metric,
        sum(when(col("_bn") > cap, lit(1L)).otherwise(lit(0L))).as("dropped_rows"),
        max(col("_bn")).cast("long").as("max_bucket"))
      .filter(col("_bn") <= cap)
      .drop("_bn")
  }

  /** Salted equi-join — the hot-key defense for JOINS: when one join key
    * carries a disproportionate share of the big side (the single-giant-key
    * case AQE's skew join cannot split, because splitting a key group would
    * need the matching build rows on every split), replicate the SMALL side
    * `salts`× and route each big-side row to one replica by a deterministic
    * per-row salt. Every reducer then holds the full dimension row for its
    * key, so the result set is identical to the plain join — only the
    * shuffle distribution changes, |small|·salts extra build rows being the
    * price of splitting the hot reducer `salts` ways.
    *
    * `saltOn` must be a deterministic big-side column (any well-spread id);
    * correctness needs no spreading quality — any routing yields the same
    * rows. */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      saltOn: Column, salts: Int): DataFrame = {
    val b = big.withColumn("_bsalt", pmod(saltOn, lit(salts)))
    val s = small.withColumn("_ssalt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    b.join(s, b(bigKey) === s(smallKey) && col("_bsalt") === col("_ssalt"))
      .drop("_bsalt", "_ssalt")
  }

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
