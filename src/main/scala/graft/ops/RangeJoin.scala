package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded time-range (interval) join: pairs with equal keys whose timestamps
  * lie within ± a fixed radius of each other.
  *
  * Absent from the reference (its joins are θ-NLJ and equi-merge only,
  * SURVEY.md §2.3); in Spark a naive formulation — equi-join on the key plus
  * a BETWEEN residual — shuffles on the key alone, so one hot key (a bot
  * user, a null-ish default) concentrates the whole quadratic blow-up in one
  * task. The scale path is temporal bucketing: quantize time into
  * radius-width buckets, replicate the LEFT side into its bucket ± 1, keep
  * the right side single-bucket, and equi-join on (key, bucket). Every
  * qualifying pair shares the right row's own bucket with exactly one of the
  * left row's three replicas, so no post-join dedup is needed, and the
  * shuffle key (key, bucket) spreads a hot key across time.
  *
  * All comparisons are on integer microseconds (caller supplies the µs
  * columns), so results are bit-identical across engines — no float epochs,
  * no interval-type rounding.
  */
object RangeJoin {

  /** Join rows of `left` and `right` sharing `key` whose INTERVALS overlap:
    * [lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅ (inclusive ends, integer µs).
    * Each interval replicates into every `bucketUs`-wide time bucket it
    * touches; overlapping intervals share at least the bucket containing
    * max(lStart, rStart) — the ONLY bucket where the pair is emitted, so no
    * dedup shuffle. Pick `bucketUs` ≈ typical interval length: replication
    * is len/bucketUs + 1 rows and candidate precision degrades with much
    * wider buckets. */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame, key: String,
      lStart: Column, lEnd: Column, rStart: Column, rEnd: Column,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val l = left.withColumn("_ls", lStart).withColumn("_le", lEnd)
      .withColumn("_bk",
        explode(expr(s"sequence(_ls div $bucketUs, _le div $bucketUs)")))
    val r = right.withColumn("_rs", rStart).withColumn("_re", rEnd)
      .withColumn("_bk",
        explode(expr(s"sequence(_rs div $bucketUs, _re div $bucketUs)")))
    l.join(r, Seq(key, "_bk"))
      .filter(col("_ls") <= col("_re") && col("_rs") <= col("_le"))
      .filter(col("_bk") === greatest(
        expr(s"_ls div $bucketUs"), expr(s"_rs div $bucketUs")))
      .drop("_bk", "_ls", "_le", "_rs", "_re")
  }

  /** Join rows of `left` and `right` sharing `key` with
    * |leftUs − rightUs| ≤ radiusUs. `leftUs`/`rightUs` are integer-µs
    * epoch columns. Other column names must not collide (alias upstream).
    * Output: key, then left's and right's remaining columns. */
  def timeRangeJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftUs: Column, rightUs: Column, radiusUs: Long): DataFrame = {
    require(radiusUs > 0, "radiusUs must be positive")
    val l = left
      .withColumn("_lus", leftUs)
      .withColumn("_bk",
        explode(array((-1 to 1).map(d => expr(s"_lus div $radiusUs") + d): _*)))
    val r = right
      .withColumn("_rus", rightUs)
      .withColumn("_bk", expr(s"_rus div $radiusUs"))
    l.join(r, Seq(key, "_bk"))
      .filter(abs(col("_rus") - col("_lus")) <= radiusUs)
      .drop("_bk", "_lus", "_rus")
  }
}
