package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.engine.Catalog

/** The relational operator surface of the reference engine, re-expressed as
  * Spark combinators (`DataFrame => DataFrame`). Inventory: SURVEY.md §2.
  *
  * Design notes (Spark-first, 100 TB-minded):
  *   - Scans are declarative: projection and conjunctive predicates reach the
  *     Parquet reader via Catalyst (`ColumnPruning`, `PushDownPredicate`),
  *     subsuming the reference's page column bitmap + `LowLevelPredicate[]`
  *     (`io/tables/TablePage.java:24-43,199-219`,
  *     `qexec/OperatorFactory.java:68-81`).
  *   - Index operators (B-tree key/RID lookups,
  *     `io/index/BTreeIndex.java:56-102`) have no Spark analog and are
  *     deliberately designed away: every index+fetch composition collapses to
  *     a value-space filter or join; Parquet min/max row-group skipping plus
  *     partition pruning is the performance analog.
  *   - Joins: the reference only has NLJ + merge join
  *     (`qexec/OperatorFactory.java:260-315`); Spark adds broadcast-hash and
  *     shuffled-hash which we use by default and hint explicitly where the
  *     dimension side is known small.
  *   - Aggregation: the reference is sort-based with a sorted-input
  *     prerequisite (`optimizer/GroupByPlanOperator.java:98-101`); Spark's
  *     `HashAggregateExec` with partial (map-side) aggregation replaces it —
  *     the reference's own MapReduce layer (`mapred/qexec/HadoopOperator.java`)
  *     already concedes group-by is a partial/final dataflow.
  */
object Relational {

  // ---------------------------------------------------------------- scans

  /** S1 TableScan (`OperatorFactory.createTableScanOperator`,
    * `OperatorFactory.java:68-81`): full scan with conjunctive predicates and
    * projection (duplicate output columns allowed via aliases). */
  def tableScan(
      spark: SparkSession,
      sfDir: String,
      table: String,
      columns: Seq[Column] = Nil,
      predicates: Seq[Column] = Nil): DataFrame = {
    val base = Catalog.load(spark, sfDir, table)
    val filtered = predicates.foldLeft(base)(_ filter _)
    if (columns.isEmpty) filtered else filtered.select(columns: _*)
  }

  /** S2 IndexScan (`AbstractExtensionFactory.java:236-243`): key values in
    * [lower, upper] with inclusive flags → value-space range filter; Parquet
    * row-group min/max stats do the skipping a B-tree descent did. */
  def indexRangeScan(
      df: DataFrame,
      key: String,
      lower: Any, lowerInclusive: Boolean,
      upper: Any, upperInclusive: Boolean): DataFrame = {
    val lo = if (lowerInclusive) col(key) >= lit(lower) else col(key) > lit(lower)
    val hi = if (upperInclusive) col(key) <= lit(upper) else col(key) < lit(upper)
    df.filter(lo && hi)
  }

  /** S3 IndexLookup equality (`OperatorFactory.java:91-98`). */
  def indexPointLookup(df: DataFrame, key: String, value: Any): DataFrame =
    df.filter(col(key) === lit(value))

  /** S5 IndexCorrelatedLookup + S6 Fetch (`OperatorFactory.java:132-139,169-177`):
    * the "re-open the index per outer tuple, fetch by RID" composition is an
    * equi-join; Spark broadcasts the small side (index-NLJ analog). */
  def correlatedLookupJoin(
      outer: DataFrame, inner: DataFrame, joinCond: Column): DataFrame =
    outer.join(inner, joinCond, "inner")

  // ---------------------------------------------------------------- sinks

  /** S7 Insert sink (`AbstractExtensionFactory.java:274-293`) — append to a
    * Parquet table; index maintenance is moot (no secondary indexes). */
  def insertInto(df: DataFrame, tablePath: String): Unit =
    df.write.mode("append").parquet(tablePath)

  /** S8 Delete sink (`AbstractExtensionFactory.java:294-300`,
    * `TablePage.deleteTuple`): Parquet is immutable → copy-on-write rewrite of
    * the surviving rows. The reference itself never executes DML
    * (`QueryProcessor.java:162-172` throws) — provided for completeness. */
  def deleteWhere(spark: SparkSession, tablePath: String, pred: Column): Unit =
    copyOnWrite(spark, tablePath)(_.filter(!pred))

  /** UPDATE (`parser/UpdateQuery.java` — parsed by the reference, never
    * executed): copy-on-write rewrite applying `assignments` to rows
    * matching `pred`. */
  def updateWhere(
      spark: SparkSession, tablePath: String, pred: Column,
      assignments: Map[String, Column]): Unit =
    copyOnWrite(spark, tablePath) { cur =>
      assignments.foldLeft(cur) { case (df, (c, v)) =>
        df.withColumn(c, when(pred, v).otherwise(col(c)))
      }
    }

  /** MERGE/upsert (beyond the reference's parsed DML): rows in `updates`
    * replace same-`key` rows in the table; unmatched rows insert. One anti
    * join + union under copy-on-write. */
  def mergeInto(
      spark: SparkSession, tablePath: String, updates: DataFrame, key: String): Unit =
    copyOnWrite(spark, tablePath) { cur =>
      cur.join(updates.select(key), Seq(key), "left_anti")
        .unionByName(updates)
    }

  /** Apply a CDC changelog (insert/update/delete ops) to a snapshot:
    * collapse the log to each key's latest op by `seqCol` (row_number, one
    * shuffle on the key), then delete = anti join, upsert = union of the
    * surviving I/U rows. The snapshot side is touched by exactly one anti
    * join — at 100 TB the changelog is the small side and broadcasts. */
  def applyCdc(
      snapshot: DataFrame, changelog: DataFrame,
      keyCol: String, opCol: String, seqCol: String): DataFrame = {
    // Latest-op-per-key as a max_by PARTIAL AGGREGATE, not a row_number
    // window (round 17, guide §2.3): the window form shuffled and sorted
    // the WHOLE changelog; the aggregate collapses map-side to one
    // candidate per (key × input partition). seq is unique per key (a
    // changelog's ordering contract — the window form was equally
    // tie-undefined without it), so max_by picks exactly the window's row.
    val keepCols = changelog.columns.filterNot(_ == seqCol)
    val latest = changelog.groupBy(col(keyCol))
      .agg(max_by(struct(keepCols.map(col): _*), col(seqCol)).as("_r"))
      .select(keepCols.map(c => col(s"_r.$c")): _*)
    val kept = snapshot.join(latest.select(keyCol), Seq(keyCol), "left_anti")
    kept.unionByName(
      latest.filter(col(opCol).isin("I", "U")).drop(opCol))
  }

  /** Generate the CDC changelog BETWEEN two snapshots — the table-diff
    * inverse of [[applyCdc]]: keys only in `after` emit I, keys only in
    * `before` emit D (carrying the before-values), keys in both whose
    * non-key columns differ (null-safely) emit U; identical rows emit
    * nothing. `applyCdc(before, snapshotDiff(before, after), ...)` equals
    * `after` — the round-trip PropertySpec pins. One full-outer join on
    * the key; at 100 TB both sides shuffle once on the key (or not at all
    * when both snapshots are bucketed on it). */
  def snapshotDiff(
      before: DataFrame, after: DataFrame, keyCol: String,
      seq: Long = 1L): DataFrame = {
    val cols = after.columns
    val b = before.select(cols.map(c => col(c).as(s"_b_$c")).toSeq: _*)
    val joined = after.join(b,
      after(keyCol) === col(s"_b_$keyCol"), "full_outer")
    val changed = cols.filterNot(_ == keyCol)
      .map(c => !(after(c) <=> col(s"_b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val isD = after(keyCol).isNull
    val op = when(col(s"_b_$keyCol").isNull, "I")
      .when(isD, "D")
      .when(changed, "U")
    joined
      .withColumn("op", op).filter(col("op").isNotNull)
      .select(cols.map(c =>
          when(isD, col(s"_b_$c")).otherwise(after(c)).as(c)).toSeq
        ++ Seq(col("op"), lit(seq).as("seq")): _*)
  }

  /** Incremental materialized-view refresh by AFFECTED GROUPS: recompute
    * `aggregate` only for group keys the delta touched; every other MV row
    * carries over verbatim (anti join), and groups whose last base row was
    * deleted vanish naturally — the recompute emits no row for them.
    * `touchedKeys` is delta-bounded, so both probes broadcast when the
    * delta is small, and at 100 TB the semi join prunes the base scan to
    * the affected groups when the base is bucketed/partitioned on the key
    * — the MV (same scale as the key domain) is never re-aggregated. The
    * caller must pass EVERY key a delta row can affect (for group-moving
    * updates: both the old and new key). */
  def refreshAffectedGroups(
      mv: DataFrame, updatedBase: DataFrame, touchedKeys: DataFrame,
      keyCol: String)(aggregate: DataFrame => DataFrame): DataFrame = {
    val touched = touchedKeys.select(keyCol).distinct()
    mv.join(touched, Seq(keyCol), "left_anti")
      .unionByName(aggregate(
        updatedBase.join(touched, Seq(keyCol), "left_semi")))
  }

  /** Small-file compaction: rewrite the table into `numFiles` parquet files
    * sorted by `sortCols` within each file — restores scan efficiency after
    * many small appends and maximizes row-group min/max skipping for range
    * predicates on the sort key. */
  def compact(
      spark: SparkSession, tablePath: String,
      numFiles: Int, sortCols: Seq[String]): Unit =
    copyOnWrite(spark, tablePath) { cur =>
      val re = cur.repartition(numFiles)
      if (sortCols.isEmpty) re
      else re.sortWithinPartitions(sortCols.map(col): _*)
    }

  /** Rewrite-and-swap for DML on immutable Parquet. */
  private[graft] def copyOnWrite(
      spark: SparkSession, tablePath: String)(f: DataFrame => DataFrame): Unit = {
    val next = f(spark.read.parquet(tablePath))
    val tmp = tablePath + ".cow"
    next.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(tablePath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  // ------------------------------------------------- filter / project

  /** P2 Filter (`OperatorFactory.java:188-195`) — predicate algebra (P4) is
    * `Column` boolean algebra; the reference dialect is conjunctive-only
    * (`parser/SQLTokenizer.java:361-424` has no OR token) but the runtime
    * level supports disjunction (`LocalPredicateDisjunction.java:18`), so we
    * accept any `Column`. */
  def filterOp(df: DataFrame, pred: Column): DataFrame = df.filter(pred)

  /** P1 projection via column maps with duplicates allowed (the reference
    * permits `producedColumnIndexes = {4,1,6,4}`; `OperatorFactory.java:41-48`).
    * Each (source, alias) pair becomes an aliased column. */
  def project(df: DataFrame, cols: Seq[(Column, String)]): DataFrame =
    df.select(cols.map { case (c, a) => c.as(a) }: _*)

  // ---------------------------------------------------------------- joins

  /** J1 NestedLoopJoin (`OperatorFactory.java:260-270`): inner θ-join or
    * Cartesian. Non-equi conditions plan as `BroadcastNestedLoopJoin`; equi
    * conditions are upgraded to hash joins by Catalyst automatically. */
  def nestedLoopJoin(left: DataFrame, right: DataFrame, cond: Option[Column]): DataFrame =
    cond match {
      case Some(c) => left.join(right, c, "inner")
      case None    => left.crossJoin(right)
    }

  /** J2 MergeJoin (`OperatorFactory.java:305-315`): sort-merge equi-join.
    * Spark inserts the required sorts itself (`EnsureRequirements`); the hint
    * pins the strategy the reference mandated. */
  def mergeJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.hint("merge").join(right, cond, "inner")

  /** J3 Index-NLJ (`PhysicalPlanGeneratorUtils.createIndexNestedLoopJoinInner`,
    * `optimizer/generator/util/PhysicalPlanGeneratorUtils.java:432`): the
    * Spark analog of "probe an index per outer row" is broadcasting the small
    * probe side into a hash join. */
  def indexNestedLoopJoin(outer: DataFrame, smallInner: DataFrame, cond: Column): DataFrame =
    outer.join(broadcast(smallInner), cond, "inner")

  // ---------------------------------------------------------- aggregation

  /** Exact SUM over a double column, made engine-portable: summing doubles is
    * order-dependent, so distributed partial aggregation would make results
    * nondeterministic vs an oracle. The data's doubles carry 2 decimals, so
    * summing as DECIMAL(18,2) is exact and associative; the final cast back to
    * DOUBLE is deterministic. At 100 TB this matters for reproducibility of
    * pipeline outputs, not just oracle tests. */
  def sumExact(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** [[sumExact]] at an explicit scale — use scale = the number of exact
    * decimal digits of the summand (e.g. 4 for a product of two 2-decimal
    * factors), so the double→decimal rounding never lands on an
    * engine-dependent half-way case. */
  def sumExactScaled(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact AVG companion to [[sumExact]] (single double division at the end). */
  def avgExact(c: Column): Column = sumExact(c) / count(c)

  /** A1/A2/A3 GroupBy (`OperatorFactory.java:393-406`): hash aggregation with
    * automatic partial/final split — the reference's `HadoopGroupBy`
    * map/combine/reduce (`AbstractExtensionFactory.java:614-620`) is exactly
    * Spark's partial_agg → exchange → final_agg. Empty `groupCols` = global
    * aggregation (A2). The reference supports COUNT/SUM/AVG/MIN/MAX with
    * SUM/AVG restricted to arithmetic types (`OperatorFactory.java:357-361`);
    * callers pass standard `functions._` aggregates.
    */
  def groupByAgg(df: DataFrame, groupCols: Seq[Column], aggs: Seq[Column]): DataFrame =
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols: _*).agg(aggs.head, aggs.tail: _*)

  // ----------------------------------------------------------- CHAR(n) glue

  /** CHAR(n) blank-padded comparison semantics (`DataType.java:400-410`,
    * fixed-length blank-padded CHAR): Spark tables normalize CHAR to STRING,
    * so reference-equivalent comparisons strip/extend trailing blanks
    * explicitly. `charEq` ignores trailing-blank differences; `charPad`
    * reproduces the padded value. */
  def charPad(c: Column, n: Int): Column = rpad(c, n, " ")
  def charEq(a: Column, b: Column): Column = rtrim(a) === rtrim(b)

  // ------------------------------------------------------------------ sort

  /** O1 Sort (`OperatorFactory.java:335-345`): multi-column asc/desc
    * external sort. Spark range-partitions then sorts per partition with
    * spill (`UnsafeExternalSorter`), replacing the reference's QueryHeap
    * two-phase external merge-sort (`qexec/heap/QueryHeap.java`). */
  def sortOp(df: DataFrame, keys: Seq[(String, Boolean)]): DataFrame =
    df.orderBy(keys.map { case (k, ascending) =>
      if (ascending) col(k).asc else col(k).desc
    }: _*)
}
