package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static pins on generated oracle SQL text (no SparkSession, no DuckDB):
  * the MATERIALIZED rewrite in the big generated oracles must cover every
  * CTE (a missed one re-inlines a training chain — the >300 s plan
  * explosion documented at TrainQ.promotedOracle) while never touching a
  * non-CTE `AS (` construct. */
class OracleSqlSpec extends AnyFunSuite {

  test("promoted oracle: every CTE materialized, nothing else rewritten") {
    val sql = SparkEntry.oracleSql("ann_ivf_pq_promoted")
    // Anchored coverage: no `<ident> AS (` survives unmaterialized. Any
    // survivor would be a CTE the anchored rewrite missed.
    val unrewritten =
      """\b[A-Za-z_][A-Za-z0-9_]*\s+AS\s*\(""".r.findAllIn(sql).toSeq
    assert(unrewritten.isEmpty, s"unmaterialized CTE heads: $unrewritten")
    // And the rewrite actually fired at scale: the m=16 promoted oracle
    // carries on the order of 200 CTEs.
    val n = sql.sliding("AS MATERIALIZED (".length)
      .count(_ == "AS MATERIALIZED (")
    assert(n > 100, s"expected >100 materialized CTEs, got $n")
  }

  test("materializeCtes: CTE heads rewritten, WINDOW clause definitions " +
      "never touched (round-12 advice)") {
    import graft.queries.Q.materializeCtes
    // Multi-definition WINDOW clause: the comma anchor alone would match
    // `w2 AS (` and emit invalid SQL — the query-keyword lookahead must
    // exclude both window specs while still rewriting the real CTEs.
    val sql =
      """WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a)
        |SELECT x, sum(x) OVER w1, avg(x) OVER w2 FROM b
        |WINDOW w1 AS (ORDER BY x), w2 AS (PARTITION BY x)""".stripMargin
    val out = materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1 AS x"), out)
    assert(out.contains("b AS MATERIALIZED (SELECT x FROM a"), out)
    assert(out.contains("w1 AS (ORDER BY x)"), out)
    assert(out.contains("w2 AS (PARTITION BY x)"), out)
    // VALUES-bodied and nested-WITH CTEs still rewrite.
    val v = materializeCtes("WITH v AS (VALUES (1)) SELECT * FROM v")
    assert(v.contains("v AS MATERIALIZED (VALUES"), v)
  }
}
