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
}
