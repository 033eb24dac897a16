package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PlanGate
import graft.engine.PlanGate.Fp

/** The plan-fingerprint regression gate must actually FIRE — the round-8
  * workflow relied on a human diffing the artifact columns; these tests
  * inject each regression class and prove the mechanical gate catches it.
  * (Pure logic — no SparkSession.) */
class PlanGateSpec extends AnyFunSuite {

  private val baseline = Map(
    "dedup_containment" -> Fp(3, 2),
    "basket_part_pairs" -> Fp(2, 0),
    "tpch_q18_bucketed" -> Fp(0, 0),
    "plain_query" -> Fp(5, 0))

  test("clean run (equal or improved fingerprints) passes") {
    assert(PlanGate.violations(baseline, baseline).isEmpty)
    val improved = baseline
      .updated("dedup_containment", Fp(2, 1)) // fewer exchanges, fewer cb
    assert(PlanGate.violations(improved, baseline).isEmpty)
  }

  test("injected cachedBroadcast rise is flagged (red test)") {
    // The basket_part_pairs class: a query acquires a broadcast of a
    // cached, corpus-sized relation that planner stats mis-sized.
    val regressed = baseline.updated("basket_part_pairs", Fp(2, 1))
    val v = PlanGate.violations(regressed, baseline)
    assert(v.size === 1 && v.head.startsWith("basket_part_pairs: cachedBroadcast 0 -> 1"), v)
  }

  test("bucketed row acquiring a hash exchange is flagged even if baseline had one") {
    // Rule is absolute for *_bucketed: the layout must supply the
    // distribution; a stale baseline must not grandfather an exchange in.
    val regressed = baseline.updated("tpch_q18_bucketed", Fp(1, 0))
    val v = PlanGate.violations(regressed, baseline)
    assert(v.size === 1 && v.head.startsWith("tpch_q18_bucketed:"), v)
    val staleBaseline = baseline.updated("tpch_q18_bucketed", Fp(1, 0))
    assert(PlanGate.violations(regressed, staleBaseline).size === 1)
  }

  test("declared design exchanges pass; exceeding the declaration fires") {
    // tpch_q21_bucketed's final suppkey aggregate genuinely re-keys — its
    // designed plan declares ONE exchange via Q.designHx at the row
    // definition; the gate consumes the assembled map.
    val design = Map("tpch_q21_bucketed" -> 1)
    val withQ21 = baseline.updated("tpch_q21_bucketed", Fp(1, 0))
    assert(PlanGate.violations(withQ21, baseline, design).isEmpty)
    val regressed = baseline.updated("tpch_q21_bucketed", Fp(2, 0))
    val v = PlanGate.violations(regressed, baseline, design)
    assert(v.size === 1 && v.head.startsWith("tpch_q21_bucketed:"), v)
    // The declaration lives in code, not the measured baseline: a stale
    // baseline row at 2 still cannot grandfather the second exchange in.
    val stale = baseline.updated("tpch_q21_bucketed", Fp(2, 0))
    assert(PlanGate.violations(regressed, stale, design).size === 1)
    // Without the declaration, the single designed exchange itself fires —
    // the default for a bucketed row is and stays ZERO.
    assert(PlanGate.violations(withQ21, baseline).size === 1)
  }

  test("design declarations assemble from the row definitions") {
    // The real map the bench passes: built by Q.designHxMap from
    // SparkEntry.allQueries — q21_bucketed declares its one re-keying
    // aggregate at the definition site, and nothing else declares any.
    val design = graft.queries.Q.designHxMap(SparkEntry.allQueries)
    assert(design === Map("tpch_q21_bucketed" -> 1))
  }

  test("non-bucketed hashExchange changes and new queries are not violations") {
    val moved = baseline
      .updated("plain_query", Fp(7, 0)) // AQE re-staging: visible, not fatal
      .updated("brand_new_query", Fp(9, 3)) // no baseline row: coverage, not regression
    assert(PlanGate.violations(moved, baseline).isEmpty)
  }

  test("baseline render/parse round-trips") {
    val parsed = PlanGate.parseBaseline(PlanGate.render(baseline))
    assert(parsed === baseline)
  }
}
