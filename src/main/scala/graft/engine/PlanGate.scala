package graft.engine

/** Automated plan-fingerprint regression gate (round 9): the round-8
  * fingerprint columns caught two fact-scale broadcast plans
  * (`basket_part_pairs`, `triangleCount`) — but only because a human
  * diffed the artifact. This gate makes the diff mechanical: the bench
  * compares every query's live fingerprint against the committed baseline
  * (`PLAN_BASELINE.json`, authored from a clean-box run) and reports
  * violations in the artifact; PlanGateSpec proves the rules fire on an
  * injected regression.
  *
  * Rules — deliberately asymmetric, matching what each column means:
  *   - `cachedBroadcast` may only FALL. Every legitimate hit is an
  *     audited, measured-or-bounded broadcast (SURVEY §9 inventory); a
  *     rise means a new planning-time cached-stats broadcast nobody
  *     sized — the OOM-at-scale class.
  *   - `*_bucketed` rows must keep ZERO hash exchanges — their whole
  *     point is that the layout supplies the distribution; any exchange
  *     is a layout regression, baseline or not. The sole escape hatch is
  *     [[bucketedDesignHx]]: a row whose DESIGNED plan includes exchanges
  *     the layout cannot supply (a final aggregate keyed off the bucket
  *     key) declares that count in code — exceeding it still fires, and
  *     a stale measured baseline can never grandfather a regression in.
  *   - other `hashExchanges` changes are NOT violations (AQE may
  *     legitimately re-stage); they stay visible in the artifact diff.
  *
  * New queries (no baseline row) pass — the gate guards regressions, not
  * coverage; the baseline is re-authored each round from the clean box.
  */
object PlanGate {

  final case class Fp(hashExchanges: Int, cachedBroadcasts: Int)

  // Designed-exchange declarations live ON the row definitions
  // (`graft.queries.Q.designHx`, assembled by `Q.designHxMap`) — a
  // bucketed row whose designed plan genuinely re-keys (tpch_q21_bucketed's
  // final suppkey aggregate) declares its count where the query is
  // written, and the gate receives the assembled map. This module stays
  // free of query knowledge.

  private val Row =
    """"([A-Za-z0-9_]+)"\s*:\s*\{\s*"hx"\s*:\s*(\d+)\s*,\s*"cb"\s*:\s*(\d+)\s*\}""".r

  /** Parse a baseline JSON of shape {"query":{"hx":N,"cb":N},...}. The
    * format is this module's own (written by [[render]]); a regex scan
    * keeps the library free of any JSON dependency. */
  def parseBaseline(json: String): Map[String, Fp] =
    Row.findAllMatchIn(json).map { m =>
      m.group(1) -> Fp(m.group(2).toInt, m.group(3).toInt)
    }.toMap

  /** Render a current fingerprint map as baseline JSON (sorted, stable). */
  def render(current: Map[String, Fp]): String =
    current.toSeq.sortBy(_._1).map { case (name, fp) =>
      s""""$name":{"hx":${fp.hashExchanges},"cb":${fp.cachedBroadcasts}}"""
    }.mkString("{\n", ",\n", "\n}")

  /** The gate: violation messages for `current` vs `baseline` (empty =
    * clean). `designHx` carries the per-row designed-exchange declarations
    * assembled from the query definitions (`Q.designHxMap`). */
  def violations(
      current: Map[String, Fp], baseline: Map[String, Fp],
      designHx: Map[String, Int] = Map.empty): Seq[String] = {
    val cbRises = current.toSeq.sortBy(_._1).flatMap { case (name, fp) =>
      baseline.get(name).collect {
        case b if fp.cachedBroadcasts > b.cachedBroadcasts =>
          s"$name: cachedBroadcast ${b.cachedBroadcasts} -> ${fp.cachedBroadcasts}" +
            " (new cached-stats broadcast nobody sized)"
      }
    }
    val bucketedHx = current.toSeq.sortBy(_._1).collect {
      case (name, fp) if name.endsWith("_bucketed") &&
          fp.hashExchanges > designHx.getOrElse(name, 0) =>
        s"$name: bucketed row has ${fp.hashExchanges} hash exchange(s)," +
          s" designed ${designHx.getOrElse(name, 0)}" +
          " (layout regression — the bucketed scan no longer supplies the distribution)"
    }
    cbRises ++ bucketedHx
  }
}
