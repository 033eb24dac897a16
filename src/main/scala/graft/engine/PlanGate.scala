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

  /** Bucketed rows whose designed-optimal plan needs exchanges the layout
    * cannot supply. `tpch_q21_bucketed`: every join/DISTINCT/semi/anti in
    * the chain keys on the orderkey and inherits the bucket distribution,
    * but the final `groupBy(suppkey)` aggregate genuinely re-keys — one
    * exchange, pinned by PlanShapeSpec ("bucketed q21 needs only the
    * final suppkey aggregate's exchange"). Anything above the declared
    * count is still a violation. */
  val bucketedDesignHx: Map[String, Int] = Map("tpch_q21_bucketed" -> 1)

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
    * clean). */
  def violations(
      current: Map[String, Fp], baseline: Map[String, Fp]): Seq[String] = {
    val cbRises = current.toSeq.sortBy(_._1).flatMap { case (name, fp) =>
      baseline.get(name).collect {
        case b if fp.cachedBroadcasts > b.cachedBroadcasts =>
          s"$name: cachedBroadcast ${b.cachedBroadcasts} -> ${fp.cachedBroadcasts}" +
            " (new cached-stats broadcast nobody sized)"
      }
    }
    val bucketedHx = current.toSeq.sortBy(_._1).collect {
      case (name, fp) if name.endsWith("_bucketed") &&
          fp.hashExchanges > bucketedDesignHx.getOrElse(name, 0) =>
        s"$name: bucketed row has ${fp.hashExchanges} hash exchange(s)," +
          s" designed ${bucketedDesignHx.getOrElse(name, 0)}" +
          " (layout regression — the bucketed scan no longer supplies the distribution)"
    }
    cbRises ++ bucketedHx
  }
}
