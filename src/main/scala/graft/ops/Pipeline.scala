package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.PolyHash

/** Event-pipeline / feature-engineering operators a large-scale training-data
  * platform needs beyond the relational core: ordered-funnel analysis, SCD2
  * dimension snapshots from change logs, URL canonicalization + dedup, and
  * hashing-trick feature vectorization. Absent from the reference (its
  * surface is relational-only — SURVEY.md §2); designed Spark-first.
  *
  * Scale notes: every operator here is one hash shuffle on its natural key
  * (user / entity / canonical-url / doc) — no self-joins, no driver state.
  */
object Pipeline {

  /** Ordered funnel: for each user, the earliest time of stage i that occurs
    * STRICTLY AFTER the chosen time of stage i-1 (classic view→click→buy
    * conversion). One Exchange on `userCol`: the per-stage times are chained
    * whole-partition conditional MINs (no ORDER BY ⇒ no per-window Sort),
    * then one hash aggregate collapses each user to a row.
    *
    * Output: userCol, t_<stage>_us (micros, null = never reached),
    * stage_reached (0..stages.length). */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(
      col(userCol), unix_micros(col(tsCol)).as("_us"), col(typeCol).as("_t"))
    var prev: Option[String] = None
    stages.foreach { stage =>
      val c = s"t_${stage}_us"
      val cond = prev match {
        case None    => col("_t") === stage
        case Some(p) => col("_t") === stage && col("_us") > col(p)
      }
      df = df.withColumn(c, min(when(cond, col("_us"))).over(w))
      prev = Some(c)
    }
    val tCols = stages.map(s => min(col(s"t_${s}_us")).as(s"t_${s}_us"))
    val agg = df.groupBy(col(userCol)).agg(tCols.head, tCols.tail: _*)
    // Deepest non-null stage wins: fold ascending so stage N's WHEN ends up
    // outermost (t_i non-null implies t_{i-1} non-null by construction).
    val reached = stages.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(s"t_${s}_us").isNotNull, lit(i + 1)).otherwise(acc)
    }
    agg.withColumn("stage_reached", reached)
  }

  /** Windowed (deadline) funnel: like [[funnel]], but each stage must land
    * within `maxGapUs` of the PREVIOUS stage's chosen time — the
    * "conversion window" of product analytics. Semantics are the
    * deterministic greedy-from-earliest convention those tools use: stage
    * i's time is the earliest event in (t_{i-1}, t_{i-1} + maxGapUs]; a
    * user whose earliest anchor misses a later deadline does NOT retry a
    * later anchor (the existential any-anchor variant is a different,
    * per-anchor-quadratic operator — compose the range-join family for
    * it). Plan shape identical to [[funnel]]: chained conditional MIN
    * windows, one exchange on the user, no per-window sort. */
  def funnelWindowed(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(
      col(userCol), unix_micros(col(tsCol)).as("_us"), col(typeCol).as("_t"))
    var prev: Option[String] = None
    stages.foreach { stage =>
      val c = s"t_${stage}_us"
      val cond = prev match {
        case None    => col("_t") === stage
        case Some(p) => col("_t") === stage && col("_us") > col(p) &&
          col("_us") <= col(p) + lit(maxGapUs)
      }
      df = df.withColumn(c, min(when(cond, col("_us"))).over(w))
      prev = Some(c)
    }
    val tCols = stages.map(s => min(col(s"t_${s}_us")).as(s"t_${s}_us"))
    val agg = df.groupBy(col(userCol)).agg(tCols.head, tCols.tail: _*)
    val reached = stages.zipWithIndex.foldLeft(lit(0)) { case (acc, (s, i)) =>
      when(col(s"t_${s}_us").isNotNull, lit(i + 1)).otherwise(acc)
    }
    agg.withColumn("stage_reached", reached)
  }

  /** SCD type-2 snapshot from a change log: each change row becomes a
    * validity interval [ts, next change ts) per key; the last interval is
    * open (valid_to_us NULL, is_current true). `tieCol` breaks equal
    * timestamps deterministically. One Exchange + one Sort on the key. */
  def scd2(
      changelog: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from_us").asc, col(tieCol).asc)
    changelog
      .select(col(keyCol), col(tieCol), col(stateCol).as("state"),
        unix_micros(col(tsCol)).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Canonicalize a URL for web-corpus dedup: drop the fragment, lowercase
    * scheme+host (path/query stay case-sensitive), strip `utm_*` tracking
    * params (wherever they sit in the query string), drop a trailing slash.
    * Pure regexp passes in the Java∩RE2 subset so the DuckDB oracle matches
    * byte-for-byte; idempotent (canon(canon(u)) == canon(u)). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val hostLower = concat(
      lower(regexp_extract(noFrag, "^(https?://[^/?]+)", 1)),
      regexp_replace(noFrag, "^https?://[^/?]+", ""))
    val noUtmMid = regexp_replace(hostLower, "&utm_[a-z_]+=[^&]*", "")
    val noUtmLead = regexp_replace(noUtmMid, "\\?utm_[a-z_]+=[^&]*&", "?")
    val noUtmOnly = regexp_replace(noUtmLead, "\\?utm_[a-z_]+=[^&]*$", "")
    // '+' so stacked slashes collapse in one pass (idempotence — pinned by
    // a randomized adversarial property)
    val noSlashQ = regexp_replace(noUtmOnly, "/+\\?", "?")
    regexp_replace(noSlashQ, "/+$", "")
  }

  /** Keep-first dedup by canonical URL: rank within each canonical-url group
    * by id (one Exchange on the canonical key) and flag the keeper. The
    * group sort is bounded by the duplicate multiplicity of one URL —
    * pathological hot URLs are exactly what the cap/observe machinery in
    * [[Skew.capBuckets]] exists for if a corpus needs it. */
  def dedupByCanonicalUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.withColumn("url_canon", canonicalizeUrl(col(urlCol)))
    val w = Window.partitionBy(col("url_canon")).orderBy(col(idCol).asc)
    canon
      .withColumn("rn", row_number().over(w))
      .withColumn("kept", col("rn") === 1)
  }

  /** Quantile binning (feature discretization): interpolated percentiles at
    * ascending `probs` computed in ONE global aggregate, broadcast as a
    * scalar row (the corpus never reshuffles), each row assigned bin
    * 1..probs.length+1 by counting cut points strictly below its value. */
  def withQuantileBin(df: DataFrame, valueCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      expr(s"percentile($valueCol, $p)").as(s"_c$i")
    }
    val cuts = df.agg(aggs.head, aggs.tail: _*)
    val bin = probs.indices.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(valueCol) > col(s"_c$i"), 1).otherwise(0)
    }
    df.crossJoin(broadcast(cuts))
      .withColumn("bin", bin.cast("int"))
      .drop(probs.indices.map(i => s"_c$i"): _*)
  }

  /** [[withQuantileBin]] for money-typed columns at scale: values go
    * through integer cents and the cut row comes from
    * [[Quantiles.exactPercentiles]] (distributed order statistics — no
    * single-reducer value buffer), so the flagship binning path survives a
    * continuous column at 100 TB. Bin comparison happens in cents, which
    * is exact under the BIGINT→DOUBLE promotion (cents < 2^53). */
  def withQuantileBinCents(df: DataFrame, valueCol: String, probs: Seq[Double],
      centsCuts: Option[DataFrame] = None): DataFrame = {
    val cents = df.withColumn("_cents",
      expr(s"CAST(ROUND($valueCol * 100) AS BIGINT)"))
    // centsCuts lets a serve-many caller feed the p0..pk cut row from a
    // session-cached Quantiles.rankedCounts table instead of rebuilding
    // the whole order-statistics pass per query.
    val cuts = centsCuts.getOrElse(Quantiles.exactPercentiles(
      cents.select(col("_cents")), "_cents", probs))
    val bin = probs.indices.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("_cents") > col(s"p$i"), 1).otherwise(0)
    }
    cents.crossJoin(broadcast(cuts))
      .withColumn("bin", bin.cast("int"))
      .drop(probs.indices.map(i => s"p$i"): _*)
      .drop("_cents")
  }

  /** Winsorization: clamp `valueCol` to its [lo, hi] interpolated
    * percentiles (broadcast scalar row). Keeps `_lo`/`_hi` cut columns and
    * clamped_low/clamped_high flags so callers can report clamp mass without
    * a second pass. */
  def winsorize(df: DataFrame, valueCol: String, lo: Double, hi: Double): DataFrame = {
    require(lo < hi, "lo must be below hi")
    val cuts = df.agg(
      expr(s"percentile($valueCol, $lo)").as("_lo"),
      expr(s"percentile($valueCol, $hi)").as("_hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn("clamped_low", col(valueCol) < col("_lo"))
      .withColumn("clamped_high", col(valueCol) > col("_hi"))
      .withColumn(s"${valueCol}_w",
        when(col("clamped_low"), col("_lo"))
          .when(col("clamped_high"), col("_hi"))
          .otherwise(col(valueCol)))
  }

  /** [[winsorize]] on the distributed percentile path (money columns):
    * cuts from [[Quantiles.exactPercentiles]] over integer cents, clamp
    * flags compared in cents (exact), cut columns exposed in value units
    * via one /100.0 (the same IEEE op on any engine). */
  def winsorizeCents(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      centsCuts: Option[DataFrame] = None): DataFrame = {
    require(lo < hi, "lo must be below hi")
    val cents = df.withColumn("_cents",
      expr(s"CAST(ROUND($valueCol * 100) AS BIGINT)"))
    val cuts = centsCuts.getOrElse(Quantiles.exactPercentiles(
      cents.select(col("_cents")), "_cents", Seq(lo, hi)))
    cents.crossJoin(broadcast(cuts))
      .withColumn("clamped_low", col("_cents") < col("p0"))
      .withColumn("clamped_high", col("_cents") > col("p1"))
      .withColumn("_lo", col("p0") / 100.0)
      .withColumn("_hi", col("p1") / 100.0)
      .withColumn(s"${valueCol}_w",
        when(col("clamped_low"), col("_lo"))
          .when(col("clamped_high"), col("_hi"))
          .otherwise(col(valueCol)))
      .drop("p0", "p1", "_cents")
  }

  /** Rolling z-score anomaly flag over the PREVIOUS `lookback` events per
    * key (the current event never sees itself): flags rows whose squared
    * deviation from the trailing mean exceeds `zSq` × the trailing
    * population variance. The money-typed value goes through integer cents,
    * so the test (x·n − S)² > zSq·(n·Q − S²) is exact 64-bit arithmetic —
    * no sqrt, no float accumulation, bit-identical on any engine or
    * partitioning. One Exchange + one Sort on the key.
    *
    * Domain bound (cf. the sub-2^53 split rule in stats_regression_exact):
    * unlike the UNBOUNDED-n regression moments, every term here is capped
    * by the window — the largest is zSq·n·Q ≤ zSq·lookback²·max|cents|²,
    * so with lookback=20, zSq=9 the BIGINTs are exact up to
    * |value| ≈ $0.5M per event. Beyond that, widen cents to DECIMAL. */
  def rollingAnomaly(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, lookback: Int, minPrev: Int, zSq: Int): DataFrame = {
    val fr = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)).asc, col(tieCol).asc)
      .rowsBetween(-lookback, -1)
    val base = df.withColumn("cents", round(col(valueCol) * 100).cast("long"))
    base
      .withColumn("n_prev", count(col("cents")).over(fr))
      .withColumn("s_prev", sum(col("cents")).over(fr))
      .withColumn("q_prev", sum(col("cents") * col("cents")).over(fr))
      .withColumn("dev_sq",
        (col("cents") * col("n_prev") - col("s_prev")) *
          (col("cents") * col("n_prev") - col("s_prev")))
      .withColumn("bound",
        lit(zSq.toLong) * (col("n_prev") * col("q_prev") - col("s_prev") * col("s_prev")))
      .withColumn("is_anomaly",
        col("n_prev") >= minPrev && col("dev_sq") > col("bound"))
  }

  /** Hashing-trick bag-of-words: whitespace tokens → compiled char-hash
    * ([[graft.expressions.PolyHash]]) → `dim` buckets → per-(doc, bucket)
    * term frequency. The sparse (doc, bucket, tf) rows ARE the vector — no
    * dense arrays, no vocabulary build, fixed output width at any corpus
    * size. One explode + one hash aggregate. */
  def hashVectorize(
      docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol),
        (PolyHash.polyHash(col("tok")) % dim).cast("int").as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
}
