package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.ops.{Dedup, Similarity, Skew}

/** Hot-bucket (boilerplate-family) defense for LSH candidate generation.
  *
  * A real web corpus has template families: thousands of documents sharing
  * one band signature, which makes an uncapped bucket self-join quadratic in
  * the family (AQE splits partitions, not a single key group). These tests
  * build a degenerate ≥1000-doc near-identical corpus and pin that every LSH
  * variant emits a candidate count bounded by bands · C(cap, 2).
  */
class DedupSkewSpec extends SparkSpec with SlowSuite {

  private val N = 1200

  /** 1200 near-identical docs: shared boilerplate + a tiny per-doc tail. */
  private def boiler = {
    import spark.implicits._
    (0L until N.toLong).map { i =>
      (i, "terms of service agreement common boilerplate text shared " +
        s"verbatim by every page in this template family revision $i")
    }.toDF("doc_id", "text")
  }

  /** 1200 near-identical 64-dim embeddings: one base direction plus a small
    * deterministic per-doc perturbation (all within a few degrees). */
  private def vecs = {
    import spark.implicits._
    (0L until N.toLong).map { i =>
      val v = Array.tabulate(64) { j =>
        (math.sin(j * 0.7 + 1.0) + 0.001 * ((i * 31 + j) % 7)).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("capBuckets keeps exactly the cap smallest ids per bucket") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 2)).toDF("id", "b")
    val kept = Skew.capBuckets(df, Seq("b"), "id", cap = 10, "cap_test")
    assert(kept.count() === 20)
    // bucket b=0 holds even ids 0..98; the 10 smallest end at 18
    assert(kept.filter(col("b") === 0).agg(max("id")).head.getLong(0) === 18L)
  }

  test("capBuckets surfaces dropped volume through observed metrics") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, 0)).toDF("id", "b") // one bucket of 100
    val kept = Skew.capBuckets(df, Seq("b"), "id", cap = 10, "cap_obs")
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("cap_obs").foreach(r => seen = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      assert(kept.count() === 10)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = seen.getOrElse(fail("observed metrics never delivered"))
      assert(m.getAs[Long]("dropped_rows") === 90L, m)
      assert(m.getAs[Long]("max_bucket") === 100L, m)
    } finally spark.listenerManager.unregister(listener)
  }

  test("minhash LSH pair count bounded under a 1200-doc boilerplate family") {
    val cap = 16
    val n = Dedup.minhashLshPairs(boiler, "doc_id", "text",
      n = 3, threshold = 0.5, maxBucket = cap).count()
    val bound = Hashing.Bands.toLong * cap * (cap - 1) / 2
    assert(n > 0, "capped LSH must still find pairs inside kept buckets")
    assert(n <= bound, s"$n candidate pairs exceed bands*C(cap,2) = $bound")
  }

  test("simhash pair count bounded under a 1200-doc boilerplate family") {
    val cap = 16
    val maxHamming = 3 // 4 blocks
    val n = Dedup.simhashPairs(boiler, "doc_id", "text",
      maxHamming, maxBucket = cap).count()
    val bound = (maxHamming + 1).toLong * cap * (cap - 1) / 2
    assert(n > 0, "capped simhash must still find pairs inside kept buckets")
    assert(n <= bound, s"$n candidate pairs exceed blocks*C(cap,2) = $bound")
  }

  test("containment df-drop yields zero pairs (and zero blow-up) on a pure boilerplate family") {
    // Every shared shingle appears in all 1200 docs — far over the df
    // threshold — so the informative dictionary is empty except each doc's
    // unique tail, and the candidate join degenerates to nothing instead of
    // 1200²/2 pairs. Pure-template families are exact/minhash dedup's job;
    // containment owns informative (rare-shingle) overlap only.
    val pairs = Dedup.containmentPairs(boiler, "doc_id", "text",
      n = 3, threshold = 0.5, maxDf = 16)
    assert(pairs.count() === 0)
  }

  test("containment df-drop still pairs a quoted doc against mostly-fresh text") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val d = Seq(
      (0L, quote),                                                  // the quoted source
      (1L, quote + " " + (1 to 40).map(i => s"f$i").mkString(" ")), // quotes 0 inside fresh text
      (2L, (1 to 30).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((0L, 1L)))
    assert(got.head._3 === 1.0) // every informative shingle of 0 is inside 1
  }

  test("SRP LSH pair count bounded under a 1200-vector near-identical family") {
    val cap = 16
    val n = Similarity.srpPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, dims = 64, maxBucket = cap).count()
    val bound = Similarity.SrpBands.toLong * cap * (cap - 1) / 2
    assert(n > 0, "capped SRP must still find pairs inside kept buckets")
    assert(n <= bound, s"$n candidate pairs exceed bands*C(cap,2) = $bound")
  }

  test("exact ngram-Jaccard: uncapped is quadratic BY DEFINITION; cap bounds it") {
    // The exact pair relation over a B-clone family IS C(B,2) rows — the 10×
    // ScaleSweep measured exactly this (256 → 250,600 true pairs under 10×
    // replication). maxBucket applies the LSH family's capped candidate
    // generation when upstream exact dedup can't collapse the family first;
    // since round 6 the cap IS the op's default (boundedness default,
    // exactness opt-in). Dropped volume must surface through the observed
    // `ngram_bucket_cap` metric — silent truncation is the one sin worse
    // than truncation.
    val cap = 16
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("ngram_bucket_cap").foreach(r => seen = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val n =
      try {
        val c = Dedup.ngramJaccardPairs(boiler, "doc_id", "text",
          n = 2, threshold = 0.5, bucketWidth = 16, maxBucket = cap).count()
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
        c
      } finally spark.listenerManager.unregister(listener)
    // each doc emits 2 bucket keys {b, b+1} → ≤ 2 kept buckets of `cap`
    val bound = 2L * cap * (cap - 1) / 2
    assert(n > 0, "capped ngram must still find pairs inside kept buckets")
    assert(n <= bound, s"$n pairs exceed 2*C(cap,2) = $bound")
    val m = seen.getOrElse(fail("ngram_bucket_cap metrics never delivered"))
    assert(m.getAs[Long]("dropped_rows") > 0L,
      s"a 1200-doc clone family over cap=$cap must observe drops: $m")
  }

  test("broadcastIfBounded: broadcasts under the bound, shuffle plan above it") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val small = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probe = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "id")
    // Under the bound: the measured size marks the side broadcast (the
    // hint is in the analyzed plan, independent of the planner's own
    // threshold choices).
    assert(probe.join(Skew.broadcastIfBounded(small), "k")
      .queryExecution.analyzed.toString.contains("ResolvedHint"))
    // Bound of 0 bytes: handed back UNTOUCHED (reference-equal) — the
    // planner keeps whatever path it would pick anyway (the honest
    // over-bound/100 TB case adds no hint).
    assert(Skew.broadcastIfBounded(small, maxBytes = 0L) eq small)
    small.unpersist()
  }

  test("editDistancePairs verify join runs broadcast at measured-small scale") {
    // The fix this pins: blocking keys are low-entropy, so the capped-AQE
    // session would otherwise shuffle the verify join on them and serialize
    // whole blocks behind single reducers (measured 6x at the 10x replica).
    val titles = boiler.limit(200)
    val pairs = Dedup.editDistancePairs(titles, "doc_id", "text", maxDist = 8,
      blockOn = t => Seq(split(t, " ").getItem(0),
        floor(length(t) / lit(8)).cast("long")))
    val p = pairs.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("blocked Levenshtein: block cap bounds a clone family's pair count") {
    val cap = 16
    val titles = boiler.select(col("doc_id"),
      substring(col("text"), 1, 40).as("t")) // identical 40-char prefixes
    val n = Dedup.editDistancePairs(titles, "doc_id", "t", maxDist = 8,
      blockOn = t => Seq(split(t, " ").getItem(0),
        floor(length(t) / lit(8)).cast("long")),
      maxBlock = cap).count()
    val bound = cap.toLong * (cap - 1) / 2 // one (token, len-bucket) block
    assert(n > 0, "capped lev must still find pairs inside the kept block")
    assert(n <= bound, s"$n pairs exceed C(cap,2) = $bound")
  }

  test("jaroWinklerPairs: block cap bounds a clone family's pair count") {
    val cap = 16
    val titles = boiler.select(col("doc_id"),
      substring(col("text"), 1, 40).as("t")) // identical 40-char prefixes
    val n = Dedup.jaroWinklerPairs(titles, "doc_id", "t", threshold = 0.9,
      blockOn = t => Seq(split(t, " ").getItem(0)),
      maxBlock = cap).count()
    val bound = cap.toLong * (cap - 1) / 2 // one first-token block
    assert(n > 0, "capped jw must still find pairs inside the kept block")
    assert(n <= bound, s"$n pairs exceed C(cap,2) = $bound")
  }
}
