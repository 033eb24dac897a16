package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing._

/** Document deduplication operators for large-scale training-data pipelines.
  * Absent from the reference (its scalar surface is comparisons + arithmetic,
  * SURVEY.md §2.7); designed Spark-first for 100 TB:
  *
  *   - every variant is candidate-generation-by-EQUI-JOIN (hash shuffle on a
  *     compact key: text hash, LSH band signature, simhash byte, length
  *     bucket, cluster label) followed by an exact verify on the candidate
  *     pairs only — never an all-pairs cross join;
  *   - no driver-side state, no collect(); skewed buckets are AQE's problem;
  *   - hash arithmetic comes from [[graft.functions.Hashing]] so results are
  *     engine-portable (DuckDB-oracle-checkable), at the cost of running as
  *     Catalyst higher-order functions rather than codegen'd built-ins. At
  *     production scale you'd swap `polyHash` for `xxhash64` (one line) —
  *     the plan shape (shuffle keys, join structure) is identical.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `tieBreak` per distinct
    * `key`. At 100 TB dedup on a long text column should key on a digest
    * instead — pass e.g. `xxhash64(text)`.
    *
    * min_by PARTIAL AGGREGATE, not a row_number window (round 17, guide
    * §2.3 "aggregate before you shuffle"): the window form shuffled EVERY
    * row to its key's partition and sorted it; the aggregate collapses
    * map-side to one candidate row per (key × input partition), so the
    * exchange carries |keys| rows, not |corpus|. Callers pass a UNIQUE
    * tieBreak (doc_id), so min_by picks exactly the window's first row. */
  def exactKeepFirst(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key)
      .agg(min_by(struct(cols.map(col): _*), tieBreak).as("_r"))
      .select(cols.map(c => col(s"_r.$c")): _*)
  }

  /** Shingle sets in hashed (BIGINT) space: Jaccard over hashes is the
    * standard trick — set ops on longs are far cheaper than on strings, and
    * since both engines run the identical polynomial recurrences, the oracle
    * agrees exactly (collisions, if any, collapse identically).
    *
    * Two-level: tokens are char-hashed ONCE ([[graft.expressions.PolyHash]],
    * one linear pass each), then each window folds its n token hashes with
    * an unrolled integer recurrence ([[Hashing.windowFoldSpark]]). The
    * round-4 profile caught the earlier one-level design (build the window
    * STRING, char-hash it) costing 17 s at sf0.1 for w=20 spans — per-window
    * work scaled with n · token length instead of n.
    *
    * Output: idCol, `s` (SORTED array of distinct hashes — sorted once per
    * doc so pair verification can merge-intersect). */
  def hashedShingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    import graft.expressions.PolyHash.polyHash
    import graft.expressions.WindowFold.windowFold
    docs
      .select(col(idCol), expr(s"split($textCol, ' ')").as("w"))
      .filter(expr(s"size(w) >= $n"))
      .select(col(idCol), transform(col("w"), t0 => polyHash(t0)).as("th"))
      .select(col(idCol), windowFold(col("th"), n).as("s"))
  }

  /** Default per-(band, signature) bucket cap for LSH candidate generation —
    * high enough that no honest test corpus is touched, low enough that a
    * boilerplate family of B docs costs O(B) (the capping sort) instead of
    * O(B²) (the bucket join). Tune per corpus at scale. */
  val LshMaxBucket = 4096

  /** MinHash+LSH near-dup pairs: shingle → polyhash → 32 minhashes → 8 band
    * signatures → equi-join on (band, sig) → exact Jaccard ≥ `threshold`.
    * Buckets over `maxBucket` members are sub-sampled (smallest ids kept,
    * dropped volume observed — [[Skew.capBuckets]]) so one boilerplate
    * family cannot make the band join quadratic.
    * Output: d1, d2, jacc — one row per near-dup pair, d1 < d2. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxBucket: Int = LshMaxBucket): DataFrame = {
    // The hashed sets feed three plan branches (minhash explode + both sides
    // of the verify join); persist so tokenize+shingle+hash runs once. The
    // repartition matters: downstream joins are all broadcasts (no exchange),
    // so without it the verify stage would inherit the file-scan partitioning
    // — possibly one task for a small-file corpus. Tracked (lazy persist, the
    // op can't know when its consumer is done) — see [[CacheRegistry]].
    val sh = CacheRegistry.track(hashedShingleSets(docs, idCol, textCol, n)
      .repartition(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    val bands = Skew.capBuckets(
      minhashBandSignatures(sh, idCol),
      Seq("band", "sig"), idCol, maxBucket, "lsh_minhash_cap")

    val cand = bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .distinct()

    verifyJaccard(cand, sh, idCol, threshold)
  }

  /** LSH band signatures from hashed shingle sets: explode shingle hashes
    * and compute the 32 minhashes as hash-aggregate MINs — whole-stage-
    * codegen'd with map-side partial aggregation, instead of 32 interpreted
    * higher-order array passes per document. Output: idCol, band, sig —
    * the equi-join key space for candidate generation, and the exact layout
    * a persisted dedup INDEX stores at production scale.
    * UNCAPPED: callers apply [[Skew.capBuckets]] per join side. */
  def minhashBandSignatures(sh: DataFrame, idCol: String): DataFrame = {
    val hx = sh.select(col(idCol), explode(col("s")).as("h"))
    val mins = hx.groupBy(col(idCol)).agg(
      min(expr(s"(${A(0)}*h + ${B(0)}) % $P")).as("m0"),
      (1 until NumHashes).map(i =>
        min(expr(s"(${A(i)}*h + ${B(i)}) % $P")).as(s"m$i")): _*)

    val bandStructs = (0 until Bands)
      .map { b =>
        val sig = combine((b * RowsPerBand until (b + 1) * RowsPerBand).map(i => s"m$i"))
        s"named_struct('band', $b, 'sig', $sig)"
      }
      .mkString("array(", ", ", ")")
    mins
      .select(col(idCol), explode(expr(bandStructs)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Incremental (batch-vs-corpus) MinHash dedup — the shape a daily 100 TB
    * ingest actually runs: the accumulated corpus is NOT re-deduped; only the
    * new batch is shingled, and its band signatures probe the corpus index.
    *
    * Scale contract: the history side never shuffles. Candidate generation
    * broadcasts the (tiny) batch signatures into a scan of the history index,
    * and the Jaccard verify broadcasts the batch-side candidate shingle sets
    * into a scan of the history shingle sets. At production scale `history`'s
    * signatures and shingle sets are precomputed artifacts of previous runs
    * (exactly [[minhashBandSignatures]] / [[hashedShingleSets]] output);
    * here they are derived inline from the text.
    *
    * A batch doc is `dup_of_history` when some history doc has Jaccard ≥
    * `threshold`, and `dup_in_batch` when some EARLIER batch doc (smaller id)
    * does — earlier regardless of that doc's own dup flags, the one-pass
    * deterministic convention (greedy keep-first would be order-sequential).
    * Output: idCol, dup_of_history, dup_in_batch, kept — one row per batch
    * doc, kept = neither flag. */
  def incrementalMinhashDedup(
      history: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxBucket: Int = LshMaxBucket): DataFrame = {
    // Deliberately NOT persisted, although each side feeds two plan
    // branches: the cache manager matches by canonicalized PLAN, so a
    // persisted read of a corpus path that gains files between invocations
    // (exactly what the streaming sink does every microbatch) silently
    // serves the STALE previous snapshot — batch 2 would never see batch
    // 1's kept docs. Recomputing the (compiled, cheap) shingle pipeline
    // twice is the correct trade; at production scale both sides' shingle
    // sets and band signatures are precomputed artifacts
    // ([[writeDedupIndex]] / [[incrementalMinhashDedupPersisted]]), not
    // inline recomputation.
    val shH = hashedShingleSets(history, idCol, textCol, n)
    val bandsH = Skew.capBuckets(minhashBandSignatures(shH, idCol),
      Seq("band", "sig"), idCol, maxBucket, "lsh_inc_hist_cap")
    incrementalMinhashCore(shH, bandsH, batch, idCol, textCol, n, threshold,
      maxBucket)
  }

  /** Persist the corpus-side MinHash dedup index — the artifact a daily
    * ingest probes instead of re-shingling its whole history: the hashed
    * shingle sets (the verify side) and the capped band signatures (the
    * candidate side), both plain columnar tables keyed by the doc id. After
    * each ingest the kept batch's rows are APPENDED to both tables (same
    * schemas), so the index grows incrementally with the corpus. */
  def writeDedupIndex(history: DataFrame, idCol: String, textCol: String,
      n: Int, path: String, maxBucket: Int = LshMaxBucket): Unit = {
    val sh = hashedShingleSets(history, idCol, textCol, n)
    sh.write.mode("overwrite").option("compression", "zstd").parquet(s"$path/shingles")
    // Derive the band table from the WRITTEN shingles: the artifacts stay
    // mutually consistent and the text pipeline runs exactly once.
    val shBack = history.sparkSession.read.parquet(s"$path/shingles")
    Skew.capBuckets(minhashBandSignatures(shBack, idCol),
        Seq("band", "sig"), idCol, maxBucket, "lsh_index_cap")
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$path/bands")
  }

  /** [[incrementalMinhashDedup]] against a [[writeDedupIndex]] artifact —
    * the SERVING shape: only the (small) batch is shingled at probe time;
    * the history side streams from the precomputed index and never
    * shuffles. Results are identical to the inline variant over the same
    * history, so the same oracle checks both. */
  def incrementalMinhashDedupPersisted(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxBucket: Int = LshMaxBucket): DataFrame =
    incrementalMinhashCore(
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/bands"),
      batch, idCol, textCol, n, threshold, maxBucket)

  /** Shared probe core: history arrives as precomputed (or inline-derived)
    * shingle + band tables; the batch is shingled here. */
  private def incrementalMinhashCore(
      shH: DataFrame, bandsH: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      n: Int, threshold: Double, maxBucket: Int): DataFrame = {
    import graft.expressions.IntersectSize.intersectSize
    val shB = hashedShingleSets(batch, idCol, textCol, n)
      .repartition(col(idCol))
    val bandsB = Skew.capBuckets(minhashBandSignatures(shB, idCol),
      Seq("band", "sig"), idCol, maxBucket, "lsh_inc_batch_cap")

    def verified(cand: DataFrame, shRight: DataFrame): DataFrame = {
      // cand carries the batch-side shingles (batch-sized → broadcast);
      // the right side streams past it un-shuffled.
      val withS1 = cand
        .join(shB.select(col(idCol).as("d1"), col("s").as("s1")), "d1")
      shRight.select(col(idCol).as("d2"), col("s").as("s2"))
        .join(broadcast(withS1), "d2")
        .withColumn("ni", intersectSize(col("s1"), col("s2")))
        .withColumn("jacc", expr("CAST(ni AS DOUBLE) / (size(s1) + size(s2) - ni)"))
        .filter(col("jacc") >= threshold)
    }

    // Batch-vs-history: broadcast batch signatures, scan the history index.
    val candH = bandsH.as("h")
      .join(broadcast(bandsB.as("b")),
        col("b.band") === col("h.band") && col("b.sig") === col("h.sig"))
      .select(col(s"b.$idCol").as("d1"), col(s"h.$idCol").as("d2"))
      .distinct()
    val dupHist = verified(candH, shH).select(col("d1").as(idCol)).distinct()
      .withColumn("_dh", lit(true))

    // Within-batch: standard LSH self-join on the (small) batch only.
    val candB = bandsB.as("l")
      .join(bandsB.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .distinct()
    val dupBatch = verified(candB, shB).select(col("d2").as(idCol)).distinct()
      .withColumn("_db", lit(true))

    batch.select(col(idCol))
      .join(broadcast(dupHist), Seq(idCol), "left")
      .join(broadcast(dupBatch), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_dh"), lit(false)).as("dup_of_history"),
        coalesce(col("_db"), lit(false)).as("dup_in_batch"),
        (coalesce(col("_dh"), lit(false)) === false &&
          coalesce(col("_db"), lit(false)) === false).as("kept"))
  }

  /** Exact n-gram Jaccard near-dup pairs with length-bucket blocking: docs
    * only pair if their token counts fall in the same or adjacent bucket of
    * `bucketWidth` tokens (each doc emits buckets {b, b+1}; a pair within
    * `bucketWidth` tokens of each other shares one). Equi-join on the bucket,
    * exact Jaccard on candidates. The scalable-but-exact baseline beside
    * [[minhashLshPairs]].
    *
    * Boundedness caveat (measured by the 10× ScaleSweep): the EXACT pair
    * relation is itself quadratic in duplicate-family size — a family of B
    * mutual near-dups IS B(B−1)/2 true pairs, so no plan can emit it in less
    * than quadratic output. Production pipelines run exact/content-hash
    * dedup BEFORE near-dup mining precisely to collapse clone families; when
    * that's not enough, `maxBucket` applies the same capped candidate
    * generation as the LSH family ([[Skew.capBuckets]], observed drops under
    * `ngram_bucket_cap`) at the documented recall trade. The default is
    * CAPPED at [[LshMaxBucket]] — at 100 TB an uncapped exact miner over a
    * boilerplate family is a scale-killer, so boundedness is the default and
    * exactness the opt-in (`maxBucket = Int.MaxValue`; the conformance suite
    * carries both rows, `dedup_ngram_jaccard` / `dedup_ngram_jaccard_exact`).
    * The cap is deterministic (smallest ids kept per bucket), so capped
    * results remain oracle-checkable.
    *
    * API note: the capped default is a BEHAVIORAL change from the original
    * uncapped signature (recall loss above the cap, silent for callers that
    * relied on exactness). Callers needing the exact relation must opt in
    * explicitly with `maxBucket = Int.MaxValue` — the conformance suite
    * carries both shapes, so neither can regress unnoticed. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, bucketWidth: Int,
      maxBucket: Int = LshMaxBucket): DataFrame = {
    // Three plan branches (bucket keys + both verify sides) → persist; the
    // repartition spreads the broadcast-join-only verify stage across cores
    // (see minhashLshPairs). Tracked for session release ([[CacheRegistry]]).
    val sh = CacheRegistry.track(hashedShingleSets(docs, idCol, textCol, n)
      .repartition(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val withB0 = sh
      .select(col(idCol), size(col("s")).as("n"),
        expr(s"CAST(floor(size(s) / $bucketWidth) AS BIGINT)").as("b"))
      .select(col(idCol), col("n"), col("b"), explode(expr("array(b, b + 1)")).as("bk"))
    val withB =
      if (maxBucket == Int.MaxValue) withB0
      else
        // The cap window hash-partitions the key table on bk — a LOW-ENTROPY
        // key (a handful of populated length buckets), unlike the LSH
        // family's (band, sig). Left alone, the streamed side of the pair
        // join inherits that partitioning, and the O(pairs) IntersectSize
        // verify serializes behind the few hot-bucket tasks (measured at
        // sf0.1: 9.9 s vs the uncapped plan's 0.9 s for IDENTICAL candidate
        // sets — the cap doesn't even fire there). Spread the tiny capped
        // key table back over the id BEFORE the quadratic explosion. The
        // partition count must be EXPLICIT: a bare repartition(col) of a
        // ~10k-row table is coalesced by AQE to ONE partition, which
        // re-serializes everything downstream (measured 12.2 s).
        Skew.capBuckets(withB0, Seq("bk"), idCol, maxBucket, "ngram_bucket_cap")
          .repartition(
            docs.sparkSession.sessionState.conf.numShufflePartitions,
            col(idCol))
    // Size pre-filter: Jaccard >= t forces |s_small| >= t·|s_big|. Pairs in
    // the same base bucket would match on BOTH emitted keys; keeping only the
    // smallest shared key (= greatest base bucket) emits each pair exactly
    // once without a shuffle-distinct.
    val cand = withB.as("l")
      .join(withB.as("r"),
        col("l.bk") === col("r.bk") && col(s"l.$idCol") < col(s"r.$idCol") &&
          col("l.bk") === greatest(col("l.b"), col("r.b")) &&
          expr(s"CAST(least(l.n, r.n) AS DOUBLE) >= $threshold * greatest(l.n, r.n)"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
    verifyJaccard(cand, sh, idCol, threshold)
  }

  /** SimHash near-dup pairs: 32-bit simhash over token hashes, blocked by
    * splitting the hash into `maxHamming + 1` bit-blocks — by pigeonhole, a
    * pair within the Hamming budget must agree on at least one whole block,
    * so an equi-join on (block index, block value) finds every such pair.
    * Fewer, wider blocks = higher-entropy join keys = less candidate fan-out
    * (the deciding factor on low-entropy corpora). Verified by exact Hamming
    * distance ≤ `maxHamming`. Output: d1, d2, ham. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      maxBucket: Int = LshMaxBucket): DataFrame = {
    val nBlocks = maxHamming + 1
    require(32 % nBlocks == 0, s"32-bit simhash must split evenly into $nBlocks blocks")
    val bits = 32 / nBlocks
    val mask = (1L << bits) - 1

    // Explode tokens (multiplicity preserved) and compute the 32 per-bit
    // ±1 sums as codegen'd hash aggregates — one pass over the tokens with
    // map-side combine, instead of 32 interpreted array passes per document.
    val th = docs
      .select(col(idCol), explode(expr(s"split($textCol, ' ')")).as("tok"))
      .select(col(idCol), graft.expressions.PolyHash.polyHash(col("tok")).as("h"))
    val bitSums = th.groupBy(col(idCol)).agg(
      sum(expr("(shiftright(h, 0) & 1)*2 - 1")).as("b0"),
      (1 until 32).map(b =>
        sum(expr(s"(shiftright(h, $b) & 1)*2 - 1")).as(s"b$b")): _*)
    val shExpr = (0 until 32)
      .map(b => s"IF(b$b > 0, ${1L << b}, 0)").mkString(" + ")
    val sim = bitSums.select(col(idCol), expr(s"CAST($shExpr AS BIGINT)").as("sh"))

    // Hot-block cap: a boilerplate family shares whole simhash values, so a
    // single (k, blk) bucket would make the block join quadratic. Capping
    // weakens the pigeonhole guarantee ONLY inside overflow buckets (a pair
    // capped out of block k but co-kept in block k' is still rejected by the
    // first-match filter when their block-k values agree) — the drop is
    // deliberately concentrated on the degenerate family.
    // Persisted: both join sides reference it, and the measured broadcast
    // below needs its true cached size (tracked — [[CacheRegistry]]).
    val keyed = CacheRegistry.track(Skew.capBuckets(
      sim.select(col(idCol), col("sh"),
        explode(expr(s"transform(sequence(0, ${nBlocks - 1}), " +
          s"k -> named_struct('k', k, 'blk', shiftright(sh, k*$bits) & $mask))")).as("kb"))
        .select(col(idCol), col("sh"), col("kb.k").as("k"), col("kb.blk").as("blk")),
      Seq("k", "blk"), idCol, maxBucket, "lsh_simhash_cap")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

    // A pair matching on several blocks would be emitted once per block;
    // keeping only the FIRST matching block (all earlier blocks differ)
    // emits each pair exactly once — cheap bit arithmetic instead of a
    // shuffle-distinct over all candidate pairs.
    val firstMatch = expr((1 until nBlocks).foldLeft("l.k = 0") { (acc, k0) =>
      val diffs = (0 until k0)
        .map(j => s"(shiftright(l.sh, ${j * bits}) & $mask) <> (shiftright(r.sh, ${j * bits}) & $mask)")
        .mkString(" AND ")
      s"$acc OR (l.k = $k0 AND $diffs)"
    })

    keyed.as("l")
      .join(Skew.broadcastIfBounded(keyed.as("r")),
        col("l.k") === col("r.k") && col("l.blk") === col("r.blk") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .filter(firstMatch)
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"),
        expr(hammingSpark("l.sh", "r.sh")).as("ham"))
      .filter(col("ham") <= maxHamming)
  }

  /** Containment near-dup pairs — the one-sided overlap symmetric Jaccard
    * misses: a short doc quoted wholesale inside a long one has tiny Jaccard
    * (union is dominated by the long doc) but containment |A∩B|/|A| ≈ 1.
    *
    * Candidate generation is rare-shingle prefix filtering: a shingle
    * appearing in more than `maxDf` docs is boilerplate — it carries no
    * discriminative pair information, and its bucket join would cost df²
    * rows — so it is DROPPED from the dictionary entirely (volume observed
    * via `containment_df_drop`). The pair-count aggregate over the
    * surviving inverted index IS the intersection size, and containment is
    * measured within the informative dictionary: c1 = |A∩B∩D| / |A∩D|.
    * Two hash shuffles (df count, pair count), join work bounded by
    * Σ_{df≤maxDf} df² — never all-pairs, never quadratic in a boilerplate
    * family (a pure-template family shares only dropped shingles and
    * simply produces no pairs; exact/minhash dedup owns that case).
    * Output: d1, d2, ni, c1, c2; pairs with max(c1, c2) ≥ `threshold`. */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxDf: Int = 64): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The postings table persists PRE-PARTITIONED on the shingle hash:
    // every consumer keys on h — the df count (groupBy h), the dictionary
    // prune (join on h), and the pair self-join — so ONE explicit exchange
    // at build time replaces three downstream ones, and `kept` (a filter +
    // project of the join) inherits the distribution into its own cache.
    // The shuffle_hash hints matter for scale, not speed: left to AQE, the
    // r7 plan put the WHOLE cached postings table under the broadcast
    // threshold and broadcast the inverted index for both joins —
    // tolerable at sf0.1, an OOM plan at corpus scale (the build side
    // grows with the corpus, not with a bounded dimension). Pinned
    // co-partitioned, the only exchange in pair generation is the
    // (d1, d2) count aggregate's.
    val inv = CacheRegistry.track(hashedShingleSets(docs, idCol, textCol, n)
      .select(col(idCol), explode(col("s")).as("h"))
      .repartition(docs.sparkSession.sessionState.conf.numShufflePartitions,
        col("h"))
      .persist(MEMORY_AND_DISK))
    val dfc = inv.groupBy(col("h")).agg(count(lit(1)).as("dfh"))
    val kept = inv.join(dfc.hint("shuffle_hash"), "h")
      .observe("containment_df_drop",
        sum(when(col("dfh") > maxDf, lit(1L)).otherwise(lit(0L))).as("dropped_postings"),
        max(col("dfh")).as("max_df"))
      .filter(col("dfh") <= maxDf)
      .select(col(idCol), col("h"))
      .persist(MEMORY_AND_DISK)
    CacheRegistry.track(kept)
    // ns is one row per doc — bounded by the corpus, NOT by a dimension, so
    // its two pair-side joins go through the measured broadcast gate: under
    // the bound it broadcasts (local scale), over it the shuffle plan
    // stands (the 100 TB case — blindly broadcasting |corpus| rows OOMs).
    val ns = CacheRegistry.track(kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("ns")).persist(MEMORY_AND_DISK))
    val nsJ = Skew.broadcastIfBounded(ns)
    val pairs = kept.as("l").hint("shuffle_hash")
      .join(kept.as("r").hint("shuffle_hash"),
        col("l.h") === col("r.h") && col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .agg(count(lit(1)).as("ni"))
    pairs
      .join(nsJ.select(col(idCol).as("d1"), col("ns").as("n1")), "d1")
      .join(nsJ.select(col(idCol).as("d2"), col("ns").as("n2")), "d2")
      .select(col("d1"), col("d2"), col("ni"),
        (col("ni").cast("double") / col("n1")).as("c1"),
        (col("ni").cast("double") / col("n2")).as("c2"))
      .filter(greatest(col("c1"), col("c2")) >= threshold)
  }

  /** Duplicated-span detection — token-window-granular exact dedup (the
    * scalable form of substring dedup): a `w`-token window whose rolling
    * hash appears in ≥ 2 distinct docs is a duplicated span; docs are
    * scored by the fraction of their windows that are duplicated (the
    * trim-or-drop signal for boilerplate and cross-doc template text).
    *
    * One shuffle builds the span inventory (hash → distinct-doc count); the
    * duplicated-span DICTIONARY (spans in ≥ 2 docs — tiny vs the corpus) is
    * broadcast back over the postings, so the corpus never shuffles twice —
    * the [[Corpus.decontaminate]] shape applied doc-vs-corpus instead of
    * doc-vs-benchmark. Output: idCol, n_spans, n_dup_spans, dup_frac for
    * every doc of ≥ `w` tokens. */
  def duplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Within-doc-distinct span hashes; both the inventory and the scoring
    // pass scan them, so the tokenize+hash pipeline materializes once.
    val sp = CacheRegistry.track(hashedShingleSets(docs, idCol, textCol, w)
      .select(col(idCol), size(col("s")).as("n_spans"), explode(col("s")).as("h"))
      .persist(MEMORY_AND_DISK))
    val dupDict = sp.groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs")) // hashes are per-doc distinct → count = doc count
      .filter(col("n_docs") >= 2)
      .select(col("h"), lit(1L).as("_dup"))
    sp.join(broadcast(dupDict), Seq("h"), "left")
      .groupBy(col(idCol), col("n_spans"))
      .agg(sum(coalesce(col("_dup"), lit(0L))).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        (col("n_dup_spans").cast("double") / col("n_spans")).as("dup_frac"))
  }

  /** Embedding near-dup pairs within a coarse partition (IVF-style: `byCol`
    * is the cluster/label column, so the self-join shuffles on it instead of
    * exploding all-pairs): exact cosine ≥ `threshold` on candidates.
    * Output: v1, v2, partition col, cos. */
  def cosinePairs(
      vecs: DataFrame, idCol: String, vecCol: String, byCol: String,
      threshold: Double): DataFrame = {
    import graft.expressions.DotProduct.dot
    // Norms once per vector (|V| rows), not three dot products per pair.
    val v = vecs.select(col(idCol), col(byCol), col(vecCol),
      Similarity.norm(col(vecCol)).as("nrm"))
    v.as("l").join(v.as("r"),
        col(s"l.$byCol") === col(s"r.$byCol") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("v1"), col(s"r.$idCol").as("v2"),
        col(s"l.$byCol").as(byCol),
        (dot(col(s"l.$vecCol"), col(s"r.$vecCol")) / (col("l.nrm") * col("r.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Connected components over near-dup pairs: label-propagation-to-min
    * (each node repeatedly adopts the smallest id reachable through its
    * neighbors) until fixpoint — the standard distributed CC formulation
    * (HashToMin-style). Converges in O(component diameter) rounds; near-dup
    * components are tiny, so a handful. Each round is one equi-join + one
    * aggregation; the driver sees only a change-count scalar per round.
    * Output: (idCol, component) for every node, component = min id of its
    * near-dup cluster (itself when unpaired) — the canonical-document
    * assignment that completes a dedup pipeline. */
  def connectedComponents(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      maxIter: Int = 25, checkpointEvery: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(MEMORY_AND_DISK)
    // Materialize the (expensive) edge pipeline once, before the loop: every
    // round then joins the cached symmetric edge list, and AQE sees its true
    // size when picking broadcast vs shuffle for the per-round join.
    sym.count()

    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .persist(MEMORY_AND_DISK)
    // comp only ever decreases (adopt-the-min), so the label set changed
    // iff Σcomp decreased — convergence is a one-scalar aggregate over the
    // cached labels instead of a full self-join diff per round.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Adopt the min over {self} ∪ neighbors, as union + min-agg: one
      // equi-join + one aggregation per round, no left join, no diff join.
      val neighborMin = sym.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(neighborMin)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .persist(MEMORY_AND_DISK)
      val s = labelSum(next)
      labels.unpersist()
      // The per-round persist dedupes work but leaves the LOGICAL plan
      // growing linearly with rounds — a driver-side planning/stack risk at
      // high round counts. localCheckpoint every N rounds rebases the plan
      // on the already-cached blocks (a cheap cache-read job) and truncates
      // the lineage; executor-local blocks suffice on a stable cluster
      // (reliable checkpoint() is the lose-an-executor-safe variant).
      labels =
        if ((i + 1) % checkpointEvery == 0) {
          val ck = next.localCheckpoint(); next.unpersist(); ck
        } else next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      i += 1
    }
    sym.unpersist()
    // Hand back a lineage-free result and release the loop's last cache —
    // callers re-cache if they fan out (e.g. the session component cache);
    // nothing stays pinned by the op itself.
    val out = labels.localCheckpoint()
    labels.unpersist()
    out.select(col("id").as(idCol), col("comp").as("component"))
  }

  /** Semi-supervised label propagation over an undirected edge set: seeded
    * nodes keep their label forever; each synchronous round every unseeded
    * node adopts the most frequent label among its currently-labeled
    * neighbors (tie → smallest label, so rounds are deterministic on any
    * partitioning). Fixed `rounds` count — LPA has no monotone convergence
    * scalar, so a fixed horizon is the deterministic choice. Per round: one
    * equi-join against the cached symmetric edges + two hash aggregates
    * (count per (node, label), then lexicographic-min of (-count, label));
    * state is one row per node, like [[connectedComponents]].
    *
    * Loop shape (round-5 rework, ~2× over the eager original): LPA needs no
    * per-round convergence scalar, so rounds CHAIN LAZILY — no count barrier
    * per round. A round's state is lazily persisted (it feeds two plan
    * branches of the next round: the neighbor join and the carry-forward),
    * and every `checkpointEvery` rounds — plus once at the end — the chain is
    * cut with an EAGER localCheckpoint: one job materializes the rounds since
    * the last cut, truncates the logical plan to a cached-RDD scan (bounded
    * plan depth at any round count — pinned by `IterativePlanSpec`), and the
    * intermediate caches are released. */
  def labelPropagation(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      seeds: DataFrame, labelCol: String, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Lazy persist, NOT eagerly counted: the first checkpoint job
    // materializes the blocks anyway, so an up-front count() is a pure
    // extra job launch at serve time; at scale round jobs dominate either
    // way. Cadence stays 2 — an A/B at cadence 3 measured SLOWER serves
    // (3.5 s vs 1.9 s solo at sf0.1): letting three lazily-persisted
    // rounds chain into one job duplicates branch evaluation and deepens
    // the plan Catalyst must re-optimize, costing more than the extra
    // materialization job saves. Frequent truncation is load-bearing for
    // latency, not just for plan depth (IterativePlanSpec pins 15 rounds).
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(MEMORY_AND_DISK)
    var labels = nodes.select(col(idCol).as("id"))
      .join(seeds.select(col(idCol).as("id"), col(labelCol).as("label")),
        Seq("id"), "left")
      .withColumn("seeded", col("label").isNotNull)
    var pending = List.empty[DataFrame]
    for (r <- 1 to rounds) {
      val nbr = sym.join(labels.filter(col("label").isNotNull),
          col("dst") === col("id"))
        .select(col("src").as("id"), col("label"))
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("id"))
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("b"))
        .select(col("id"), col("b.l").as("nbr_label"))
      val next = labels.join(nbr, Seq("id"), "left")
        .withColumn("label", when(col("seeded"), col("label"))
          .otherwise(coalesce(col("nbr_label"), col("label"))))
        .select("id", "label", "seeded")
      labels =
        if (r % checkpointEvery == 0 || r == rounds) {
          val ck = next.localCheckpoint() // eager: materialize + cut lineage
          pending.foreach(_.unpersist()); pending = Nil
          ck
        } else {
          // Lazy persist: dedupes this round's two references in the next
          // round's plan when the next checkpoint job evaluates them.
          val p = next.persist(MEMORY_AND_DISK)
          pending ::= p
          p
        }
    }
    sym.unpersist()
    labels.select(col("id").as(idCol), col("label"), col("seeded"))
  }

  /** Multi-source BFS hop distance over the symmetric near-dup graph:
    * `dist` = hops to the nearest seed (0 at seeds, NULL when unreachable
    * within `maxHops`) — proximity-to-known-set labeling (how many dedup
    * edges from a benchmark/flagged document).
    *
    * Frontier form: round h joins ONLY the previous frontier (dist = h−1)
    * against the edges, so per-round shuffle is bounded by the frontier's
    * edge incidence, never the whole graph — the property that keeps round
    * cost falling as the search saturates. First assignment wins
    * (coalesce), which IS min-hop by BFS construction; no min-agg over
    * history needed. Same checkpoint cadence as [[labelPropagation]].
    * Output: idCol, dist (BIGINT, NULL = beyond maxHops), reached. */
  def bfsDistance(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      seeds: DataFrame, maxHops: Int, checkpointEvery: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Lazy persist + cadence 2 — see labelPropagation's loop comment.
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(MEMORY_AND_DISK)
    var dist = nodes.select(col(idCol).as("id"))
      .join(seeds.select(col(idCol).as("id"), lit(0L).as("dist")).distinct(),
        Seq("id"), "left")
    var pending = List.empty[DataFrame]
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === (h - 1)).select(col("id"))
      val nbr = sym.join(frontier, col("dst") === col("id"))
        .select(col("src").as("id")).distinct()
        .withColumn("nd", lit(h.toLong))
      val next = dist.join(nbr, Seq("id"), "left")
        .withColumn("dist", coalesce(col("dist"), col("nd")))
        .select("id", "dist")
      dist =
        if (h % checkpointEvery == 0 || h == maxHops) {
          val ck = next.localCheckpoint() // eager: materialize + cut lineage
          pending.foreach(_.unpersist()); pending = Nil
          ck
        } else {
          // Lazy persist: dedupes this round's two references (frontier +
          // carry-forward) when the next checkpoint job evaluates them.
          val p = next.persist(MEMORY_AND_DISK)
          pending ::= p
          p
        }
    }
    sym.unpersist()
    dist.select(col("id").as(idCol), col("dist"),
      col("dist").isNotNull.as("reached"))
  }

  /** Bounded-round Bellman-Ford: weighted shortest distance from the seed
    * set using at most `maxRounds` edges ([[bfsDistance]] is the w≡1
    * special case; integer weights keep every relaxation exact and
    * engine-portable). Unlike BFS, a labeled node can improve in a later
    * round, so each round relaxes ALL labeled nodes — one equi-join + one
    * min-aggregate on the cached symmetric edge list per round, the
    * [[connectedComponents]] shuffle discipline. Distances only decrease
    * monotonically; maxRounds bounds the plan regardless of graph diameter
    * (the 100 TB contract: k rounds = k bounded shuffles, no convergence
    * loop on a pathological chain). Output: idCol, dist (BIGINT, NULL =
    * unreachable within maxRounds edges), reached. */
  def weightedDistance(
      nodes: DataFrame, edges: DataFrame, idCol: String, weightCol: String,
      seeds: DataFrame, maxRounds: Int, checkpointEvery: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Lazy persist + cadence 2 — see labelPropagation's loop comment.
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"),
        col(weightCol).as("w"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst"),
        col(weightCol).as("w")))
      .persist(MEMORY_AND_DISK)
    var dist = nodes.select(col(idCol).as("id"))
      .join(seeds.select(col(idCol).as("id"), lit(0L).as("dist")).distinct(),
        Seq("id"), "left")
    var pending = List.empty[DataFrame]
    for (r <- 1 to maxRounds) {
      val relax = sym.join(dist.filter(col("dist").isNotNull),
          col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("dist") + col("w")).as("nd"))
        .select(col("src").as("id"), col("nd"))
      val next = dist.join(relax, Seq("id"), "left")
        .withColumn("dist", least(col("dist"), col("nd")))
        .select("id", "dist")
      dist =
        if (r % checkpointEvery == 0 || r == maxRounds) {
          val ck = next.localCheckpoint() // eager: materialize + cut lineage
          pending.foreach(_.unpersist()); pending = Nil
          ck
        } else {
          val p = next.persist(MEMORY_AND_DISK)
          pending ::= p
          p
        }
    }
    sym.unpersist()
    dist.select(col("id").as(idCol), col("dist"),
      col("dist").isNotNull.as("reached"))
  }

  /** Fixed-iteration PageRank over the symmetric near-dup graph — ranks
    * concentrate on hub documents of boilerplate families (prune-first
    * candidates). Damping 0.85, rank0 = 1.
    *
    * Engine-portable exactness: the whole iteration runs in FIXED-POINT
    * integer arithmetic at scale 10¹² — contribution = rank_u div degree
    * (integer division), partial sums are exact BIGINTs, and the damping
    * update is `0.15·10¹² + (17·sum) div 20` (0.85 = 17/20). No floats
    * anywhere in the recurrence, so any engine reproduces it bit-for-bit.
    * (A DOUBLE formulation dies on cross-engine double→DECIMAL cast
    * semantics: Spark casts through the shortest string representation,
    * DuckDB scales the exact binary value — a 1-ulp divergence the sf0.1
    * oracle run caught.) The display `rank` is one final double division.
    *
    * Each iteration is one equi-join + one hash aggregate on the cached
    * symmetric edge list — same shuffle shape as [[connectedComponents]].
    * Output: idCol, deg, rank_u (fixed-point BIGINT), rank (double). */
  def pageRank(
      nodes: DataFrame, edges: DataFrame, idCol: String, iters: Int = 3,
      checkpointEvery: Int = 3): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val One = 1000000000000L // fixed-point 1.0 (scale 1e12)
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .union(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .persist(MEMORY_AND_DISK)
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val base = nodes.select(col(idCol).as("id"))
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist(MEMORY_AND_DISK)
    var ranks = base.withColumn("rank_u", lit(One))
    (1 to iters).foreach { it =>
      val contrib = sym.join(ranks, col("src") === col("id"))
        .select(col("dst").as("id"), expr("rank_u div deg").as("c"))
      val sums = contrib.groupBy("id").agg(sum(col("c")).as("csum"))
      ranks = base.join(sums, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(15L * One / 100) +
            expr("(17 * coalesce(csum, CAST(0 AS BIGINT))) div 20")).as("rank_u"))
      // The recurrence references ranks once per iteration, so the lazy plan
      // grows only linearly — but unbounded linear growth is still a driver
      // planning risk at high iteration counts; cut it periodically.
      if (it % checkpointEvery == 0 && it < iters) ranks = ranks.localCheckpoint()
    }
    // Lineage-free handoff; release the loop caches (see connectedComponents).
    val out = ranks.localCheckpoint()
    sym.unpersist()
    base.unpersist()
    out.select(col("id").as(idCol), col("deg"), col("rank_u"),
      (col("rank_u").cast("double") / lit(One.toDouble)).as("rank"))
  }

  /** Count triangles in a canonical (d1 < d2) undirected edge set — the
    * standard cohesion metric over the near-dup graph (triangle-dense
    * regions = boilerplate/template families worth aggressive pruning).
    * With canonical edges every triangle a<b<c is counted exactly once by
    * the oriented wedge join (a,b)+(b,c) closed by (a,c); both joins are
    * hash equi-joins on single keys, no enumeration of non-edges. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("d1"), col("d2"))
    // The edge list is the BUILD side of both wedge joins. Left to planner
    // stats, a cached edge set is broadcast unconditionally — fine for a
    // near-dup graph at test scale, an OOM plan once edges grow with the
    // corpus (the cached-stats broadcast trap, SURVEY §9). The measured
    // gate keeps the local broadcast (wedge probe at full parallelism)
    // and falls back to key-shuffled joins over the bound.
    val eB = Skew.broadcastIfBounded(e)
    e.as("e1")
      .join(eB.as("e2"), col("e1.d2") === col("e2.d1"))
      .join(eB.as("e3"),
        col("e1.d1") === col("e3.d1") && col("e2.d2") === col("e3.d2"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Common-neighbor similarity over a canonical (d1 < d2) edge set: every
    * node pair sharing ≥ `minCommon` neighbors, with the shared count and
    * the Jaccard of the two neighborhood sets — co-citation structure the
    * per-edge similarity can't see (two docs never directly compared can
    * share an entire template family; the classic link-prediction
    * baseline). Wedges (x—a, x—b, a<b) come from ONE self-join of the
    * symmetric edge list keyed on the shared endpoint — bounded by Σ deg²,
    * the budget the triangle join already pays — and degrees join back on
    * the surviving pairs. The probe side goes through the measured
    * broadcast gate, never planner stats on a cached edge set. */
  def commonNeighbors(edges: DataFrame, minCommon: Int): DataFrame = {
    val sym = edges.select(col("d1").as("x"), col("d2").as("y"))
      .union(edges.select(col("d2").as("x"), col("d1").as("y")))
    val deg = sym.groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val symB = Skew.broadcastIfBounded(sym)
    val wedges = sym.as("l")
      .join(symB.as("r"),
        col("l.x") === col("r.x") && col("l.y") < col("r.y"))
      .select(col("l.y").as("n1"), col("r.y").as("n2"))
    wedges.groupBy(col("n1"), col("n2")).agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(deg.select(col("x").as("n1"), col("deg").as("deg_a")), "n1")
      .join(deg.select(col("x").as("n2"), col("deg").as("deg_b")), "n2")
      .withColumn("jacc",
        expr("CAST(cn AS DOUBLE) / CAST(deg_a + deg_b - cn AS DOUBLE)"))
      .select(col("n1").as("d1"), col("n2").as("d2"),
        col("cn"), col("deg_a"), col("deg_b"), col("jacc"))
  }

  /** Bounded-round k-core peel over the near-dup graph: `rounds` synchronous
    * rounds of discarding nodes whose ALIVE-degree < k — the density filter
    * that isolates template/boilerplate cliques no single triangle count
    * can. The operator is DEFINED as the bounded peel (like
    * [[labelPropagation]]'s fixed rounds): it equals the true k-core iff a
    * full round removes nothing, which near-dup graphs (tiny components,
    * diameter ≤ ~4) reach well inside 4 rounds; an unconverged peel is a
    * superset of the core. Each round is two equi-joins against the alive
    * set + one count aggregate; the alive set feeds BOTH joins, so every
    * round ends in an eager localCheckpoint that materializes it once and
    * truncates the lineage — plan depth stays constant in `rounds`, exactly
    * as [[connectedComponents]]'s loop does. The checkpoint job yields the
    * alive count for free, so a round that removes nothing short-circuits
    * the remaining rounds (the peel is a fixed point: once every survivor
    * has alive-degree ≥ k, further rounds are identity). Output:
    * (idCol, in_core) for every node. */
  def kCore(
      nodes: DataFrame, edges: DataFrame, idCol: String,
      k: Int, rounds: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col("d1").as("a"), col("d2").as("b"))
      .union(edges.select(col("d2").as("a"), col("d1").as("b")))
      .persist(MEMORY_AND_DISK)
    var alive = nodes.select(col(idCol).as("id")).localCheckpoint()
    var prevN = alive.count()
    var converged = false
    var i = 0
    while (!converged && i < rounds) {
      val next = sym
        .join(alive.select(col("id").as("b")), "b")
        .join(alive.select(col("id").as("a")), "a")
        .groupBy(col("a")).agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= k).select(col("a").as("id"))
        .localCheckpoint()
      val n = next.count()
      alive.unpersist()
      alive = next
      converged = n == prevN
      prevN = n
      i += 1
    }
    sym.unpersist()
    nodes.select(col(idCol))
      .join(alive.select(col("id").as(idCol), lit(1).as("_in")),
        Seq(idCol), "left")
      .select(col(idCol), col("_in").isNotNull.as("in_core"))
  }

  /** Blocked edit-distance pair mining — fuzzy ENTITY dedup (near-identical
    * names/titles differing by typos), the short-string complement of the
    * shingle-based DOCUMENT dedup above. Candidates come from an equi-join
    * on caller-chosen blocking keys (e.g. first token + length bucket), so
    * the pairwise verify runs only inside blocks; a length-gap prune
    * (`|len(a)−len(b)| ≤ maxDist`, a Levenshtein lower bound) drops
    * non-starters cheaply, and the survivors go through the banded
    * O(len·maxDist) [[graft.expressions.BoundedLevenshtein]] rather than
    * the built-in's full O(len²) DP. Blocking trades
    * recall for boundedness exactly like LSH banding: a pair split across
    * blocks is never compared — at 100 TB that is the only way an
    * edit-distance pass is runnable at all.
    *
    * Like [[ngramJaccardPairs]], the exact pair relation is quadratic in
    * clone-family size by definition; `maxBlock` bounds degenerate blocks
    * ([[Skew.capBuckets]], observed drops under `lev_block_cap`) when
    * upstream exact dedup can't. Default UNCAPPED — exact semantics. */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String, maxDist: Int,
      blockOn: Column => Seq[Column], maxBlock: Int = Int.MaxValue): DataFrame =
    blockedStringCandidates(df, idCol, strCol, blockOn, maxBlock,
        "lev_block_cap")
      .filter(abs(length(col("t1")) - length(col("t2"))) <= maxDist)
      .withColumn("dist",
        graft.expressions.BoundedLevenshtein.boundedLev(
          col("t1"), col("t2"), maxDist))
      .filter(col("dist") <= maxDist)
      .select("d1", "d2", "dist")

  /** Jaro-Winkler fuzzy-match pairs over the same blocked-candidate
    * skeleton as [[editDistancePairs]] — the ER comparator where edit
    * distance over-penalizes suffix noise. The verify is the codegen'd
    * [[graft.expressions.JaroWinkler]] native; like every pair miner here
    * the TRUE pair relation is quadratic in clone-family size, so
    * `maxBlock` is the boundedness knob (default UNCAPPED — exact). */
  def jaroWinklerPairs(
      df: DataFrame, idCol: String, strCol: String, threshold: Double,
      blockOn: Column => Seq[Column], maxBlock: Int = Int.MaxValue): DataFrame =
    blockedStringCandidates(df, idCol, strCol, blockOn, maxBlock,
        "jw_block_cap")
      .withColumn("jw",
        graft.expressions.JaroWinkler.jaroWinkler(col("t1"), col("t2")))
      .filter(col("jw") >= threshold)
      .select("d1", "d2", "jw")

  /** Shared pair-miner skeleton: block on caller-chosen keys, cap
    * degenerate blocks ([[Skew.capBuckets]], observed drops), and emit
    * within-block candidates (d1, t1, d2, t2), d1 < d2.
    *
    * Persist + id-repartition: blocking keys are LOW-ENTROPY by design
    * (first token, length bucket), so a shuffle join on them funnels whole
    * blocks into single reducers and serializes the expensive verify
    * expression behind one task. Broadcasting the measured-small side
    * keeps the stream side id-partitioned — verify runs at full
    * parallelism ([[Skew.broadcastIfBounded]]); past the bound, the
    * shuffle plan stands and `maxBlock` is the skew defense. */
  private def blockedStringCandidates(
      df: DataFrame, idCol: String, strCol: String,
      blockOn: Column => Seq[Column], maxBlock: Int,
      capLabel: String): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(strCol).as("_t"))
    val keyed0 = blockOn(col("_t")).zipWithIndex.foldLeft(base) {
      case (d, (c, i)) => d.withColumn(s"_bk$i", c)
    }
    val keyed1 =
      if (maxBlock == Int.MaxValue) keyed0
      else Skew.capBuckets(keyed0,
        keyed0.columns.filter(_.startsWith("_bk")).toSeq, "_id", maxBlock,
        capLabel)
    val keyed = CacheRegistry.track(keyed1.repartition(col("_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val keys = keyed.columns.filter(_.startsWith("_bk")).toSeq
    val a = keyed.select(col("_id").as("d1") +: col("_t").as("t1") +: keys.map(col): _*)
    val b = keyed.select(col("_id").as("d2") +: col("_t").as("t2") +: keys.map(col): _*)
    a.join(Skew.broadcastIfBounded(b), keys)
      .filter(col("d1") < col("d2"))
  }

  /** Exact Jaccard over candidate pairs (d1, d2) against sorted hashed
    * shingle sets: codegen'd two-pointer merge-intersect, once per pair. */
  private def verifyJaccard(
      cand: DataFrame, sh: DataFrame, idCol: String, threshold: Double): DataFrame = {
    import graft.expressions.IntersectSize.intersectSize
    // Measured broadcast of the (persisted) shingle sets: the candidate
    // relation is the quadratic side and must stream with its own
    // partitioning, never reshuffle on doc ids ([[Skew.broadcastIfBounded]]
    // — the capped adaptive threshold can no longer make this call, and at
    // corpus sizes past the bound the shuffle plan is the correct one).
    val s1 = Skew.broadcastIfBounded(
      sh.select(col(idCol).as("d1"), col("s").as("s1")))
    val s2 = Skew.broadcastIfBounded(
      sh.select(col(idCol).as("d2"), col("s").as("s2")))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("ni", intersectSize(col("s1"), col("s2")))
      .withColumn("jacc", expr("CAST(ni AS DOUBLE) / (size(s1) + size(s2) - ni)"))
      .filter(col("jacc") >= threshold)
      .select("d1", "d2", "jacc")
  }
}
