package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
      (2L, "completely different words about spark shuffles and parquet files here"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank")  // exact dup of 0
    ).toDF("doc_id", "text")
  }

  test("exactKeepFirst keeps the min-id row per key") {
    val kept = Dedup.exactKeepFirst(docs, col("text"), col("doc_id"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(0L, 1L, 2L))
  }

  test("minhashLshPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L).get
    assert(exact._3 === 1.0) // identical shingle sets
    assert(pairs.forall(_._3 >= 0.5))
  }

  test("simhashPairs: identical docs at hamming 0; blocking finds them") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("connectedComponents labels chains and singletons with the min id") {
    import spark.implicits._
    // 1-2, 2-3, 3-4 form a chain (diameter > 1 → needs multiple rounds);
    // 5 is unpaired; 6-7 a separate pair.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("d1", "d2")
    val got = Dedup.connectedComponents(nodes, edges, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 5L), (6L, 6L), (7L, 6L)))
  }

  test("incrementalMinhashDedup flags history dups and earlier-batch dups only") {
    import spark.implicits._
    val history = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different words about spark shuffles and parquet files here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"), // dup of history 0
      (11L, "fresh unrelated content mentioning catalyst plans and tungsten codegen stages"),
      (12L, "fresh unrelated content mentioning catalyst plans and tungsten codegen pages"), // near-dup of 11
      (13L, "short")                                                             // < n tokens → no shingles
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalMinhashDedup(history, batch, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(
      (10L, true, false, false),   // matches history, not any earlier batch doc
      (11L, false, false, true),   // first of its family in the batch → kept
      (12L, false, true, false),   // near-dups the EARLIER batch doc 11
      (13L, false, false, true)))  // shingle-less docs can never match
  }

  test("ngramJaccardPairs: capped default equals exact when no bucket overflows") {
    // Guards the round-7 capped-path fix: below the cap the default must be
    // a pure PLAN change (partitioning spread), never a semantic one — the
    // pair sets are identical. Randomized corpus, deterministic seed.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val corpus = (0L until 60L).map { i =>
      val base = (0 until 8 + rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
      // plant near-dups: every 4th doc clones the previous with one swap
      val words = if (i % 4 == 3) {
        val prev = (0 until 8).map(_ => vocab(((i - 1) % 10).toInt))
        prev.updated(2, vocab(rnd.nextInt(vocab.size)))
      } else base
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(maxBucket: Int) =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
          n = 2, threshold = 0.5, bucketWidth = 4, maxBucket = maxBucket)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(Dedup.LshMaxBucket)
    val exact = pairs(Int.MaxValue)
    assert(capped === exact,
      s"capped default diverged below the cap: ${capped.diff(exact)} / ${exact.diff(capped)}")
  }

  test("containmentPairs finds one-sided (doc-inside-doc) overlap") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon"),                          // contained in 1
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "totally unrelated words in this other document right here"),
      (3L, "xy")                                                        // < n tokens → no shingles
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((0L, 1L)))
    val (_, _, c1, c2) = pairs.head
    assert(c1 === 1.0)  // every shingle of 0 appears in 1
    assert(c2 < 0.5)    // ...but 1 is mostly new text — Jaccard would miss this
  }

  test("duplicatedSpans scores docs by shared-window fraction; short docs drop") {
    import spark.implicits._
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6 shared tokens
    val d = Seq(
      (0L, s"$shared a1 a2 a3 a4"),  // 10 tokens: windows at pos 1..6 (w=5)
      (1L, s"$shared b1 b2 b3 b4"),  // shares windows fully inside `shared`
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (3L, "tiny doc")               // < w tokens → no row
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(d, "doc_id", "text", w = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // docs 0 and 1 share exactly the two windows lying inside the 6 shared
    // tokens (s1..s5, s2..s6); doc 2 shares nothing; doc 3 has no windows
    assert(got.toSeq === Seq((0L, 6, 2L), (1L, 6, 2L), (2L, 6, 0L)))
  }

  test("cosinePairs respects partition blocking and threshold") {
    import spark.implicits._
    val vecs = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),
      (1L, 0, Seq(1.0f, 0.01f)),  // ~same direction as 0
      (2L, 0, Seq(0.0f, 1.0f)),   // orthogonal to 0
      (3L, 1, Seq(1.0f, 0.0f))    // same as 0 but other partition → never paired
    ).toDF("vec_id", "label", "embedding")
    val pairs = Dedup.cosinePairs(vecs, "vec_id", "embedding", "label", 0.9)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("editDistancePairs equals brute force restricted to shared blocks") {
    import spark.implicits._
    val names = Seq(
      (0L, "acme widget mk2"), (1L, "acme widget mk3"),  // dist 1, same block
      (2L, "acme gadget mk2"),                           // dist 2 from 0 (3 from 1)
      (3L, "zenith widget mk2"),                         // other first token
      (4L, "acme widget mark two special edition")       // other length bucket
    ).toDF("id", "name")
    def blocks(t: org.apache.spark.sql.Column) =
      Seq(split(t, " ").getItem(0), floor(length(t) / lit(8)).cast("long"))

    val got = Dedup.editDistancePairs(names, "id", "name", maxDist = 2, blocks)
      .select("d1", "d2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val n2 = names.toDF("id2", "name2")
    val naive = names.join(n2, col("id") < col("id2"))
      .filter(split(col("name"), " ").getItem(0) === split(col("name2"), " ").getItem(0) &&
        floor(length(col("name")) / lit(8)) === floor(length(col("name2")) / lit(8)) &&
        levenshtein(col("name"), col("name2")) <= 2)
      .select(col("id"), col("id2"), levenshtein(col("name"), col("name2")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(got == naive)
    assert(got == Set((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("labelPropagation: majority vote, min-label tie-break, immutable seeds") {
    import spark.implicits._
    // star: node 10 has seeded neighbors 1(label 5), 2(label 5), 3(label 7)
    // → majority 5. node 20 ties between 1(5) and 3(7) → min label 5.
    // node 3 is seeded and keeps 7 even though its neighbors say 5.
    val nodes = Seq(1L, 2L, 3L, 10L, 20L, 99L).toDF("id")
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (3L, 20L),
      (1L, 3L), (2L, 3L)).toDF("d1", "d2")
    val seeds = Seq((1L, 5L), (2L, 5L), (3L, 7L)).toDF("id", "lab")
    val out = graft.ops.Dedup.labelPropagation(nodes, edges, "id", seeds, "lab", 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(10L) === 5L)
    assert(out(20L) === 5L)
    assert(out(3L) === 7L)  // seed immutable
    assert(out(99L) === -1L) // isolated node stays unlabeled
  }

  test("bfsDistance: min hops to nearest seed, NULL past maxHops") {
    import spark.implicits._
    // chain 1-2-3-4-5 with seed 1; 6-7 unreached pair; 8 isolated.
    // node 4 also adjacent to seed 9 → dist 1 (nearest seed wins).
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L),
      (9L, 4L)).toDF("d1", "d2")
    val seeds = Seq(1L, 9L).toDF("id")
    val out = graft.ops.Dedup.bfsDistance(nodes, edges, "id", seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L,
      6L -> -1L, 7L -> -1L, 8L -> -1L, 9L -> 0L))
  }

  test("weightedDistance: later rounds improve already-labeled nodes") {
    import spark.implicits._
    // seed 1; direct edge 1-3 costs 100 but the 2-edge path via 2 costs 20
    // — round 1 labels 3 with 100, round 2 must RELAX it to 20 (the
    // semantic BFS first-assignment-wins cannot express). Node 4 hangs off
    // 3 (w=1) and lands at 21 in round 3; node 5 is unreachable.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L),
      (3L, 4L, 1L)).toDF("d1", "d2", "w")
    val seeds = Seq(1L).toDF("id")
    val out = graft.ops.Dedup.weightedDistance(nodes, edges, "id", "w",
        seeds, maxRounds = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> 0L, 2L -> 10L, 3L -> 20L, 4L -> 21L, 5L -> -1L))
  }

  test("kCore: peels tails, keeps the clique; converged peel equals deeper peel") {
    import spark.implicits._
    // triangle 1-2-3 (the 2-core) with tail 3-4-5; 6 isolated.
    // Round 1 drops 5 (deg 1) and 6; round 2 drops 4 (its only alive
    // neighbor left is 3); round 3 removes nothing — the peel has hit its
    // fixed point, so rounds=3 and rounds=10 must return identical rows
    // (the early exit makes the deeper call cost no extra rounds).
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("d1", "d2")
    def run(rounds: Int) = graft.ops.Dedup.kCore(nodes, edges, "id", k = 2,
        rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = run(3)
    assert(got === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))
    assert(run(10) === got)
  }

  test("commonNeighbors: wedge counts, degrees and neighbor-Jaccard") {
    import spark.implicits._
    // 1 and 2 share neighbors {3, 4}; 3 and 4 share {1, 2}; every other
    // pair shares at most one. deg(1)=deg(2)=deg(3)=deg(4)=2 (the 4-cycle
    // 1-3-2-4-1), so jacc = 2 / (2 + 2 - 2) = 1.0 for both pairs.
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("d1", "d2")
    val got = graft.ops.Dedup.commonNeighbors(edges, minCommon = 2)
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 2L, 2L, 1.0),
      (3L, 4L, 2L, 2L, 2L, 1.0)))
  }
}
