package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnSweep, KMeans}

class AnnSweepSpec extends SparkSpec with SlowSuite {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("join-path Lloyd equals the literal-expression Lloyd at small k") {
    // The sweep's large-codebook trainer (centroids as DATA, broadcast-join
    // argmin) must be the same algorithm as KMeans.lloyd (centroids as
    // literal expressions): same seeds, same tie-breaks, same fixed-point
    // means — so at small k the assignments agree row-for-row, proving the
    // sweep measures operating points, not a different trainer.
    val (litAssigned, _) = KMeans.lloyd(emb, "vec_id", "embedding", 4, 2, 64)
    val (joinAssigned, _) = AnnSweep.lloydJoin(emb, "vec_id", "embedding", 4, 2, 64)
    val lit = litAssigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val jn = joinAssigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(jn === lit)
  }

  test("clustered corpus is deterministic and cluster-separated") {
    val c1 = AnnSweep.clusteredCorpus(spark, 400, 16, 8, 0.3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val c2 = AnnSweep.clusteredCorpus(spark, 400, 16, 8, 0.3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(c1.toSeq === c2.toSeq)
    // Within-cluster distances must sit far under between-cluster ones —
    // the property that makes recall measure the index, not the corpus.
    val df = AnnSweep.clusteredCorpus(spark, 400, 16, 8, 0.3)
      .withColumn("c", col("vec_id") % 8)
    val pairs = df.as("l").crossJoin(df.as("r"))
      .filter(col("l.vec_id") < col("r.vec_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(l.embedding, r.embedding, (x, y) ->
          |  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
          |  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |CAST(0 AS DOUBLE), (a, b) -> a + b)""".stripMargin))
      .groupBy(col("l.c") === col("r.c"))
      .agg(max("d2").as("mx"), min("d2").as("mn"))
      .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (withinMax, _) = pairs(true)
    val (_, betweenMin) = pairs(false)
    assert(withinMax < betweenMin,
      s"within-cluster max $withinMax must undercut between-cluster min $betweenMin")
  }

  test("recall at a structured operating point clears 0.5 on the clustered corpus") {
    // The round-9 gate: where ANN structure exists, the IVF-PQ layout at a
    // sane operating point must actually find neighbors — recall@10 well
    // above the near-isotropic 0.08 baseline the real corpus produces.
    // m=16 subspaces × 256-entry codebooks: the knob setting the sweep
    // showed recoverable (0.86 here vs 0.40 at m=8/k=64 — within-cluster
    // resolution, not probe coverage, is what the coarse-only knobs can't
    // buy back).
    val corpus = AnnSweep.clusteredCorpus(spark, 1000, 32, 10, 0.3)
    val res = AnnSweep.sweep(corpus, "vec_id", "embedding", 32,
      Seq(AnnSweep.OpPoint("c_np4_m16_k256", kc = 10, nprobe = 4, m = 16, k = 256)))
    assert(res.size === 1)
    assert(res.head.recall >= 0.5, s"recall=${res.head.recall}")
  }

  test("frozen-model append preserves recall within reach of a full retrain") {
    // Maintenance-quality evidence (round-9 stretch): encoding a delta
    // with codebooks trained BEFORE it existed must not crater recall when
    // the delta is new members of known cells — the daily-ingest shape.
    // Tolerance is deliberately loose (0.25 absolute): the claim under
    // test is "no collapse without retrain", not point equality.
    val corpus = AnnSweep.clusteredCorpus(spark, 1000, 32, 10, 0.3)
    val r = AnnSweep.appendRecall(
      corpus.filter(col("vec_id") < 900), corpus.filter(col("vec_id") >= 900),
      "vec_id", "embedding", 32,
      AnnSweep.OpPoint("spec_maint", kc = 10, nprobe = 4, m = 16, k = 256))
    assert(r.appended >= 0.0 && r.appended <= 1.0)
    assert(r.retrained >= 0.5, s"retrained=${r.retrained}")
    assert(r.appended >= r.retrained - 0.25,
      s"append collapsed: appended=${r.appended} retrained=${r.retrained}")
  }

  test("serve returns at most kTop ranked rows per probe with ascending adist") {
    val corpus = AnnSweep.clusteredCorpus(spark, 500, 16, 5, 0.3)
    val books = AnnSweep.trainBooksJoin(corpus, "vec_id", "embedding", 4, 8, 2, 16)
    val (assigned, cents) = AnnSweep.lloydJoin(corpus, "vec_id", "embedding", 5, 2, 16)
    val enc = AnnSweep.encodeJoin(assigned, "vec_id", "embedding", books, 4, 4)
    val out = AnnSweep.serveAdc(enc, cents, books,
        corpus.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        4, 4, 2, 10)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 10)
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rows.length))
      val ads = sorted.map(_.getDouble(3))
      assert(ads.zip(ads.tail).forall { case (a, b) => a <= b })
    }
    books.unpersist()
  }

  test("promoted corpus: polyhash centers are pairwise well-separated") {
    // The promoted lifecycle row (ann_ivf_pq_promoted) derives its
    // clustered corpus from the embeddings table with polyhash CENTERS —
    // the one replayable-in-DuckDB substitute for the sweep corpus's
    // xxhash64. The separation invariant that makes recall measure the
    // INDEX (not the corpus) must hold for the string-polyhash scheme
    // too: no two of the 20 cluster centers may come close, else
    // between-cluster confusion is baked into the corpus. Empirical pin:
    // min pairwise center distance-squared across all 190 pairs stays an
    // order of magnitude above the noise norm (~1.0). Expected scale:
    // E[d2] = 2 * Var(U[-1,1)) * 64 ~ 42.7.
    import graft.functions.Hashing
    val ph = Hashing.polyHashSpark("'ctr:' || CAST(c * 997 + d AS STRING)")
    val centers = spark.range(20).select(col("id").as("c"),
      expr(s"transform(sequence(1, 64), d -> " +
        s"(CAST((($ph) * ($ph)) % ${Hashing.P} % 1000003 AS DOUBLE)" +
        s" / 1000003.0) * 2.0 - 1.0)").as("v"))
    val d2 = centers.as("a").crossJoin(centers.as("b"))
      .filter(col("a.c") < col("b.c"))
      .select(expr(
        """aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)),
          |CAST(0 AS DOUBLE), (acc, t) -> acc + t)""".stripMargin).as("d2"))
      .agg(org.apache.spark.sql.functions.min("d2"),
        org.apache.spark.sql.functions.avg("d2")).head()
    assert(d2.getDouble(0) > 10.0, s"min center d2 = ${d2.getDouble(0)}")
    assert(d2.getDouble(1) > 30.0, s"mean center d2 = ${d2.getDouble(1)}")
  }
}
