package graft

import org.apache.spark.sql.functions._

import graft.ops.PQ

/** Product-quantization properties the DuckDB-oracle rows can't pin:
  * structural code bounds, clone behavior (identical vectors must share
  * codes and read ADC distance 0 to each other), and the map-side-only
  * encode plan (no Exchange — the contract that makes PQ encoding a single
  * linear pass at 100 TB). */
class PQSpec extends SparkSpec with SlowSuite {

  private val M = 2
  private val K = 4
  private val Dims = 8

  // 40 vectors of 8 dims; ids 7 and 27 are exact clones.
  private def vecs = {
    import spark.implicits._
    (0L until 40L).map { i =>
      val base = if (i == 27L) 7L else i
      (i, (0 until Dims).map(d => ((base * 31 + d * 17) % 13).toFloat / 13f))
    }.toDF("vec_id", "embedding")
  }

  private def books = PQ.train(vecs, "vec_id", "embedding", M, K, iters = 2, Dims)

  test("codes are in [0, k) and the encode plan has no Exchange") {
    val b = books
    val enc = PQ.encode(vecs, "embedding", b, Dims / M)
    val rows = enc.select("vec_id", "code0", "code1").collect()
    assert(rows.length === 40)
    rows.foreach { r =>
      (1 to M).foreach { j =>
        val c = r.getInt(j)
        assert(c >= 0 && c < K, s"code out of range: $r")
      }
    }
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must be map-side only:\n$plan")
  }

  test("exact clones share all codes and achieve the minimal ADC distance") {
    val b = books
    val enc = PQ.encode(vecs, "embedding", b, Dims / M)
      .select("vec_id", "code0", "code1").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(enc(7L) === enc(27L), "identical vectors must encode identically")
    // ADC adist(v) = Σ_j table[code_j(v)] where table[c] = dist(q_sub, cent_c):
    // a clone of the query picks argmin per subspace, so its adist IS the
    // global minimum (other vectors may tie by sharing codes, never beat it).
    // All adists are sums of squared distances — non-negative.
    val all = PQ.adcTopK(vecs, vecs.filter(col("vec_id") === 7L),
        "vec_id", "embedding", b, Dims, kTop = 40)
      .select("neighbor", "adist").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(all.forall(_._2 >= 0.0), "ADC distances must be non-negative")
    val minA = all.map(_._2).min
    val cloneA = all.toMap.apply(27L)
    assert(cloneA === minA,
      s"clone adist $cloneA must equal the global minimum $minA")
  }

  test("train is deterministic across invocations") {
    assert(books === books)
  }

  test("ADC is exact against a GAPPED codebook (empty-cluster dropout)") {
    // KMeans.lloyd drops empty clusters, so codebook ids need not be dense
    // 0..k-1. A positional array[code+1] lookup reads the wrong centroid's
    // distance above the gap (and null for the top id); the map-keyed table
    // must stay exact. Handcrafted books with ids {0,2,5} / {1,3,4}.
    def cent(seed: Int) =
      (0 until Dims / M).map(d => ((seed * 7 + d * 3) % 11).toDouble / 11.0)
    val gapped: Seq[Seq[(Int, Seq[Double])]] = Seq(
      Seq((0, cent(1)), (2, cent(2)), (5, cent(3))),
      Seq((1, cent(4)), (3, cent(5)), (4, cent(6))))
    val enc = PQ.encode(vecs, "embedding", gapped, Dims / M)
      .select("vec_id", "code0", "code1").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(enc.values.forall { case (c0, c1) =>
      Set(0, 2, 5)(c0) && Set(1, 3, 4)(c1) },
      "codes must be the actual (non-dense) codebook ids")
    val q = vecs.filter(col("vec_id") === 3L)
    val got = PQ.adcTopK(vecs, q, "vec_id", "embedding", gapped, Dims, kTop = 40)
      .select("neighbor", "adist").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.forall(_._2.isDefined), "no adist may be null (gap lookup)")
    // Brute-force oracle: same fold order as KMeans.distSpark (left-to-right
    // double sum of squared diffs over the subspace), table keyed by id.
    val qv = vecs.filter(col("vec_id") === 3L)
      .select("embedding").collect().head.getSeq[Float](0)
    def dist(sub: Seq[Float], c: Seq[Double]): Double =
      sub.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
        a + (x.toDouble - y) * (x.toDouble - y) }
    val expect = got.map { case (n, _) =>
      val (c0, c1) = enc(n)
      val s = Dims / M
      val d0 = dist(qv.slice(0, s), gapped(0).toMap.apply(c0))
      val d1 = dist(qv.slice(s, 2 * s), gapped(1).toMap.apply(c1))
      n -> (d0 + d1)
    }.toMap
    got.foreach { case (n, Some(a)) =>
      assert(a === expect(n), s"gapped-codebook adist mismatch for neighbor $n")
    case _ => ()
    }
  }

  test("training and encoding are partitioning-invariant") {
    // The distributed-correctness property: nothing in train (hash-order
    // seeds, fixed-point sums) or encode (map-side expressions) may depend
    // on how the input is split across partitions.
    val b1 = PQ.train(vecs, "vec_id", "embedding", M, K, iters = 2, Dims)
    val b2 = PQ.train(vecs.repartition(7), "vec_id", "embedding", M, K,
      iters = 2, Dims)
    assert(b1 === b2, "codebooks must not depend on partitioning")
    val e1 = PQ.encode(vecs, "embedding", b1, Dims / M)
      .select("vec_id", "code0", "code1").collect().sortBy(_.getLong(0)).toSeq
    val e2 = PQ.encode(vecs.repartition(5), "embedding", b1, Dims / M)
      .select("vec_id", "code0", "code1").collect().sortBy(_.getLong(0)).toSeq
    assert(e1 === e2, "codes must not depend on partitioning")
  }

  test("PQ ADC ranks true neighbors far above random on the test corpus") {
    // Quality pin on real data (500 vecs, 64 dims, sf0.001). The synthetic
    // corpus is near-isotropic noise (within-label distance ≈ global — no
    // low-dim manifold), so ABSOLUTE recall@10 is data-limited for any
    // practical code budget (measured: 0.16 at m=4/k=8 up to only 0.6 at
    // m=32 — quantization error ~ total variance on iid data; real
    // embeddings concentrate near manifolds and recall climbs accordingly).
    // The data-independent property worth pinning is RANKING POWER: the
    // mean ADC rank of the exact-L2 top-10 must be far better than the
    // random-ranking expectation of ~|corpus|/2 ≈ 250 (measured ~120).
    // Deterministic end to end — a regression pin, not a statistical test.
    val dir = "/root/testdata/sf0.001"
    val vecs = graft.engine.Catalog.load(spark, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val b = PQ.train(vecs, "vec_id", "embedding", m = 4, k = 8,
      iters = 2, dims = 64)
    val n = vecs.count().toInt
    val pqRank = PQ.adcTopK(vecs, queries, "vec_id", "embedding", b, 64,
        kTop = n)
      .select("q_vec", "neighbor", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // exact squared-L2 top-10 per query (self excluded, ties by neighbor)
    import org.apache.spark.sql.expressions.Window
    val truth = vecs.select(col("vec_id").as("neighbor"), col("embedding").as("e"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_vec"),
        col("embedding").as("q"))))
      .filter(col("q_vec") =!= col("neighbor"))
      .withColumn("d2", expr(
        """aggregate(zip_with(q, e, (x, y) ->
          |  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |CAST(0 AS DOUBLE), (a, b) -> a + b)""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_vec").orderBy(col("d2").asc, col("neighbor").asc)))
      .filter(col("rank") <= 10)
      .select("q_vec", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ranks = truth.map(pqRank(_).toDouble)
    val mean = ranks.sum / ranks.length
    info(f"mean ADC rank of exact top-10 = $mean%.1f (random ≈ ${n / 2})")
    assert(mean < n / 3.0,
      f"ADC ranking power collapsed: mean rank $mean%.1f vs random ${n / 2}")
  }

  test("residual IVF-PQ matches raw IVF-PQ recall on the isotropic corpus") {
    // Residual refinement quantizes vec − coarse-centroid (Jégou §IV). Both
    // variants share the SAME coarse pruning, so recall@10 vs the exact
    // in-probed-cell answer isolates CODEBOOK quality. On the synthetic
    // near-isotropic corpus the within-cell spread ≈ global spread, so the
    // refinement is expected to land within noise of raw — this test pins
    // that it does NOT degrade (a regression pin + documentation of why the
    // knob exists: real manifold-structured embeddings are where it wins).
    val dir = "/root/testdata/sf0.001"
    def top10(name: String): Map[(Long, Long), Int] =
      SparkEntry.queries(name)(spark, dir)
        .select("q_vec", "neighbor", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val raw = top10("ann_ivf_pq_topk")
    val res = top10("ann_ivf_pq_residual")
    // exact L2 top-10 (global) as the reference answer set
    import org.apache.spark.sql.expressions.Window
    val vecs = graft.engine.Catalog.load(spark, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val truth = vecs.select(col("vec_id").as("neighbor"), col("embedding").as("e"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_vec"),
        col("embedding").as("q"))))
      .filter(col("q_vec") =!= col("neighbor"))
      .withColumn("d2", expr(
        """aggregate(zip_with(q, e, (x, y) ->
          |  (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
          |CAST(0 AS DOUBLE), (a, b) -> a + b)""".stripMargin))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_vec").orderBy(col("d2").asc, col("neighbor").asc)))
      .filter(col("rank") <= 10)
      .select("q_vec", "neighbor").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawHits = truth.count(raw.contains)
    val resHits = truth.count(res.contains)
    info(s"recall@10 hits of ${truth.size}: raw=$rawHits residual=$resHits")
    assert(resHits >= rawHits - 3,
      s"residual codebooks degraded recall: $resHits vs raw $rawHits")
  }

  test("ADC search shuffles only the final per-query top-k") {
    // The scale contract: the encoded-corpus side reaches the scorer with
    // NO shuffle (query tables broadcast across the scan); the single hash
    // Exchange in the plan is the rank window on the scored candidates.
    val top = PQ.adcTopK(vecs, vecs.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", books, Dims, kTop = 3)
    val plan = top.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 1, s"expected exactly the top-k window exchange:\n$plan")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoop"),
      s"query tables must broadcast:\n$plan")
  }

  test("merged multi-subspace training equals the sequential per-subspace Lloyd") {
    // Round 17: PQ.train now trains all m subspaces in shared data passes
    // (one seed scan, one aggregate job per Lloyd round). This pin replays
    // the OLD sequential form — one KMeans.lloyd per subspace slice — and
    // requires codebook equality to the last bit, on a corpus whose size
    // (40) exceeds k so seeds, assignment ties and fixed-point sums are all
    // exercised.
    import graft.ops.KMeans
    val merged = PQ.train(vecs, "vec_id", "embedding", M, K, iters = 2, Dims)
    val sub = Dims / M
    val sequential = (0 until M).map { j =>
      val sv = vecs.select(col("vec_id"),
        expr(PQ.subSpark("embedding", j, sub)).as("_sub"))
      val (_, cents) = KMeans.lloyd(sv, "vec_id", "_sub", K, iters = 2, sub)
      KMeans.collectCents(cents.select(col("cluster"), col("cent")))
    }
    assert(merged === sequential,
      "merged training must be bit-identical to per-subspace Lloyd")
  }
}
