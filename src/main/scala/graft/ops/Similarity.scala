package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct.dot

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). North-star operator — absent from the reference.
  *
  * Determinism: the dot product folds left-to-right over the array in both
  * Spark (`aggregate`) and DuckDB (`list_reduce`), each term widened
  * float→double (exact), so cosine values are bit-identical across engines
  * and oracle-checkable. Ranks tie-break on the neighbor id.
  *
  * Scale: brute-force is the exactness baseline — O(|Q|·|V|) but fully
  * distributed (broadcast the small probe set, scan+rank the big side; no
  * shuffle of V). The IVF variant prunes to `nprobe` coarse partitions first,
  * turning the scan side into a partition-pruned fraction of V — the standard
  * recall/throughput trade. At 100 TB, V is bucketed by the coarse key on
  * disk so the IVF probe reads only matching buckets.
  */
object Similarity {

  /** Sequential-fold dot product of two array-typed SQL expressions. */
  def dotSpark(a: String, b: String): String =
    s"aggregate(transform(sequence(1, size($a)), i -> " +
      s"CAST(element_at($a, i) AS DOUBLE) * CAST(element_at($b, i) AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (x, y) -> x + y)"

  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a)+1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  def cosSpark(a: String, b: String): String =
    s"${dotSpark(a, b)} / sqrt(${dotSpark(a, a)}) / sqrt(${dotSpark(b, b)})"

  def cosDuck(a: String, b: String): String =
    s"${dotDuck(a, b)} / sqrt(${dotDuck(a, a)}) / sqrt(${dotDuck(b, b)})"

  /** Brute-force cosine top-k: for each probe vector, the `k` nearest other
    * vectors by cosine (desc, id asc on ties). Probes are broadcast; the
    * corpus is scanned once, ranked per probe. Output:
    * q_vec, rank, neighbor, cos. */
  /** `sqrt(dot(v, v))` — precompute once per vector so pair scoring costs one
    * dot product, not three. */
  def norm(v: Column): Column = sqrt(dot(v, v))
  def normDuck(v: String): String = s"sqrt(${dotDuck(v, v)})"

  // ---- SRP-LSH (sign random projection / hyperplane LSH) ----------------

  /** Number of hyperplanes (signature bits) and band split for [[srpPairs]].
    * 16 bits in 2 bands of 8: P[band match] = agree^8 per band — the
    * selectivity/recall knob; more+narrower bands raise recall and candidate
    * volume. Tuned per corpus at scale. */
  val SrpPlanes = 16
  val SrpBands = 2
  val SrpBandBits: Int = SrpPlanes / SrpBands

  /** Deterministic pseudo-random hyperplanes, identical in both engines:
    * plane(j)(i) = ((A(j)·1000003·(i+1) + B(j)·7919) mod P) / P − 0.5.
    * The 1000003/7919 multipliers push the products past P so the mod
    * actually mixes (raw A(j)·(i+1) ≪ P would make every coordinate ≈ −0.5
    * — a constant plane that hashes nothing). Values are used as FLOAT
    * literals so the Spark side can run the codegen'd [[DotProduct]]. */
  def srpPlane(j: Int, dims: Int): IndexedSeq[Float] = {
    import graft.functions.Hashing.{A, B, P}
    IndexedSeq.tabulate(dims) { i =>
      (((A(j) * 1000003L * (i + 1) + B(j) * 7919L) % P).toDouble / P - 0.5).toFloat
    }
  }

  /** 16-bit SRP signature of `vec` as a Spark Column (native dot products
    * against the plane literals — whole-stage codegen'd). */
  def srpSig(vec: Column, dims: Int): Column =
    (0 until SrpPlanes).map { j =>
      val plane = array(srpPlane(j, dims).map(v => lit(v)): _*)
      when(dot(vec, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The same signature as DuckDB SQL over column expression `vec`. */
  def srpSigDuck(vec: String, dims: Int): String =
    (0 until SrpPlanes).map { j =>
      val lits = srpPlane(j, dims).mkString("CAST([", ",", "] AS FLOAT[])")
      s"CASE WHEN ${dotDuck(vec, lits)} >= 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Embedding near-dup pairs WITHOUT any precomputed cluster/label column:
    * SRP-LSH buckets by hyperplane-sign bands, exact cosine ≥ `threshold` on
    * candidates. The label-free counterpart of [[Dedup.cosinePairs]] — at
    * 100 TB the shuffle key is the (band, signature-slice) pair, the
    * verify join touches only same-bucket pairs, and a pair matching both
    * bands is emitted once (the band-0 filter below), not deduplicated by a
    * second shuffle. Output: v1, v2, cos. */
  def srpPairs(
      vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dims: Int,
      maxBucket: Int = Dedup.LshMaxBucket): DataFrame = {
    val mask = (1L << SrpBandBits) - 1
    val v = vecs.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm"), srpSig(col(vecCol), dims).as("sig"))
    // Hot-bucket cap before the band self-join — see [[Skew.capBuckets]]:
    // near-identical embedding families share band values, and the bucket
    // join is quadratic in the bucket without it.
    val banded = Skew.capBuckets(
      v.select(col(idCol), col(vecCol), col("nrm"), col("sig"),
        explode(expr(
          s"transform(sequence(0, ${SrpBands - 1}), " +
            s"k -> named_struct('k', k, 'bv', shiftright(sig, k*$SrpBandBits) & $mask))")).as("kb"))
        .select(col(idCol), col(vecCol), col("nrm"),
          col("sig"), col("kb.k").as("k"), col("kb.bv").as("bv")),
      Seq("k", "bv"), idCol, maxBucket, "lsh_srp_cap")
    val firstMatch = expr((1 until SrpBands).foldLeft("l.k = 0") { (acc, k0) =>
      val diffs = (0 until k0)
        .map(j => s"(shiftright(l.sig, ${j * SrpBandBits}) & $mask) <> " +
          s"(shiftright(r.sig, ${j * SrpBandBits}) & $mask)")
        .mkString(" AND ")
      s"$acc OR (l.k = $k0 AND $diffs)"
    })
    banded.as("l")
      .join(banded.as("r"),
        col("l.k") === col("r.k") && col("l.bv") === col("r.bv") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .filter(firstMatch)
      .select(col(s"l.$idCol").as("v1"), col(s"r.$idCol").as("v2"),
        (dot(col(s"l.$vecCol"), col(s"r.$vecCol")) /
          (col("l.nrm") * col("r.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def knnBruteForce(
      vecs: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = probes.select(col(idCol).as("q_vec"), col(vecCol).as("q_emb"),
      norm(col(vecCol)).as("q_nrm"))
    val v = vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
    val scored = v.join(broadcast(q), col(idCol) =!= col("q_vec"))
      .select(col("q_vec"), col(idCol).as("neighbor"),
        (dot(col("q_emb"), col(vecCol)) / (col("q_nrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_vec").orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_vec", "rank", "neighbor", "cos")
  }

  /** IVF-style ANN: coarse partitions given by `labelCol`; each partition is
    * represented by its min-id member vector (deterministic medoid stand-in —
    * no float averaging, so the oracle agrees bit-for-bit). Each probe selects
    * its `nprobe` nearest partitions by cosine-to-representative, then ranks
    * only vectors in those partitions. Output: q_vec, rank, neighbor, cos. */
  def knnIvf(
      vecs: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val wRep = Window.partitionBy(labelCol).orderBy(col(idCol).asc)
    val reps = vecs
      .withColumn("_rn", row_number().over(wRep)).filter(col("_rn") === 1)
      .select(col(labelCol).as("rep_label"), col(vecCol).as("rep_emb"))

    val q = probes.select(col(idCol).as("q_vec"), col(vecCol).as("q_emb"),
      norm(col(vecCol)).as("q_nrm"))

    val wProbe = Window.partitionBy("q_vec")
      .orderBy(col("rep_cos").desc, col("rep_label").asc)
    val probeParts = q.crossJoin(broadcast(reps))
      .select(col("q_vec"), col("q_emb"), col("q_nrm"), col("rep_label"),
        (dot(col("q_emb"), col("rep_emb")) / sqrt(dot(col("q_emb"), col("q_emb")))
          / sqrt(dot(col("rep_emb"), col("rep_emb")))).as("rep_cos"))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select("q_vec", "q_emb", "q_nrm", "rep_label")

    val v = vecs.select(col(idCol), col(labelCol), col(vecCol),
      norm(col(vecCol)).as("nrm"))
    val scored = v.join(broadcast(probeParts),
        col(labelCol) === col("rep_label") && col(idCol) =!= col("q_vec"))
      .select(col("q_vec"), col(idCol).as("neighbor"),
        (dot(col("q_emb"), col(vecCol)) / (col("q_nrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_vec").orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_vec", "rank", "neighbor", "cos")
  }

  /** Persist the IVF index: cell members written PARTITIONED BY the cell
    * label — a probe's nprobe cells are whole partition DIRECTORIES, so
    * the serving scan reads nprobe/|cells| of the corpus via partition
    * pruning instead of filtering after a full scan — plus the min-id
    * representative table. Norms are precomputed into the index (pay once
    * at build, never at query time). */
  def writeIvfIndex(vecs: DataFrame, idCol: String, vecCol: String,
      labelCol: String, path: String): Unit = {
    vecs.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"), col(labelCol))
      .write.mode("overwrite").option("compression", "zstd").partitionBy(labelCol).parquet(s"$path/cells")
    val wRep = Window.partitionBy(labelCol).orderBy(col(idCol).asc)
    vecs.withColumn("_rn", row_number().over(wRep)).filter(col("_rn") === 1)
      .select(col(labelCol).as("rep_label"), col(vecCol).as("rep_emb"))
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$path/reps")
  }

  /** Persist a TRAINED-quantizer IVF index: cell members written PARTITIONED
    * BY the learned k-means cluster (norms precomputed at build) plus the
    * centroid table — the train-once / serve-many split production ANN
    * requires. Training ([[KMeans.lloyd]]) and this write run in the BUILD
    * job; serving ([[knnIvfKmeansPersisted]]) reads only the index and never
    * pays training. `assigned`/`cents` are [[KMeans.lloyd]]'s outputs. */
  def writeKmeansIvfIndex(assigned: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String, path: String): Unit = {
    assigned
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"), col("cluster"))
      .write.mode("overwrite").option("compression", "zstd").partitionBy("cluster").parquet(s"$path/cells")
    cents.select(col("cluster"), col("cent"))
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$path/cents")
  }

  /** Probe a [[writeKmeansIvfIndex]] index from disk: the k centroids
    * broadcast, each probe picks its `nprobe` nearest cells by squared L2
    * (the metric the quantizer was trained in), and the cell join prunes the
    * scan to the selected partition directories (dynamic partition pruning,
    * pinned in PlanShapeSpec). Results are identical to the in-session
    * trained path (`ann_ivf_kmeans`), so the same oracle checks both. */
  def knnIvfKmeansPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/cents")
    val q = probes.select(col(idCol).as("q_vec"), col(vecCol).as("q_emb"),
      norm(col(vecCol)).as("q_nrm"))
    val wProbe = Window.partitionBy("q_vec").orderBy(col("d").asc, col("p_cluster").asc)
    val probeParts = q.crossJoin(broadcast(
        cents.select(col("cluster").as("p_cluster"), col("cent"))))
      .withColumn("d", expr(
        """aggregate(zip_with(q_emb, cent, (x, y) ->
          |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
          |CAST(0 AS DOUBLE), (a, b) -> a + b)""".stripMargin))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select("q_vec", "q_emb", "q_nrm", "p_cluster")
    val v = spark.read.parquet(s"$path/cells")
    val scored = v.join(broadcast(probeParts),
        col("cluster") === col("p_cluster") && col(idCol) =!= col("q_vec"))
      .select(col("q_vec"), col(idCol).as("neighbor"),
        (dot(col("q_emb"), col(vecCol)) / (col("q_nrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_vec").orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_vec", "rank", "neighbor", "cos")
  }

  /** Probe a [[writeIvfIndex]] index from disk — the ANN SERVING path:
    * representatives broadcast, each probe picks its nprobe cells, and the
    * cell join against the label-partitioned index prunes the scan to the
    * selected partition directories (dynamic partition pruning; pinned in
    * PlanShapeSpec). Results are identical to [[knnIvf]] over the same
    * data. */
  def knnIvfPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, idCol: String, vecCol: String, labelCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val reps = spark.read.parquet(s"$path/reps")
    val q = probes.select(col(idCol).as("q_vec"), col(vecCol).as("q_emb"),
      norm(col(vecCol)).as("q_nrm"))
    val wProbe = Window.partitionBy("q_vec")
      .orderBy(col("rep_cos").desc, col("rep_label").asc)
    val probeParts = q.crossJoin(broadcast(reps))
      .select(col("q_vec"), col("q_emb"), col("q_nrm"), col("rep_label"),
        (dot(col("q_emb"), col("rep_emb")) / sqrt(dot(col("q_emb"), col("q_emb")))
          / sqrt(dot(col("rep_emb"), col("rep_emb")))).as("rep_cos"))
      .withColumn("_pr", row_number().over(wProbe))
      .filter(col("_pr") <= nprobe)
      .select("q_vec", "q_emb", "q_nrm", "rep_label")
    val v = spark.read.parquet(s"$path/cells")
    val scored = v.join(broadcast(probeParts),
        col(labelCol) === col("rep_label") && col(idCol) =!= col("q_vec"))
      .select(col("q_vec"), col(idCol).as("neighbor"),
        (dot(col("q_emb"), col(vecCol)) / (col("q_nrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_vec").orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_vec", "rank", "neighbor", "cos")
  }
}
