package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column — the coarse-quantizer trainer
  * for IVF-style ANN (the reference has no vector surface at all; north-star
  * territory, standard in any embedding-pipeline at scale).
  *
  * Engine-portable exactness (the same discipline as [[Dedup.pageRank]]):
  * centroid means are computed in FIXED-POINT integer arithmetic — each
  * coordinate is `floor(x · 2^20)` summed as exact BIGINTs, and the mean is
  * ONE double division `sum / (n · 2^20)` — so any engine reproduces the
  * centroids bit-for-bit and the whole training loop is DuckDB-oracle
  * checkable. (Naive `avg(double)` is partial-aggregation-order-dependent
  * and can never be hash-checked across engines.)
  *
  * Scale shape, per iteration:
  *   - assignment is MAP-SIDE ONLY: the k·dims centroid literals are baked
  *     into a codegen'd expression (k-means centroids are always broadcast —
  *     collecting O(k·d) scalars per round to the driver is the same
  *     per-round-scalar budget the CC/PageRank loops use, independent of
  *     corpus size);
  *   - the centroid update is ONE hash aggregate with `dims` SUM columns —
  *     map-side partial aggregation shuffles k rows per partition, NOT the
  *     n·dims exploded rows a (cluster, dim) groupBy would.
  */
object KMeans {

  /** Fixed-point scale for centroid accumulation: 2^20. float32 has a 24-bit
    * mantissa, so `x · 2^20` is still exact in DOUBLE, and per-cluster sums
    * stay far under 2^63 for any realistic corpus (1e12 rows · 2^20 · |x|≲1).
    */
  val Scale = 1L << 20

  /** Deterministic seed order: a multiplicative hash of the id, ties on the
    * id — identical SQL text in both dialects. */
  def seedHash(id: String): String = s"(($id * 1000003) % 999983)"

  /** Squared-L2 distance from array column `v` (float) to a LITERAL centroid,
    * folded left-to-right over the dims — deterministic IEEE sequence both
    * engines replicate. */
  def distSpark(v: String, cent: Seq[Double]): String = {
    val lits = cent.map(d => s"${d}D").mkString(", ")
    s"aggregate(zip_with($v, array($lits), " +
      "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), " +
      "CAST(0 AS DOUBLE), (a, b) -> a + b)"
  }

  /** The k seed centroids (cluster 0..k-1 in seed-hash order) as
    * `(cluster, cent: array<double>)`. `orderBy.limit(k)` is a distributed
    * TakeOrdered — no global sort; the k-row window after it is trivial. */
  def seeds(vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val w = Window.orderBy(col("_h"), col(idCol))
    vecs.select(col(idCol), col(vecCol), expr(seedHash(idCol)).as("_h"))
      .orderBy(col("_h"), col(idCol)).limit(k)
      .withColumn("cluster", (row_number().over(w) - 1).cast("int"))
      .select(col("cluster"),
        expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("cent"))
  }

  /** Assign every vector to its nearest centroid (squared L2, ties to the
    * smaller cluster id) — pure map-side expression over centroid literals. */
  def assign(
      vecs: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val structs = cents.sortBy(_._1).map { case (c, arr) =>
      s"named_struct('d', ${distSpark(vecCol, arr)}, 'c', $c)"
    }
    vecs.withColumn("cluster",
      expr(s"array_min(array(${structs.mkString(", ")})).c"))
  }

  /** Per-cluster fixed-point centroid update: `dims` BIGINT sums + count in
    * ONE hash aggregate, then the single-division means. Output:
    * (cluster, n, cent: array<double>). */
  def centroidAgg(assigned: DataFrame, vecCol: String, dims: Int): DataFrame = {
    val sums = (1 to dims).map { i =>
      sum(expr(s"CAST(floor(CAST(element_at($vecCol, $i) AS DOUBLE) * $Scale) AS BIGINT)"))
        .as(s"_s$i")
    }
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cluster"), col("n"),
        array((1 to dims).map(i =>
          expr(s"CAST(_s$i AS DOUBLE) / (CAST(n AS DOUBLE) * CAST($Scale AS DOUBLE))")): _*)
          .as("cent"))
  }

  /** `iters` Lloyd rounds. Returns (final assignment with `cluster` column,
    * final centroids (cluster, n, cent)). Empty clusters simply drop out of
    * the centroid set (deterministically, in both engines). */
  def lloyd(
      vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dims: Int): (DataFrame, DataFrame) = {
    require(iters >= 1)
    var cents = collectCents(seeds(vecs, idCol, vecCol, k))
    var assigned = assign(vecs, idCol, vecCol, cents)
    (2 to iters).foreach { _ =>
      cents = collectCents(centroidAgg(assigned, vecCol, dims)
        .select(col("cluster"), col("cent")))
      assigned = assign(vecs, idCol, vecCol, cents)
    }
    (assigned, centroidAgg(assigned, vecCol, dims))
  }

  /** (cluster, cent) rows → the literal seq [[assign]] wants, SORTED by
    * cluster id: collect order follows partitioning, and a partitioning-
    * dependent sequence would leak into any consumer that forgets to sort
    * (PQSpec pins the invariance). O(k·d) driver data — the standard
    * centroid broadcast. */
  def collectCents(df: DataFrame): Seq[(Int, Seq[Double])] =
    df.collect().toSeq.map(r =>
      r.getInt(0) -> r.getSeq[Double](r.fieldIndex("cent"))).sortBy(_._1)

  // ------------------------------------------------------- DuckDB oracle --

  /** Squared-L2 distance in DuckDB between `v` (row alias.col) and a
    * centroid list expression `cent`, same fold order as [[distSpark]]. */
  def distDuck(v: String, cent: String, dims: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, ${dims + 1}), " +
      s"i -> (CAST($v[i] AS DOUBLE) - $cent[i]) * (CAST($v[i] AS DOUBLE) - $cent[i]))), " +
      "(a, b) -> a + b)"

  /** The full training loop as DuckDB CTEs over table `tbl(idCol, vecCol)`.
    * Defines: `seed`, and per round t: `a{t}` (vec_id, cluster) and `c{t}`
    * (cluster, n, cent). The caller appends its final SELECT.
    *
    * `prefix` namespaces every generated CTE (`{p}s0`, `{p}seed`, `{p}a{t}`,
    * `{p}c{t}s`, `{p}c{t}`) so several independent trainings can coexist in
    * ONE oracle query — the product-quantizer oracle trains one codebook per
    * subspace ([[PQ]]). Default empty keeps the original names. */
  def oracleCtes(
      tbl: String, idCol: String, vecCol: String,
      k: Int, iters: Int, dims: Int, prefix: String = ""): String = {
    val p = prefix
    val sb = new StringBuilder
    sb ++= s"""${p}s0 AS (SELECT $idCol, $vecCol, ${seedHash(idCol)} AS h FROM $tbl),
              |${p}seed AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, $idCol) - 1 AS INT) AS cluster,
              |                list_transform($vecCol, x -> CAST(x AS DOUBLE)) AS cent
              |         FROM (SELECT * FROM ${p}s0 ORDER BY h, $idCol LIMIT $k)),
              |""".stripMargin
    (1 to iters).foreach { t =>
      val prev = if (t == 1) s"${p}seed" else s"${p}c${t - 1}"
      sb ++= s"""${p}a$t AS (SELECT $idCol, $vecCol, cluster FROM (
                |  SELECT v.$idCol, v.$vecCol, c.cluster,
                |         ROW_NUMBER() OVER (PARTITION BY v.$idCol
                |             ORDER BY ${distDuck(s"v.$vecCol", "c.cent", dims)} ASC, c.cluster ASC) AS rn
                |  FROM $tbl v, $prev c) x WHERE rn = 1),
                |${p}c${t}s AS (SELECT cluster, i,
                |         CAST(SUM(CAST(FLOOR(CAST($vecCol[i] AS DOUBLE) * $Scale) AS BIGINT)) AS BIGINT) AS s,
                |         COUNT(*) AS n
                |       FROM ${p}a$t, range(1, ${dims + 1}) t(i) GROUP BY cluster, i),
                |${p}c$t AS (SELECT cluster, MIN(n) AS n,
                |         list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST($Scale AS DOUBLE)) ORDER BY i) AS cent
                |       FROM ${p}c${t}s GROUP BY cluster)""".stripMargin
      sb ++= (if (t < iters) ",\n" else "\n")
    }
    sb.result()
  }
}
