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
}
