package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, 0, Seq(1.0f, 0.0f, 0.0f)),
      (1L, 0, Seq(0.9f, 0.1f, 0.0f)),
      (2L, 0, Seq(0.0f, 1.0f, 0.0f)),
      (3L, 1, Seq(0.0f, 0.9f, 0.1f)),
      (4L, 1, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
  }

  test("knnBruteForce ranks by cosine desc, excludes self") {
    val out = Similarity.knnBruteForce(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L)) // nearest then next
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(out.forall(_.getLong(0) == 0L))
  }

  test("knnIvf searches only the nprobe nearest partitions") {
    // probe = vec 4 (z-axis). Partition reps: label 0 → vec 0 (x), label 1 → vec 3 (~y).
    // nprobe=1 picks label 1 (cos(z, ~y) > cos(z, x) = 0) → candidates {3}.
    val out = Similarity.knnIvf(vecs, vecs.filter(col("vec_id") === 4L),
        "vec_id", "embedding", "label", nprobe = 1, k = 10)
      .collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L))
  }

  test("brute force and IVF with all partitions agree") {
    val bf = Similarity.knnBruteForce(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 4).collect().map(r => (r.getInt(1), r.getLong(2)))
    val ivf = Similarity.knnIvf(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", "label", nprobe = 2, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(bf.sorted.toSeq === ivf.sorted.toSeq)
  }
}
