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

  test("persisted IVF serve: empty probe workload yields an empty result " +
      "(the pruneCells lit(false) branch), and results equal the " +
      "in-session path") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sivf_empty")
      .toString
    Similarity.writeIvfIndex(vecs, "vec_id", "embedding", "label", tmp)
    // Zero probes: probe materialization collects nothing, the probed-cell
    // set is empty, and the serve must plan/execute to an empty result —
    // not throw on an empty IN list.
    val empty = Similarity.knnIvfPersisted(spark, tmp,
      vecs.filter(col("vec_id") === -1L), "vec_id", "embedding", "label",
      nprobe = 2, k = 3)
    assert(empty.collect().isEmpty)
    // Full-cell coverage (nprobe = |labels|): the persisted serve equals
    // the in-session path bit-for-bit on the same data.
    val p = Similarity.knnIvfPersisted(spark, tmp,
        vecs.filter(col("vec_id") === 1L), "vec_id", "embedding", "label",
        nprobe = 2, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val i = Similarity.knnIvf(vecs, vecs.filter(col("vec_id") === 1L),
        "vec_id", "embedding", "label", nprobe = 2, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(p.toSeq === i.toSeq)
  }

  test("brute force and IVF with all partitions agree") {
    val bf = Similarity.knnBruteForce(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", k = 4).collect().map(r => (r.getInt(1), r.getLong(2)))
    val ivf = Similarity.knnIvf(vecs, vecs.filter(col("vec_id") === 1L),
      "vec_id", "embedding", "label", nprobe = 2, k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(bf.sorted.toSeq === ivf.sorted.toSeq)
  }

  test("maxsim index lifecycle: appended docs are SERVED (negative-namespace " +
      "clones win ties), tombstoned docs never appear, compaction is " +
      "serve-equivalent") {
    import spark.implicits._
    // Designed corpus through the REAL conformance rows: a temp dir with
    // only a documents table (the maxsim rows touch nothing else). Doc 0
    // is the probe (0 % 250 == 0); mod-3 docs seed the delta; mod-4 docs
    // are tombstoned. 20 docs ⇒ every doc is in the top-10's reach, so
    // both lifecycle effects are observable, not just hash-stable.
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (0L until 20L).map { i =>
      val t = (0 until 6).map(j => words(((i * 7 + j * 3) % 10).toInt))
      (i, t.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = graft.engine.TempDirs.create("graft_mslife_fixture")
    docs.write.mode("overwrite")
      .parquet(graft.engine.Catalog.path(dir, "documents"))
    def ids(name: String): Seq[Long] =
      SparkEntry.queries(name)(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val append = ids("retrieval_maxsim_ivf_append")
    val deleted = ids("retrieval_maxsim_ivf_delete")
    val compacted = SparkEntry.queries(
      "retrieval_maxsim_ivf_lifecycle_compacted")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // appended docs genuinely serve: negative-namespace clones surface
    assert(append.exists(_ < 0L), s"no delta doc served: $append")
    // pre-delete the tombstone family is present; post-delete NEVER
    assert(append.exists(id => id >= 0 && id % 10 == 4), append)
    assert(deleted.forall(id => !(id >= 0 && id % 10 == 4)), deleted)
    // deletes keep the delta served
    assert(deleted.exists(_ < 0L), deleted)
    // compaction is pure reorganization: bit-equal serve
    assert(compacted === deleted)
  }
}
