package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.KMeans

class KMeansSpec extends SparkSpec with SlowSuite {

  private val dir = "/root/testdata/sf0.001"
  private def vecs = Catalog.load(spark, dir, "embeddings")

  test("lloyd assignment covers every vector with clusters in [0, k)") {
    val (assigned, cents) = KMeans.lloyd(vecs, "vec_id", "embedding", 4, 2, 64)
    val total = vecs.count()
    assert(assigned.count() == total)
    assert(assigned.filter(col("cluster") < 0 || col("cluster") >= 4).count() == 0)
    // centroid row counts partition the corpus
    assert(cents.agg(sum("n")).head.getLong(0) == total)
  }

  test("fixed-point centroids are bit-identical across runs and partitionings") {
    def centList(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cluster").collect()
        .map(r => (r.getInt(0), r.getSeq[Double](r.fieldIndex("cent")).toList)).toList
    val a = centList(KMeans.lloyd(vecs, "vec_id", "embedding", 4, 3, 64)._2)
    val b = centList(KMeans.lloyd(vecs.repartition(7), "vec_id", "embedding", 4, 3, 64)._2)
    assert(a == b)
  }

  test("re-assigning against the returned centroids reproduces the final assignment") {
    val (assigned, cents) = KMeans.lloyd(vecs, "vec_id", "embedding", 4, 3, 64)
    val centSeq = cents.select("cluster", "cent").collect().toSeq
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    // NOT a fixpoint claim (Lloyd's may still be moving); the claim is that
    // `assign` is a pure function of (vectors, centroid literals): feeding the
    // PREVIOUS round's centroids back must reproduce the same labels the
    // final round computed from them.
    val (prevAssigned, _) = KMeans.lloyd(vecs, "vec_id", "embedding", 4, 2, 64)
    val prevCents = KMeans.centroidAgg(prevAssigned, "embedding", 64)
      .select("cluster", "cent").collect().toSeq
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
    val re = KMeans.assign(vecs, "vec_id", "embedding", prevCents)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fin = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(re == fin)
    assert(centSeq.map(_._1).distinct.size == centSeq.size)
  }

  test("assignment stage is map-side only — no Exchange in the plan") {
    val cents = KMeans.collectCents(KMeans.seeds(vecs, "vec_id", "embedding", 4))
    val plan = KMeans.assign(vecs, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
