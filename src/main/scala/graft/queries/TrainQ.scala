package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.{KMeans, Similarity}

/** Training-data-pipeline operators beyond the dedup/ANN/text families:
  * k-means coarse-quantizer training, int8 embedding quantization,
  * hard-negative mining, deterministic shard assignment. All oracles are
  * exact — the float paths are either fixed-point (k-means) or identical
  * deterministic IEEE sequences (quantization, cosine). */
object TrainQ {

  private val K = 4
  private val Iters = 3
  private val Dims = 64

  val all: Seq[Q] = Seq(

    // K-means (Lloyd) cluster assignment after 3 rounds: seeds by
    // deterministic hash order, map-side nearest-centroid assignment,
    // fixed-point centroid means — the IVF coarse-quantizer trainer.
    Q("kmeans_assign",
      (s, dir) => {
        val (assigned, _) = KMeans.lloyd(Catalog.load(s, dir, "embeddings"),
          "vec_id", "embedding", K, Iters, Dims)
        assigned.select(col("vec_id"), col("cluster")).orderBy("vec_id")
      },
      Some(s"""WITH ${KMeans.oracleCtes("embeddings", "vec_id", "embedding", K, Iters, Dims)}
              |SELECT vec_id, cluster FROM a$Iters ORDER BY vec_id""".stripMargin)),

    // The trained centroids themselves, exploded to scalar
    // (cluster, n, dim, cent_val) rows (array columns can't reach the driver
    // comparator). cent_val = BIGINT fixed-point sum / (n · 2^20) — one
    // double division, bit-identical cross-engine.
    Q("kmeans_centroids",
      (s, dir) => {
        val (_, cents) = KMeans.lloyd(Catalog.load(s, dir, "embeddings"),
          "vec_id", "embedding", K, Iters, Dims)
        cents.select(col("cluster"), col("n"), posexplode(col("cent")))
          .select(col("cluster"), col("n"),
            (col("pos") + 1).cast("int").as("dim"), col("col").as("cent_val"))
          .orderBy("cluster", "dim")
      },
      Some(s"""WITH ${KMeans.oracleCtes("embeddings", "vec_id", "embedding", K, Iters, Dims)}
              |SELECT cluster, n, CAST(i AS INT) AS dim,
              |       CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(${KMeans.Scale} AS DOUBLE)) AS cent_val
              |FROM c${Iters}s ORDER BY cluster, dim""".stripMargin)),

    // Int8 scalar quantization of the embedding column: per-dim global
    // min/max (one 64-column-wide agg at scale; here a (dim) groupBy over
    // exploded rows keeps the oracle 1:1), q = round((x-mn)/scale) clamped
    // to [0,255], plus the exact reconstruction error — every double op is
    // the same IEEE sequence in both engines, so `err` hash-matches.
    // 4x memory shrink for the ANN corpus; scale path quantizes map-side
    // against broadcast stats.
    Q("embed_quantize_int8",
      (s, dir) => {
        val ex = Catalog.load(s, dir, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), (col("pos") + 1).cast("int").as("i"),
            col("col").cast("double").as("x"))
        val stats = ex.groupBy("i")
          .agg(min("x").as("mn"), max("x").as("mx"))
          .withColumn("sc", expr("(mx - mn) / CAST(255 AS DOUBLE)"))
        ex.join(broadcast(stats), "i")
          .withColumn("qv", expr(
            """CAST(least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
              |CAST(floor((x - mn) / sc + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS INT)""".stripMargin))
          .withColumn("err", expr("abs(x - (mn + CAST(qv AS DOUBLE) * sc))"))
          .select("vec_id", "i", "qv", "err")
          .orderBy("vec_id", "i")
      },
      Some("""WITH ex AS (SELECT vec_id, CAST(i AS INT) AS i,
             |                   CAST(embedding[i] AS DOUBLE) AS x
             |            FROM embeddings, range(1, 65) t(i)),
             |st AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx,
             |              (MAX(x) - MIN(x)) / CAST(255 AS DOUBLE) AS sc
             |       FROM ex GROUP BY i),
             |q AS (SELECT vec_id, ex.i, x, mn, sc,
             |             CAST(LEAST(CAST(255 AS BIGINT), GREATEST(CAST(0 AS BIGINT),
             |               CAST(FLOOR((x - mn) / sc + CAST(0.5 AS DOUBLE)) AS BIGINT))) AS INT) AS qv
             |      FROM ex JOIN st ON ex.i = st.i)
             |SELECT vec_id, i, qv, ABS(x - (mn + CAST(qv AS DOUBLE) * sc)) AS err
             |FROM q ORDER BY vec_id, i""".stripMargin)),

    // Hard-negative mining for contrastive training: for each probe, the
    // top-5 most-similar vectors with a DIFFERENT label — same broadcast-
    // probes / rank-per-probe shape as ann_bruteforce_topk with the label
    // anti-predicate in the join.
    Q("train_hard_negatives",
      (s, dir) => {
        val vecs = Catalog.load(s, dir, "embeddings")
        val q = vecs.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_vec"), col("label").as("q_label"),
            col("embedding").as("q_emb"),
            Similarity.norm(col("embedding")).as("q_nrm"))
        val v = vecs.select(col("vec_id"), col("label"), col("embedding"),
          Similarity.norm(col("embedding")).as("nrm"))
        import graft.expressions.DotProduct.dot
        val scored = v.join(broadcast(q), col("label") =!= col("q_label"))
          .select(col("q_vec"), col("vec_id").as("neg"),
            (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cos"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_vec").orderBy(col("cos").desc, col("neg").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select("q_vec", "rank", "neg", "cos")
          .orderBy("q_vec", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, label, embedding,
              |                  ${Similarity.normDuck("embedding")} AS nrm FROM embeddings),
              |q AS (SELECT vec_id AS q_vec, label AS q_label, embedding AS q_emb,
              |             ${Similarity.normDuck("embedding")} AS q_nrm FROM embeddings
              |      WHERE vec_id % 100 = 0),
              |scored AS (SELECT q_vec, e.vec_id AS neg,
              |                  ${Similarity.dotDuck("q_emb", "e.embedding")} / (q_nrm * nrm) AS cos
              |           FROM e, q WHERE e.label <> q.q_label),
              |r AS (SELECT q_vec, neg, cos,
              |             ROW_NUMBER() OVER (PARTITION BY q_vec
              |                                ORDER BY cos DESC, neg ASC) AS rank
              |      FROM scored)
              |SELECT q_vec, rank, neg, cos FROM r WHERE rank <= 5
              |ORDER BY q_vec, rank""".stripMargin)),

    // Deterministic shard assignment + within-shard training order: the
    // "global shuffle" step of a training-data writer without any sampling
    // nondeterminism. shard = hash(id) mod nshards; order within a shard is
    // (hash, id) — a pseudo-random permutation both engines reproduce. The
    // write path (ops.Sharding.writeShards) repartitions on the shard and
    // sorts within partitions — one shuffle, no global sort.
    Q("shard_assign",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("h"), col("doc_id"))
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("(doc_id * 1000003 + 12345) % 1000000007").as("h"))
          .withColumn("shard", expr("CAST(h % 8 AS INT)"))
          .withColumn("pos", row_number().over(w))
          .select("doc_id", "shard", "pos")
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |                  (doc_id * 1000003 + 12345) % 1000000007 AS h
             |           FROM documents),
             |a AS (SELECT doc_id, CAST(h % 8 AS INT) AS shard,
             |             CAST(ROW_NUMBER() OVER (PARTITION BY h % 8
             |                                     ORDER BY h, doc_id) AS INT) AS pos
             |      FROM h)
             |SELECT doc_id, shard, pos FROM a ORDER BY doc_id""".stripMargin))
  )
}
