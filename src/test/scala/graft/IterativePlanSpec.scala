package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Pins the lineage-truncation contract of the iterative graph ops
  * (connectedComponents / labelPropagation / pageRank): the returned frame's
  * LOGICAL plan stays constant-size regardless of round count (each
  * localCheckpoint segment rebases on cached RDD blocks), and truncation
  * changes nothing about the results. The failure mode this guards —
  * driver-side planning/stack blowup at high round counts — is invisible at
  * the 3 rounds the conformance queries run. */
class IterativePlanSpec extends SparkSpec with SlowSuite {

  private def planSize(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case n => n }.length

  // Path graph 0-1-2-…-15: min-label/seed information travels ONE hop per
  // round, forcing ~14 rounds — far past every checkpoint cadence.
  private def pathNodes = {
    import spark.implicits._
    (0L to 15L).toDF("id")
  }
  private def pathEdges = {
    import spark.implicits._
    (0L until 15L).map(i => (i, i + 1)).toDF("d1", "d2")
  }

  test("connectedComponents: bounded plan at high round count, result exact") {
    val cc = Dedup.connectedComponents(pathNodes, pathEdges, "id")
    assert(planSize(cc) <= 6, s"plan grew with rounds:\n${cc.queryExecution.optimizedPlan}")
    val got = cc.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq === (0L to 15L).map(i => (i, 0L)))
  }

  test("labelPropagation: bounded plan, 12-round spread correct, truncation value-neutral") {
    import spark.implicits._
    val seeds = Seq((0L, 7L)).toDF("id", "lab")
    val many = Dedup.labelPropagation(pathNodes, pathEdges, "id", seeds, "lab",
      rounds = 15)
    assert(planSize(many) <= 6, s"plan grew with rounds:\n${many.queryExecution.optimizedPlan}")
    // the seed label walks the whole path: every node ends labeled 7
    val labels = many.collect().map(r => (r.getLong(0), r.get(1)))
    assert(labels.forall(_._2 == 7L), s"unspread labels: ${labels.mkString(",")}")
    // checkpoint cadence must not change values — compare against a run whose
    // cadence never fires mid-loop (single final cut only)
    val a = Dedup.labelPropagation(pathNodes, pathEdges, "id", seeds, "lab",
      rounds = 5, checkpointEvery = 2).orderBy("id").collect().toSeq
    val b = Dedup.labelPropagation(pathNodes, pathEdges, "id", seeds, "lab",
      rounds = 5, checkpointEvery = 100).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("bfsDistance: bounded plan at 15 hops, truncation value-neutral") {
    import spark.implicits._
    val seeds = Seq(0L).toDF("id")
    val bfs = Dedup.bfsDistance(pathNodes, pathEdges, "id", seeds, maxHops = 15)
    assert(planSize(bfs) <= 6, s"plan grew with hops:\n${bfs.queryExecution.optimizedPlan}")
    // hop distance along the path IS the node index
    val got = bfs.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L to 15L).map(i => (i, i)))
    val a = Dedup.bfsDistance(pathNodes, pathEdges, "id", seeds,
      maxHops = 6, checkpointEvery = 2).orderBy("id").collect().toSeq
    val b = Dedup.bfsDistance(pathNodes, pathEdges, "id", seeds,
      maxHops = 6, checkpointEvery = 100).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("weightedDistance: bounded plan at 15 rounds, truncation value-neutral") {
    import spark.implicits._
    val seeds = Seq(0L).toDF("id")
    val wEdges = pathEdges.withColumn("w", col("d2") * 10L) // edge i→i+1 weighs 10(i+1)
    val bf = Dedup.weightedDistance(pathNodes, wEdges, "id", "w", seeds,
      maxRounds = 15)
    assert(planSize(bf) <= 6, s"plan grew with rounds:\n${bf.queryExecution.optimizedPlan}")
    // distance to node k = 10 * (1 + 2 + … + k)
    val got = bf.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L to 15L).map(i => (i, 10L * i * (i + 1) / 2)))
    val a = Dedup.weightedDistance(pathNodes, wEdges, "id", "w", seeds,
      maxRounds = 6, checkpointEvery = 2).orderBy("id").collect().toSeq
    val b = Dedup.weightedDistance(pathNodes, wEdges, "id", "w", seeds,
      maxRounds = 6, checkpointEvery = 100).orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("pageRank: bounded plan at 9 iterations, truncation value-neutral") {
    val pr9 = Dedup.pageRank(pathNodes, pathEdges, "id", iters = 9)
    assert(planSize(pr9) <= 6, s"plan grew with iters:\n${pr9.queryExecution.optimizedPlan}")
    val a = pr9.orderBy("id").collect().toSeq
    val b = Dedup.pageRank(pathNodes, pathEdges, "id", iters = 9,
      checkpointEvery = 100).orderBy("id").collect().toSeq
    assert(a === b)
  }
}
