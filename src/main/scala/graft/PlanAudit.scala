package graft

/** Plan auditor (dev harness): run named conformance queries against a data
  * dir and print the FINAL adaptive plan's join strategies and exchange
  * counts — the quick check for "did the dimension chain stay broadcast /
  * did a fact-fact join correctly go to sort-merge" at a given scale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.PlanAudit q1 q2 ..."
  * (add SPARK_GRAFT_PLAN=1 to dump the full executed plan per query).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.engine.GraftSession.local("graft-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, dir)
      df.count() // finalize the adaptive plan
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count() // warm re-run (layouts built)
      val t2 = System.nanoTime()
      // Same tree-walk as Bench's fingerprint (descend adaptive wrappers,
      // stop at cache boundaries) so AUDIT numbers and the bench artifact's
      // fp columns are directly comparable — the plan-STRING rendering
      // repeats each cached relation's build plan under every scan site.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case qs: QueryStageExec => nodes(qs.plan)
        case i: InMemoryTableScanExec => Seq(i)
        case other => other +: other.children.flatMap(nodes)
      }
      val all = nodes(df.queryExecution.executedPlan)
      val hashEx = all.count {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
        case _ => false
      }
      val names = all.map(_.nodeName)
      def n(s: String) = names.count(_.contains(s))
      println(s"AUDIT $q broadcastHash=${n("BroadcastHashJoin")}" +
        s" sortMerge=${n("SortMergeJoin")}" +
        s" shuffledHash=${n("ShuffledHashJoin")}" +
        s" nestedLoop=${n("BroadcastNestedLoopJoin")}" +
        s" hashExchanges=$hashEx" +
        s" aqeShuffleReads=${n("AQEShuffleRead")}" +
        f" firstSec=${(t1 - t0) / 1e9}%.2f warmSec=${(t2 - t1) / 1e9}%.2f")
      if (sys.env.contains("SPARK_GRAFT_PLAN"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
