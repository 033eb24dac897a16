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
    // Measurement-hook audit (round 13): "kc:<n>" / "bigkc:<n>" audits the
    // maxsim kc serve hook at that cell count (quantizer trained UNTIMED,
    // then the same first/warm serve timing + plan walk as a named query).
    val KcRow = "(big)?kc:(\\d+)".r
    args.foreach { q =>
      val run: () => org.apache.spark.sql.DataFrame = q match {
        case KcRow(big, kc) =>
          val quant = graft.queries.SimilarityQ.maxsimQuantizerAtKc(
            spark, dir, kc.toInt, big = big != null)
          () => graft.queries.SimilarityQ.maxsimServeQuantized(
            spark, dir, quant, big = big != null)
        case name => () => SparkEntry.queries(name)(spark, dir)
      }
      val t0 = System.nanoTime()
      val df = run()
      df.count() // finalize the adaptive plan
      val t1 = System.nanoTime()
      run().count() // warm re-run (layouts built)
      val t2 = System.nanoTime()
      // Same serve-plan tree walk as Bench's fingerprint (PlanNodes), so
      // AUDIT numbers and the bench artifact's fp columns are directly
      // comparable.
      val all = graft.engine.PlanNodes.serveNodes(df)
      val hashEx = graft.engine.PlanNodes.hashExchanges(all)
      def n(s: String) = graft.engine.PlanNodes.count(all, s)
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
