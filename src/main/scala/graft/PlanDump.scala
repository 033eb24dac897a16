package graft

/** Explain-plan dumper (dev harness, round 17): write
  * `df.explain("formatted")` output for named conformance queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/r<N>/`.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> \
  *   sbt "runMain graft.PlanDump <outDir> <suffix> q1 q2 ..."
  * writes `<outDir>/<query>_<suffix>.txt` per query. The dump is the
  * ANALYZED-through-PHYSICAL formatted explain of the constructed frame
  * (pre-execution, `AdaptiveSparkPlan isFinalPlan=false`) followed by the
  * EXECUTED plan string after one collect — both, because static shape
  * (pushed filters, join strategy, exchange placement) reads best from the
  * formatted form while runtime facts (AQE re-staging, reused exchanges)
  * only exist on the executed plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.engine.GraftSession.local("graft-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(2).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        s"== explain(formatted), pre-execution ==\n$formatted\n" +
          s"== executed plan (after one collect) ==\n$executed\n")
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
