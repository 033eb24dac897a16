package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Executed-scan metrics extraction — the ONLY trustworthy evidence that a
  * partition-pruned layout actually pruned at runtime.
  *
  * Plan strings lie twice over: a filter Catalyst degraded to
  * `dynamicpruningexpression(true)` still contains the word
  * "dynamicpruning" (the r14 MaxSim forward layout shipped one round as
  * decoration because a pin matched that string), and a static IN filter
  * proves selection only at planning — whether the scan READ fewer files is
  * a runtime fact. This helper reads it off the executed plan: run the
  * DataFrame (`df.collect()` — NOT `df.count()`, which spawns a separate
  * QueryExecution and leaves df's own metrics at zero), then pull
  * `numFiles`/`filesSize` (post-pruning) and `staticFilesNum`/
  * `staticFilesSize` (pre-DPP totals — present ONLY when a live dynamic
  * filter executed) from the matching `FileSourceScanExec`.
  */
object ScanMetrics {

  /** All FileSourceScanExec nodes under `p`, traversing AQE wrappers
    * (`AdaptiveSparkPlanExec.executedPlan`, `QueryStageExec.plan`) and
    * subqueries. */
  def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case o => (o.children ++ o.subqueries).flatMap(scans)
  }

  /** Metrics of the executed scan whose root path contains `tag`:
    * (numFiles, staticFilesNum, filesSize, staticFilesSize), each -1 when
    * the metric is absent. `staticFilesNum` exists only when the scan
    * carried a LIVE dynamic pruning filter — its absence on a DPP-claimed
    * scan means the filter never ran (and must read as -1, loudly, not as
    * 100%-selected). AQE re-instantiates stage plans, so the tree can hold
    * both an executed scan (metrics set) and a never-run copy (zeros) —
    * the populated one wins. */
  def forPath(df: DataFrame, tag: String): Option[(Long, Long, Long, Long)] = {
    val matches = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(tag)))
    if (matches.isEmpty) None
    else {
      def m(f: FileSourceScanExec, n: String, alt: Long) =
        f.metrics.get(n).map(_.value).getOrElse(alt)
      val f = matches.maxBy(x => m(x, "numFiles", -1L))
      Some((m(f, "numFiles", -1L), m(f, "staticFilesNum", -1L),
        m(f, "filesSize", -1L), m(f, "staticFilesSize", -1L)))
    }
  }

  /** Total parquet data files under `dir` (recursive) — the denominator a
    * statically pruned scan's `numFiles` is compared against (static
    * pruning happens at planning, so the scan itself reports no pre-prune
    * total the way a live DPP scan's `staticFilesNum` does). */
  def parquetFilesUnder(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }
}
