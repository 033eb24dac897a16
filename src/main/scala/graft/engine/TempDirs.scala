package graft.engine

import java.nio.file.{Files, Path}

/** Temp-dir factory with recursive delete at JVM exit.
  *
  * Plain `Files.createTempDirectory` leaks: nine rounds of bench/verify
  * sessions had left ~4300 orphaned `graft_*` dirs (56 GB — the XML-export
  * layout alone writes 2.4 GB per session) under /tmp. That slow fill is a
  * real failure mode twice over: a DuckDB oracle died on a full disk this
  * round, and sustained page-cache pressure from a near-full disk is the
  * best remaining explanation for round 9's `dedup_ngram_jaccard` ×2.3
  * "regression" — bit-identical plans, low warm spread, yet consistently
  * slower, and unreproducible on a clean box (r10 re-measured 1.2 s).
  * Session artifacts (indexes, layouts, exports) are session-scoped by
  * design, so their dirs die with the JVM.
  */
object TempDirs {

  private val created = scala.collection.mutable.ArrayBuffer.empty[Path]

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.synchronized {
        created.foreach { p =>
          try deleteRecursively(p.toFile)
          catch { case _: Throwable => () } // exit-path best effort
        }
      }
    }, "graft-tempdir-cleanup"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    // Never descend through a directory SYMLINK: File.listFiles follows
    // links, so a session artifact containing a link into the source data
    // dir would get the link TARGET's contents deleted. Deleting the link
    // itself (File.delete removes the link, not the target) is the whole
    // cleanup obligation.
    if (!Files.isSymbolicLink(f.toPath)) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(); ()
  }

  /** Create a temp directory deleted (recursively) when this JVM exits. */
  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.synchronized { created += p }
    p.toString
  }
}
