package graft

import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuiteLike

/** Tag for tests excluded from the fast inner loop
  * (`sbt fastTest` ≡ `testOnly * -- -l graft.Slow`); the full `sbt test`
  * is unchanged. Apply per-test (`test("...", Slow)`) or suite-wide by
  * mixing in [[SlowSuite]]. */
object Slow extends Tag("graft.Slow")

/** Marks EVERY test in the mixing suite [[Slow]] — for suites whose cost
  * is structural (streaming micro-batch triggers, Lloyd/PQ trainings,
  * multi-round sweeps) rather than one heavy test. */
trait SlowSuite extends AnyFunSuiteLike {
  override def tags: Map[String, Set[String]] = {
    val base = super.tags
    testNames.iterator
      .map(n => n -> (base.getOrElse(n, Set.empty[String]) + Slow.name))
      .toMap
  }
}
