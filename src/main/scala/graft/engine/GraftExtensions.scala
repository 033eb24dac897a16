package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BoundedLevenshtein, DotProduct, IntersectSize, JaroWinkler, PolyHash, ZOrderValue}

/** Registers the graft native expressions with the SQL front, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works like any built-in:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.engine.GraftExtensions")
  * }}}
  *
  * This is the `SparkSessionExtensions.injectFunction` path — the same
  * mechanism third-party engines use to extend Spark SQL without forking it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(
      name: String,
      builder: Seq[Expression] => Expression,
      usage: String): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf"),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_dot",
      { case Seq(a, b) => DotProduct(a, b) },
      "graft_dot(a, b) - dot product of two array<float> vectors (double)."))
    ext.injectFunction(fn("graft_intersect_size",
      { case Seq(a, b) => IntersectSize(a, b) },
      "graft_intersect_size(a, b) - |a ∩ b| of two sorted distinct array<bigint>."))
    ext.injectFunction(fn("graft_polyhash",
      { case Seq(a) => PolyHash(a) },
      "graft_polyhash(s) - polynomial rolling hash (mod 1e9+7) of a string."))
    ext.injectFunction(fn("graft_zorder",
      { case Seq(a, b) => ZOrderValue(a, b) },
      "graft_zorder(x, y) - Morton-interleaved z-order value of two ints (bigint)."))
    ext.injectFunction(fn("graft_jaro_winkler",
      { case Seq(a, b) => JaroWinkler(a, b) },
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity over UTF-8 bytes " +
        "(DuckDB-bit-compatible)."))
    ext.injectFunction(fn("graft_lev_bounded",
      { case Seq(a, b, k) =>
        BoundedLevenshtein(a, b,
          k.eval().asInstanceOf[Number].intValue()) },
      "graft_lev_bounded(a, b, k) - min(levenshtein(a, b), k+1) via banded O(len*k) DP."))
    // abs(e) <= r → -r <= e <= r: makes symmetric-distance predicates
    // pushdown-eligible (see graft.plans.AbsRangeRewrite).
    ext.injectOptimizerRule(_ => graft.plans.AbsRangeRewrite)
  }
}
