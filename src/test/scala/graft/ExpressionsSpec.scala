package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProduct.dot
import graft.expressions.IntersectSize.intersectSize
import graft.expressions.PolyHash.polyHash
import graft.functions.Hashing

class ExpressionsSpec extends SparkSpec {

  test("DotProduct matches the SQL higher-order formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.0f)))
      .toDF("a", "b")
    val native = df.select(dot(col("a"), col("b"))).collect()(0).getDouble(0)
    val hof = df.selectExpr(
      "aggregate(transform(sequence(1, size(a)), i -> " +
        "CAST(element_at(a, i) AS DOUBLE) * CAST(element_at(b, i) AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (x, y) -> x + y)").collect()(0).getDouble(0)
    assert(native === hof)
    assert(native === 1.5 * 0.5 + -2.25 * 4.0 + 3.125 * -1.0)
  }

  test("SqDist matches the zip_with/aggregate formulation bit-for-bit, " +
      "on float and double arrays (all four side combinations)") {
    import graft.expressions.SqDist.sqDist
    import spark.implicits._
    val hof = "aggregate(zip_with(%s, %s, (x, y) -> " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
      "CAST(0 AS DOUBLE), (a, b) -> a + b)"
    val df = Seq((Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.0f)))
      .toDF("af", "bf")
      .withColumn("ad", expr("transform(af, x -> CAST(x AS DOUBLE))"))
      .withColumn("bd", expr("transform(bf, x -> CAST(x AS DOUBLE))"))
    for ((a, b) <- Seq(("af", "bf"), ("af", "bd"), ("ad", "bf"), ("ad", "bd"))) {
      val native = df.select(sqDist(col(a), col(b))).collect()(0).getDouble(0)
      val ref = df.selectExpr(hof.format(a, b)).collect()(0).getDouble(0)
      assert(native === ref, s"($a, $b)")
      assert(native === { // left-to-right fold, double widening
        val x = Seq(1.5, -2.25, 3.125); val y = Seq(0.5, 4.0, -1.0)
        ((x(0) - y(0)) * (x(0) - y(0)) + (x(1) - y(1)) * (x(1) - y(1))) +
          (x(2) - y(2)) * (x(2) - y(2))
      })
    }
  }

  test("SqDist is null-safe and survives both codegen and interpreted paths") {
    import graft.expressions.SqDist.sqDist
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f)))).toDF("a", "b")
    assert(df.select(sqDist(col("a"), col("b"))).collect()(0).isNullAt(0))
    // Interpreted path (eval): force it through an aggregation expression
    // tree where codegen falls back.
    val vals = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 5.0f))).toDF("a", "b")
    val viaFilter = vals.filter(sqDist(col("a"), col("b")) > 0).count()
    assert(viaFilter === 1)
    assert(vals.select(sqDist(col("a"), col("b"))).collect()(0).getDouble(0)
      === 13.0)
  }

  test("DotProduct is null-safe") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Float]], Option(Seq(1.0f)))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("IntersectSize equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(7L), Seq(7L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)))
    val df = cases.toDF("a", "b")
    val got = df.select(intersectSize(col("a"), col("b"))).collect().map(_.getInt(0))
    val want = df.selectExpr("size(array_intersect(a, b))").collect().map(_.getInt(0))
    assert(got.toSeq === want.toSeq)
  }

  test("PolyHash matches the dual-dialect SQL fragment on ASCII text") {
    import spark.implicits._
    val df = Seq("hello", "", "the quick brown fox", "a").toDF("s")
    val native = df.select(polyHash(col("s"))).collect().map(_.getLong(0))
    val frag = df.selectExpr(Hashing.polyHashSpark("s")).collect().map(_.getLong(0))
    assert(native.toSeq === frag.toSeq)
    // reference value: fold of 'hello' codes
    var h = 0L
    "hello".foreach(c => h = (h * 31 + c.toLong) % Hashing.P)
    assert(native(0) === h)
  }

  test("TopKAggregate matches the window formulation, incl. ties and small groups") {
    import graft.expressions.TopKAggregate.topK
    import spark.implicits._
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 7.0, 12L), (1L, 1.0, 13L), (1L, 7.0, 9L),
      (2L, 3.0, 20L) // group smaller than k
    ).toDF("g", "score", "id").repartition(4) // force partial buffers + merge
    val got = df.groupBy("g").agg(topK(col("score"), col("id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.score"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (1L, 0, 7.0, 9L), (1L, 1, 7.0, 12L), (1L, 2, 5.0, 10L),
      (2L, 0, 3.0, 20L)))
  }

  test("BoundedLevenshtein matches the built-in below the bound and saturates above") {
    import spark.implicits._
    val df = Seq(
      ("kitten", "sitting"),   // dist 3
      ("flaw", "lawn"),        // dist 2
      ("abc", "abc"),          // dist 0
      ("", "abc"),             // dist 3 (insert-only)
      ("abcdefgh", ""),        // dist 8
      ("short", "a much longer string")) // length gap beyond any small k
      .toDF("a", "b")
    for (k <- Seq(0, 1, 3, 8)) {
      val got = df.select(
        graft.expressions.BoundedLevenshtein.boundedLev(col("a"), col("b"), k))
        .collect().map(_.getInt(0))
      val want = df.select(least(levenshtein(col("a"), col("b")), lit(k + 1)))
        .collect().map(_.getInt(0))
      assert(got.toSeq === want.toSeq, s"k=$k")
    }
    // null-safe like the built-in
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(nulls.select(
      graft.expressions.BoundedLevenshtein.boundedLev(col("a"), col("b"), 2))
      .collect()(0).isNullAt(0))
  }

  test("JaroWinkler: textbook values, empty semantics, null-safety") {
    import spark.implicits._
    import graft.expressions.JaroWinkler.jaroWinkler
    val got = Seq(
      ("martha", "marhta"),  // classic: jaro 0.9444..., prefix 3 → 0.9611...
      ("dixon", "dicksonx"),
      ("abc", "abc"),        // identical → 1.0
      ("", "abc"),           // either-empty → 0.0 (DuckDB semantics)
      ("", ""),              // both-empty → 0.0 (DuckDB, NOT the 1.0 convention)
      ("abc", "xyz"))        // no matches → 0.0
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got(0) === (0.9444444444444445 + 3 * 0.1 * (1.0 - 0.9444444444444445)))
    assert(got(1) > 0.78 && got(1) < 0.82) // 0.8133... (prefix 2)
    assert(got(2) === 1.0)
    assert(got(3) === 0.0)
    assert(got(4) === 0.0)
    assert(got(5) === 0.0)
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
    assert(nulls.select(jaroWinkler(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  test("extensions expose the functions to SQL") {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_polyhash('hello') AS h, " +
        "graft_zorder(3, 5) AS z, " +
        "graft_lev_bounded('kitten', 'sitting', 2) AS lev, " +
        "graft_jaro_winkler('martha', 'marhta') AS jw FROM vecs").collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getLong(1) === 99162322L)
    assert(r.getLong(2) === graft.expressions.ZOrderValue.interleave(3, 5))
    assert(r.getInt(3) === 3) // true distance 3 saturates at k+1
    assert(r.getDouble(4) > 0.96 && r.getDouble(4) < 0.962)
  }
}
