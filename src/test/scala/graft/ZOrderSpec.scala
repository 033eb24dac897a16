package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.expressions.ZOrderValue
import graft.ops.Layout

class ZOrderSpec extends SparkSpec {

  test("interleave puts x in even bits, y in odd bits, order-preserving") {
    assert(ZOrderValue.spread(0L) == 0L)
    assert(ZOrderValue.spread(0xffffffffL) == 0x5555555555555555L)
    // sign-flip maps Int.MinValue → code 0, so (min,min) is the curve origin
    assert(ZOrderValue.interleave(Int.MinValue, Int.MinValue) == 0L)
    assert(ZOrderValue.interleave(Int.MinValue + 1, Int.MinValue) == 1L)
    assert(ZOrderValue.interleave(Int.MinValue, Int.MinValue + 1) == 2L)
    assert(ZOrderValue.interleave(-1, -1) == 0x3fffffffffffffffL)
    // within a fixed y, z is monotone in x (same quadrant ordering)
    val ys = 7
    val zs = (0 to 100).map(x => ZOrderValue.interleave(x, ys))
    assert(zs == zs.sorted)
  }

  test("codegen and interpreted paths agree") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 501 - 250).cast("int").as("x"),
      (col("id") * 91 % 997 - 498).cast("int").as("y"))
    val got = df.select(col("x"), col("y"),
        ZOrderValue.zorder(col("x"), col("y")).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrderValue.interleave(r.getInt(0), r.getInt(1)))
    }
  }

  test("z-ordered files are clustered in BOTH dimensions") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_zspec").toString + "/t"
    Layout.writeZOrdered(
      Catalog.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey"),
      tmp, col("l_partkey").cast("int"), col("l_suppkey").cast("int"),
      numFiles = 8)
    val perFile = spark.read.parquet(tmp)
      .groupBy(input_file_name().as("f"))
      .agg(
        (max("l_partkey") - min("l_partkey")).as("p_span"),
        (max("l_suppkey") - min("l_suppkey")).as("s_span"))
      .collect()
    val full = spark.read.parquet(tmp)
      .agg((max("l_partkey") - min("l_partkey")).as("p"),
        (max("l_suppkey") - min("l_suppkey")).as("s")).head
    val (pFull, sFull) = (full.getLong(0), full.getLong(1))
    assert(perFile.length >= 4)
    // Files AVERAGE a strict fraction of BOTH domains. (Per-file bounds
    // would be too strong: an equal-count curve segment that straddles a
    // top-bit quadrant transition legitimately spans the other dimension.)
    // A single-column sort leaves the unsorted dimension averaging ~full
    // range, so this is the property that distinguishes z-order.
    val pAvg = perFile.map(_.getLong(1)).sum.toDouble / perFile.length
    val sAvg = perFile.map(_.getLong(2)).sum.toDouble / perFile.length
    assert(pAvg <= pFull * 0.65, s"avg partkey span $pAvg vs full $pFull")
    assert(sAvg <= sFull * 0.65, s"avg suppkey span $sAvg vs full $sFull")
  }
}
