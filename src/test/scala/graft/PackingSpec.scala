package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.Packing

class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("distributed global cumsum equals the single-window formulation for any partition count") {
    val docs = Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), expr("size(split(text, ' '))").cast("long").as("n"))
    val single = docs
      .withColumn("cum", sum("n").over(Window.orderBy("doc_id")))
      .select("doc_id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 3, 32)) {
      val dist = Packing.globalCumsum(docs, "doc_id", col("n"), "cum", parts)
        .select("doc_id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == single, s"parts=$parts")
    }
  }

  test("packSequences bins are sequential and respect the offset-based budget") {
    val docs = Catalog.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val packed = Packing.packSequences(docs, "doc_id",
        expr("size(split(text, ' '))").cast("long"), budget = 512)
      .select("doc_id", "n", "cum", "bin")
      .orderBy("doc_id").collect()
    packed.foreach { r =>
      val (n, cum, bin) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bin == (cum - n) / 512)
    }
    // bins are nondecreasing in doc order and start at 0
    val bins = packed.map(_.getLong(3))
    assert(bins.head == 0L)
    assert(bins.sliding(2).forall { case Array(a, b) => b >= a; case _ => true })
  }
}
