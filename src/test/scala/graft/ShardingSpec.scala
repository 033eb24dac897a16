package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.Sharding

class ShardingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("writeShards: one file per shard dir, lossless, pruned read-back") {
    val out = Files.createTempDirectory("shards").toString
    val docs = Catalog.load(spark, dir, "documents").select("doc_id", "n_chars")
    Sharding.writeShards(docs, "doc_id", 8, out)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == (0 until 8).map(k => s"shard=$k"))
    dirs.foreach { d =>
      val files = new java.io.File(s"$out/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())

    // partition pruning reaches the scan
    val plan = back.filter(col("shard") === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("within-shard row order is the deterministic (hash, id) permutation") {
    val out = Files.createTempDirectory("shards").toString
    val docs = Catalog.load(spark, dir, "documents").select("doc_id")
    Sharding.writeShards(docs, "doc_id", 4, out)

    val expected = Sharding.assignShards(docs, "doc_id", 4)
      .filter(col("shard") === 2).orderBy(col("_h"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // one file per shard → read order IS file order
    val actual = spark.read.parquet(s"$out/shard=2")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(actual == expected)
  }
}
