package graft

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Malformed-input behavior of the CSV source — the three parse modes a
  * 100 TB ingest pipeline chooses between (quarantine / drop / abort). */
class SourcesSpec extends SparkSpec {

  private def writeCsv(): String = {
    val dir = Files.createTempDirectory("graft_badcsv")
    Files.writeString(dir.resolve("data.csv"),
      "1,alpha,10.5\n2,beta,not_a_number\n3,gamma,7.25\nbad row only\n")
    dir.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("_corrupt", StringType)))

  test("PERMISSIVE quarantines malformed rows into the corrupt-record column") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(writeCsv())
      .cache() // corrupt-column queries require the full schema materialized
    assert(df.count() == 4)
    val bad = df.filter(col("_corrupt").isNotNull)
      .select("_corrupt").collect().map(_.getString(0)).sorted
    assert(bad.toSeq == Seq("2,beta,not_a_number", "bad row only"))
    // good rows parse fully
    val good = df.filter(col("_corrupt").isNull).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(good.toSeq == Seq(1L, 3L))
  }

  test("DROPMALFORMED malformedness depends on the pruned read schema") {
    // Spark CSV semantics worth pinning: a row is judged against the columns
    // ACTUALLY READ. Reading the full schema, row 2's unconvertible score
    // makes it malformed → dropped. Projecting only `id`, the bad field is
    // never parsed → the row survives. Downstream counts over DROPMALFORMED
    // data therefore vary with column pruning — quarantine with PERMISSIVE
    // when exact row accounting matters.
    val path = writeCsv()
    def read() = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED")
      .csv(path)
    val full = read().select("id", "name", "score").collect().map(_.getLong(0))
    assert(full.sorted.toSeq == Seq(1L, 3L))
    val pruned = read().select("id").collect().map(_.getLong(0))
    assert(pruned.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("FAILFAST aborts on the first malformed row") {
    val ex = intercept[SparkException] {
      spark.read
        .schema(StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST")
        .csv(writeCsv())
        .collect()
    }
    assert(ex.getMessage.contains("Malformed") || ex.getCause != null)
  }
}
