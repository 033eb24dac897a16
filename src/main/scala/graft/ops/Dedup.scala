package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing._

/** Document deduplication operators for large-scale training-data pipelines.
  * Absent from the reference (its scalar surface is comparisons + arithmetic,
  * SURVEY.md §2.7); designed Spark-first for 100 TB:
  *
  *   - every variant is candidate-generation-by-EQUI-JOIN (hash shuffle on a
  *     compact key: text hash, LSH band signature, simhash byte, length
  *     bucket, cluster label) followed by an exact verify on the candidate
  *     pairs only — never an all-pairs cross join;
  *   - no driver-side state, no collect(); skewed buckets are AQE's problem;
  *   - hash arithmetic comes from [[graft.functions.Hashing]] so results are
  *     engine-portable (DuckDB-oracle-checkable), at the cost of running as
  *     Catalyst higher-order functions rather than codegen'd built-ins. At
  *     production scale you'd swap `polyHash` for `xxhash64` (one line) —
  *     the plan shape (shuffle keys, join structure) is identical.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `tieBreak` per distinct
    * `key`. One hash shuffle on the key; at 100 TB dedup on a long text
    * column should key on a digest instead — pass e.g. `xxhash64(text)`. */
  def exactKeepFirst(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(tieBreak.asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Tokenized docs with word-`n`-gram shingle sets; docs shorter than `n`
    * tokens are dropped (dialect-portable guard). Output: idCol, `s`. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), expr(s"split($textCol, ' ')").as("w"))
      .filter(expr(s"size(w) >= $n"))
      .select(col(idCol), expr(shinglesSpark("w", n)).as("s"))

  /** MinHash+LSH near-dup pairs: shingle → polyhash → 32 minhashes → 8 band
    * signatures → equi-join on (band, sig) → exact Jaccard ≥ `threshold`.
    * Output: d1, d2, jacc — one row per near-dup pair, d1 < d2. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    val hs = sh.select(col(idCol), expr(s"transform(s, sh0 -> ${polyHashSpark("sh0")})").as("H"))

    val bandStructs = (0 until Bands)
      .map(b => s"named_struct('band', $b, 'sig', ${bandSigSpark("H", b)})")
      .mkString("array(", ", ", ")")
    val bands = hs
      .select(col(idCol), explode(expr(bandStructs)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))

    val cand = bands.as("l")
      .join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .distinct()

    verifyJaccard(cand, sh, idCol, threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs with length-bucket blocking: docs
    * only pair if their token counts fall in the same or adjacent bucket of
    * `bucketWidth` tokens (each doc emits buckets {b, b+1}; a pair within
    * `bucketWidth` tokens of each other shares one). Equi-join on the bucket,
    * exact Jaccard on candidates. The scalable-but-exact baseline beside
    * [[minhashLshPairs]]. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, bucketWidth: Int): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    val withB = sh.select(col(idCol), (size(col("s")) divide bucketWidth).cast("long").as("b"))
      .select(col(idCol), explode(expr("array(b, b + 1)")).as("bk"))
    val cand = withB.as("l")
      .join(withB.as("r"),
        col("l.bk") === col("r.bk") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .distinct()
    verifyJaccard(cand, sh, idCol, threshold)
  }

  /** SimHash near-dup pairs: 32-bit simhash over token hashes, blocked on any
    * of the 4 simhash bytes matching (standard simhash LSH), verified by
    * Hamming distance ≤ `maxHamming`. Output: d1, d2, ham. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val hs = docs
      .select(col(idCol), expr(s"split($textCol, ' ')").as("w"))
      .select(col(idCol), expr(s"transform(w, t0 -> ${polyHashSpark("t0")})").as("Hs"))
    val sim = hs.select(col(idCol), expr(simhashSpark("Hs")).as("sh"))

    val keyed = sim.select(col(idCol), col("sh"),
      explode(expr("transform(sequence(0, 3), k -> named_struct('k', k, 'byte', shiftright(sh, k*8) & 255))")).as("kb"))
      .select(col(idCol), col("sh"), col("kb.k").as("k"), col("kb.byte").as("byte"))

    keyed.as("l")
      .join(keyed.as("r"),
        col("l.k") === col("r.k") && col("l.byte") === col("r.byte") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"),
        expr(hammingSpark("l.sh", "r.sh")).as("ham"))
      .distinct()
      .filter(col("ham") <= maxHamming)
  }

  /** Embedding near-dup pairs within a coarse partition (IVF-style: `byCol`
    * is the cluster/label column, so the self-join shuffles on it instead of
    * exploding all-pairs): exact cosine ≥ `threshold` on candidates.
    * Output: v1, v2, partition col, cos. */
  def cosinePairs(
      vecs: DataFrame, idCol: String, vecCol: String, byCol: String,
      threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol), col(byCol), col(vecCol))
    v.as("l").join(v.as("r"),
        col(s"l.$byCol") === col(s"r.$byCol") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("v1"), col(s"r.$idCol").as("v2"),
        col(s"l.$byCol").as(byCol),
        expr(Similarity.cosSpark(s"l.$vecCol", s"r.$vecCol")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact Jaccard over candidate pairs (d1, d2) against shingle sets. */
  private def verifyJaccard(
      cand: DataFrame, sh: DataFrame, idCol: String, threshold: Double): DataFrame = {
    val s1 = sh.select(col(idCol).as("d1"), col("s").as("s1"))
    val s2 = sh.select(col(idCol).as("d2"), col("s").as("s2"))
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("jacc",
        expr("CAST(size(array_intersect(s1, s2)) AS DOUBLE) / " +
          "(size(s1) + size(s2) - size(array_intersect(s1, s2)))"))
      .filter(col("jacc") >= threshold)
      .select("d1", "d2", "jacc")
  }
}
