package graft.functions

/** Text-analysis fragments for training-data curation: language ID
  * (stopword-hit heuristic), quality scoring, token counting, and document
  * fingerprinting. Like [[Hashing]], every fragment is emitted in both the
  * Spark SQL and DuckDB dialects so the conformance oracle computes the
  * identical values: integer counts, plus double arithmetic in a fixed
  * operation order (each division/multiply appears once, same shape in both
  * dialects — IEEE-deterministic).
  *
  * North-star surface: the reference has no string functions at all
  * (SURVEY.md §2.7).
  */
object TextAnalysis {

  /** Small per-language stopword lists for the lang-ID heuristic. */
  val StopEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "on")
  val StopEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "se")
  val StopFr: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "les", "des")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, or punctuation runs. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]+"

  private def litsSpark(xs: Seq[String]) =
    xs.map(x => s"'$x'").mkString("array(", ", ", ")")
  private def litsDuck(xs: Seq[String]) =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Count of tokens in array expr `w` that appear in the word list. */
  def hitsSpark(w: String, words: Seq[String]): String =
    s"size(filter($w, t -> array_contains(${litsSpark(words)}, t)))"
  def hitsDuck(w: String, words: Seq[String]): String =
    s"len(list_filter($w, t -> list_contains(${litsDuck(words)}, t)))"

  /** Predicted language: argmax of stopword hits (ties: en > es > fr). Both
    * dialects share the literal CASE text; `en/es/fr` are column refs of the
    * precomputed hit counts. */
  val langIdCase: String =
    "CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits THEN 'en' " +
      "WHEN es_hits >= fr_hits THEN 'es' ELSE 'fr' END"

  /** Quality score from precomputed columns (identical text both dialects):
    * rewards lexical diversity, caps length contribution at 100 tokens. */
  val qualityScore: String =
    "distinct_ratio * 0.5 + stop_ratio * 0.2 + CAST(least(n_tokens, 100) AS DOUBLE) * 0.003"

  /** Winnowing-lite fingerprint: min polynomial hash over all 8-char
    * windows of the text (shift-resistant content fingerprint). The outer
    * lambda variable is `j` to avoid capture by polyHash's internal `i`. */
  def minWindowHashSpark(text: String, w: Int = 8): String =
    s"array_min(transform(sequence(1, length($text) - ${w - 1}), j -> " +
      s"${Hashing.polyHashSpark(s"substr($text, j, $w)")}))"

  def minWindowHashDuck(text: String, w: Int = 8): String =
    s"list_min(list_transform(range(1, length($text) - ${w - 2}), j -> " +
      s"${Hashing.polyHashDuck(s"substr($text, CAST(j AS INT), $w)")}))"
}
