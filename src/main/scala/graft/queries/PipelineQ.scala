package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.functions.Hashing.polyHashDuck
import graft.ops.Pipeline

/** Oracle-checked event-pipeline / feature-engineering queries: ordered
  * funnel conversion, SCD2 dimension snapshots, URL canonicalization dedup,
  * and hashing-trick vectorization. */
object PipelineQ {

  /** Deterministic synthetic URL per doc (the corpus has no URL column):
    * mixed-case host, utm tracking params around a real `id` param, a
    * fragment, and a trailing-slash path — every mess the canonicalizer
    * must clean. doc_id mod-cycles make distinct raw URLs collide after
    * canonicalization (lcm(5,25,7) = 175 canonical keys). */
  private val urlSpark =
    concat(lit("https://WWW.Example"), (col("doc_id") % 5).cast("string"),
      lit(".COM/Path"), (col("doc_id") % 25).cast("string"),
      lit("/?utm_source=feed&id="), (col("doc_id") % 7).cast("string"),
      lit("&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
      lit("#sec"), col("doc_id").cast("string"))

  private val urlDuck =
    "'https://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) || " +
      "'.COM/Path' || CAST(doc_id % 25 AS VARCHAR) || " +
      "'/?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) || " +
      "'&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR) || " +
      "'#sec' || CAST(doc_id AS VARCHAR)"

  val all: Seq[Q] = Seq(

    // Ordered view→click→purchase funnel: earliest stage-i time strictly
    // after the chosen stage-(i-1) time, one shuffle on user_id.
    Q("funnel_conversion",
      (s, dir) =>
        Pipeline.funnel(Catalog.load(s, dir, "events"),
            "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
          .orderBy("user_id"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type AS t
             |           FROM events),
             |v AS (SELECT user_id,
             |        MIN(CASE WHEN t = 'view' THEN us END) AS t_view_us
             |      FROM e GROUP BY user_id),
             |c AS (SELECT e.user_id,
             |        MIN(CASE WHEN t = 'click' AND us > t_view_us THEN us END)
             |          AS t_click_us
             |      FROM e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id),
             |p AS (SELECT e.user_id,
             |        MIN(CASE WHEN t = 'purchase' AND us > t_click_us THEN us END)
             |          AS t_purchase_us
             |      FROM e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id)
             |SELECT v.user_id, t_view_us, t_click_us, t_purchase_us,
             |  CAST(CASE WHEN t_purchase_us IS NOT NULL THEN 3
             |            WHEN t_click_us IS NOT NULL THEN 2
             |            WHEN t_view_us IS NOT NULL THEN 1
             |            ELSE 0 END AS INT) AS stage_reached
             |FROM v JOIN c ON v.user_id = c.user_id
             |       JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // SCD2 snapshot from the event change log: per-user validity intervals
    // [ts, next ts), open-ended current row, event_id tiebreak.
    Q("scd2_user_state",
      (s, dir) =>
        Pipeline.scd2(Catalog.load(s, dir, "events"),
            "user_id", "ts", "event_id", "event_type")
          .orderBy("user_id", "valid_from_us", "event_id"),
      Some("""WITH e AS (SELECT user_id, event_id, event_type AS state,
             |                  epoch_us(ts) AS valid_from_us FROM events)
             |SELECT user_id, event_id, state, valid_from_us,
             |  LEAD(valid_from_us) OVER (PARTITION BY user_id
             |       ORDER BY valid_from_us, event_id) AS valid_to_us,
             |  LEAD(valid_from_us) OVER (PARTITION BY user_id
             |       ORDER BY valid_from_us, event_id) IS NULL AS is_current
             |FROM e ORDER BY user_id, valid_from_us, event_id""".stripMargin)),

    // URL canonicalization + keep-first dedup by canonical key.
    Q("dedup_url_canonical",
      (s, dir) =>
        Pipeline.dedupByCanonicalUrl(
            Catalog.load(s, dir, "documents")
              .select(col("doc_id"), urlSpark.as("url")),
            "doc_id", "url")
          .select("doc_id", "url_canon", "rn", "kept")
          .orderBy("doc_id"),
      Some(s"""WITH u AS (SELECT doc_id, $urlDuck AS url FROM documents),
              |c AS (SELECT doc_id,
              |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              |    regexp_replace(
              |      lower(regexp_extract(regexp_replace(url, '#.*$$', ''),
              |                           '^(https?://[^/?]+)', 1)) ||
              |      regexp_replace(regexp_replace(url, '#.*$$', ''),
              |                     '^https?://[^/?]+', ''),
              |    '&utm_[a-z_]+=[^&]*', '', 'g'),
              |    '\\?utm_[a-z_]+=[^&]*&', '?'),
              |    '\\?utm_[a-z_]+=[^&]*$$', ''),
              |    '/\\?', '?'),
              |    '/$$', '') AS url_canon
              |  FROM u),
              |r AS (SELECT doc_id, url_canon,
              |        CAST(ROW_NUMBER() OVER (PARTITION BY url_canon
              |             ORDER BY doc_id) AS INT) AS rn
              |      FROM c)
              |SELECT doc_id, url_canon, rn, rn = 1 AS kept
              |FROM r ORDER BY doc_id""".stripMargin)),

    // Hashing-trick bag-of-words: sparse (doc, bucket, tf) rows, 256-dim.
    Q("feature_hash_vectorize",
      (s, dir) =>
        Pipeline.hashVectorize(Catalog.load(s, dir, "documents"),
            "doc_id", "text", dim = 256)
          .orderBy("doc_id", "bucket"),
      Some(s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              |          FROM documents),
              |h AS (SELECT doc_id,
              |        CAST(${polyHashDuck("tok")} % 256 AS INT) AS bucket
              |      FROM t)
              |SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
              |FROM h GROUP BY doc_id, bucket
              |ORDER BY doc_id, bucket""".stripMargin))
  )
}
