package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.functions.Hashing._
import graft.functions.TextAnalysis._

/** Oracle-checked text-analysis queries over `documents`. */
object TextQ {

  val all: Seq[Q] = Seq(

    // Token counting: whitespace tokens + BPE-ish pre-tokenizer runs.
    Q("text_token_count",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"),
            expr("length(text)").as("n_chars2"),
            expr("size(split(text, ' '))").as("n_ws_tokens"),
            expr(s"size(regexp_extract_all(text, '$BpePattern', 0))").as("n_bpe_tokens"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, length(text) AS n_chars2,
              |  len(string_split(text, ' ')) AS n_ws_tokens,
              |  len(regexp_extract_all(text, '$BpePattern')) AS n_bpe_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: lexical diversity, stopword ratio, length-capped score.
    Q("text_quality",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"), expr("split(text, ' ')").as("w"))
          .select(col("doc_id"),
            expr("size(w)").as("n_tokens"),
            expr("CAST(size(array_distinct(w)) AS DOUBLE) / size(w)").as("distinct_ratio"),
            expr(s"CAST(${hitsSpark("w", StopEn)} AS DOUBLE) / size(w)").as("stop_ratio"))
          .withColumn("quality", expr(qualityScore))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              |x AS (SELECT doc_id, len(w) AS n_tokens,
              |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
              |  CAST(${hitsDuck("w", StopEn)} AS DOUBLE) / len(w) AS stop_ratio
              |FROM d)
              |SELECT doc_id, n_tokens, distinct_ratio, stop_ratio,
              |       $qualityScore AS quality
              |FROM x ORDER BY doc_id""".stripMargin)),

    // Language ID: stopword-hit argmax vs the labeled lang column.
    Q("text_langid",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), expr("split(text, ' ')").as("w"))
          .select(col("doc_id"), col("lang"),
            expr(hitsSpark("w", StopEn)).as("en_hits"),
            expr(hitsSpark("w", StopEs)).as("es_hits"),
            expr(hitsSpark("w", StopFr)).as("fr_hits"))
          .withColumn("pred_lang", expr(langIdCase))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
              |x AS (SELECT doc_id, lang,
              |  ${hitsDuck("w", StopEn)} AS en_hits,
              |  ${hitsDuck("w", StopEs)} AS es_hits,
              |  ${hitsDuck("w", StopFr)} AS fr_hits
              |FROM d)
              |SELECT doc_id, lang, en_hits, es_hits, fr_hits,
              |       $langIdCase AS pred_lang
              |FROM x ORDER BY doc_id""".stripMargin)),

    // Deterministic train/test split: hash-of-id bucketing (stable across
    // runs, engines, and cluster layouts — the only sane way to split at
    // 100 TB; row-order sampling is not reproducible).
    Q("split_train_test",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"),
            expr(s"${polyHashSpark("CAST(doc_id AS STRING)")} % 100").as("bucket"))
          .withColumn("split", when(col("bucket") < 80, "train").otherwise("test"))
          .select("doc_id", "bucket", "split")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, ${polyHashDuck("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
              |  CASE WHEN ${polyHashDuck("CAST(doc_id AS VARCHAR)")} % 100 < 80
              |       THEN 'train' ELSE 'test' END AS split
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Document chunking: fixed-size token windows with overlap (chunk 64,
    // stride 48) — the standard context-window prep step. Chunk starts are
    // generated per doc with sequence+explode; text rebuilt by slicing the
    // token array.
    Q("text_chunking",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"), expr("split(text, ' ')").as("w"))
          .select(col("doc_id"), col("w"),
            explode(expr("sequence(1, greatest(size(w) - 16, 1), 48)")).as("start"))
          .select(col("doc_id"), col("start"),
            expr("array_join(slice(w, start, 64), ' ')").as("chunk_text"),
            expr("size(slice(w, start, 64))").as("chunk_tokens"))
          .orderBy("doc_id", "start"),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |st AS (SELECT doc_id, w,
             |              unnest(range(1, greatest(len(w) - 16, 1) + 1, 48)) AS start
             |       FROM d)
             |SELECT doc_id, start,
             |  array_to_string(list_slice(w, start, start + 63), ' ') AS chunk_text,
             |  len(list_slice(w, start, start + 63)) AS chunk_tokens
             |FROM st ORDER BY doc_id, start""".stripMargin)),

    // Text normalization: lowercase, strip non-alphanumerics, collapse
    // whitespace — the first pass of every training-data cleaning pipeline,
    // all codegen'd regexp built-ins. (DuckDB needs the explicit 'g' flag;
    // Spark replaces all matches by default.)
    Q("text_normalize",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"),
            trim(regexp_replace(regexp_replace(lower(col("text")),
              "[^a-z0-9 ]", " "), " +", " ")).as("norm_text"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(lower(text),
             |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Stratified sampling: per-class (language) keep-rates via hash-of-id
    // bucketing — deterministic across engines, runs, and cluster layouts,
    // unlike row-order TABLESAMPLE. The class-rebalancing step of corpus
    // construction.
    Q("sample_stratified",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .withColumn("bucket",
            expr(s"${polyHashSpark("CAST(doc_id AS STRING)")} % 100"))
          .withColumn("rate",
            when(col("lang") === "en", 80)
              .when(col("lang") === "es", 50).otherwise(20))
          .filter(col("bucket") < col("rate"))
          .select("doc_id", "lang", "bucket", "rate")
          .orderBy("doc_id"),
      Some(s"""WITH b AS (SELECT doc_id, lang,
              |  ${polyHashDuck("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
              |  CASE lang WHEN 'en' THEN 80 WHEN 'es' THEN 50 ELSE 20 END AS rate
              |FROM documents)
              |SELECT doc_id, lang, bucket, CAST(rate AS INT) AS rate
              |FROM b WHERE bucket < rate ORDER BY doc_id""".stripMargin)),

    // Sequence packing: docs assigned to 512-token training bins by exact
    // GLOBAL prefix sum — computed distributed (two-phase partition scan +
    // broadcast offsets, ops.Packing) yet bit-identical to the oracle's
    // single global window.
    Q("pack_sequences",
      (s, dir) =>
        graft.ops.Packing.packSequences(
            Catalog.load(s, dir, "documents").select(col("doc_id"), col("text")),
            "doc_id", expr("size(split(text, ' '))").cast("long"), budget = 512)
          .select("doc_id", "n", "cum", "bin")
          .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |       FROM documents),
             |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM t)
             |SELECT doc_id, n, CAST(cum AS BIGINT) AS cum,
             |       (CAST(cum AS BIGINT) - n) // 512 AS bin
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Document fingerprinting: whole-text polynomial hash + winnowing-lite
    // min-8-gram-window hash (shift-resistant). The full-text hash runs the
    // CODEGEN'D PolyHash expression (one linear byte pass), not the
    // interpreted SQL recurrence — char-level substr(s, i, 1) folding is
    // O(len²) and must never touch an unbounded text column (the
    // inverted-index digest learned this at sf0.1).
    Q("text_fingerprint",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .filter(expr("length(text) >= 8"))
          .select(col("doc_id"),
            graft.expressions.PolyHash.polyHash(col("text")).as("fp_full"),
            expr(minWindowHashSpark("text")).as("fp_min8"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  ${polyHashDuck("text")} AS fp_full,
              |  ${minWindowHashDuck("text")} AS fp_min8
              |FROM documents WHERE length(text) >= 8 ORDER BY doc_id""".stripMargin)),

    // Deterministic k-fold assignment for cross-validation: fold = salted
    // id hash mod k — reproducible on any engine/layout (row-order splits
    // are not), folds near-balanced by the hash. Companion to the 80/20
    // split_train_test gate.
    Q("split_kfold",
      (s, dir) =>
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"),
            (expr(polyHashSpark("concat('fold:', CAST(doc_id AS STRING))")) % 5)
              .cast("int").as("fold"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(${polyHashDuck("'fold:' || CAST(doc_id AS VARCHAR)")} % 5 AS INT)
              |    AS fold
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // HTML boilerplate stripping for web-corpus ingestion: the probe wraps
    // each doc in a full HTML page (title, heading with an entity, script
    // with a raw '<', a comment), and the stripper must recover clean text:
    // script/comment blocks first (their bodies may contain '<'), then tags,
    // then entity decode, then whitespace collapse. All regexes in the
    // Java∩RE2 subset; per-row codegen'd regexp_replace chain.
    Q("text_html_strip",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>D"), col("doc_id").cast("string"),
          lit("</title></head><body><h1>Doc &amp; "), col("doc_id").cast("string"),
          lit("</h1><p>"), col("text"),
          lit("</p><script>var x = 1 < 2;</script><!-- trailer --></body></html>"))
        Catalog.load(s, dir, "documents")
          .select(col("doc_id"), html.as("raw"))
          .select(col("doc_id"),
            expr("size(regexp_extract_all(raw, '<[a-z!/][^>]*>', 0))").as("n_tags"),
            expr("trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
              "regexp_replace(raw, '<script>.*?</script>', ' '), " +
              "'<!--.*?-->', ' '), '<[^>]*>', ' '), '&amp;', '&'), ' +', ' '))")
              .as("clean"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (SELECT doc_id,
             |  '<html><head><title>D' || CAST(doc_id AS VARCHAR) ||
             |  '</title></head><body><h1>Doc &amp; ' || CAST(doc_id AS VARCHAR) ||
             |  '</h1><p>' || text ||
             |  '</p><script>var x = 1 < 2;</script><!-- trailer --></body></html>'
             |    AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '<[a-z!/][^>]*>')) AS INT) AS n_tags,
             |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |    regexp_replace(raw, '<script>.*?</script>', ' ', 'g'),
             |    '<!--.*?-->', ' ', 'g'), '<[^>]*>', ' ', 'g'),
             |    '&amp;', '&', 'g'), ' +', ' ', 'g')) AS clean
             |FROM r ORDER BY doc_id""".stripMargin)),

    // Per-document top-3 characteristic terms by tf·idf, LINEAR-idf form:
    // score = tf · N / df — the single IEEE division keeps both engines
    // bit-identical (tf·N is an exact BIGINT product), where the textbook
    // log-idf would pin the hash to two engines' ln() implementations.
    // This is deliberately a different ORDERING than log-idf (log damps
    // high-N/df ratios; linear does not) — the row claims a deterministic
    // tf-idf-family scoring, not log-idf equivalence. Shape: one explode,
    // two hash aggregates (tf on (doc,term), df on term — df reuses the tf
    // table, no second corpus scan), a vocab-sized equi-join back, and a
    // per-doc top-k window. At 100 TB the (doc,term) table is the classic
    // index-build relation; df is |vocab| rows.
    Q("text_tfidf_topk",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Catalog.load(s, dir, "documents")
          .select(col("doc_id"), explode(expr("split(text, ' ')")).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = Catalog.load(s, dir, "documents")
          .agg(count(lit(1)).cast("long").as("n"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term").asc)
        tf.join(df, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            expr("CAST(tf * n AS DOUBLE) / CAST(df AS DOUBLE)"))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select("doc_id", "rk", "term", "tf", "df", "score")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |          FROM documents),
             |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM t GROUP BY doc_id, term),
             |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |              CAST(tf.tf * n.n AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
             |       FROM tf JOIN df USING (term), n),
             |r AS (SELECT doc_id, term, tf, df, score,
             |             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
             |               ORDER BY score DESC, term ASC) AS INT) AS rk
             |      FROM sc)
             |SELECT doc_id, rk, term, tf, df, score
             |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Corpus-level collocation mining: top-20 adjacent bigrams by PMI.
    // Rank is EXACT PMI rank: PMI = ln(p(ab)/(p(a)p(b))) and ln is
    // monotone, so ordering by the raw ratio n_ab·N / (n_a·n_b) (one
    // exact BIGINT product, one IEEE division) is the PMI ordering with
    // no log in either engine; the emitted `ratio` is e^PMI (apply ln
    // client-side for the textbook value). Min support n_ab >= 5 kills
    // hapax noise. Shape: bigram + unigram hash aggregates, two
    // vocab-sized equi-joins, distributed top-k (TakeOrdered — never a
    // global sort). The BIGINT product n_ab·N needs ~2·10^13 here and
    // headroom to ~9·10^18; a 100 TB corpus crosses that, so at that
    // scale the product moves to DOUBLE (rank changes only where ratios
    // tie within 1 ulp).
    Q("text_collocations_pmi",
      (s, dir) => {
        val toks = Catalog.load(s, dir, "documents")
          .select(col("doc_id"), expr("split(text, ' ')").as("w"))
        val u = toks.select(explode(col("w")).as("t"))
        val uni = u.groupBy(col("t")).agg(count(lit(1)).as("n"))
        val ntok = u.agg(count(lit(1)).cast("long").as("ntok"))
        val bg = toks.filter(expr("size(w) >= 2"))
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), " +
              "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"))
            .as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
        bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .join(uni.select(col("t").as("a"), col("n").as("n_a")), "a")
          .join(uni.select(col("t").as("b"), col("n").as("n_b")), "b")
          .crossJoin(broadcast(ntok))
          .withColumn("ratio",
            expr("CAST(n_ab * ntok AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)"))
          .orderBy(col("ratio").desc, col("a").asc, col("b").asc)
          .limit(20)
          .select("a", "b", "n_ab", "n_a", "n_b", "ratio")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |u AS (SELECT unnest(w) AS t FROM d),
             |uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY t),
             |ntok AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntok FROM u),
             |bg AS (SELECT unnest(list_transform(range(1, len(w)),
             |                i -> w[i] || ' ' || w[i + 1])) AS bgm
             |       FROM d WHERE len(w) >= 2),
             |nab AS (SELECT split_part(bgm, ' ', 1) AS a,
             |               split_part(bgm, ' ', 2) AS b,
             |               CAST(COUNT(*) AS BIGINT) AS n_ab
             |        FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5),
             |j AS (SELECT nab.a, nab.b, nab.n_ab, ua.n AS n_a, ub.n AS n_b,
             |             CAST(nab.n_ab * ntok.ntok AS DOUBLE)
             |               / CAST(ua.n * ub.n AS DOUBLE) AS ratio
             |      FROM nab JOIN uni ua ON ua.t = nab.a
             |               JOIN uni ub ON ub.t = nab.b, ntok)
             |SELECT a, b, n_ab, n_a, n_b, ratio
             |FROM j ORDER BY ratio DESC, a ASC, b ASC LIMIT 20""".stripMargin)),

    // Skip-gram (target, context) training-pair mining — the word2vec /
    // embedding-pretraining data layer: every token's contexts are the
    // tokens within ±2 positions, emitted as symmetric (t, c) pairs with
    // support counts plus the unigram counts that parameterize the
    // negative-sampling distribution. Pairs are generated ARRAY-LOCALLY
    // per document (fixed-offset transforms over the token array — never a
    // positional self-join, which would be |doc|²-prone), so the pair
    // stream is linear in tokens (≤ 2 per token per direction); the count
    // table is vocab²-bounded and min-support 3 keeps it sparse. Top-50 by
    // (support, t, c) via distributed top-k (TakeOrdered, never a global
    // sort). Distinct from text_collocations_pmi in both semantics and
    // output: collocations rank ADJACENT bigrams by association strength;
    // this emits the windowed, symmetrized pair table a trainer consumes.
    Q("train_skipgram_pairs",
      (s, dir) => {
        val toks = Catalog.load(s, dir, "documents")
          .select(col("doc_id"), expr("split(text, ' ')").as("w"))
        val uni = toks.select(explode(col("w")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("n_t"))
        val fw = toks.filter(expr("size(w) >= 2"))
          .select(explode(expr(
            "filter(flatten(transform(sequence(1, size(w) - 1), i -> array(" +
              "struct(element_at(w, i) AS a, element_at(w, i + 1) AS b), " +
              "IF(i + 2 <= size(w), struct(element_at(w, i) AS a, element_at(w, i + 2) AS b), NULL)))), " +
              "p -> p IS NOT NULL)")).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
        val sym = fw.select(col("a").as("t"), col("b").as("c"))
          .unionAll(fw.select(col("b").as("t"), col("a").as("c")))
        sym.groupBy(col("t"), col("c")).agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= 3)
          .join(uni, "t")
          .join(uni.select(col("t").as("c"), col("n_t").as("n_c")), "c")
          .orderBy(col("cnt").desc, col("t").asc, col("c").asc)
          .limit(50)
          .select("t", "c", "cnt", "n_t", "n_c")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |uni AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t
             |        FROM (SELECT unnest(w) AS t FROM d) GROUP BY t),
             |f1 AS (SELECT unnest(list_transform(range(1, len(w)),
             |                i -> w[i] || ' ' || w[i + 1])) AS p
             |       FROM d WHERE len(w) >= 2),
             |f2 AS (SELECT unnest(list_transform(range(1, len(w) - 1),
             |                i -> w[i] || ' ' || w[i + 2])) AS p
             |       FROM d WHERE len(w) >= 3),
             |fw AS (SELECT split_part(p, ' ', 1) AS a, split_part(p, ' ', 2) AS b
             |       FROM (SELECT p FROM f1 UNION ALL SELECT p FROM f2)),
             |sym AS (SELECT a AS t, b AS c FROM fw
             |        UNION ALL SELECT b AS t, a AS c FROM fw),
             |cnt AS (SELECT t, c, CAST(COUNT(*) AS BIGINT) AS cnt
             |        FROM sym GROUP BY t, c HAVING COUNT(*) >= 3)
             |SELECT cnt.t, cnt.c, cnt.cnt, ut.n_t, uc.n_t AS n_c
             |FROM cnt JOIN uni ut ON ut.t = cnt.t
             |         JOIN uni uc ON uc.t = cnt.c
             |ORDER BY cnt.cnt DESC, cnt.t ASC, cnt.c ASC LIMIT 50""".stripMargin))
  )
}
