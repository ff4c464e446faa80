package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north star in
  * BASELINE.json): tokenization, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure `functions._` column expressions —
  * codegen'd, no UDFs — so they stay inside whole-stage codegen and scale
  * embarrassingly parallel over document partitions.
  */
object TextOps {

  /** Word tokens (lowercased \w+ runs) — identical regex semantics in Spark
    * (Java regex) and DuckDB (RE2) for this class. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\w+"), lit(0))

  /** Tokenization + counting stats per document. */
  val q22TokenStats: QueryDef = QueryDef(
    "q22_token_stats",
    (s, dir) => Tables(s, dir).documents
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_unique"),
        (aggregate(transform(col("toks"), t => length(t)), lit(0), (acc, x) => acc + x)
          .cast("double") / size(col("toks"))).as("avg_token_len")),
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
        CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) AS avg_token_len
      FROM t"""))

  /** Quality scoring: length, punctuation density, stopword ratio,
    * type-token ratio — the standard cheap pre-filters for web corpora. */
  val q23TextQuality: QueryDef = QueryDef(
    "q23_text_quality",
    (s, dir) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "value", "data", "table")
      Tables(s, dir).documents
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .select(
          col("doc_id"),
          col("n_chars"),
          col("n_tokens"),
          size(array_intersect(array_distinct(col("toks")),
            array(stop.map(lit): _*))).cast("long").as("n_stop_types"),
          (size(filter(col("toks"), t => t.isin(stop.map(x => x: Any): _*)))
            .cast("double") / col("n_tokens")).as("stop_ratio"),
          (size(array_distinct(col("toks"))).cast("double") / col("n_tokens")).as("ttr"),
          size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
            .cast("long").as("n_punct"))
    },
    Some("""WITH t AS (SELECT doc_id, n_chars, text,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents)
      SELECT doc_id, n_chars,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_intersect(list_distinct(toks),
          ['the','a','of','and','to','in','is','value','data','table'])) AS BIGINT) AS n_stop_types,
        CAST(len(list_filter(toks, x -> list_contains(
          ['the','a','of','and','to','in','is','value','data','table'], x))) AS DOUBLE)
          / len(toks) AS stop_ratio,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
        CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct
      FROM t"""))

  /** Language-ID heuristic: score by marker-token hits per language, argmax
    * with a deterministic priority order. (On real corpora the marker lists
    * would be per-language n-gram profiles; the mechanism — score columns +
    * CASE argmax, one pass, no shuffle — is the scale-relevant part.) */
  val q24LangId: QueryDef = QueryDef(
    "q24_lang_id",
    (s, dir) => {
      val d = Tables(s, dir).documents.withColumn("toks", tokens(col("text")))
      def score(markers: Seq[String]): Column =
        size(filter(col("toks"), t => t.isin(markers.map(x => x: Any): _*))).cast("long")
      d.withColumn("s_en", score(Seq("the", "a", "and", "of")))
        .withColumn("s_data", score(Seq("data", "table", "row", "column")))
        .withColumn("s_query", score(Seq("query", "join", "filter", "scan")))
        .withColumn("predicted",
          when(col("s_en") >= col("s_data") && col("s_en") >= col("s_query"), lit("en"))
            .when(col("s_data") >= col("s_query"), lit("data"))
            .otherwise(lit("query")))
        .select(col("doc_id"), col("lang"), col("s_en"), col("s_data"),
                col("s_query"), col("predicted"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      sc AS (SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of'], x))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, x -> list_contains(['data','table','row','column'], x))) AS BIGINT) AS s_data,
        CAST(len(list_filter(toks, x -> list_contains(['query','join','filter','scan'], x))) AS BIGINT) AS s_query
        FROM t)
      SELECT doc_id, lang, s_en, s_data, s_query,
        CASE WHEN s_en >= s_data AND s_en >= s_query THEN 'en'
             WHEN s_data >= s_query THEN 'data'
             ELSE 'query' END AS predicted
      FROM sc"""))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * identical digests in any engine, the exact-dedup key. */
  val q25Fingerprint: QueryDef = QueryDef(
    "q25_fingerprint",
    (s, dir) => Tables(s, dir).documents
      .select(col("doc_id"),
              md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fingerprint")),
    Some("""SELECT doc_id,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents"""))

  /** Repetition / boilerplate signals — the Gopher-style within-document
    * quality gates: duplicate-trigram ratio (templated or machine-looped
    * text repeats its n-grams) and top-token share (a single token
    * dominating the document). Pure per-row projections over the token
    * array — zero shuffle, embarrassingly parallel at any corpus size; a
    * training-data pipeline filters on these before any pairwise dedup
    * gets to run. Trigram strings (not hashes) keep the DuckDB oracle
    * bit-exact; the per-doc top-token scan is O(distinct·n) on short
    * arrays, still inside the projection. */
  val q76Repetition: QueryDef = QueryDef(
    "q76_repetition",
    (s, dir) => Tables(s, dir).documents
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("tris", expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
      .select(
        col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("tris"))).cast("double") / size(col("tris")))
          .as("dup_trigram_ratio"),
        (array_max(expr("transform(array_distinct(toks), t -> size(filter(toks, x -> x = t)))"))
          .cast("double") / size(col("toks"))).as("top_token_share")),
    Some("""WITH t AS (
        SELECT doc_id, lang, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      g AS (
        SELECT doc_id, lang, toks,
          list_transform(range(0, len(toks) - 2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS tris
        FROM t WHERE len(toks) >= 3)
      SELECT doc_id, lang,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris) AS dup_trigram_ratio,
        CAST(list_max(list_transform(list_distinct(toks),
          t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks) AS top_token_share
      FROM g"""))

  /** Chi-square keyness: which tokens are over/under-represented in each
    * source vs the rest of the corpus — the standard corpus-comparison
    * statistic for spotting source-specific boilerplate or topic drift
    * before mixing sources into a training set. From the 2×2 table
    * (a = token-in-source, with marginals ta = token total, sa = source
    * total, n = grand total): χ² = n·(ad−bc)² / (ta·(n−ta)·sa·(n−sa)).
    * Shapes: one (source, token) hash-agg over the exploded tokens, then
    * broadcast joins against the tiny marginal frames — at 100 TB the
    * marginals are |vocab| + |sources| rows regardless of corpus size.
    * The corpus-wide token count is an in-plan broadcast 1-row aggregate
    * (one action, no driver-side pre-pass). SUMS (b, c, d) stay in exact
    * int64 — they are bounded by n, safe at any feasible corpus — but
    * PRODUCTS are computed in double: a·d and ta·(n−ta) exceed 2^63 once
    * n passes ~3e9 tokens (any multi-TB corpus), where Spark (non-ANSI)
    * wraps silently and DuckDB errors. The double expression tree is
    * mirrored node-for-node in the oracle so IEEE determinism gives bit
    * parity; above 2^53 the products round (deterministically) instead
    * of corrupting.
    */
  val q114Chi2Keyness: QueryDef = QueryDef(
    "q114_chi2_keyness",
    (s, dir) => {
      val tok = Tables(s, dir).documents
        .select(col("source"), explode(tokens(col("text"))).as("token"))
      val nAgg = tok.agg(count(lit(1)).as("n"))
      val st = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("a"))
      val ta = tok.groupBy(col("token")).agg(count(lit(1)).as("ta"))
      val sa = tok.groupBy(col("source")).agg(count(lit(1)).as("sa"))
      st.join(broadcast(ta), "token").join(broadcast(sa), "source")
        .crossJoin(broadcast(nAgg))
        .withColumn("b", col("ta") - col("a"))
        .withColumn("c", col("sa") - col("a"))
        .withColumn("d", col("n") - col("ta") - col("sa") + col("a"))
        .withColumn("diff",
          col("a").cast("double") * col("d").cast("double") -
            col("b").cast("double") * col("c").cast("double"))
        .withColumn("chi2", round(
          col("n").cast("double") * (col("diff") * col("diff")) /
            ((col("ta").cast("double") * (col("n") - col("ta")).cast("double")) *
             (col("sa").cast("double") * (col("n") - col("sa")).cast("double"))), 4))
        .select(col("source"), col("token"), col("a").as("n_in_source"), col("chi2"))
    },
    Some("""WITH tok AS (
        SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents),
      st AS (SELECT source, token, COUNT(*) AS a FROM tok GROUP BY 1, 2),
      ta AS (SELECT token, COUNT(*) AS ta FROM tok GROUP BY 1),
      sa AS (SELECT source, COUNT(*) AS sa FROM tok GROUP BY 1),
      n AS (SELECT COUNT(*) AS n FROM tok)
      SELECT st.source, st.token, a AS n_in_source,
        round(CAST(n AS DOUBLE) *
          ((CAST(a AS DOUBLE) * CAST(n - ta - sa + a AS DOUBLE)
              - CAST(ta - a AS DOUBLE) * CAST(sa - a AS DOUBLE))
           * (CAST(a AS DOUBLE) * CAST(n - ta - sa + a AS DOUBLE)
              - CAST(ta - a AS DOUBLE) * CAST(sa - a AS DOUBLE))) /
          ((CAST(ta AS DOUBLE) * CAST(n - ta AS DOUBLE))
           * (CAST(sa AS DOUBLE) * CAST(n - sa AS DOUBLE))), 4) AS chi2
      FROM st JOIN ta USING (token) JOIN sa USING (source) CROSS JOIN n"""))

  val all: Seq[QueryDef] = Seq(q22TokenStats, q23TextQuality, q24LangId, q25Fingerprint,
    q76Repetition, q114Chi2Keyness)
}
