package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pipeline-fitness operators: context-packing efficiency, dedup
  * threshold sensitivity, tokenizer fertility, and text↔embedding
  * alignment — the what-ifs that tune a training-data pipeline's knobs
  * with numbers instead of folklore.
  */
object FitnessOps {

  /** Context-window packing efficiency: if documents pack greedily (in
    * doc order, within language) into windows of 512 / 2048 / 8192
    * tokens, how many windows result and what share is padding waste?
    * The preprocessing-cost what-if answered before a single batch is
    * materialized. One tokenize pass; a per-lang cumulative window (the
    * q82 idiom); a ×3 length fan-out aggregated to three rows.
    */
  val q222PackingEfficiency: QueryDef = QueryDef(
    "q222_packing_efficiency",
    (s, dir) => {
      val wLang = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val toks = Tables(s, dir).documents
        .select(col("lang"), col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum(col("n_tok")).over(wLang), lit(0L)))
        .localCheckpoint() // one tokenize+cumsum pass feeds all 3 lengths
      toks
        .withColumn("ctx_len", explode(expr(
          "transform(array(512, 2048, 8192), l -> CAST(l AS BIGINT))")))
        .withColumn("bin", (col("cum_before") / col("ctx_len")).cast("long"))
        .groupBy(col("ctx_len"), col("lang"), col("bin"))
        .agg(sum(col("n_tok")).as("bin_tokens"))
        .groupBy(col("ctx_len"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("bin_tokens")).as("total_tokens"),
          round(sum(col("bin_tokens")).cast("double") /
            (count(lit(1)) * col("ctx_len")).cast("double"), 6)
            .as("utilization"))
    },
    Some("""WITH t AS (SELECT lang, doc_id,
          CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (SELECT *,
          COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM t),
      fan AS (SELECT c.*, CAST(l.l AS BIGINT) AS ctx_len,
          c.cum_before // CAST(l.l AS BIGINT) AS bin
        FROM c CROSS JOIN (SELECT UNNEST([512, 2048, 8192]) AS l) l),
      bins AS (SELECT ctx_len, lang, bin, SUM(n_tok) AS bin_tokens
        FROM fan GROUP BY 1, 2, 3)
      SELECT ctx_len, COUNT(*) AS n_windows,
        CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
        round(CAST(SUM(bin_tokens) AS DOUBLE) /
          CAST(COUNT(*) * ctx_len AS DOUBLE), 6) AS utilization
      FROM bins GROUP BY 1"""))

  /** Dedup-threshold sensitivity: how many near-dup pairs — and how
    * many documents — would each Jaccard threshold τ ∈ 0.3…0.8 remove?
    * The policy-knob sweep that shows where the corpus's similarity
    * mass sits before anyone commits to "dedup at 0.7". Runs on the
    * documented q27 yardstick domain (doc_id < 300, within-language)
    * so the exact pair table is bounded; the sweep is a ×6 fan-out
    * over that model-sized pair set; removal counts a doc once via a
    * distinct on the kept-lowest-id convention.
    */
  val q223DedupSensitivity: QueryDef = QueryDef(
    "q223_dedup_sensitivity",
    (s, dir) => {
      val t = Tables(s, dir).documents
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"),
          array_distinct(TextOps.tokens(col("text"))).as("toks"))
      val a = t.select(col("lang"), col("doc_id").as("id_a"),
        col("toks").as("toks_a"))
      val b = t.select(col("lang"), col("doc_id").as("id_b"),
        col("toks").as("toks_b"))
      val pairs = a.join(b, Seq("lang")).filter(col("id_a") < col("id_b"))
        .withColumn("jac",
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))))
        .filter(col("jac") >= 0.3)
        .select(col("id_a"), col("id_b"), col("jac"))
        .localCheckpoint() // model-sized pair table feeds the 6-τ sweep
      pairs
        .withColumn("tau", explode(expr(
          "transform(sequence(3, 8), i -> CAST(i AS DOUBLE) / 10.0)")))
        .filter(col("jac") >= col("tau"))
        .groupBy(col("tau"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_b")).as("n_docs_removed"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
          list_distinct(regexp_extract_all(lower(text), '\w+')) AS toks
        FROM documents WHERE doc_id < 300),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))) AS jac
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id),
      fan AS (SELECT p.*, CAST(i.i AS DOUBLE) / 10.0 AS tau
        FROM pairs p CROSS JOIN (SELECT UNNEST(range(3, 9)) AS i) i
        WHERE p.jac >= CAST(i.i AS DOUBLE) / 10.0)
      SELECT tau, COUNT(*) AS n_pairs,
        CAST(COUNT(DISTINCT id_b) AS BIGINT) AS n_docs_removed
      FROM fan WHERE jac >= 0.3 GROUP BY 1"""))

  /** Tokenizer fertility by language: characters per token, tokens per
    * document, and the regex-token vs whitespace-word ratio — the
    * efficiency numbers that decide whether a tokenizer needs
    * per-language retraining (high fertility = wasted context). One
    * scan, one agg per language, exact-int reductions.
    */
  val q224TokenizerFertility: QueryDef = QueryDef(
    "q224_tokenizer_fertility",
    (s, dir) => {
      Tables(s, dir).documents
        .select(col("lang"), col("n_chars"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          round(sum(col("n_chars")).cast("double") /
            sum(col("n_tok")).cast("double"), 6).as("chars_per_token"),
          round(sum(col("n_tok")).cast("double") /
            count(lit(1)).cast("double"), 6).as("tokens_per_doc"),
          round(sum(col("n_tok")).cast("double") /
            sum(col("n_words")).cast("double"), 6).as("token_word_ratio"))
    },
    Some("""WITH t AS (SELECT lang, n_chars,
          CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_tok,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words
        FROM documents)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        round(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_tok) AS DOUBLE), 6)
          AS chars_per_token,
        round(CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS tokens_per_doc,
        round(CAST(SUM(n_tok) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE), 6)
          AS token_word_ratio
      FROM t GROUP BY 1"""))

  /** Embedding-contract audit: per label, certify the three invariants
    * an embedding table must honor before ANN/dedup trust it — every
    * vector has its text row (id coverage), every vector is 64-dim,
    * and every vector is L2-normalized (min/max norm pinned at 9
    * decimals, deviation flagged at 1e-4). Norms fold dims in array
    * order — identical left-to-right in both engines — so the
    * certificate is bit-comparable.
    */
  val q225EmbeddingContract: QueryDef = QueryDef(
    "q225_embedding_contract",
    (s, dir) => {
      val t = Tables(s, dir)
      t.embeddings
        .join(t.documents.select(col("doc_id")),
          col("vec_id") === col("doc_id"), "left")
        .select(col("label"),
          when(col("doc_id").isNotNull, 1L).otherwise(0L).as("matched"),
          size(col("embedding")).cast("long").as("dims"),
          round(sqrt(expr(
            "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")),
            9).as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("matched")).as("n_matched"),
          min(col("dims")).as("dims_min"),
          max(col("dims")).as("dims_max"),
          min(col("norm")).as("norm_min"),
          max(col("norm")).as("norm_max"),
          (max(abs(col("norm") - lit(1.0))) < 0.0001).as("normalized_ok"))
    },
    Some("""WITH j AS (SELECT e.label,
          CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS matched,
          CAST(len(e.embedding) AS BIGINT) AS dims,
          round(sqrt(list_sum(list_transform(e.embedding,
            v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 9) AS norm
        FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id)
      SELECT label, COUNT(*) AS n_vecs,
        CAST(SUM(matched) AS BIGINT) AS n_matched,
        CAST(MIN(dims) AS BIGINT) AS dims_min,
        CAST(MAX(dims) AS BIGINT) AS dims_max,
        MIN(norm) AS norm_min, MAX(norm) AS norm_max,
        MAX(abs(norm - 1.0)) < 0.0001 AS normalized_ok
      FROM j GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q222PackingEfficiency, q223DedupSensitivity,
    q224TokenizerFertility, q225EmbeddingContract)
}
