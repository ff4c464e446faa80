package graft.ops

import org.apache.spark.sql.functions._

/** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
  * 2001) — the language-modeling IR scorer next to BM25 (q91):
  * score(d, q) = Σ_{t∈q} ln((c(t,d) + μ·p(t|C)) / (|d| + μ)), μ = 2000.
  * Document-length normalization comes from the Dirichlet prior rather
  * than BM25's b/k1 knobs; the two rankers disagree exactly where
  * collection statistics matter, which is why IR stacks ship both
  * (reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q91/q318/q319's retrieval family).
  *
  * Scale shape: ONE tokenize scan feeds (a) per-doc lengths, (b)
  * per-(doc, query-term) counts (the postings of a 4-term query — a
  * semi-join against the query, so only matching tokens survive the
  * scan), and (c) the 4-row collection-frequency frame; scoring is a
  * broadcast of (b)'s 4-term model over the doc spine. Top-10 by
  * TakeOrdered. Token-mass linear; no global sort.
  *
  * Exactness: scores are integer micro-nats: each term's contribution
  * is floor(ln((c·T + μ·cf) / ((|d| + μ)·T)) · 1e6) — the ln argument
  * is ONE rational of exact BIGINTs (collection total T multiplied
  * through, so no intermediate float), identical in both engines;
  * per-doc scores are exact BIGINT sums; ties break to the lower
  * doc_id.
  */
object QlmOps {

  private val Mu = 2000L
  private val QueryTerms = Seq("scan", "join", "window", "stream")

  val q527QlmDirichlet: QueryDef = QueryDef(
    "q527_qlm_dirichlet",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("tok"))
        .localCheckpoint()
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val totRow = toks.agg(count(lit(1)).as("t"))
      val qterms = s.createDataFrame(QueryTerms.map(Tuple1(_))).toDF("tok")
      val cf = broadcast(qterms).join(toks, Seq("tok"), "left")
        .groupBy(col("tok"))
        .agg(sum(when(col("doc_id").isNotNull, 1L).otherwise(0L)).as("cf"))
      val ctd = toks.join(broadcast(qterms), Seq("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      // score every doc against all 4 terms (absent terms score with c=0)
      val spine = dl.crossJoin(broadcast(cf)).crossJoin(broadcast(totRow))
        .join(ctd, Seq("doc_id", "tok"), "left").na.fill(0L, Seq("c"))
        .select(col("doc_id"),
          floor(log((col("c") * col("t") + lit(Mu) * col("cf")).cast("double") /
            ((col("dl") + Mu) * col("t")).cast("double")) * 1e6)
            .cast("long").as("lp"))
      spine.groupBy(col("doc_id")).agg(sum(col("lp")).as("qlm_micro"))
        .orderBy(col("qlm_micro").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
        FROM documents),
      dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM toks GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM toks),
      qterms AS (SELECT unnest([${QueryTerms.map(t => s"'$t'").mkString(", ")}])
        AS tok),
      cf AS (
        SELECT q.tok,
          CAST(COUNT(tk.doc_id) AS BIGINT) AS cf
        FROM qterms q LEFT JOIN toks tk ON tk.tok = q.tok
        GROUP BY 1),
      ctd AS (
        SELECT tk.doc_id, tk.tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks tk JOIN qterms q ON q.tok = tk.tok
        GROUP BY 1, 2),
      scored AS (
        SELECT d.doc_id,
          CAST(floor(ln(CAST(COALESCE(c.c, 0) * tot.t + $Mu * f.cf AS DOUBLE) /
            CAST((d.dl + $Mu) * tot.t AS DOUBLE)) * 1e6) AS BIGINT) AS lp
        FROM dl d
        CROSS JOIN cf f CROSS JOIN tot
        LEFT JOIN ctd c ON c.doc_id = d.doc_id AND c.tok = f.tok)
      SELECT doc_id, CAST(SUM(lp) AS BIGINT) AS qlm_micro
      FROM scored GROUP BY 1
      ORDER BY qlm_micro DESC, doc_id LIMIT 10"""))

  val all: Seq[QueryDef] = Seq(q527QlmDirichlet)
}
