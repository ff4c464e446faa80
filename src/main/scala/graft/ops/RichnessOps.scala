package graft.ops

import org.apache.spark.sql.functions._

/** Unseen-mass wave: nonparametric species-richness estimators over the
  * corpus vocabulary — "how many distinct word types exist beyond this
  * sample?" Good–Turing (q298) estimates the unseen PROBABILITY mass;
  * Chao1/Chao2/jackknife estimate the unseen TYPE COUNT, the number a
  * vocab-budget or tokenizer-sizing decision actually needs. Abundance
  * (token counts) and incidence (document counts) variants, both with
  * the bias-corrected Chao form, plus first-order jackknife and sample
  * coverage.
  *
  * Scale shape: one token explode → type census (the q197/q298 shape),
  * then two constant-size frequency-of-frequency aggregations; every
  * estimator is closed-form on an O(1) frame.
  */
object RichnessOps {

  /** Chao1 (abundance), Chao2 (incidence), jackknife-1, and Good–Turing
    * coverage for the documents vocabulary, one summary row. */
  val q414SpeciesRichness: QueryDef = QueryDef(
    "q414_species_richness",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      val types = toks.groupBy(col("tok"))
        .agg(count(lit(1)).as("f"),
          countDistinct(col("doc_id")).as("q"))
        .localCheckpoint() // both censuses read it
      val ab = types.agg(
        count(lit(1)).as("s_obs"),
        sum(col("f")).as("n_tokens"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("f2"),
        sum(when(col("q") === 1, 1L).otherwise(0L)).as("q1"),
        sum(when(col("q") === 2, 1L).otherwise(0L)).as("q2"))
      val m = Tables(s, dir).documents.agg(
        countDistinct(col("doc_id")).as("m_docs"))
      ab.crossJoin(broadcast(m))
        .withColumn("chao1", round(col("s_obs") +
          col("f1").cast("double") * (col("f1") - 1) /
            (lit(2.0) * (col("f2") + 1)), 4))
        .withColumn("chao2", round(col("s_obs") +
          (col("m_docs") - 1).cast("double") / col("m_docs") *
            col("q1").cast("double") * (col("q1") - 1) /
            (lit(2.0) * (col("q2") + 1)), 4))
        .withColumn("jack1", round(col("s_obs") +
          col("q1").cast("double") * (col("m_docs") - 1) / col("m_docs"), 4))
        .withColumn("coverage", round(lit(1.0) -
          col("f1").cast("double") / col("n_tokens"), 6))
        .select(col("s_obs"), col("n_tokens"), col("f1"), col("f2"),
          col("q1"), col("q2"), col("m_docs"),
          col("chao1"), col("chao2"), col("jack1"), col("coverage"))
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(
          regexp_extract_all(lower(text), '\w+')) AS tok FROM documents),
      types AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS q
        FROM toks GROUP BY 1),
      ab AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
          CAST(SUM(f) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          CAST(SUM(CASE WHEN q = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
          CAST(SUM(CASE WHEN q = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2
        FROM types),
      md AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS m_docs
        FROM documents)
      SELECT s_obs, n_tokens, f1, f2, q1, q2, m_docs,
        round(s_obs + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)), 4)
          AS chao1,
        round(s_obs + CAST(m_docs - 1 AS DOUBLE) / m_docs
          * CAST(q1 AS DOUBLE) * (q1 - 1) / (2.0 * (q2 + 1)), 4) AS chao2,
        round(s_obs + CAST(q1 AS DOUBLE) * (m_docs - 1) / m_docs, 4) AS jack1,
        round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
      FROM ab, md"""))

  val all: Seq[QueryDef] = Seq(q414SpeciesRichness)
}
