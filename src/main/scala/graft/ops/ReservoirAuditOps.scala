package graft.ops

import org.apache.spark.sql.functions._

/** Representativeness audit of the q112 weighted reservoir — the
  * dashboard a sampling pipeline keeps NEXT to its sample: per source,
  * how many documents the Efraimidis–Spirakis top-50 actually kept
  * versus the count its char-weight share predicts. A-ES inclusion
  * probabilities are proportional to weight for small samples, so
  * E[kept_s] ≈ K·(chars_s/chars_total); a source drifting far from its
  * expectation flags either weight skew (a few whale docs absorb the
  * slots) or an upstream hash defect. The reservoir itself is q112's
  * EXACT deterministic sample (md5 keys), so this audit is reproducible
  * across engines and reruns — which is precisely what makes it usable
  * as a standing data-quality gate rather than a one-off notebook.
  *
  * Scale shape: the sample is one scan + TakeOrdered (no full sort);
  * totals are one hash agg; everything downstream joins a ≤|sources|-row
  * frame against a 50-row frame. The 1-row grand total is a broadcast.
  *
  * Exactness: counts/chars BIGINT; shares and ratios are single
  * BIGINT→DOUBLE divisions rounded at 6 — identical IEEE ops both
  * engines (q112's own oracle discipline).
  */
object ReservoirAuditOps {

  private val K = 50 // q112's sample size

  val q491ReservoirCoverage: QueryDef = QueryDef(
    "q491_reservoir_coverage",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val sample = docs
        .withColumn("u",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("double") + 1.0) / 1152921504606846976.0)
        .withColumn("es_key", log(col("u")) / col("n_chars"))
        .orderBy(col("es_key").desc, col("doc_id").asc)
        .limit(K)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("sampled_chars"))
      val totals = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))
      val grand = totals.agg(sum(col("tot_chars")).as("grand_chars"))
      totals
        .join(sample, Seq("source"), "left")
        .na.fill(0L, Seq("n_sampled", "sampled_chars"))
        .crossJoin(broadcast(grand)) // 1-row grand total
        .select(col("source"), col("n_docs"), col("tot_chars"),
          col("n_sampled"), col("sampled_chars"),
          round(col("tot_chars").cast("double") /
            col("grand_chars").cast("double"), 6).as("weight_share"),
          round(lit(K.toDouble) * col("tot_chars").cast("double") /
            col("grand_chars").cast("double"), 4).as("expected_sampled"),
          round(col("n_sampled").cast("double") /
            (lit(K.toDouble) * col("tot_chars").cast("double") /
              col("grand_chars").cast("double")), 4).as("rep_ratio"))
    },
    Some(s"""WITH keyed AS (
        SELECT source, n_chars,
          ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            + 1.0) / 1152921504606846976.0) / n_chars AS es_key,
          doc_id
        FROM documents),
      samp AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
          CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM (SELECT * FROM keyed ORDER BY es_key DESC, doc_id ASC LIMIT $K)
        GROUP BY 1),
      tot AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS tot_chars
        FROM documents GROUP BY 1),
      grand AS (SELECT CAST(SUM(tot_chars) AS BIGINT) AS grand_chars FROM tot)
      SELECT t.source, t.n_docs, t.tot_chars,
        COALESCE(sp.n_sampled, 0) AS n_sampled,
        COALESCE(sp.sampled_chars, 0) AS sampled_chars,
        round(CAST(t.tot_chars AS DOUBLE) / CAST(g.grand_chars AS DOUBLE), 6)
          AS weight_share,
        round($K.0 * CAST(t.tot_chars AS DOUBLE) /
          CAST(g.grand_chars AS DOUBLE), 4) AS expected_sampled,
        round(CAST(COALESCE(sp.n_sampled, 0) AS DOUBLE) /
          ($K.0 * CAST(t.tot_chars AS DOUBLE) /
            CAST(g.grand_chars AS DOUBLE)), 4) AS rep_ratio
      FROM tot t LEFT JOIN samp sp ON sp.source = t.source
      CROSS JOIN grand g"""))

  val all: Seq[QueryDef] = Seq(q491ReservoirCoverage)
}
