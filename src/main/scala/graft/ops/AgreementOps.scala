package graft.ops

import org.apache.spark.sql.functions._

/** Inter-rater and classifier agreement metrics over the q520 labeling
  * fixture:
  *
  *  - q541 Fleiss' κ (Fleiss 1971): chance-corrected agreement of the
  *    THREE md5-derived annotators across all documents and languages —
  *    the multi-rater generalization of q142's Cohen κ, the go/no-go
  *    number before trusting crowdsourced labels at all.
  *  - q542 one-vs-rest Matthews correlation (Matthews 1975): per-class
  *    MCC of q511's naive-Bayes confusion matrix — the
  *    imbalance-robust summary precision/recall can hide.
  *
  * (Reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q142/q183/q533's eval family.)
  *
  * Scale shape: q541 is one vote fan-out + two hash-aggs (per-subject
  * category counts, then global sums); q542 is 25-cell matrix algebra
  * on q511's registered output (the q157-reuses-q79 composition
  * idiom). Exactness: all counts are BIGINTs; κ and MCC are fixed
  * float expressions over exact sums (MCC's four marginal products are
  * cast to double BEFORE multiplying — their BIGINT product overflows
  * at scale), rounded for display.
  */
object AgreementOps {

  val q541FleissKappa: QueryDef = QueryDef(
    "q541_fleiss_kappa",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("lang"))
      val langs = docs.select(col("lang")).distinct()
        .withColumn("idx",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("lang"))) - 1).cast("long"))
        .localCheckpoint()
      val nLangs = langs.count()
      val anns = s.range(1, 4).select(col("id").as("ann"))
      val votes = docs.join(broadcast(langs), Seq("lang"))
        .crossJoin(broadcast(anns))
        .withColumn("h", pmod(conv(substring(md5(concat(
          lit("ann"), col("ann").cast("string"), lit("|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(10L)))
        .withColumn("vidx",
          when(col("h") < 7, col("idx"))
            .otherwise(pmod(col("idx") + 1 + (col("h") - 7), lit(nLangs))))
      val cellSq = votes.groupBy(col("doc_id"), col("vidx"))
        .agg(count(lit(1)).as("nij"))
      val subj = cellSq.groupBy(col("doc_id"))
        .agg(sum(col("nij") * col("nij")).as("sq"))
      val catTot = votes.groupBy(col("vidx")).agg(count(lit(1)).as("cj"))
        .agg(sum(col("cj") * col("cj")).as("cjsq"), sum(col("cj")).as("tot"))
      subj.agg(count(lit(1)).as("n_subjects"), sum(col("sq")).as("ssq"))
        .crossJoin(broadcast(catTot))
        .select(col("n_subjects"),
          // P̄ = (Σ_i Σ_j n_ij² − N·n) / (N·n·(n−1)), n = 3 raters
          ((col("ssq") - col("n_subjects") * 3).cast("double") /
            (col("n_subjects").cast("double") * 3 * 2)).as("pbar"),
          (col("cjsq").cast("double") /
            (col("tot").cast("double") * col("tot"))).as("pe"))
        .select(col("n_subjects"),
          round(col("pbar"), 9).as("pbar"),
          round(col("pe"), 9).as("pe"),
          round((col("pbar") - col("pe")) / (lit(1.0) - col("pe")), 9)
            .as("fleiss_kappa"))
    },
    Some("""WITH langs AS (
        SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT)
          AS idx
        FROM (SELECT DISTINCT lang FROM documents)),
      nl AS (SELECT COUNT(*) AS n FROM langs),
      votes AS (
        SELECT d.doc_id,
          CASE WHEN ('0x' || substr(md5('ann' || CAST(a.ann AS VARCHAR) ||
              '|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 7
            THEN l.idx
          ELSE (l.idx + 1 + (('0x' || substr(md5('ann' ||
            CAST(a.ann AS VARCHAR) || '|' ||
            CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 - 7)) % nl.n
          END AS vidx
        FROM documents d
        JOIN langs l ON l.lang = d.lang
        CROSS JOIN (SELECT unnest(range(1, 4)) AS ann) a
        CROSS JOIN nl),
      subj AS (
        SELECT doc_id, SUM(nij * nij) AS sq FROM
          (SELECT doc_id, vidx, CAST(COUNT(*) AS BIGINT) AS nij
           FROM votes GROUP BY 1, 2)
        GROUP BY 1),
      cat AS (
        SELECT CAST(SUM(cj * cj) AS BIGINT) AS cjsq,
          CAST(SUM(cj) AS BIGINT) AS tot FROM
          (SELECT vidx, CAST(COUNT(*) AS BIGINT) AS cj
           FROM votes GROUP BY 1)),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
          CAST(SUM(sq) AS BIGINT) AS ssq FROM subj),
      parts AS (
        SELECT n_subjects,
          CAST(ssq - n_subjects * 3 AS DOUBLE) /
            (CAST(n_subjects AS DOUBLE) * 3 * 2) AS pbar,
          CAST(cjsq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot) AS pe
        FROM agg CROSS JOIN cat)
      SELECT n_subjects, round(pbar, 9) AS pbar, round(pe, 9) AS pe,
        round((pbar - pe) / (1.0 - pe), 9) AS fleiss_kappa
      FROM parts"""))

  val q542MccOvr: QueryDef = QueryDef(
    "q542_mcc_ovr",
    (s, dir) => {
      val m = NaiveBayesOps.q511NaiveBayes.fn(s, dir).localCheckpoint()
      val tot = m.agg(sum(col("n")).as("total"))
      val byTrue = m.groupBy(col("true_lang")).agg(sum(col("n")).as("row_tot"))
      val byPred = m.groupBy(col("pred_lang")).agg(sum(col("n")).as("col_tot"))
      val diag = m.where(col("true_lang") === col("pred_lang"))
        .select(col("true_lang").as("lang"), col("n").as("tp"))
      byTrue.select(col("true_lang").as("lang"), col("row_tot"))
        .join(byPred.select(col("pred_lang").as("lang"), col("col_tot")),
          Seq("lang"), "outer")
        .na.fill(0L, Seq("row_tot", "col_tot"))
        .join(diag, Seq("lang"), "left").na.fill(0L, Seq("tp"))
        .crossJoin(broadcast(tot))
        .select(col("lang"), col("tp"),
          (col("col_tot") - col("tp")).as("fp"),
          (col("row_tot") - col("tp")).as("fn"),
          (col("total") - col("row_tot") - col("col_tot") + col("tp"))
            .as("tn"))
        // degenerate classes (a zero marginal) have an UNDEFINED MCC —
        // reported as (mcc_defined = 0, mcc = 0.0) instead of NaN, so the
        // report always carries every class (the NB fixture collapses to
        // the majority class when the corpus vocabulary is shared)
        .select(col("lang"), col("tp"), col("fp"), col("fn"), col("tn"),
          ((col("tp") + col("fp")) * (col("tp") + col("fn")) *
            (col("tn") + col("fp")) * (col("tn") + col("fn")) > 0)
            .cast("long").as("mcc_defined"),
          when((col("tp") + col("fp")) * (col("tp") + col("fn")) *
            (col("tn") + col("fp")) * (col("tn") + col("fn")) > 0,
            round((col("tp").cast("double") * col("tn") -
              col("fp").cast("double") * col("fn")) /
              sqrt((col("tp") + col("fp")).cast("double") *
                ((col("tp") + col("fn")).cast("double") *
                  ((col("tn") + col("fp")).cast("double") *
                    (col("tn") + col("fn"))))), 9))
            .otherwise(lit(0.0)).as("mcc"))
    },
    NaiveBayesOps.q511NaiveBayes.oracle.map { confusionSql =>
      s"""WITH m AS MATERIALIZED ($confusionSql),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM m),
      by_true AS (SELECT true_lang AS lang, CAST(SUM(n) AS BIGINT) AS row_tot
        FROM m GROUP BY 1),
      by_pred AS (SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT) AS col_tot
        FROM m GROUP BY 1),
      diag AS (SELECT true_lang AS lang, CAST(n AS BIGINT) AS tp FROM m
        WHERE true_lang = pred_lang),
      cells AS (
        SELECT COALESCE(t.lang, p.lang) AS lang,
          COALESCE(d.tp, 0) AS tp,
          COALESCE(p.col_tot, 0) - COALESCE(d.tp, 0) AS fp,
          COALESCE(t.row_tot, 0) - COALESCE(d.tp, 0) AS fn,
          tot.total - COALESCE(t.row_tot, 0) - COALESCE(p.col_tot, 0)
            + COALESCE(d.tp, 0) AS tn
        FROM by_true t
        FULL OUTER JOIN by_pred p ON p.lang = t.lang
        LEFT JOIN diag d ON d.lang = COALESCE(t.lang, p.lang)
        CROSS JOIN tot)
      SELECT lang, tp, fp, fn, tn,
        CAST((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0 AS BIGINT)
          AS mcc_defined,
        CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) > 0 THEN
          round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) /
            sqrt(CAST(tp + fp AS DOUBLE) *
              (CAST(tp + fn AS DOUBLE) *
                (CAST(tn + fp AS DOUBLE) * (tn + fn)))), 9)
        ELSE 0.0 END AS mcc
      FROM cells"""
    })

  val all: Seq[QueryDef] = Seq(q541FleissKappa, q542MccOvr)
}
