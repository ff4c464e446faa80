package graft.ops

import org.apache.spark.sql.functions._

/** Agreement & marginal-homogeneity tests over the labeling fixtures —
  * the two classical companions of q541's Fleiss κ (reference:
  * overseer's eval/report family, doc/guide/Introduction.md:3):
  *
  *  - q557 Krippendorff's α (nominal, coincidence-matrix form): the
  *    agreement coefficient content-analysis standards require when κ's
  *    chance model is contested — D_o/D_e over the same three
  *    md5-derived annotators as q541, so the two coefficients are
  *    directly comparable on one fixture.
  *  - q559 Cochran's Q: do three binary curation GATES (length, token
  *    mass, word-length) pass the same fraction of documents, accounting
  *    for per-document correlation? The marginal-homogeneity test a
  *    curation pipeline runs before treating its gates as exchangeable.
  *
  * Scale shape: both are one fan-out + two hash-aggs; every statistic
  * folds from exact BIGINT censuses (Σn², row/column totals) — the
  * floats are single fixed expressions at the end.
  */
object HomogeneityOps {

  val q557KrippendorffAlpha: QueryDef = QueryDef(
    "q557_krippendorff_alpha",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("lang"))
      val langs = docs.select(col("lang")).distinct()
        .withColumn("idx",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("lang"))) - 1).cast("long"))
        .localCheckpoint()
      val nLangs = langs.count()
      val anns = s.range(1, 4).select(col("id").as("ann"))
      // q541's exact annotator model: 70% truthful, else deterministic
      // md5-rotated error — same votes, so κ and α are comparable
      val votes = docs.join(broadcast(langs), Seq("lang"))
        .crossJoin(broadcast(anns))
        .withColumn("h", pmod(conv(substring(md5(concat(
          lit("ann"), col("ann").cast("string"), lit("|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(10L)))
        .withColumn("vidx",
          when(col("h") < 7, col("idx"))
            .otherwise(pmod(col("idx") + 1 + (col("h") - 7), lit(nLangs))))
      val cell = votes.groupBy(col("doc_id"), col("vidx"))
        .agg(count(lit(1)).as("nij"))
      // per-unit: n_u = 3 raters, Σ_c n_uc² ; observed disagreement
      // D_o = Σ_u (n_u² − Σ_c n_uc²) / (n_u − 1) — integer because
      // n_u − 1 = 2 divides the even numerator? not necessarily: keep
      // the ×2 scaling and divide once at the end (exact BIGINTs).
      val perUnit = cell.groupBy(col("doc_id"))
        .agg(sum(col("nij") * col("nij")).as("sq"))
        .agg(count(lit(1)).as("n_units"),
          sum(lit(9L) - col("sq")).as("do2")) // Σ(9 − sq); D_o = do2/2
      val marg = votes.groupBy(col("vidx")).agg(count(lit(1)).as("nc"))
        .agg(sum(col("nc")).as("ntot"), sum(col("nc") * col("nc")).as("ncsq"))
      perUnit.crossJoin(broadcast(marg))
        .select(col("n_units"), col("ntot"),
          // D_o = do2/2 ; D_e = (ntot² − Σnc²) / (ntot − 1)
          round(col("do2").cast("double") / 2.0, 6).as("d_obs"),
          round((col("ntot") * col("ntot") - col("ncsq")).cast("double") /
            (col("ntot") - 1).cast("double"), 6).as("d_exp"),
          round(lit(1.0) -
            (col("do2").cast("double") / 2.0) /
              ((col("ntot") * col("ntot") - col("ncsq")).cast("double") /
                (col("ntot") - 1).cast("double")), 9).as("alpha"))
    },
    Some("""WITH langs AS (
        SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT)
          AS idx
        FROM (SELECT DISTINCT lang FROM documents)),
      nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM langs),
      votes AS (
        SELECT d.doc_id,
          CASE WHEN ('0x' || substr(md5('ann' || CAST(a.ann AS VARCHAR) ||
              '|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 7
            THEN l.idx
          ELSE (l.idx + 1 + (('0x' || substr(md5('ann' ||
            CAST(a.ann AS VARCHAR) || '|' ||
            CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 - 7))
            % nl.n END AS vidx
        FROM documents d
        JOIN langs l ON l.lang = d.lang
        CROSS JOIN (SELECT UNNEST(range(1, 4)) AS ann) a
        CROSS JOIN nl),
      cell AS (
        SELECT doc_id, vidx, CAST(COUNT(*) AS BIGINT) AS nij
        FROM votes GROUP BY 1, 2),
      per_unit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
          CAST(SUM(9 - sq) AS BIGINT) AS do2
        FROM (SELECT doc_id, SUM(nij * nij) AS sq FROM cell GROUP BY 1)),
      marg AS (
        SELECT CAST(SUM(nc) AS BIGINT) AS ntot,
          CAST(SUM(nc * nc) AS BIGINT) AS ncsq
        FROM (SELECT vidx, CAST(COUNT(*) AS BIGINT) AS nc
          FROM votes GROUP BY 1))
      SELECT p.n_units, m.ntot,
        round(CAST(p.do2 AS DOUBLE) / 2.0, 6) AS d_obs,
        round(CAST(m.ntot * m.ntot - m.ncsq AS DOUBLE)
          / CAST(m.ntot - 1 AS DOUBLE), 6) AS d_exp,
        round(1.0 - (CAST(p.do2 AS DOUBLE) / 2.0)
          / (CAST(m.ntot * m.ntot - m.ncsq AS DOUBLE)
            / CAST(m.ntot - 1 AS DOUBLE)), 9) AS alpha
      FROM per_unit p CROSS JOIN marg m"""))

  val q559CochranQ: QueryDef = QueryDef(
    "q559_cochran_q",
    (s, dir) => {
      val gates = Tables(s, dir).documents
        .select(col("doc_id"),
          expr("regexp_extract_all(lower(text), '\\\\w+', 0)").as("toks"),
          col("n_chars"))
        .select(col("doc_id"),
          when(col("n_chars") >= 500, 1L).otherwise(0L).as("g1"),
          when(size(col("toks")) >= 100, 1L).otherwise(0L).as("g2"),
          when(col("n_chars") <= size(col("toks")) * 8, 1L).otherwise(0L)
            .as("g3"))
      val agg = gates.agg(
        count(lit(1)).as("n_docs"),
        sum(col("g1")).as("t1"), sum(col("g2")).as("t2"),
        sum(col("g3")).as("t3"),
        sum(col("g1") + col("g2") + col("g3")).as("lsum"),
        sum((col("g1") + col("g2") + col("g3")) *
          (col("g1") + col("g2") + col("g3"))).as("lsq"))
      // Q = k(k−1)·Σ_j(G_j − T/k)² / (k·ΣL − ΣL²), k = 3 gates
      agg.select(col("n_docs"), col("t1"), col("t2"), col("t3"),
        round(lit(6.0) *
          ((col("t1") * 3 - col("lsum")) * (col("t1") * 3 - col("lsum")) +
            (col("t2") * 3 - col("lsum")) * (col("t2") * 3 - col("lsum")) +
            (col("t3") * 3 - col("lsum")) * (col("t3") * 3 - col("lsum")))
            .cast("double") / 9.0 /
          (lit(3.0) * col("lsum") - col("lsq")).cast("double"), 6)
          .as("cochran_q"),
        (lit(6.0) *
          ((col("t1") * 3 - col("lsum")) * (col("t1") * 3 - col("lsum")) +
            (col("t2") * 3 - col("lsum")) * (col("t2") * 3 - col("lsum")) +
            (col("t3") * 3 - col("lsum")) * (col("t3") * 3 - col("lsum")))
            .cast("double") / 9.0 /
          (lit(3.0) * col("lsum") - col("lsq")).cast("double") > 5.991)
          .as("reject_homogeneity"))
    },
    Some("""WITH gates AS (
        SELECT doc_id,
          CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS g1,
          CASE WHEN len(regexp_extract_all(lower(text), '\w+')) >= 100
            THEN 1 ELSE 0 END AS g2,
          CASE WHEN n_chars <= len(regexp_extract_all(lower(text), '\w+'))
            * 8 THEN 1 ELSE 0 END AS g3
        FROM documents),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(g1) AS BIGINT) AS t1, CAST(SUM(g2) AS BIGINT) AS t2,
          CAST(SUM(g3) AS BIGINT) AS t3,
          CAST(SUM(g1 + g2 + g3) AS BIGINT) AS lsum,
          CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS lsq
        FROM gates)
      SELECT n_docs, t1, t2, t3,
        round(6.0 * CAST((t1 * 3 - lsum) * (t1 * 3 - lsum)
            + (t2 * 3 - lsum) * (t2 * 3 - lsum)
            + (t3 * 3 - lsum) * (t3 * 3 - lsum) AS DOUBLE) / 9.0
          / CAST(3.0 * lsum - lsq AS DOUBLE), 6) AS cochran_q,
        6.0 * CAST((t1 * 3 - lsum) * (t1 * 3 - lsum)
            + (t2 * 3 - lsum) * (t2 * 3 - lsum)
            + (t3 * 3 - lsum) * (t3 * 3 - lsum) AS DOUBLE) / 9.0
          / CAST(3.0 * lsum - lsq AS DOUBLE) > 5.991 AS reject_homogeneity
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q557KrippendorffAlpha, q559CochranQ)
}
