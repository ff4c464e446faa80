package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Heaps' law fit: vocabulary growth V(n) ≈ K·n^β measured at ten
  * corpus-prefix checkpoints (docs ordered by doc_id), with the (β, K)
  * OLS in log-log space over the ten points — the growth-view twin of
  * q571's Zipf frequency fit, and the law `graft.ScaleGen heaps` mode
  * scales by, so the fit doubles as a generator audit.
  *
  * Scale shape: one token pass produces BOTH per-type first-occurrence
  * (min doc id) and per-doc token counts; the cut dimension is 10 rows
  * broadcast over the vocabulary-sized first-occurrence frame. The
  * prefix-sum spine (global rank + running token sum over the
  * |docs|-row doc frame) runs through [[Spine.prefixSpine]] — the
  * two-pass range-partitioned scan — so NO growing frame passes
  * through a single-partition window (r15; the r14 shape's one
  * documented residual).
  *
  * Exactness: V(n) and n are exact BIGINTs; the OLS runs on ten
  * round(·,12) log points summed as DECIMAL(28,12); β/K round 6.
  */
object HeapsOps {

  val q563HeapsLaw: QueryDef = QueryDef(
    "q563_heaps_law",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
            .as("tok"))
        .localCheckpoint() // first-occurrence and per-doc counts share it
      val docTok = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"))
      // doc-frame prefix spine: |docs| grows with the corpus, so the
      // rank + running sum run through the two-pass range-partitioned
      // Spine (no single-partition window — r15)
      val docPos = Spine.prefixSpine(docTok, Seq(col("doc_id")), Seq("n_tok"))
        .withColumnRenamed("cum_n_tok", "cum_tok")
      val nDocs = docTok.count()
      val firstDoc = toks.groupBy(col("tok"))
        .agg(min(col("doc_id")).as("first_doc"))
      val firstPos = firstDoc.join(
          docPos.select(col("doc_id").as("first_doc"), col("pos")), "first_doc")
        .select(col("tok"), col("pos").as("first_pos"))
      import s.implicits._
      val cuts = (1 to 10)
        .map(d => (d, math.ceil(nDocs * d / 10.0).toLong))
        .toDF("decile", "cut_pos")
      val checkpoints = cuts
        .join(docPos.select(col("pos"), col("cum_tok")),
          col("pos") === col("cut_pos"))
        .select(col("decile"), col("cut_pos").as("n_docs"),
          col("cum_tok").as("n_tokens"))
      // 10-row cut dimension fanned over the vocabulary-sized
      // first-occurrence frame (broadcast NLJ, build side = 10 rows)
      val vocabAt = firstPos.crossJoin(broadcast(cuts))
        .where(col("first_pos") <= col("cut_pos"))
        .groupBy(col("decile")).agg(count(lit(1)).as("vocab"))
      val rows = checkpoints.join(vocabAt, Seq("decile"))
        .localCheckpoint() // readout rows and the 1-row fit both read it
      val pts = rows.select(
        round(log(col("n_tokens").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("x"),
        round(log(col("vocab").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("y"),
        round(log(col("n_tokens").cast("double"))
          * log(col("n_tokens").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("xx"),
        round(log(col("n_tokens").cast("double"))
          * log(col("vocab").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("xy"))
      val fit = pts
        .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("xx")).as("sxx"),
          sum(col("xy")).as("sxy"))
        .select(
          round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("np") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
            .as("beta"),
          round(exp((col("sy").cast("double")
            - (col("np") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("np") * col("sxx") - col("sx") * col("sx")).cast("double")
              * col("sx").cast("double")) / col("np").cast("double")), 6)
            .as("k"))
      rows.crossJoin(broadcast(fit))
        .select(col("decile"), col("n_docs"), col("n_tokens"), col("vocab"),
          col("beta"), col("k"))
        .orderBy(col("decile"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      doc_tok AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM toks GROUP BY 1),
      doc_pos AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS pos,
          CAST(SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_tok
        FROM doc_tok),
      first_pos AS (
        SELECT t.tok, MIN(p.pos) AS first_pos
        FROM (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY 1) t
        JOIN doc_pos p ON p.doc_id = t.first_doc
        GROUP BY 1),
      cuts AS (
        SELECT d AS decile,
          CAST(ceil((SELECT COUNT(*) FROM doc_tok) * d / 10.0) AS BIGINT)
            AS cut_pos
        FROM generate_series(1, 10) g(d)),
      rows_ AS (
        SELECT c.decile, c.cut_pos AS n_docs, p.cum_tok AS n_tokens,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM first_pos f
           WHERE f.first_pos <= c.cut_pos) AS vocab
        FROM cuts c JOIN doc_pos p ON p.pos = c.cut_pos),
      pts AS (
        SELECT
          CAST(round(ln(CAST(n_tokens AS DOUBLE)), 12) AS DECIMAL(28,12)) AS x,
          CAST(round(ln(CAST(vocab AS DOUBLE)), 12) AS DECIMAL(28,12)) AS y,
          CAST(round(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS xx,
          CAST(round(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS xy
        FROM rows_),
      fit AS (
        SELECT
          round(CAST(np * sxy - sx * sy AS DOUBLE)
            / CAST(np * sxx - sx * sx AS DOUBLE), 6) AS beta,
          round(exp((CAST(sy AS DOUBLE)
            - CAST(np * sxy - sx * sy AS DOUBLE)
              / CAST(np * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / CAST(np AS DOUBLE)), 6) AS k
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(x) AS sx,
                SUM(y) AS sy, SUM(xx) AS sxx, SUM(xy) AS sxy FROM pts))
      SELECT r.decile, r.n_docs, r.n_tokens, r.vocab, f.beta, f.k
      FROM rows_ r CROSS JOIN fit f
      ORDER BY r.decile"""))

  val all: Seq[QueryDef] = Seq(q563HeapsLaw)
}
