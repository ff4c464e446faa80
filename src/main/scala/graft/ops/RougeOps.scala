package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ROUGE-2 (Lin 2004) — the RECALL-oriented twin of q516's BLEU-2 on the
  * identical deterministic pairing (consecutive same-lang docs as
  * candidate/reference): clipped bigram matches over REFERENCE bigram
  * mass (recall), over candidate mass (precision), and their F1 — the
  * summarization-eval staple next to BLEU's translation lens
  * (reference: overseer's report pipelines, doc/guide/Introduction.md:3).
  *
  * Scale shape: identical to q516 — pairing is a per-lang window, clip
  * counting one hash agg over exploded bigrams; token-mass linear.
  *
  * Exactness: q516's micro-int discipline — per-pair scores floor(·1e6)
  * BIGINT, per-lang means divide the exact micro sums at the end.
  */
object RougeOps {

  val q550Rouge2: QueryDef = QueryDef(
    "q550_rouge2",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          expr("regexp_extract_all(lower(text), '\\\\w+', 0)").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .where(col("n") >= 2)
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val roled = d.withColumn("rn", row_number().over(w))
        .select(col("lang"), expr("CAST((rn - 1) DIV 2 AS BIGINT)").as("pair"),
          (col("rn") % 2).cast("long").as("role"), col("toks"))
      val fullPairs = roled.groupBy(col("lang"), col("pair"))
        .agg(count(lit(1)).as("cnt")).where(col("cnt") === 2)
        .select(col("lang"), col("pair"))
      val p = roled.join(fullPairs, Seq("lang", "pair"))
      val grams = p.select(col("lang"), col("pair"), col("role"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("g"))
      val per = grams
        .groupBy(col("lang"), col("pair"), col("g"))
        .agg(sum(when(col("role") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("role") === 0, 1L).otherwise(0L)).as("r"))
        .groupBy(col("lang"), col("pair"))
        .agg(sum(least(col("c"), col("r"))).as("clip"),
          sum(col("c")).as("ctot"), sum(col("r")).as("rtot"))
        .select(col("lang"),
          floor(col("clip").cast("double") / col("rtot") * 1e6)
            .cast("long").as("rec_micro"),
          floor(col("clip").cast("double") / col("ctot") * 1e6)
            .cast("long").as("prec_micro"),
          when(col("clip") === 0, 0L).otherwise(
            floor(lit(2.0) * (col("clip").cast("double") / col("rtot")) *
              (col("clip").cast("double") / col("ctot")) /
              (col("clip").cast("double") / col("rtot") +
                col("clip").cast("double") / col("ctot")) * 1e6)
              .cast("long")).as("f1_micro"))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("rec_micro")).as("sum_rec_micro"),
          sum(col("prec_micro")).as("sum_prec_micro"),
          sum(col("f1_micro")).as("sum_f1_micro"))
        .select(col("lang"), col("n_pairs"),
          round(col("sum_rec_micro").cast("double") / col("n_pairs") / 1e6, 9)
            .as("mean_rouge2_recall"),
          round(col("sum_prec_micro").cast("double") / col("n_pairs") / 1e6, 9)
            .as("mean_rouge2_precision"),
          round(col("sum_f1_micro").cast("double") / col("n_pairs") / 1e6, 9)
            .as("mean_rouge2_f1"))
        .orderBy(col("lang"))
    },
    Some("""WITH t AS (
        SELECT doc_id, lang, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      d AS (SELECT doc_id, lang, toks FROM t WHERE len(toks) >= 2),
      roled AS (
        SELECT lang,
          CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
            // 2 AS BIGINT) AS pair,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) % 2
            AS BIGINT) AS role,
          toks
        FROM d),
      full_pairs AS (
        SELECT lang, pair FROM roled GROUP BY 1, 2 HAVING COUNT(*) = 2),
      p AS (
        SELECT r.lang, r.pair, r.role, r.toks
        FROM roled r JOIN full_pairs f
          ON f.lang = r.lang AND f.pair = r.pair),
      grams AS (
        SELECT lang, pair, role,
          toks[i] || ' ' || toks[i + 1] AS g
        FROM p, UNNEST(range(1, len(toks))) AS u(i)),
      cl AS (
        SELECT lang, pair, g,
          CAST(SUM(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM grams GROUP BY 1, 2, 3),
      per AS (
        SELECT lang,
          CAST(SUM(LEAST(c, r)) AS BIGINT) AS clip,
          CAST(SUM(c) AS BIGINT) AS ctot,
          CAST(SUM(r) AS BIGINT) AS rtot
        FROM cl GROUP BY lang, pair),
      micro AS (
        SELECT lang,
          CAST(floor(CAST(clip AS DOUBLE) / rtot * 1e6) AS BIGINT)
            AS rec_micro,
          CAST(floor(CAST(clip AS DOUBLE) / ctot * 1e6) AS BIGINT)
            AS prec_micro,
          CASE WHEN clip = 0 THEN 0 ELSE
            CAST(floor(2.0 * (CAST(clip AS DOUBLE) / rtot) *
              (CAST(clip AS DOUBLE) / ctot) /
              (CAST(clip AS DOUBLE) / rtot + CAST(clip AS DOUBLE) / ctot)
              * 1e6) AS BIGINT) END AS f1_micro
        FROM per)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        round(CAST(SUM(rec_micro) AS DOUBLE) / COUNT(*) / 1e6, 9)
          AS mean_rouge2_recall,
        round(CAST(SUM(prec_micro) AS DOUBLE) / COUNT(*) / 1e6, 9)
          AS mean_rouge2_precision,
        round(CAST(SUM(f1_micro) AS DOUBLE) / COUNT(*) / 1e6, 9)
          AS mean_rouge2_f1
      FROM micro GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q550Rouge2)
}
