package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus BLEU-2 evaluation (Papineni et al. 2002) over deterministic
  * same-language document pairs — clipped unigram & bigram precision,
  * geometric mean, brevity penalty. The reference-based text-similarity
  * score every generation-eval harness computes; here each language's
  * docs are paired consecutively by id (odd row = candidate, even row
  * = reference), making the fixture self-contained (reference:
  * overseer's arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: pairing is one window over (lang, doc_id); n-gram
  * clipping is a hash-agg on (pair, gram) — every stage an equi-join
  * or partial-agg-friendly groupBy, linear in token mass. Nothing is
  * pairwise across the corpus: each candidate meets exactly ONE
  * reference.
  *
  * Exactness: clipped counts and lengths are BIGINTs; each pair's BLEU
  * is ONE fixed float expression over them, quantized to integer
  * micro-BLEU (floor(b·1e6) — both engines floor the same double), so
  * per-language aggregates are exact integer sums.
  */
object BleuOps {

  val q516Bleu: QueryDef = QueryDef(
    "q516_bleu",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          expr("regexp_extract_all(lower(text), '\\\\w+', 0)").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .where(col("n") >= 2)
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val roled = d.withColumn("rn", row_number().over(w))
        .select(col("lang"), expr("CAST((rn - 1) DIV 2 AS BIGINT)").as("pair"),
          (col("rn") % 2).cast("long").as("role"), col("toks"), col("n"))
      val fullPairs = roled.groupBy(col("lang"), col("pair"))
        .agg(count(lit(1)).as("cnt")).where(col("cnt") === 2)
        .select(col("lang"), col("pair"))
      val p = roled.join(fullPairs, Seq("lang", "pair")).localCheckpoint()

      def clipped(grams: org.apache.spark.sql.DataFrame) = grams
        .groupBy(col("lang"), col("pair"), col("g"))
        .agg(sum(when(col("role") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("role") === 0, 1L).otherwise(0L)).as("r"))
        .groupBy(col("lang"), col("pair"))
        .agg(sum(least(col("c"), col("r"))).as("clip"), sum(col("c")).as("tot"))

      val uni = clipped(p.select(col("lang"), col("pair"), col("role"),
        explode(col("toks")).as("g")))
      val big = clipped(p.select(col("lang"), col("pair"), col("role"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("g")))
      val lens = p.groupBy(col("lang"), col("pair"))
        .agg(sum(when(col("role") === 1, col("n"))).as("clen"),
          sum(when(col("role") === 0, col("n"))).as("rlen"))
      val per = lens
        .join(uni.select(col("lang"), col("pair"),
          col("clip").as("clip1"), col("tot").as("tot1")), Seq("lang", "pair"))
        .join(big.select(col("lang"), col("pair"),
          col("clip").as("clip2"), col("tot").as("tot2")), Seq("lang", "pair"))
        .select(col("lang"),
          floor(least(lit(1.0), exp(lit(1.0) - col("rlen").cast("double") / col("clen"))) *
            sqrt((col("clip1").cast("double") / col("tot1")) *
              (col("clip2").cast("double") / col("tot2"))) * lit(1e6))
            .cast("long").as("bm"))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("bm")).as("sum_bleu_micro"))
        .select(col("lang"), col("n_pairs"), col("sum_bleu_micro"),
          round(col("sum_bleu_micro").cast("double") / col("n_pairs") / 1e6, 9)
            .as("mean_bleu"))
    },
    Some("""WITH t AS (
        SELECT doc_id, lang, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      d AS (SELECT doc_id, lang, toks, CAST(len(toks) AS BIGINT) AS n
        FROM t WHERE len(toks) >= 2),
      roled AS (
        SELECT lang,
          CAST((row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1)
            // 2 AS BIGINT) AS pair,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) % 2
            AS BIGINT) AS role,
          toks, n
        FROM d),
      full_pairs AS (
        SELECT lang, pair FROM roled GROUP BY 1, 2 HAVING COUNT(*) = 2),
      p AS (SELECT r.* FROM roled r JOIN full_pairs USING (lang, pair)),
      uni AS (
        SELECT lang, pair, role, unnest(toks) AS g FROM p),
      ucnt AS (
        SELECT lang, pair, g,
          SUM(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS c,
          SUM(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS r
        FROM uni GROUP BY 1, 2, 3),
      clip1 AS (
        SELECT lang, pair, CAST(SUM(LEAST(c, r)) AS BIGINT) AS clip1,
          CAST(SUM(c) AS BIGINT) AS tot1
        FROM ucnt GROUP BY 1, 2),
      big AS (
        SELECT lang, pair, role,
          unnest(list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i + 1])) AS g
        FROM p),
      bcnt AS (
        SELECT lang, pair, g,
          SUM(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS c,
          SUM(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS r
        FROM big GROUP BY 1, 2, 3),
      clip2 AS (
        SELECT lang, pair, CAST(SUM(LEAST(c, r)) AS BIGINT) AS clip2,
          CAST(SUM(c) AS BIGINT) AS tot2
        FROM bcnt GROUP BY 1, 2),
      lens AS (
        SELECT lang, pair,
          SUM(CASE WHEN role = 1 THEN n END) AS clen,
          SUM(CASE WHEN role = 0 THEN n END) AS rlen
        FROM p GROUP BY 1, 2),
      per AS (
        SELECT l.lang,
          CAST(floor(LEAST(1.0, exp(1.0 - CAST(rlen AS DOUBLE) / clen)) *
            sqrt((CAST(clip1 AS DOUBLE) / tot1) *
              (CAST(clip2 AS DOUBLE) / tot2)) * 1e6) AS BIGINT) AS bm
        FROM lens l
        JOIN clip1 c1 USING (lang, pair)
        JOIN clip2 c2 USING (lang, pair))
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(bm) AS BIGINT) AS sum_bleu_micro,
        round(CAST(SUM(bm) AS DOUBLE) / COUNT(*) / 1e6, 9) AS mean_bleu
      FROM per GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q516Bleu)
}
