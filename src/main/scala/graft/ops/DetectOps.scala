package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Synthetic-text detection wave: statistical watermark detection
  * (Kirchenbauer et al. 2023 — the green-list z-test every
  * contamination-aware training pipeline should run on crawled text
  * now that watermarked LLM output is in the wild), and function-word
  * profile divergence (the classic authorship/MT-detection signal:
  * human text has stable stopword profiles; generated or translated
  * text drifts).
  *
  * Scale shapes: both are single-scan projections + per-doc hash aggs;
  * the watermark bit is a per-position md5 parity (no model, no join),
  * the profile divergence joins one 10-row broadcast corpus profile.
  */
object DetectOps {

  /** Watermark z-test: position i is GREEN when the md5 of
    * "prev|current" has an odd low byte — exactly the seeded-hash
    * green-list rule a watermarking sampler biases toward. On
    * unwatermarked text green hits are Bernoulli(1/2), so
    * z = (2g − n)/√n is standard normal and the 4σ flag fires at the
    * false-positive rate every watermark paper quotes (~3·10⁻⁵);
    * watermarked text (greens biased to δ > ½) sends z through the
    * roof. This corpus is a NEGATIVE CONTROL — the spec pins the z
    * distribution to standard-normal behavior, which is precisely the
    * property a detector must get right before its positives mean
    * anything. One projection pass; the only shuffle is the per-doc
    * aggregation. */
  val q356WatermarkDetect: QueryDef = QueryDef(
    "q356_watermark_detect",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 17) // >= 16 trials
      // DISTINCT pairs per doc — the detector-standard dedup (Kirchenbauer
      // §5: repeated n-grams reuse one seeded draw, so counting them as
      // independent trials inflates |z| on templated text; measured here:
      // raw-pair z means drift to −0.38 on the template-family fixture,
      // distinct-pair trials are Binomial(n, 1/2) per doc by hash fairness)
      docs.select(col("doc_id"),
          explode(array_distinct(expr(
            """transform(sequence(0, size(toks)-2),
                 i -> concat(toks[i], '|', toks[i+1]))"""))).as("pair"))
        .withColumn("green",
          (conv(substring(md5(col("pair")), 15, 2), 16, 10).cast("long") % 2))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_trials"), sum(col("green")).as("n_green"))
        .filter(col("n_trials") >= 16)
        .withColumn("z", round(
          (lit(2L) * col("n_green") - col("n_trials")).cast("double") /
            sqrt(col("n_trials").cast("double")), 6))
        .withColumn("flagged", col("z") > 4.0)
        .select(col("doc_id"), col("n_trials"), col("n_green"), col("z"),
          col("flagged"))
    },
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk
          FROM documents),
      d AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 17),
      g AS (SELECT doc_id,
          ('0x' || substr(md5(p.pair), 15, 2))::BIGINT % 2 AS green
        FROM d, UNNEST(list_distinct(list_transform(range(1, len(tk)),
          i -> tk[i] || '|' || tk[i+1]))) AS p(pair)),
      agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trials,
          CAST(SUM(green) AS BIGINT) AS n_green
        FROM g GROUP BY 1 HAVING COUNT(*) >= 16)
      SELECT doc_id, n_trials, n_green,
        round(CAST(2 * n_green - n_trials AS DOUBLE) / sqrt(CAST(n_trials AS DOUBLE)), 6) AS z,
        round(CAST(2 * n_green - n_trials AS DOUBLE) / sqrt(CAST(n_trials AS DOUBLE)), 6) > 4.0
          AS flagged
      FROM agg"""))

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Function-word profile divergence: each document's distribution over
    * ten function words vs the corpus profile, as KL(doc ‖ corpus) with
    * add-one smoothing on the doc side (docs with ≥ 5 stopword hits).
    * Stopword profiles are the stablest stylometric signal in human
    * text; machine-translated or template-generated passages drift,
    * which is why this is a standard synthetic/ported-text triage
    * column. The corpus profile is a 10-row broadcast; the per-doc pass
    * is one conditional aggregation — p·ln(p/q) terms follow q133's
    * raw-double ln discipline. */
  val q357StopwordDivergence: QueryDef = QueryDef(
    "q357_stopword_divergence",
    (s, dir) => {
      val stopArr = typedlit(stops)
      val hits = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .filter(array_contains(stopArr, col("w")))
        .localCheckpoint() // corpus profile + per-doc profile share it
      val corpus = broadcast(hits.groupBy(col("w")).agg(count(lit(1)).as("cw")))
      val ctot = broadcast(hits.agg(count(lit(1)).as("ctot")))
      val perDoc = hits.groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("dw"))
      val docTot = perDoc.groupBy(col("doc_id"))
        .agg(sum(col("dw")).as("dtot"))
        .filter(col("dtot") >= 5)
      // grid-complete over ALL ten words (the q329 idiom): absent words
      // carry their smoothed 1/(dtot+10) mass or the KL is only partial
      val stopsDf = broadcast(s.createDataFrame(stops.map(Tuple1(_))).toDF("w"))
      docTot.crossJoin(stopsDf)
        .join(perDoc, Seq("doc_id", "w"), "left")
        .withColumn("dw", coalesce(col("dw"), lit(0L)))
        .crossJoin(ctot)
        .join(corpus, Seq("w"), "left")
        .withColumn("p", (col("dw") + 1).cast("double") / (col("dtot") + 10))
        // add-one smoothing BOTH sides: a stopword absent from the whole
        // corpus must still carry q-mass or the inner join silently drops
        // p-mass and Gibbs' inequality (KL >= 0) breaks — observed as a
        // negative KL at sf0.001 before this fix
        .withColumn("q", (coalesce(col("cw"), lit(0L)) + 1).cast("double") /
          (col("ctot") + 10))
        .groupBy(col("doc_id"), col("dtot"))
        .agg(round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl_bits"))
        .select(col("doc_id"), col("dtot").as("n_stop"), col("kl_bits"))
    },
    Some("""WITH h AS (SELECT doc_id, u.w
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk
              FROM documents), UNNEST(tk) AS u(w)
        WHERE u.w IN ('the','a','of','and','to','in','is','for','on','with')),
      corpus AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM h GROUP BY 1),
      ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ctot FROM h),
      pd AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS dw FROM h GROUP BY 1, 2),
      dt AS (SELECT doc_id, CAST(SUM(dw) AS BIGINT) AS dtot
        FROM pd GROUP BY 1 HAVING SUM(dw) >= 5),
      sw AS (SELECT UNNEST(['the','a','of','and','to','in','is','for','on','with']) AS w),
      grid AS (SELECT dt.doc_id, dt.dtot, sw.w,
          COALESCE(pd.dw, 0) AS dw
        FROM dt CROSS JOIN sw
        LEFT JOIN pd ON pd.doc_id = dt.doc_id AND pd.w = sw.w)
      SELECT g.doc_id, g.dtot AS n_stop,
        round(SUM((CAST(g.dw + 1 AS DOUBLE) / (g.dtot + 10))
          * ln((CAST(g.dw + 1 AS DOUBLE) / (g.dtot + 10))
              / (CAST(COALESCE(c.cw, 0) + 1 AS DOUBLE) / (ct.ctot + 10)))), 6) AS kl_bits
      FROM grid g LEFT JOIN corpus c ON c.w = g.w
      CROSS JOIN ctot ct
      GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q356WatermarkDetect, q357StopwordDivergence)
}
