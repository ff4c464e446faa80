package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Corpus-release wave: Good–Turing frequency smoothing, a deterministic
  * Bayesian bootstrap for uncertainty on corpus statistics, the composed
  * 4-stage release funnel (gate → exact dedup → decontaminate → source
  * cap), and data-constrained epoch allocation across languages — the
  * planning layer that turns curation outputs into a training schedule.
  *
  * Scale shapes: q298 reduces to the frequency-of-frequencies frame
  * (≤ max count rows); q299 multiplies documents by a CONSTANT 32
  * replicates and immediately folds them into 32 exact DECIMAL sums;
  * q300 is one token pass + a broadcast decontamination semi-join +
  * per-(lang,source) windows; q301 runs entirely on the K-language
  * frame. Determinism: every float that feeds a cross-engine SUM is
  * rounded and cast to DECIMAL first, so partition order cannot perturb
  * the result.
  */
object ReleaseOps {

  /** Good–Turing smoothing over TRIGRAM types (the classical n-gram
    * application — the unigram vocabulary of the fixture is a closed
    * 31-token set with no rare mass, while the trigram space is sparse):
    * the frequency-of-frequencies table N_r and the Turing-adjusted
    * count r* = (r+1)·N_{r+1}/N_r for r = 1…10, plus the Good–Turing
    * unseen mass P₀ = N₁/N — the classical answer to "how much
    * probability do n-grams we have never seen deserve". One n-gram
    * aggregation; the N_r frame is bounded by the max type count, and
    * the shifted join is a self-join on that tiny frame. */
  val q298GoodTuring: QueryDef = QueryDef(
    "q298_good_turing",
    (s, dir) => {
      val counts = Tables(s, dir).documents
        .select(TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("r"))
      val nr = counts.groupBy(col("r")).agg(count(lit(1)).as("n_types"))
        .localCheckpoint() // feeds base, shifted side, and both scalars
      val totals = nr.agg(sum(col("r") * col("n_types")).as("n_tokens"),
        sum(when(col("r") === 1L, col("n_types"))).as("n1"))
      val shifted = nr.select((col("r") - 1).as("r"), col("n_types").as("n_next"))
      nr.filter(col("r") <= 10)
        .join(shifted, Seq("r"), "left")
        .crossJoin(broadcast(totals))
        .select(col("r"), col("n_types"),
          round((col("r") + 1).cast("double") * col("n_next") / col("n_types"), 6)
            .as("r_star"),
          round(col("n1").cast("double") / col("n_tokens"), 6).as("p_unseen"))
        .orderBy(col("r"))
    },
    Some("""WITH toks AS (
        SELECT regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      counts AS (
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS r FROM (
          SELECT UNNEST(list_transform(range(0, len(toks) - 2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gram
          FROM toks WHERE len(toks) >= 3) GROUP BY 1),
      nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types FROM counts GROUP BY 1),
      tot AS (SELECT CAST(SUM(r * n_types) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN r = 1 THEN n_types END) AS BIGINT) AS n1 FROM nr)
      SELECT nr.r, nr.n_types,
        round(CAST(nr.r + 1 AS DOUBLE) * nx.n_types / nr.n_types, 6) AS r_star,
        round(CAST(tot.n1 AS DOUBLE) / tot.n_tokens, 6) AS p_unseen
      FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1, tot
      WHERE nr.r <= 10 ORDER BY nr.r"""))

  /** Deterministic Bayesian bootstrap (Rubin 1981) of the mean document
    * length: B = 32 replicates with per-(doc, replicate) exponential
    * weights w = −ln(u), u drawn md5-deterministically, so both engines
    * materialize the identical weight matrix. Each replicate mean is an
    * exact DECIMAL ratio; the CI is the 2nd/31st order statistic of the
    * 32 replicate means (≈ 94% coverage) and the SE is the exact-sum
    * standard deviation across replicates. The ×32 blow-up is a constant
    * factor folded immediately into 32 group sums — at 100 TB this is
    * one extra map + one 32-group aggregation, never a materialized
    * copy. */
  val q299BayesBootstrap: QueryDef = QueryDef(
    "q299_bayes_bootstrap",
    (s, dir) => {
      val reps = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"))
        .withColumn("b", explode(sequence(lit(1L), lit(32L))))
        .withColumn("u",
          (conv(substring(md5(concat_ws(":", col("doc_id"), col("b"))), 1, 8),
            16, 10).cast("double") + 1.0) / 4294967296.0)
        .withColumn("w", round(-log(col("u")), 12).cast(DecimalType(20, 12)))
      val means = reps.groupBy(col("b"))
        .agg((sum(col("w") * col("n_chars")).cast("double") /
          sum(col("w")).cast("double")).as("m"))
        .select(col("b"), round(col("m"), 9).cast(DecimalType(22, 9)).as("m"))
      val ranked = means
        .withColumn("rk", row_number().over(Window.orderBy(col("m").asc)))
      ranked.agg(
        count(lit(1)).as("n_reps"),
        (sum(col("m")).cast("double") / count(lit(1))).as("point_est"),
        sum(col("m") * col("m")).cast("double").as("s2"),
        max(when(col("rk") === 2, col("m"))).cast("double").as("ci_lo"),
        max(when(col("rk") === 31, col("m"))).cast("double").as("ci_hi"))
        .select(col("n_reps"), round(col("point_est"), 6).as("point_est"),
          round(sqrt((col("s2") - lit(32.0) * col("point_est") * col("point_est"))
            / lit(31.0)), 6).as("boot_se"),
          round(col("ci_lo"), 6).as("ci_lo"), round(col("ci_hi"), 6).as("ci_hi"))
    },
    Some("""WITH reps AS (
        SELECT d.doc_id, d.n_chars, b.b,
          (('0x' || substr(md5(d.doc_id || ':' || b.b), 1, 8))::BIGINT + 1.0)
            / 4294967296.0 AS u
        FROM documents d CROSS JOIN (SELECT UNNEST(range(1, 33)) AS b) b),
      wts AS (SELECT b, doc_id, n_chars,
          CAST(round(-ln(u), 12) AS DECIMAL(20,12)) AS w FROM reps),
      means AS (SELECT b,
          CAST(round(CAST(SUM(w * n_chars) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 9)
            AS DECIMAL(22,9)) AS m
        FROM wts GROUP BY 1),
      ranked AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk FROM means),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
          CAST(SUM(m) AS DOUBLE) / COUNT(*) AS point_est,
          CAST(SUM(m * m) AS DOUBLE) AS s2,
          CAST(MAX(CASE WHEN rk = 2 THEN m END) AS DOUBLE) AS ci_lo,
          CAST(MAX(CASE WHEN rk = 31 THEN m END) AS DOUBLE) AS ci_hi
        FROM ranked)
      SELECT n_reps, round(point_est, 6) AS point_est,
        round(sqrt((s2 - 32.0 * point_est * point_est) / 31.0), 6) AS boot_se,
        round(ci_lo, 6) AS ci_lo, round(ci_hi, 6) AS ci_hi
      FROM agg"""))

  /** The composed corpus-release funnel, per language: quality gate
    * (≥ 20 tokens and ≥ 30% distinct-token ratio) → exact dedup (min
    * doc_id per md5(text)) → decontamination (drop any doc sharing a
    * trigram hash with the held-out eval split, q78's definition) →
    * per-(lang, source) cap (first 200 survivors in the q84 hash order).
    * Output: the per-language survivor funnel and the final token mass —
    * the one-glance release report. Eval membership is doc_id % 100 = 0;
    * the funnel runs on the train remainder. One token pass feeds every
    * stage; the eval trigram set rides a broadcast semi-join; the cap is
    * a per-group window. */
  val q300ReleaseFunnel: QueryDef = QueryDef(
    "q300_release_funnel",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          TextOps.tokens(col("text")).as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("tris", when(col("n_toks") >= 3, array_distinct(transform(
          transform(
            expr("transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"),
            t => md5(t)),
          h => shiftleft(conv(substring(h, 1, 8), 16, 10).cast("long"), 32)
            .bitwiseOR(conv(substring(h, 9, 8), 16, 10).cast("long")))))
          .otherwise(array().cast("array<bigint>")))
        .localCheckpoint() // one token+shingle pass feeds eval set and funnel
      val evalTris = docs.filter(col("doc_id") % 100 === 0)
        .select(explode(col("tris")).as("h")).distinct()
      val contaminated = docs.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"), explode(col("tris")).as("h"))
        .join(broadcast(evalTris), Seq("h"))
        .select(col("doc_id")).distinct()
      val train = docs.filter(col("doc_id") % 100 =!= 0)
        .withColumn("gate", col("n_toks") >= 20 &&
          (size(array_distinct(col("toks"))).cast("double") / col("n_toks")) >= 0.3)
      // survivors sort FIRST inside their natural partition (gate DESC /
      // keep_decon DESC), so the rank test needs no survivor-only
      // partition key — the alternative (a when(flag, key) partition)
      // funnels every non-survivor into one giant null partition, a
      // single-executor sort at scale
      val wDup = Window.partitionBy(md5(col("text")))
        .orderBy(col("gate").desc, col("doc_id").asc_nulls_first)
      val wCap = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("keep_decon").desc, md5(col("text")).asc_nulls_first,
          col("doc_id").asc_nulls_first)
      val staged = train
        .withColumn("keep_dup", col("gate") && row_number().over(wDup) === 1)
        .join(contaminated.withColumn("contam", lit(true)), Seq("doc_id"), "left")
        .withColumn("keep_decon", col("keep_dup") && col("contam").isNull)
        .withColumn("keep_cap",
          col("keep_decon") && row_number().over(wCap) <= 200)
      staged.groupBy(col("lang"))
        .agg(count(lit(1)).as("docs_in"),
          sum(col("gate").cast("long")).as("after_gate"),
          sum(col("keep_dup").cast("long")).as("after_dedup"),
          sum(col("keep_decon").cast("long")).as("after_decon"),
          sum(col("keep_cap").cast("long")).as("after_cap"),
          sum(when(col("keep_cap"), col("n_toks")).otherwise(0L)).as("tokens_final"))
        .orderBy(col("lang"))
    },
    Some("""WITH base AS (
        SELECT doc_id, lang, source, text,
          regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      d AS (SELECT doc_id, lang, source, text, toks,
          CAST(len(toks) AS BIGINT) AS n_toks,
          CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
            list_transform(range(0, len(toks) - 2),
              i -> md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])),
            h -> (('0x' || substr(h, 1, 8))::BIGINT
              - CASE WHEN ('0x' || substr(h, 1, 8))::BIGINT >= 2147483648
                     THEN 4294967296 ELSE 0 END) * 4294967296
              + ('0x' || substr(h, 9, 8))::BIGINT))
          ELSE [] END AS tris
        FROM base),
      ev AS (SELECT DISTINCT UNNEST(tris) AS h FROM d WHERE doc_id % 100 = 0),
      contam AS (SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, UNNEST(tris) AS h FROM d WHERE doc_id % 100 <> 0) t
        JOIN ev USING (h)),
      train AS (SELECT d.*,
          (n_toks >= 20 AND
           CAST(len(list_distinct(toks)) AS DOUBLE) / n_toks >= 0.3) AS gate
        FROM d WHERE doc_id % 100 <> 0),
      dup AS (SELECT *, (gate AND ROW_NUMBER() OVER (
            PARTITION BY md5(text)
            ORDER BY gate DESC, doc_id NULLS FIRST) = 1) AS keep_dup
        FROM train),
      dec AS (SELECT dup.*,
          (keep_dup AND contam.doc_id IS NULL) AS keep_decon
        FROM dup LEFT JOIN contam ON dup.doc_id = contam.doc_id),
      cap AS (SELECT *, (keep_decon AND ROW_NUMBER() OVER (
            PARTITION BY lang, source
            ORDER BY keep_decon DESC, md5(text) NULLS FIRST, doc_id NULLS FIRST) <= 200) AS keep_cap
        FROM dec)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_in,
        CAST(SUM(CASE WHEN gate THEN 1 ELSE 0 END) AS BIGINT) AS after_gate,
        CAST(SUM(CASE WHEN keep_dup THEN 1 ELSE 0 END) AS BIGINT) AS after_dedup,
        CAST(SUM(CASE WHEN keep_decon THEN 1 ELSE 0 END) AS BIGINT) AS after_decon,
        CAST(SUM(CASE WHEN keep_cap THEN 1 ELSE 0 END) AS BIGINT) AS after_cap,
        CAST(SUM(CASE WHEN keep_cap THEN n_toks ELSE 0 END) AS BIGINT) AS tokens_final
      FROM cap GROUP BY 1 ORDER BY lang"""))

  /** Data-constrained epoch allocation (the Muennighoff-style question:
    * with a token budget of half the corpus and a 4-epoch repetition
    * ceiling, how many epochs does each language run?): target shares
    * come from τ=0.5 temperature sampling (∝ √mass), capped sources
    * surrender their surplus, and one proportional redistribution round
    * hands it to uncapped languages. Every sum that crosses languages is
    * an exact DECIMAL fold of pre-rounded terms. K-language frame —
    * model-sized at any corpus scale. */
  val q301EpochAllocation: QueryDef = QueryDef(
    "q301_epoch_allocation",
    (s, dir) => {
      val w = Window.partitionBy()
      val mass = Tables(s, dir).documents
        .select(col("lang"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("lang")).agg(sum(col("n")).as("mass"))
        .withColumn("sq", round(sqrt(col("mass")), 6).cast(DecimalType(24, 6)))
        .withColumn("stot", sum(col("sq")).over(w))
        .withColumn("budget", sum(col("mass")).over(w).cast("double") / 2.0)
        .withColumn("share", col("sq").cast("double") / col("stot"))
        .withColumn("target", col("budget") * col("share"))
        .withColumn("capped", col("target") > col("mass") * 4.0)
        .withColumn("tokens1", round(least(col("target"), col("mass") * 4.0), 2)
          .cast(DecimalType(24, 2)))
      mass
        .withColumn("leftover", col("budget") - sum(col("tokens1")).over(w)
          .cast("double"))
        .withColumn("sq_open", sum(when(!col("capped"), col("sq"))
          .otherwise(lit(0).cast(DecimalType(24, 6)))).over(w))
        .withColumn("tokens_final",
          when(col("capped"), col("tokens1").cast("double"))
            .otherwise(least(col("mass") * 4.0,
              col("tokens1").cast("double") +
                col("leftover") * (col("sq").cast("double") /
                  col("sq_open").cast("double")))))
        .select(col("lang"), col("mass"), round(col("share"), 6).as("share"),
          col("capped"),
          round(col("tokens_final") / col("mass"), 6).as("epochs"),
          round(col("tokens_final"), 2).as("alloc_tokens"))
        .orderBy(col("lang"))
    },
    Some("""WITH mass AS (
        SELECT lang, CAST(SUM(len(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS mass
        FROM documents GROUP BY 1),
      sq AS (SELECT lang, mass,
          CAST(round(sqrt(mass), 6) AS DECIMAL(24,6)) AS sq FROM mass),
      tot AS (SELECT *, SUM(sq) OVER () AS stot,
          CAST(SUM(mass) OVER () AS DOUBLE) / 2.0 AS budget FROM sq),
      t1 AS (SELECT *, CAST(sq AS DOUBLE) / CAST(stot AS DOUBLE) AS share,
          budget * (CAST(sq AS DOUBLE) / CAST(stot AS DOUBLE)) AS target FROM tot),
      t2 AS (SELECT *, (target > mass * 4.0) AS capped,
          CAST(round(least(target, mass * 4.0), 2) AS DECIMAL(24,2)) AS tokens1
        FROM t1),
      t3 AS (SELECT *, budget - CAST(SUM(tokens1) OVER () AS DOUBLE) AS leftover,
          SUM(CASE WHEN NOT capped THEN sq ELSE CAST(0 AS DECIMAL(24,6)) END)
            OVER () AS sq_open
        FROM t2),
      fin AS (SELECT *,
          CASE WHEN capped THEN CAST(tokens1 AS DOUBLE)
               ELSE least(mass * 4.0, CAST(tokens1 AS DOUBLE)
                 + leftover * (CAST(sq AS DOUBLE) / CAST(sq_open AS DOUBLE)))
          END AS tokens_final
        FROM t3)
      SELECT lang, mass, round(share, 6) AS share, capped,
        round(tokens_final / mass, 6) AS epochs,
        round(tokens_final, 2) AS alloc_tokens
      FROM fin ORDER BY lang"""))

  val all: Seq[QueryDef] =
    Seq(q298GoodTuring, q299BayesBootstrap, q300ReleaseFunnel, q301EpochAllocation)
}
