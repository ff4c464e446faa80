package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scaling-law wave: held-out language-model loss as a function of
  * training-corpus size, fit to a power law — the measurement that
  * decides whether buying 10× more data is worth it.
  *
  * Scale shape: the slice fan-out is a narrow explode (a doc joins its
  * ≤ 5 nested slices), every LM count is a partial-agg shuffle keyed by
  * (slice, gram), and the held set joins the per-slice counts as gram
  * TYPES (vocab-bounded), never occurrences.
  */
object ScalingOps {

  private val dec = DecimalType(28, 10)

  /** Data scaling-law fit (the Kaplan/Chinchilla audit, at corpus
    * level): md5 gates docs into a held-out test shard (top 1/16) and
    * five NESTED training slices (gate < 1, 2, 4, 8, 15 sixteenths);
    * each slice trains q94's add-one bigram LM, the held shard's
    * cross-entropy H_s is scored against each, and ln-loss-vs-ln-tokens
    * is fit by OLS: H = a + b·ln N, i.e. ppl ∝ N^b. The slope b is the
    * data-scaling exponent and the fit extrapolates ppl at 10× the full
    * corpus — the number that prices the next crawl. Nesting means a
    * doc explodes into exactly its member slices (no repeated scans);
    * held-side scoring joins gram TYPES (weighted by occurrence count)
    * so the heavy join stays vocab-bounded; NLL terms and OLS moment
    * sums follow the round→DECIMAL discipline. */
  val q378ScalingLaw: QueryDef = QueryDef(
    "q378_scaling_law",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
            .cast("int").as("g"))
        .filter(size(col("toks")) >= 2)
        .localCheckpoint() // feeds train slices AND the held shard
      val train = docs.filter(col("g") < 15)
        .withColumn("s", explode(expr("filter(array(1, 2, 4, 8, 15), x -> g < x)")))
      val bg = train.select(col("s"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as("b"))
        .select(col("s"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // r16: ONE bigram explode — c1 is exactly the w2-marginal of c12
      // (Σ_w2 c12 ≡ the bigram count per (s, w1), integer-exact), so the
      // 5×-token-mass bg pass no longer runs twice; c12 checkpoints for
      // its two consumers (the marginal here and the held-side probe)
      val c12 = bg.groupBy(col("s"), col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .localCheckpoint()
      val c1 = c12.groupBy(col("s"), col("w1")).agg(sum(col("c12")).as("c1"))
      val vstats = train.select(col("s"), explode(col("toks")).as("t"))
        .groupBy(col("s"))
        .agg(countDistinct(col("t")).as("v"), count(lit(1)).as("n_tokens"))
      val heldBg = docs.filter(col("g") === 15)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("h"))
        .localCheckpoint() // the type frame probes all five slices
      val nHeld = heldBg.agg(sum(col("h")).as("n_held"))
      val perSlice = heldBg
        .withColumn("s", explode(expr("array(1, 2, 4, 8, 15)")))
        .join(c12, Seq("s", "w1", "w2"), "left")
        .join(c1, Seq("s", "w1"), "left")
        .join(vstats, Seq("s"))
        .withColumn("nll", round(col("h") *
          -log((coalesce(col("c12"), lit(0L)).cast("double") + 1.0) /
            (coalesce(col("c1"), lit(0L)).cast("double") + col("v"))), 6).cast(dec))
        .groupBy(col("s"), col("v"), col("n_tokens"))
        .agg(sum(col("nll")).as("snll"))
        .crossJoin(nHeld)
        .withColumn("avg_nll", col("snll").cast("double") / col("n_held"))
        .localCheckpoint() // 5 rows; feeds the fit and the output
      val fit = perSlice
        .select(round(log(col("n_tokens").cast("double")), 9).as("x"),
          round(col("avg_nll"), 9).as("y"))
        .agg(count(lit(1)).as("k"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(round(col("x") * col("x"), 9).cast(dec)).as("sxx"),
          sum(round(col("x") * col("y"), 9).cast(dec)).as("sxy"))
        .select(
          ((col("k") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("k") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope"),
          col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
          col("k"))
        .select(col("slope"),
          ((col("syd") - col("slope") * col("sxd")) / col("k")).as("intercept"))
      val fullTokens = perSlice.filter(col("s") === 15)
        .select(col("n_tokens").as("full_tokens"))
      perSlice.crossJoin(fit).crossJoin(fullTokens)
        .select(col("s").as("slice_sixteenths"), col("n_tokens"), col("v").as("vocab"),
          round(col("avg_nll"), 6).as("avg_nll"),
          round(exp(col("avg_nll")), 4).as("ppl"),
          round(col("slope"), 6).as("scaling_exponent"),
          round(exp(col("intercept") + col("slope") *
            log(lit(10.0) * col("full_tokens").cast("double"))), 4).as("ppl_at_10x"))
        .orderBy(col("slice_sixteenths"))
    },
    Some("""WITH docs AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::BIGINT AS INT) AS g
        FROM documents),
      d2 AS (SELECT * FROM docs WHERE len(toks) >= 2),
      tr0 AS (SELECT toks, list_filter([1, 2, 4, 8, 15], x -> g < x) AS ss
        FROM d2 WHERE g < 15),
      train AS (SELECT u.s, toks FROM tr0, UNNEST(ss) AS u(s)),
      bg AS (SELECT s, t.u.w1 AS w1, t.u.w2 AS w2 FROM train,
        UNNEST(list_transform(range(0, len(toks)-1),
          i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS t(u)),
      c12 AS (SELECT s, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
      c1 AS (SELECT s, w1, COUNT(*) AS c1 FROM bg GROUP BY 1, 2),
      vstats AS (SELECT s, CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS v,
          CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM train, UNNEST(toks) AS t(tok) GROUP BY 1),
      held AS (SELECT t.u.w1 AS w1, t.u.w2 AS w2
        FROM (SELECT * FROM d2 WHERE g = 15),
        UNNEST(list_transform(range(0, len(toks)-1),
          i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS t(u)),
      hb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS h FROM held GROUP BY 1, 2),
      nh AS (SELECT CAST(SUM(h) AS BIGINT) AS n_held FROM hb),
      ps AS (SELECT sl.s, vs.v, vs.n_tokens,
          SUM(CAST(round(hb.h * -ln((CAST(COALESCE(c12.c12, 0) AS DOUBLE) + 1.0)
            / (CAST(COALESCE(c1.c1, 0) AS DOUBLE) + vs.v)), 6) AS DECIMAL(28,10))) AS snll
        FROM hb CROSS JOIN (SELECT UNNEST([1, 2, 4, 8, 15]) AS s) sl
        LEFT JOIN c12 ON c12.s = sl.s AND c12.w1 = hb.w1 AND c12.w2 = hb.w2
        LEFT JOIN c1 ON c1.s = sl.s AND c1.w1 = hb.w1
        JOIN vstats vs ON vs.s = sl.s
        GROUP BY 1, 2, 3),
      ps2 AS (SELECT ps.*, CAST(ps.snll AS DOUBLE) / nh.n_held AS avg_nll
        FROM ps CROSS JOIN nh),
      fitin AS (SELECT round(ln(CAST(n_tokens AS DOUBLE)), 9) AS x,
          round(avg_nll, 9) AS y FROM ps2),
      moments AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          SUM(CAST(x AS DECIMAL(28,10))) AS sx, SUM(CAST(y AS DECIMAL(28,10))) AS sy,
          SUM(CAST(round(x * x, 9) AS DECIMAL(28,10))) AS sxx,
          SUM(CAST(round(x * y, 9) AS DECIMAL(28,10))) AS sxy
        FROM fitin),
      fit AS (SELECT
          CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE) AS slope,
          CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, k
        FROM moments),
      fit2 AS (SELECT slope, (syd - slope * sxd) / k AS intercept FROM fit),
      ft AS (SELECT n_tokens AS full_tokens FROM ps2 WHERE s = 15)
      SELECT ps2.s AS slice_sixteenths, ps2.n_tokens, ps2.v AS vocab,
        round(ps2.avg_nll, 6) AS avg_nll,
        round(exp(ps2.avg_nll), 4) AS ppl,
        round(fit2.slope, 6) AS scaling_exponent,
        round(exp(fit2.intercept + fit2.slope
          * ln(10.0 * CAST(ft.full_tokens AS DOUBLE))), 4) AS ppl_at_10x
      FROM ps2 CROSS JOIN fit2 CROSS JOIN ft
      ORDER BY slice_sixteenths"""))

  val all: Seq[QueryDef] = Seq(q378ScalingLaw)
}
