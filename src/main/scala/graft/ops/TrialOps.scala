package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Experimentation & linkage-audit wave: CUPED variance reduction (the
  * pre-period covariate adjustment every mature A/B platform applies
  * before reading an experiment), the sequential probability ratio test
  * (Wald's SPRT — the always-valid early-stopping walk), and a
  * record-linkage BLOCKING-quality audit (reduction ratio vs pair
  * completeness — the precision/recall trade every dedup blocking
  * scheme must report before it is trusted).
  *
  * Scale shapes: CUPED is two per-user count aggregations + integer
  * moment sums; SPRT is a daily aggregation + one cumulative window;
  * the blocking audit counts candidate pairs from block SIZES (never
  * materializing pairs) and joins the truth set only against per-doc
  * block keys.
  */
object TrialOps {

  /** CUPED (Deng et al. 2013): per user, X = pre-period click count
    * (Jan 1–14), Y = post-period purchase count (Jan 15–30);
    * θ = cov(X,Y)/var(X) from integer-exact moment sums, and the
    * adjusted variance var(Y − θX) = var(Y) − 2θ·cov + θ²·var(X) —
    * reported as the variance-reduction percentage a fixed-horizon
    * readout gains. Every moment is an int64 sum (one per-user
    * aggregation); doubles appear only in the final θ and variance
    * divisions, mirrored in both engines. */
  val q351Cuped: QueryDef = QueryDef(
    "q351_cuped",
    (s, dir) => {
      val e = EventOps.events(s, dir)
      val perUser = e.groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click" &&
            to_date(col("ts")) <= lit("2024-01-14"), 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase" &&
            to_date(col("ts")) >= lit("2024-01-15"), 1L).otherwise(0L)).as("y"))
      val m = perUser.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      m.select(col("n").as("n_users"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num"),
          col("n"))
        .withColumn("theta",
          round(col("cov_num").cast("double") / col("varx_num"), 9))
        .withColumn("var_y", round(col("vary_num").cast("double") /
          (col("n") * col("n")), 9))
        .withColumn("var_cuped", round(
          (col("vary_num").cast("double") -
            lit(2.0) * col("theta") * col("cov_num") +
            col("theta") * col("theta") * col("varx_num")) /
          (col("n") * col("n")), 9))
        .withColumn("var_reduction_pct",
          round(lit(100.0) * (lit(1.0) - col("var_cuped") / col("var_y")), 6))
        .select(col("n_users"), col("theta"), col("var_y"), col("var_cuped"),
          col("var_reduction_pct"))
    },
    Some("""WITH pu AS (SELECT user_id,
          CAST(SUM(CASE WHEN event_type = 'click'
            AND CAST(ts AS DATE) <= DATE '2024-01-14' THEN 1 ELSE 0 END) AS BIGINT) AS x,
          CAST(SUM(CASE WHEN event_type = 'purchase'
            AND CAST(ts AS DATE) >= DATE '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
          CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pu),
      d AS (SELECT n AS n_users,
          n * sxy - sx * sy AS cov_num,
          n * sxx - sx * sx AS varx_num,
          n * syy - sy * sy AS vary_num, n
        FROM m),
      t AS (SELECT *, round(CAST(cov_num AS DOUBLE) / varx_num, 9) AS theta,
          round(CAST(vary_num AS DOUBLE) / (n * n), 9) AS var_y
        FROM d)
      SELECT n_users, theta, var_y,
        round((CAST(vary_num AS DOUBLE) - 2.0 * theta * cov_num
          + theta * theta * varx_num) / (n * n), 9) AS var_cuped,
        round(100.0 * (1.0 - round((CAST(vary_num AS DOUBLE)
            - 2.0 * theta * cov_num + theta * theta * varx_num) / (n * n), 9)
          / var_y), 6) AS var_reduction_pct
      FROM t"""))

  /** Wald's SPRT over the daily purchase rate: H0 p = p0 (the week-1
    * baseline share of purchase events, a 1-row broadcast), H1
    * p = p1 = round(1.2·p0, 9); each day contributes
    * c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)) to the cumulative
    * log-likelihood ratio (12-dp DECIMAL running sum), compared against
    * the α = β = 0.05 boundaries ±ln(19) = ±2.944438979166441 (a shared
    * numeric literal, so no cross-engine ln(literal) tie). Reports per
    * day: trials, conversions, the running LLR, and the position
    * verdict — the always-valid sequential read a fixed-horizon test
    * can't give. */
  val q352Sprt: QueryDef = QueryDef(
    "q352_sprt",
    (s, dir) => {
      val decL = DecimalType(24, 12)
      val bound = 2.944438979166441 // ln((1-0.05)/0.05)
      val e = EventOps.events(s, dir)
      val daily = e.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c"))
        .localCheckpoint() // baseline + the walk read it
      val p0row = broadcast(daily.filter(col("day") <= lit("2024-01-07"))
        .agg(round(sum(col("c")).cast("double") / sum(col("n")), 9).as("p0"))
        .withColumn("p1", round(col("p0") * 1.2, 9)))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(p0row)
        .withColumn("term", round(
          col("c") * log(col("p1") / col("p0")) +
          (col("n") - col("c")) * log((lit(1.0) - col("p1")) / (lit(1.0) - col("p0"))),
          12).cast(decL))
        .withColumn("llr", sum(col("term")).over(w))
        .select(col("day"), col("n").as("trials"), col("c").as("conversions"),
          round(col("llr").cast("double"), 6).as("llr"),
          when(col("llr").cast("double") >= bound, "reject_h0")
            .when(col("llr").cast("double") <= -bound, "accept_h0")
            .otherwise("continue").as("verdict"))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM events GROUP BY 1),
      p0r AS (SELECT round(CAST(SUM(c) AS DOUBLE) / SUM(n), 9) AS p0
        FROM daily WHERE day <= DATE '2024-01-07'),
      pp AS (SELECT p0, round(p0 * 1.2, 9) AS p1 FROM p0r),
      terms AS (SELECT d.day, d.n, d.c,
          CAST(round(d.c * ln(p.p1 / p.p0)
            + (d.n - d.c) * ln((1.0 - p.p1) / (1.0 - p.p0)), 12)
            AS DECIMAL(24,12)) AS term
        FROM daily d CROSS JOIN pp p),
      walk AS (SELECT day, n, c,
          SUM(term) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
        FROM terms)
      SELECT day, n AS trials, c AS conversions,
        round(CAST(llr AS DOUBLE), 6) AS llr,
        CASE WHEN CAST(llr AS DOUBLE) >= 2.944438979166441 THEN 'reject_h0'
             WHEN CAST(llr AS DOUBLE) <= -2.944438979166441 THEN 'accept_h0'
             ELSE 'continue' END AS verdict
      FROM walk ORDER BY day"""))

  /** Blocking-quality audit (record-linkage): three blocking schemes —
    * language, 16-char lowercase prefix (q135's block), and
    * (lang, token-count ÷ 8 bucket) — scored on the two numbers a
    * blocking choice trades: REDUCTION RATIO (1 − candidate-pair share
    * of all pairs; from block sizes via Σs(s−1)/2, pairs never
    * materialized) and PAIR COMPLETENESS (share of true near-dup pairs
    * co-blocked; truth = q28's MinHash-banded candidates verified with
    * exact Jaccard ≥ 0.5 — complete on this fixture under q28's
    * documented recall contract, while the ORACLE recomputes truth by
    * brute force). The audit that says whether a cheap blocking key is
    * safe to deploy at 100 TB. */
  val q353BlockingQuality: QueryDef = QueryDef(
    "q353_blocking_quality",
    (s, dir) => {
      val k = 32; val bands = 16
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"), lower(col("text")).as("ltext"),
          TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .withColumn("prefix16", substring(col("ltext"), 1, 16))
        .withColumn("lenbucket",
          concat_ws("|", col("lang"), floor(size(col("toks")) / 8).cast("string")))
        .localCheckpoint() // schemes + truth both read it
      // truth pairs: q28's banded candidates + exact-Jaccard verify
      val shingled = docs.withColumn("hsh",
        expr("transform(sequence(0, size(toks)-3), i -> xxhash64(toks[i], toks[i+1], toks[i+2]))"))
        .withColumn("sig", Dedup.minhashSig(col("hsh"), k))
        .localCheckpoint()
      val banded = shingled.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(element_at(col("sig"), b * 2 + 1),
                          element_at(col("sig"), b * 2 + 2)))))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bh"))
      val sh = shingled.select(col("doc_id"), array_distinct(col("hsh")).as("shd"))
      val truth = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("bh"), col("doc_id").as("id_b")),
          Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .join(sh.select(col("doc_id").as("id_a"), col("shd").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("shd").as("sh_b")), Seq("id_b"))
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) >= 0.5)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // three scheme joins read it
      val nDocs = broadcast(docs.agg(count(lit(1)).as("nd")))
      val nTruth = broadcast(truth.agg(count(lit(1)).as("n_truth")))
      def scheme(name: String, key: org.apache.spark.sql.Column): DataFrame = {
        val keys = docs.select(col("doc_id"), key.as("bk")).localCheckpoint()
        val cand = keys.groupBy(col("bk")).agg(count(lit(1)).as("sz"))
          .agg(coalesce(sum(expr("sz * (sz - 1) div 2")), lit(0L)).as("n_cand"))
        val covered = truth
          .join(keys.select(col("doc_id").as("id_a"), col("bk").as("ka")), Seq("id_a"))
          .join(keys.select(col("doc_id").as("id_b"), col("bk").as("kb")), Seq("id_b"))
          .agg(sum(when(col("ka") === col("kb"), 1L).otherwise(0L)).as("n_covered"))
        broadcast(cand).crossJoin(broadcast(covered))
          .crossJoin(nDocs).crossJoin(nTruth)
          .select(lit(name).as("scheme"), col("n_cand"),
            round(lit(1.0) - col("n_cand").cast("double") /
              (col("nd") * (col("nd") - 1) / 2), 9).as("reduction_ratio"),
            col("n_truth"), coalesce(col("n_covered"), lit(0L)).as("n_covered"),
            round(coalesce(col("n_covered"), lit(0L)).cast("double") /
              col("n_truth"), 9).as("completeness"))
      }
      scheme("lang", col("lang"))
        .unionByName(scheme("prefix16", col("prefix16")))
        .unionByName(scheme("lang_lenbucket", col("lenbucket")))
        .orderBy(col("scheme"))
    },
    Some("""WITH t AS (SELECT doc_id, lang, lower(text) AS ltext,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      d AS (SELECT doc_id, lang, substr(ltext, 1, 16) AS prefix16,
          lang || '|' || CAST(len(toks) // 8 AS VARCHAR) AS lenbucket,
          list_distinct(list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3),
      truth AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
      keys AS (
        SELECT 'lang' AS scheme, doc_id, lang AS bk FROM d
        UNION ALL SELECT 'prefix16', doc_id, prefix16 FROM d
        UNION ALL SELECT 'lang_lenbucket', doc_id, lenbucket FROM d),
      cand AS (SELECT scheme, CAST(COALESCE(SUM(sz * (sz - 1) // 2), 0) AS BIGINT) AS n_cand
        FROM (SELECT scheme, bk, COUNT(*) AS sz FROM keys GROUP BY 1, 2)
        GROUP BY 1),
      cov AS (SELECT ka.scheme,
          CAST(SUM(CASE WHEN ka.bk = kb.bk THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM truth tr
        JOIN keys ka ON ka.doc_id = tr.id_a
        JOIN keys kb ON kb.doc_id = tr.id_b AND kb.scheme = ka.scheme
        GROUP BY 1)
      SELECT c.scheme, c.n_cand,
        round(1.0 - CAST(c.n_cand AS DOUBLE) / (nd.nd * (nd.nd - 1) / 2), 9)
          AS reduction_ratio,
        nt.n_truth, COALESCE(v.n_covered, 0) AS n_covered,
        round(CAST(COALESCE(v.n_covered, 0) AS DOUBLE) / nt.n_truth, 9)
          AS completeness
      FROM cand c LEFT JOIN cov v USING (scheme)
      CROSS JOIN nd CROSS JOIN nt
      ORDER BY scheme"""))

  val all: Seq[QueryDef] = Seq(q351Cuped, q352Sprt, q353BlockingQuality)
}
