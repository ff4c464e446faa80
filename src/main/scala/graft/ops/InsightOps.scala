package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical-insight operators: χ² independence testing, information
  * gain of curation gates, deterministic negative sampling, and
  * burstiness profiling — the feature-selection and training-pair
  * layer over the same keyed-scan shapes.
  */
object InsightOps {

  /** χ² test of independence on the market-segment × order-priority
    * contingency table — "does priority mix differ by segment?". One
    * hash-agg to the ≤|segs|·|prios| cell table; marginals and N are
    * windows over that model-sized frame, never a second scan. Expected
    * counts divide exact int64 marginals in double, mirrored; per-cell
    * contributions let the analyst see WHERE independence breaks, not
    * just that it does.
    */
  val q170ContingencyChi2: QueryDef = QueryDef(
    "q170_contingency_chi2",
    (s, dir) => {
      val t = Tables(s, dir)
      val cells = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_obs"))
      val wRow = Window.partitionBy(col("c_mktsegment"))
      val wCol = Window.partitionBy(col("o_orderpriority"))
      val wAll = Window.partitionBy()
      cells
        .withColumn("e",
          sum(col("n_obs")).over(wRow).cast("double") *
            sum(col("n_obs")).over(wCol).cast("double") /
            sum(col("n_obs")).over(wAll).cast("double"))
        .select(col("c_mktsegment"), col("o_orderpriority"), col("n_obs"),
          round(col("e"), 6).as("expected"),
          round((col("n_obs").cast("double") - col("e")) *
                (col("n_obs").cast("double") - col("e")) / col("e"), 6)
            .as("chi2_contrib"))
    },
    Some("""WITH cells AS (SELECT c_mktsegment, o_orderpriority,
          COUNT(*) AS n_obs
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      m AS (SELECT *,
          CAST(SUM(n_obs) OVER (PARTITION BY c_mktsegment) AS DOUBLE) *
            CAST(SUM(n_obs) OVER (PARTITION BY o_orderpriority) AS DOUBLE) /
            CAST(SUM(n_obs) OVER () AS DOUBLE) AS e
        FROM cells)
      SELECT c_mktsegment, o_orderpriority, n_obs,
        round(e, 6) AS expected,
        round((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e) / e, 6)
          AS chi2_contrib
      FROM m"""))

  /** Information gain of three cheap curation gates (length, token
    * count, vocabulary size) against the language label: which
    * filter actually separates the corpus — the feature-selection step
    * before anyone trains a quality classifier. ONE scan builds every
    * (feature, gate, lang) count via a stack generator; both entropies
    * are ln-sums over exact count ratios on the model-sized profile.
    * Complements q142 (kappa says two gates agree; IG says whether a
    * gate carries label information at all).
    */
  val q171InfoGain: QueryDef = QueryDef(
    "q171_info_gain",
    (s, dir) => {
      val cnt = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("lang"), expr(
          """stack(3,
             'len_gate',   CAST(n_chars >= 300 AS STRING),
             'tok_gate',   CAST(size(toks) >= 55 AS STRING),
             'vocab_gate', CAST(size(array_distinct(toks)) >= 30 AS STRING))
             AS (feature, gate)"""))
        .groupBy(col("feature"), col("gate"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val wF  = Window.partitionBy(col("feature"))
      val wFG = Window.partitionBy(col("feature"), col("gate"))
      val wFL = Window.partitionBy(col("feature"), col("lang"))
      val terms = cnt
        .withColumn("n",    sum(col("c")).over(wF))
        .withColumn("n_fg", sum(col("c")).over(wFG))
        .withColumn("m_l",  sum(col("c")).over(wFL))
        .withColumn("h_cond_term",
          -(col("c").cast("double") / col("n")) *
            log(col("c").cast("double") / col("n_fg")))
        // the label-entropy term is constant per (feature, lang): divide
        // its contribution evenly over that frame's rows so one SUM
        // yields it exactly once per feature
        .withColumn("h_label_term",
          (-(col("m_l").cast("double") / col("n")) *
            log(col("m_l").cast("double") / col("n"))) /
            count(lit(1)).over(wFL).cast("double"))
      terms.groupBy(col("feature"))
        .agg(max(col("n")).as("n_docs"),
          round(sum(col("h_label_term")), 6).as("h_label"),
          round(sum(col("h_cond_term")), 6).as("h_cond"),
          round(sum(col("h_label_term")) - sum(col("h_cond_term")), 6)
            .as("info_gain"))
    },
    Some("""WITH cnt AS (
        SELECT lang, f.feature, f.gate, COUNT(*) AS c
        FROM documents,
          LATERAL (VALUES
            ('len_gate',   CAST(n_chars >= 300 AS VARCHAR)),
            ('tok_gate',   CAST(len(regexp_extract_all(lower(text), '\w+')) >= 55 AS VARCHAR)),
            ('vocab_gate', CAST(len(list_distinct(regexp_extract_all(lower(text), '\w+'))) >= 30 AS VARCHAR)))
            AS f(feature, gate)
        GROUP BY 1, 2, 3),
      terms AS (SELECT *,
          CAST(SUM(c) OVER (PARTITION BY feature) AS BIGINT) AS n,
          CAST(SUM(c) OVER (PARTITION BY feature, gate) AS BIGINT) AS n_fg,
          CAST(SUM(c) OVER (PARTITION BY feature, lang) AS BIGINT) AS m_l,
          COUNT(*) OVER (PARTITION BY feature, lang) AS k_fl
        FROM cnt),
      t2 AS (SELECT feature, n,
          -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n_fg) AS h_cond_term,
          (-(CAST(m_l AS DOUBLE) / n) * ln(CAST(m_l AS DOUBLE) / n))
            / CAST(k_fl AS DOUBLE) AS h_label_term
        FROM terms)
      SELECT feature, MAX(n) AS n_docs,
        round(SUM(h_label_term), 6) AS h_label,
        round(SUM(h_cond_term), 6) AS h_cond,
        round(SUM(h_label_term) - SUM(h_cond_term), 6) AS info_gain
      FROM t2 GROUP BY 1"""))

  /** Deterministic negative sampling for training pairs: for every
    * purchasing customer, the 5 most-"random" popular parts they did
    * NOT buy — the contrastive negatives a recommender/embedding
    * trainer pairs with the positives. The candidate pool is the
    * top-50-popularity parts (model-sized, broadcast — the candidate
    * generation NEVER goes customers × parts), negatives are an
    * anti-join against the purchase set, and "random" is an md5 hash
    * rank: reproducible across runs, engines, and partitionings, which
    * is what makes the train set auditable.
    */
  val q172NegativeSampling: QueryDef = QueryDef(
    "q172_negative_sampling",
    (s, dir) => {
      val t = Tables(s, dir)
      val purch = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
        .localCheckpoint() // feeds pool build, candidate users, and the anti-join
      val pool = purch.groupBy(col("part"))
        .agg(countDistinct(col("cust")).as("n_buyers"))
        .orderBy(col("n_buyers").desc, col("part").asc)
        .limit(50)
        .select(col("part"))
      val cands = purch.select(col("cust")).distinct()
        .crossJoin(broadcast(pool))
      val neg = cands.join(purch, Seq("cust", "part"), "left_anti")
      val w = Window.partitionBy(col("cust"))
        .orderBy(md5(concat(col("cust").cast("string"), lit("|"),
                            col("part").cast("string"))).asc,
                 col("part").asc)
      neg.withColumn("neg_rank", row_number().over(w).cast("long"))
        .filter(col("neg_rank") <= 5)
        .select(col("cust"), col("part"), col("neg_rank"))
    },
    Some("""WITH purch AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS part
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      pool AS (SELECT part, COUNT(DISTINCT cust) AS n_buyers
          FROM purch GROUP BY 1
          ORDER BY n_buyers DESC, part ASC LIMIT 50),
      cands AS (SELECT c.cust, p.part
          FROM (SELECT DISTINCT cust FROM purch) c CROSS JOIN pool p),
      neg AS (SELECT * FROM cands
          WHERE NOT EXISTS (SELECT 1 FROM purch
            WHERE purch.cust = cands.cust AND purch.part = cands.part)),
      rk AS (SELECT cust, part,
          ROW_NUMBER() OVER (PARTITION BY cust
            ORDER BY md5(concat(CAST(cust AS VARCHAR), '|',
                                CAST(part AS VARCHAR))) ASC, part ASC)
            AS neg_rank
        FROM neg)
      SELECT cust, part, neg_rank FROM rk WHERE neg_rank <= 5"""))

  /** Burstiness profile (Fano factor): variance-to-mean ratio of each
    * event type's DAILY counts — Poisson arrivals sit at 1.0, bursty
    * types (incident storms, bot traffic) sit far above; the signal a
    * pipeline uses to pick which streams need rate-adaptive handling.
    * Daily counts are one keyed agg; the Fano factor runs the q54 exact
    * power-sum idiom over those int64 counts (day count per type is
    * bounded, but the math never assumes it).
    */
  val q173Burstiness: QueryDef = QueryDef(
    "q173_burstiness",
    (s, dir) => {
      val daily = EventOps.events(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      val n  = count(lit(1)).cast("double")
      val s1 = sum(col("c")).cast("double")
      val s2 = sum(col("c") * col("c")).cast("double")
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(s1 / n, 6).as("mean_daily"),
          round(((s2 - s1 * s1 / n) / (n - lit(1.0))) / (s1 / n), 6)
            .as("fano_factor"))
    },
    Some("""WITH daily AS (SELECT event_type, EXTRACT(day FROM ts) AS d,
          COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      p AS (SELECT event_type, COUNT(*) AS n_days,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(c) AS DOUBLE) AS s1,
          CAST(SUM(c * c) AS DOUBLE) AS s2
        FROM daily GROUP BY 1)
      SELECT event_type, n_days,
        round(s1 / n, 6) AS mean_daily,
        round(((s2 - s1 * s1 / n) / (n - 1.0)) / (s1 / n), 6) AS fano_factor
      FROM p"""))

  val all: Seq[QueryDef] = Seq(q170ContingencyChi2, q171InfoGain,
    q172NegativeSampling, q173Burstiness)
}
