package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Agreement & competition wave: Krippendorff's alpha across three
  * quality gates, a paired sign-flip permutation test between md5 arms,
  * Bradley–Terry strength estimation from pairwise brand duels, and the
  * Condorcet/Copeland tournament audit — the multi-rater and
  * multi-competitor inference layer on top of the earlier two-sample
  * tests (q142 kappa, q215 two-proportion z).
  *
  * Scale shapes: q310 is one projection pass folded into exact integer
  * coincidence sums; q311 folds days × 64 sign replicates into exact
  * DECIMAL sums; q312/q313 run on the (day × brand) spine and its
  * brand-pair frame — calendar- and dimension-bounded at any data
  * scale.
  */
object CompeteOps {

  /** Krippendorff's alpha (nominal, 3 raters, no missing values) for
    * inter-gate agreement: three heuristic quality gates each rate every
    * document pass/fail; α = 1 − (n−1)·o01 / (n0·n1), where o01 is the
    * within-unit cross-category coincidence Σ_u n_u0·n_u1/(m−1) — the
    * standard coincidence-matrix closed form. All integer sums until the
    * final ratio. Generalizes q142's two-rater kappa. */
  val q310KrippendorffAlpha: QueryDef = QueryDef(
    "q310_krippendorff_alpha",
    (s, dir) => {
      val rated = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
          col("n_chars"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .withColumn("g_len", (col("n_toks") >= 30L).cast("long"))
        .withColumn("g_distinct",
          (col("n_toks") > 0L &&
            size(array_distinct(col("toks"))).cast("double") /
              greatest(col("n_toks"), lit(1L)) >= 0.25).cast("long"))
        .withColumn("g_chars", (col("n_chars") >= 150L).cast("long"))
        .withColumn("n_pass", col("g_len") + col("g_distinct") + col("g_chars"))
      rated.agg(
        count(lit(1)).as("n_units"),
        sum(col("n_pass")).as("n1"),
        sum(lit(3L) - col("n_pass")).as("n0"),
        // per-unit cross-category coincidence, ×2 to stay integral:
        // 2·Σ n_u0·n_u1/(m−1) with m=3 ⇒ Σ n_u0·n_u1
        sum(col("n_pass") * (lit(3L) - col("n_pass"))).as("o01_x2"))
        .select(col("n_units"), col("n0"), col("n1"),
          round(lit(1.0) - ((col("n0") + col("n1") - 1).cast("double") *
            (col("o01_x2").cast("double") / 2.0)) /
            (col("n0").cast("double") * col("n1")), 6).as("alpha"))
    },
    Some("""WITH rated AS (SELECT
          CASE WHEN len(regexp_extract_all(lower(text), '\w+')) >= 30
               THEN 1 ELSE 0 END
          + CASE WHEN len(regexp_extract_all(lower(text), '\w+')) > 0
                  AND CAST(len(list_distinct(regexp_extract_all(lower(text), '\w+')))
                   AS DOUBLE) / greatest(len(regexp_extract_all(lower(text), '\w+')), 1) >= 0.25
               THEN 1 ELSE 0 END
          + CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS n_pass
        FROM documents),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
          CAST(SUM(3 - n_pass) AS BIGINT) AS n0,
          CAST(SUM(n_pass) AS BIGINT) AS n1,
          CAST(SUM(n_pass * (3 - n_pass)) AS BIGINT) AS o01_x2
        FROM rated)
      SELECT n_units, n0, n1,
        round(1.0 - (CAST(n0 + n1 - 1 AS DOUBLE) * (CAST(o01_x2 AS DOUBLE) / 2.0))
          / (CAST(n0 AS DOUBLE) * n1), 6) AS alpha
      FROM agg"""))

  /** Paired sign-flip permutation test: daily revenue difference between
    * the two md5 user arms (q215's split), tested by 64 deterministic
    * sign-flip replicates (md5-seeded ±1 per (day, replicate)). p-value
    * = share of replicate |mean| ≥ observed |mean| — the exact-ish
    * randomization answer that needs no normality. Every cross-engine
    * sum folds pre-rounded DECIMAL terms. */
  val q311PairedPermutation: QueryDef = QueryDef(
    "q311_paired_permutation",
    (s, dir) => {
      val M = DecimalType(22, 4)
      val t = Tables(s, dir)
      val daily = t.orders
        .withColumn("arm",
          pmod(conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(2L)))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(when(col("arm") === 0L, col("o_totalprice")).otherwise(0.0)
          .cast(M)).as("rev_a"),
          sum(when(col("arm") === 1L, col("o_totalprice")).otherwise(0.0)
            .cast(M)).as("rev_b"))
        .withColumn("d", col("rev_a") - col("rev_b"))
        .localCheckpoint() // feeds the observed stat and all 64 replicates
      val obs = daily.agg(count(lit(1)).as("n_days"),
        (sum(col("d")).cast("double") / count(lit(1))).as("t_obs"))
      val reps = daily
        .withColumn("b", explode(sequence(lit(1L), lit(64L))))
        .withColumn("sgn",
          when(pmod(conv(substring(md5(concat_ws(":", col("day"), col("b"))), 1, 8),
            16, 10).cast("long"), lit(2L)) === 0L, lit(1L)).otherwise(lit(-1L)))
        .groupBy(col("b"))
        .agg((sum(col("sgn") * col("d")).cast("double") /
          count(lit(1))).as("t_rep"))
      reps.crossJoin(broadcast(obs))
        .agg(max(col("n_days")).as("n_days"),
          round(max(abs(col("t_obs"))), 4).as("t_obs_abs"),
          sum((abs(col("t_rep")) >= abs(col("t_obs"))).cast("long")).as("n_extreme"),
          count(lit(1)).as("n_reps"))
        .select(col("n_days"), col("t_obs_abs"),
          col("n_extreme"), col("n_reps"),
          round(col("n_extreme").cast("double") / col("n_reps"), 6).as("p_value"),
          (col("n_extreme").cast("double") / col("n_reps") < 0.05).as("reject_05"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          SUM(CAST(CASE WHEN ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
            THEN o_totalprice ELSE 0 END AS DECIMAL(22,4))) AS rev_a,
          SUM(CAST(CASE WHEN ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
            THEN o_totalprice ELSE 0 END AS DECIMAL(22,4))) AS rev_b
        FROM orders GROUP BY 1),
      dd AS (SELECT day, rev_a - rev_b AS d FROM daily),
      obs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(SUM(d) AS DOUBLE) / COUNT(*) AS t_obs FROM dd),
      reps AS (SELECT b.b,
          CAST(SUM((CASE WHEN ('0x' || substr(md5(dd.day || ':' || b.b), 1, 8))::BIGINT % 2 = 0
            THEN 1 ELSE -1 END) * dd.d) AS DOUBLE) / COUNT(*) AS t_rep
        FROM dd CROSS JOIN (SELECT UNNEST(range(1, 65)) AS b) b
        GROUP BY 1),
      fin AS (SELECT obs.n_days, abs(obs.t_obs) AS t_obs_abs,
          CAST(SUM(CASE WHEN abs(reps.t_rep) >= abs(obs.t_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
          CAST(COUNT(*) AS BIGINT) AS n_reps
        FROM reps, obs GROUP BY 1, 2)
      SELECT n_days, round(t_obs_abs, 4) AS t_obs_abs, n_extreme, n_reps,
        round(CAST(n_extreme AS DOUBLE) / n_reps, 6) AS p_value,
        (CAST(n_extreme AS DOUBLE) / n_reps < 0.05) AS reject_05
      FROM fin"""))

  /** Shared duel frame for q312/q313: daily brand revenue, then for each
    * day every brand pair with both present — the higher-revenue brand
    * wins the duel (exact-tie days are dropped). Days × brand-pairs is
    * calendar × dimension² — bounded at any data scale. */
  private def duels(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val daily = t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(to_date(col("l_shipdate")).as("day"), col("p_brand").as("brand"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(22, 8))).as("rev"))
      .localCheckpoint() // both duel sides read the same spine
    daily.select(col("day"), col("brand").as("a"), col("rev").as("ra"))
      .join(daily.select(col("day"), col("brand").as("b"), col("rev").as("rb")),
        Seq("day"))
      .filter(col("a") < col("b") && col("ra") =!= col("rb"))
      .select(col("a"), col("b"), (col("ra") > col("rb")).cast("long").as("a_wins"))
  }

  private val duelsSql =
    """daily AS (SELECT CAST(l_shipdate AS DATE) AS day, p.p_brand AS brand,
          SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,8))) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
      duels AS (SELECT x.brand AS a, y.brand AS b,
          CASE WHEN x.rev > y.rev THEN 1 ELSE 0 END AS a_wins
        FROM daily x JOIN daily y ON x.day = y.day
        WHERE x.brand < y.brand AND x.rev <> y.rev)"""

  /** Bradley–Terry strengths from the daily brand duels, two unrolled
    * MM iterations from the uniform start (s⁰ = 1 ⇒ s¹_i = 2w_i/n_i;
    * s²_i = w_i / Σ_j n_ij/(s¹_i+s¹_j)), normalized to mean 1. The MM
    * denominator folds pre-rounded DECIMAL terms over the brand-pair
    * frame. Output: wins, comparisons, strength, rank. */
  val q312BradleyTerry: QueryDef = QueryDef(
    "q312_bradley_terry",
    (s, dir) => {
      // r16: the duel frame has ONE consumer (the pair census) — its
      // eager checkpoint materialized the days×pairs frame for nothing;
      // pairs/wins stay checkpointed (multiple consumers) but LAZY, so
      // the two model-sized frames materialize inside the final action
      // instead of costing a driver job each
      val pairs = duels(s, dir).groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_ab"), sum(col("a_wins")).as("w_ab"))
        .localCheckpoint(false)
      val wins = pairs.select(col("a").as("brand"), col("w_ab").as("w"),
          col("n_ab").as("n"))
        .unionAll(pairs.select(col("b").as("brand"),
          (col("n_ab") - col("w_ab")).as("w"), col("n_ab").as("n")))
        .groupBy(col("brand"))
        .agg(sum(col("w")).as("wins"), sum(col("n")).as("comparisons"))
        .withColumn("s1",
          lit(2.0) * col("wins").cast("double") / col("comparisons"))
        .localCheckpoint(false)
      val s1a = wins.select(col("brand").as("a"), col("s1").as("s1a"))
      val s1b = wins.select(col("brand").as("b"), col("s1").as("s1b"))
      val denom = pairs.join(broadcast(s1a), Seq("a")).join(broadcast(s1b), Seq("b"))
        .withColumn("term", round(col("n_ab").cast("double") /
          (col("s1a") + col("s1b")), 12).cast(DecimalType(24, 12)))
        .select(col("a"), col("b"), col("term"))
      val byBrand = denom.select(col("a").as("brand"), col("term"))
        .unionAll(denom.select(col("b").as("brand"), col("term")))
        .groupBy(col("brand")).agg(sum(col("term")).cast("double").as("den"))
      val w = Window.partitionBy()
      wins.join(byBrand, Seq("brand"))
        .withColumn("s2_raw", col("wins").cast("double") / col("den"))
        .withColumn("s2_sum", sum(round(col("s2_raw"), 9).cast(DecimalType(24, 9)))
          .over(w).cast("double"))
        .withColumn("n_brands", count(lit(1)).over(w))
        .withColumn("strength",
          round(col("s2_raw") * col("n_brands") / col("s2_sum"), 6))
        .withColumn("rank", row_number().over(Window.orderBy(
          col("strength").desc, col("brand").asc)).cast("long"))
        .select(col("brand"), col("wins"), col("comparisons"),
          col("strength"), col("rank"))
        .orderBy(col("rank"))
    },
    Some(s"""WITH $duelsSql,
      pairs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab,
          CAST(SUM(a_wins) AS BIGINT) AS w_ab
        FROM duels GROUP BY 1, 2),
      wins AS (SELECT brand, CAST(SUM(w) AS BIGINT) AS wins,
          CAST(SUM(n) AS BIGINT) AS comparisons,
          2.0 * SUM(w) / SUM(n) AS s1
        FROM (SELECT a AS brand, w_ab AS w, n_ab AS n FROM pairs
              UNION ALL
              SELECT b, n_ab - w_ab, n_ab FROM pairs)
        GROUP BY 1),
      denom AS (SELECT p.a, p.b,
          CAST(round(CAST(p.n_ab AS DOUBLE) / (wa.s1 + wb.s1), 12)
            AS DECIMAL(24,12)) AS term
        FROM pairs p JOIN wins wa ON wa.brand = p.a
          JOIN wins wb ON wb.brand = p.b),
      den AS (SELECT brand, CAST(SUM(term) AS DOUBLE) AS den
        FROM (SELECT a AS brand, term FROM denom
              UNION ALL SELECT b, term FROM denom)
        GROUP BY 1),
      s2 AS (SELECT w.brand, w.wins, w.comparisons,
          CAST(w.wins AS DOUBLE) / d.den AS s2_raw
        FROM wins w JOIN den d USING (brand)),
      norm AS (SELECT *, CAST(SUM(CAST(round(s2_raw, 9) AS DECIMAL(24,9)))
            OVER () AS DOUBLE) AS s2_sum,
          COUNT(*) OVER () AS n_brands
        FROM s2)
      SELECT brand, wins, comparisons,
        round(s2_raw * n_brands / s2_sum, 6) AS strength,
        CAST(ROW_NUMBER() OVER (ORDER BY round(s2_raw * n_brands / s2_sum, 6)
            DESC, brand)
          AS BIGINT) AS rank
      FROM norm ORDER BY rank"""))

  /** Condorcet / Copeland tournament audit on the same duels: brand a
    * "beats" b when it wins the majority of their daily duels; the
    * Copeland score counts pairwise victories, and the Condorcet winner
    * (if any) beats every other brand. Pure pair-frame arithmetic after
    * the duel aggregation. */
  val q313CondorcetAudit: QueryDef = QueryDef(
    "q313_condorcet_audit",
    (s, dir) => {
      val pairs = duels(s, dir).groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_ab"), sum(col("a_wins")).as("w_ab"))
        .withColumn("a_beats",
          (col("w_ab") * 2 > col("n_ab")).cast("long"))
        .withColumn("b_beats",
          (col("w_ab") * 2 < col("n_ab")).cast("long"))
        .localCheckpoint()
      val scores = pairs.select(col("a").as("brand"), col("a_beats").as("v"),
          lit(1L).as("m"))
        .unionAll(pairs.select(col("b").as("brand"), col("b_beats").as("v"),
          lit(1L).as("m")))
        .groupBy(col("brand"))
        .agg(sum(col("v")).as("copeland"), sum(col("m")).as("n_opponents"))
      scores
        .withColumn("is_condorcet", col("copeland") === col("n_opponents"))
        .select(col("brand"), col("copeland"), col("n_opponents"),
          col("is_condorcet"))
        .orderBy(col("copeland").desc, col("brand"))
    },
    Some(s"""WITH $duelsSql,
      pairs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab,
          CAST(SUM(a_wins) AS BIGINT) AS w_ab
        FROM duels GROUP BY 1, 2),
      sides AS (SELECT a AS brand,
          CASE WHEN w_ab * 2 > n_ab THEN 1 ELSE 0 END AS v, 1 AS m FROM pairs
        UNION ALL
        SELECT b, CASE WHEN w_ab * 2 < n_ab THEN 1 ELSE 0 END, 1 FROM pairs),
      scores AS (SELECT brand, CAST(SUM(v) AS BIGINT) AS copeland,
          CAST(SUM(m) AS BIGINT) AS n_opponents
        FROM sides GROUP BY 1)
      SELECT brand, copeland, n_opponents,
        (copeland = n_opponents) AS is_condorcet
      FROM scores ORDER BY copeland DESC, brand"""))

  val all: Seq[QueryDef] = Seq(q310KrippendorffAlpha, q311PairedPermutation,
    q312BradleyTerry, q313CondorcetAudit)
}
