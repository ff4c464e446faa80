package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Bayesian-decision wave: exact Beta–Binomial A/B posterior (q456) and
  * the Page–Hinkley online drift detector (q457). q456 completes the
  * experimentation family with its Bayesian member — q215's z-test and
  * q352's SPRT answer "is there an effect?"; the posterior answers
  * "what is P(B beats A)?" EXACTLY, via the closed-form sum
  * h(a₁,b₁,a₂,b₂) = Σᵢ B(a₁+i, b₁+b₂) / [(b₂+i)·B(1+i, b₂)·B(a₁, b₁)]
  * computed in the q437 ln-factorial-spine idiom (uniform priors make
  * every Beta argument an integer). q457 gives the drift family its
  * sequential member: CUSUM (q130) scans offline, Page–Hinkley is THE
  * streaming-monitor form (m_t − min m_s vs a λ threshold).
  *
  * Determinism: q456's terms round at 12 dp and sum as DECIMAL off a
  * spine of running 9-dp-rounded logs; q457 is exact prefix-integer
  * algebra against deterministic (x̄ + δ) drift.
  *
  * Scale shape: one scan each; q456 adds an (nA+nB)-row spine + a
  * successes-sized sweep, both linear.
  */
object BayesAbOps {

  private val HighValue = 300000.0

  /** Exact P(urgent beats non-urgent on the high-value rate) under
    * independent Beta(1,1) priors: per-arm posterior summary plus the
    * shared exact probability and the 95% decision. */
  val q456BayesianAb: QueryDef = QueryDef(
    "q456_bayesian_ab",
    (s, dir) => {
      val cells = Tables(s, dir).orders
        .select(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("arm"),
          when(col("o_totalprice") > HighValue, 1L).otherwise(0L).as("hv"))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("hv")).as("r"))
      val params = cells.agg(
        max(when(col("arm") === 0, col("n"))).as("na"),
        max(when(col("arm") === 0, col("r"))).as("ra"),
        max(when(col("arm") === 1, col("n"))).as("nb"),
        max(when(col("arm") === 1, col("r"))).as("rb"))
        // uniform priors: a = 1 + r, b = 1 + n - r
        .select((col("ra") + 1).as("aa"), (col("na") - col("ra") + 1).as("ba"),
          (col("rb") + 1).as("ab"), (col("nb") - col("rb") + 1).as("bb"),
          col("na"), col("ra"), col("nb"), col("rb"))
        .localCheckpoint() // spine + sweep + report passes
      // ln-factorial spine up to aa+ba+ab+bb. r15: distributed exact
      // ladder replaces the single-partition window + single-task
      // explode (length grows with the corpus); bit-identical by the
      // DECIMAL-prefix argument on Spine.lnFactorialLadder. Length
      // probe = one head() on the 1-row checkpointed params frame.
      val spine = Spine.lnFactorialLadder(s, params
          .select((col("aa") + col("ba") + col("ab") + col("bb")).as("len"))
          .head().getLong(0))
        .localCheckpoint() // probed five times by the sweep
      def lfOf(keyCol: String, out: String) =
        spine.select(col("j").as(keyCol), col("lf").as(out))
      // lnB(x, y) = lf(x-1) + lf(y-1) - lf(x+y-1); constants first
      val const = params
        .withColumn("k1", col("ba") + col("bb") - 1)
        .join(lfOf("k1", "lf_babb"), Seq("k1"), "left")
        .withColumn("k2", col("aa") - 1)
        .join(lfOf("k2", "lf_aam1"), Seq("k2"), "left")
        .withColumn("k3", col("ba") - 1)
        .join(lfOf("k3", "lf_bam1"), Seq("k3"), "left")
        .withColumn("k4", col("aa") + col("ba") - 1)
        .join(lfOf("k4", "lf_aaba"), Seq("k4"), "left")
        .withColumn("k5", col("bb") - 1)
        .join(lfOf("k5", "lf_bbm1"), Seq("k5"), "left")
        .withColumn("lnb_aa_ba", coalesce(col("lf_aam1"), lit(0.0))
          + coalesce(col("lf_bam1"), lit(0.0))
          - coalesce(col("lf_aaba"), lit(0.0)))
      val ks = const.select(col("aa"), col("ba"), col("bb"),
        coalesce(col("lf_babb"), lit(0.0)).as("lf_babb"),
        coalesce(col("lf_bbm1"), lit(0.0)).as("lf_bbm1"),
        col("lnb_aa_ba"),
        explode(sequence(lit(0L), col("ab") - 1)).as("i"))
        .withColumn("m1", col("aa") + col("i") - 1)
        .withColumn("m2", col("aa") + col("i") + col("ba") + col("bb") - 1)
        .withColumn("m3", col("i"))
        .withColumn("m4", col("i") + col("bb"))
      val tail = ks
        .join(lfOf("m1", "lf1"), Seq("m1"), "left")
        .join(lfOf("m2", "lf2"), Seq("m2"), "left")
        .join(lfOf("m3", "lf3"), Seq("m3"), "left")
        .join(lfOf("m4", "lf4"), Seq("m4"), "left")
        .withColumn("lnt",
          coalesce(col("lf1"), lit(0.0)) + col("lf_babb")
            - coalesce(col("lf2"), lit(0.0))
            - log((col("bb") + col("i")).cast("double"))
            - (coalesce(col("lf3"), lit(0.0)) + col("lf_bbm1")
              - coalesce(col("lf4"), lit(0.0)))
            - col("lnb_aa_ba"))
        .agg(sum(round(exp(col("lnt")), 12).cast(DecimalType(38, 12)))
          .as("p_raw"))
      val p = tail.select(
        round(least(lit(1.0), col("p_raw").cast("double")), 6)
          .as("p_b_beats_a"))
      val arms = params.select(explode(array(
        struct(lit("non_urgent").as("arm"), col("na").as("n"),
          col("ra").as("successes")),
        struct(lit("urgent").as("arm"), col("nb").as("n"),
          col("rb").as("successes")))).as("r"))
        .select(col("r.arm").as("arm"), col("r.n").as("n"),
          col("r.successes").as("successes"))
        .withColumn("post_mean", round(
          (col("successes") + 1) / (col("n").cast("double") + 2), 6))
      arms.crossJoin(broadcast(p))
        .withColumn("b_better_95", col("p_b_beats_a") > 0.95)
        .orderBy(col("arm"))
    },
    Some(s"""WITH cells AS (SELECT
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS arm,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN o_totalprice > $HighValue THEN 1 ELSE 0 END)
            AS BIGINT) AS r
        FROM orders GROUP BY 1),
      params AS (SELECT ra + 1 AS aa, na - ra + 1 AS ba,
          rb + 1 AS ab, nb - rb + 1 AS bb, na, ra, nb, rb
        FROM (SELECT
            MAX(CASE WHEN arm = 0 THEN n END) AS na,
            MAX(CASE WHEN arm = 0 THEN r END) AS ra,
            MAX(CASE WHEN arm = 1 THEN n END) AS nb,
            MAX(CASE WHEN arm = 1 THEN r END) AS rb
          FROM cells)),
      spine AS MATERIALIZED (SELECT j,
          CAST(SUM(CAST(round(ln(CAST(j AS DOUBLE)), 9) AS DECIMAL(38,9)))
            OVER (ORDER BY j) AS DOUBLE) AS lf
        FROM (SELECT UNNEST(range(1, aa + ba + ab + bb + 1)) AS j
          FROM params)),
      const_ AS (SELECT p.*,
          COALESCE(s1.lf, 0.0) AS lf_babb,
          COALESCE(s5.lf, 0.0) AS lf_bbm1,
          COALESCE(s2.lf, 0.0) + COALESCE(s3.lf, 0.0)
            - COALESCE(s4.lf, 0.0) AS lnb_aa_ba
        FROM params p
        LEFT JOIN spine s1 ON s1.j = p.ba + p.bb - 1
        LEFT JOIN spine s2 ON s2.j = p.aa - 1
        LEFT JOIN spine s3 ON s3.j = p.ba - 1
        LEFT JOIN spine s4 ON s4.j = p.aa + p.ba - 1
        LEFT JOIN spine s5 ON s5.j = p.bb - 1),
      ks AS (SELECT c.*, UNNEST(range(0, c.ab)) AS i FROM const_ c),
      tail AS (SELECT SUM(CAST(round(exp(
            COALESCE(f1.lf, 0.0) + ks.lf_babb - COALESCE(f2.lf, 0.0)
              - ln(CAST(ks.bb + ks.i AS DOUBLE))
              - (COALESCE(f3.lf, 0.0) + ks.lf_bbm1 - COALESCE(f4.lf, 0.0))
              - ks.lnb_aa_ba), 12) AS DECIMAL(38,12))) AS p_raw
        FROM ks
        LEFT JOIN spine f1 ON f1.j = ks.aa + ks.i - 1
        LEFT JOIN spine f2 ON f2.j = ks.aa + ks.i + ks.ba + ks.bb - 1
        LEFT JOIN spine f3 ON f3.j = ks.i
        LEFT JOIN spine f4 ON f4.j = ks.i + ks.bb),
      p AS (SELECT round(LEAST(1.0, CAST(p_raw AS DOUBLE)), 6)
          AS p_b_beats_a FROM tail),
      arms AS (SELECT 'non_urgent' AS arm, na AS n, ra AS successes
          FROM params
        UNION ALL SELECT 'urgent', nb, rb FROM params)
      SELECT a.arm, a.n, a.successes,
        round((a.successes + 1) / (CAST(a.n AS DOUBLE) + 2), 6) AS post_mean,
        p.p_b_beats_a, (p.p_b_beats_a > 0.95) AS b_better_95
      FROM arms a, p ORDER BY a.arm"""))

  /** Page–Hinkley drift detector on daily order counts: the PH walk,
    * its maximum and argmax, the λ = 5σ threshold, and the first alarm
    * day if any. */
  val q457PageHinkley: QueryDef = QueryDef(
    "q457_page_hinkley",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("c"))
      val bounds = daily.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      val series = bounds
        .select(explode(sequence(col("tmin"), col("tmax"))).as("t"))
        .join(daily, Seq("t"), "left")
        .na.fill(0L, Seq("c"))
        .localCheckpoint() // moment pass + walk pass
      val d38 = DecimalType(38, 0)
      val mom = series.agg(count(lit(1)).as("n"),
        sum(col("c").cast(d38)).as("sc"),
        sum((col("c") * col("c")).cast(d38)).as("scc"))
        .withColumn("mu", col("sc").cast("double") / col("n"))
        .withColumn("sd", sqrt(col("scc").cast("double") / col("n")
          - col("mu") * col("mu")))
        .withColumn("threshold", round(lit(5.0) * col("sd"), 4))
      val wT = Window.orderBy(col("t"))
      val walk = series.crossJoin(broadcast(mom))
        .withColumn("rk", row_number().over(wT).cast("long"))
        .withColumn("pc", sum(col("c").cast(d38)).over(wT))
        // m_t = prefix - rk*(mu + delta), delta = 0.5
        .withColumn("m", col("pc").cast("double")
          - col("rk") * (col("mu") + 0.5))
        .withColumn("minm", min(col("m")).over(
          wT.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("ph", round(col("m") - col("minm"), 6))
        .localCheckpoint() // max pass + alarm pass
      val top = walk
        .orderBy(col("ph").desc, col("t")).limit(1)
        .select(col("ph").as("max_ph"), col("t").as("argmax_day"))
      val alarm = walk
        .where(col("ph") > col("threshold"))
        .agg(min(col("t")).as("first_alarm_day"))
      walk.groupBy(col("n"), col("threshold"))
        .agg(count(lit(1)).as("chk"))
        .crossJoin(broadcast(top)).crossJoin(broadcast(alarm))
        .select(col("n").as("n_days"), lit(0.5).as("delta"),
          col("threshold"), round(col("max_ph"), 4).as("max_ph"),
          col("argmax_day"), col("first_alarm_day"),
          col("first_alarm_day").isNotNull.as("alarmed"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
      spine AS (SELECT UNNEST(range(tmin, tmax + 1)) AS t FROM bounds),
      series AS (SELECT s.t, COALESCE(d.c, 0) AS c
        FROM spine s LEFT JOIN daily d ON d.t = s.t),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(c AS DECIMAL(38,0))) AS sc,
          SUM(CAST(c * c AS DECIMAL(38,0))) AS scc
        FROM series),
      mom2 AS (SELECT n, CAST(sc AS DOUBLE) / n AS mu,
          round(5.0 * sqrt(CAST(scc AS DOUBLE) / n
            - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)), 4)
            AS threshold
        FROM mom),
      walk0 AS MATERIALIZED (SELECT s.t, m.n, m.threshold,
          CAST(SUM(CAST(s.c AS DECIMAL(38,0))) OVER (ORDER BY s.t) AS DOUBLE)
            - (ROW_NUMBER() OVER (ORDER BY s.t)) * (m.mu + 0.5) AS m
        FROM series s, mom2 m),
      walk AS MATERIALIZED (SELECT *, round(m - MIN(m) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS ph
        FROM walk0),
      tp0 AS (SELECT ph AS max_ph, t AS argmax_day FROM walk
        ORDER BY ph DESC, t LIMIT 1),
      alarm AS (SELECT MIN(t) AS first_alarm_day FROM walk
        WHERE ph > threshold)
      SELECT ANY_VALUE(w.n) AS n_days, CAST(0.5 AS DOUBLE) AS delta,
        ANY_VALUE(w.threshold) AS threshold,
        round(ANY_VALUE(tp.max_ph), 4) AS max_ph,
        ANY_VALUE(tp.argmax_day) AS argmax_day,
        ANY_VALUE(al.first_alarm_day) AS first_alarm_day,
        (ANY_VALUE(al.first_alarm_day) IS NOT NULL) AS alarmed
      FROM walk w, tp0 tp, alarm al"""))

  val all: Seq[QueryDef] = Seq(q456BayesianAb, q457PageHinkley)
}
