package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Collocation & cohort-survival wave: Dunning's log-likelihood-ratio
  * collocations (the rare-word-safe complement to q181's PMI) and the
  * two-cohort log-rank test (the significance test q161's Kaplan–Meier
  * curves were missing).
  *
  * Scale shapes: q381 is three bigram-marginal aggregations joined on
  * their keys; q382 reduces the event log to a per-user survival row,
  * then one wide time-spine window (prefix cumulative — never the
  * O(n²) FOLLOWING frame) computes every at-risk count.
  */
object CohortStatOps {

  private val dec = DecimalType(28, 10)

  /** Dunning G² collocations (Dunning 1993): for each bigram, the
    * 2×2 table (k11 = bigram count, marginals = first/second-position
    * word counts, N = all bigrams) scored by
    * G² = 2·Σ k·ln(k·N/(row·col)) — unlike PMI it does not explode on
    * rare words, which is why it is the standard collocation extractor.
    * Top 20 by G² among bigrams seen ≥ 5 times. Each G² is a 4-term
    * sum evaluated in ONE expression (no aggregation-order concern);
    * the heavy work is three hash aggregations over the bigram frame. */
  val q381LlrCollocations: QueryDef = QueryDef(
    "q381_llr_collocations",
    (s, dir) => {
      val bg = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint() // feeds k11 and both marginals
      val k11 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("k11"))
        .filter(col("k11") >= 5)
      val r1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("row1"))
      val c2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("col2"))
      val n = bg.agg(count(lit(1)).as("n"))
      k11.join(r1, Seq("w1")).join(c2, Seq("w2")).crossJoin(n)
        .withColumn("k12", col("row1") - col("k11"))
        .withColumn("k21", col("col2") - col("k11"))
        .withColumn("k22", col("n") - col("row1") - col("col2") + col("k11"))
        .withColumn("g2", round(lit(2.0) * (
          when(col("k11") > 0, col("k11").cast("double") *
            log(col("k11").cast("double") * col("n") /
              (col("row1").cast("double") * col("col2")))).otherwise(0.0) +
          when(col("k12") > 0, col("k12").cast("double") *
            log(col("k12").cast("double") * col("n") /
              (col("row1").cast("double") * (col("n") - col("col2"))))).otherwise(0.0) +
          when(col("k21") > 0, col("k21").cast("double") *
            log(col("k21").cast("double") * col("n") /
              ((col("n") - col("row1")).cast("double") * col("col2")))).otherwise(0.0) +
          when(col("k22") > 0, col("k22").cast("double") *
            log(col("k22").cast("double") * col("n") /
              ((col("n") - col("row1")).cast("double") * (col("n") - col("col2")))))
            .otherwise(0.0)), 6))
        .orderBy(col("g2").desc, col("w1"), col("w2")).limit(20)
        .withColumn("rk", row_number().over( // 20-row slice, not the pair frame (r15)
          Window.orderBy(col("g2").desc, col("w1"), col("w2"))))
        .select(col("rk"), col("w1"), col("w2"), col("k11"), col("g2"))
        .orderBy(col("rk"))
    },
    Some("""WITH t AS (SELECT regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      bg AS (SELECT b.u.w1 AS w1, b.u.w2 AS w2
        FROM (SELECT toks FROM t WHERE len(toks) >= 2),
        UNNEST(list_transform(range(0, len(toks)-1),
          i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS b(u)),
      k11 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11 FROM bg
        GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      r1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS row1 FROM bg GROUP BY 1),
      c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS col2 FROM bg GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg),
      sc AS (SELECT k11.w1, k11.w2, k11.k11, round(2.0 * (
          (CASE WHEN k11 > 0 THEN k11 * ln(CAST(k11 AS DOUBLE) * n
            / (CAST(row1 AS DOUBLE) * col2)) ELSE 0.0 END) +
          (CASE WHEN row1 - k11 > 0 THEN (row1 - k11) * ln(CAST(row1 - k11 AS DOUBLE) * n
            / (CAST(row1 AS DOUBLE) * (n - col2))) ELSE 0.0 END) +
          (CASE WHEN col2 - k11 > 0 THEN (col2 - k11) * ln(CAST(col2 - k11 AS DOUBLE) * n
            / (CAST(n - row1 AS DOUBLE) * col2)) ELSE 0.0 END) +
          (CASE WHEN n - row1 - col2 + k11 > 0 THEN (n - row1 - col2 + k11)
            * ln(CAST(n - row1 - col2 + k11 AS DOUBLE) * n
              / (CAST(n - row1 AS DOUBLE) * (n - col2))) ELSE 0.0 END)), 6) AS g2
        FROM k11 JOIN r1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nn)
      SELECT rk, w1, w2, k11, g2 FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY g2 DESC, w1, w2) AS rk FROM sc)
      WHERE rk <= 20 ORDER BY rk"""))

  /** Two-cohort log-rank test (Mantel 1966) on time-to-first-purchase:
    * users split by id parity; at every death time the observed group-1
    * deaths are compared to the hypergeometric expectation
    * E = d·n₁/n with variance d·(n₁/n)(1−n₁/n)(n−d)/(n−1), and
    * Z = Σ(O−E)/√ΣV. Censoring = no purchase before the user's last
    * event (exactly q161's convention). At-risk counts come from ONE
    * wide time-spine window as prefix cumulatives (total − seen-before)
    * — never a per-pair join, never an UNBOUNDED FOLLOWING frame.
    * O−E and V terms ride the round→DECIMAL discipline. */
  val q382LogrankTest: QueryDef = QueryDef(
    "q382_logrank_test",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(col("us")).as("t0"),
          min(when(col("event_type") === "purchase", col("us"))).as("tp"),
          max(col("us")).as("tmax"))
        .select(pmod(col("user_id"), lit(2)).cast("int").as("grp"),
          when(col("tp").isNotNull, col("tp") - col("t0"))
            .otherwise(col("tmax") - col("t0")).as("t"),
          col("tp").isNotNull.cast("long").as("d"))
        .localCheckpoint() // feeds the spine and the group totals
      val spine = perUser.groupBy(col("t"))
        .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c1"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c2"),
          sum(when(col("grp") === 0, col("d")).otherwise(0L)).as("d1"),
          sum(when(col("grp") === 1, col("d")).otherwise(0L)).as("d2"))
      val wOrd = Window.orderBy(col("t"))
      val tot = perUser.groupBy()
        .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n1tot"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n2tot"))
      val risk = spine.crossJoin(tot)
        .withColumn("seen1", coalesce(sum(col("c1")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("seen2", coalesce(sum(col("c2")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("r1", col("n1tot") - col("seen1"))
        .withColumn("r2", col("n2tot") - col("seen2"))
        .filter(col("d1") + col("d2") > 0)
        .withColumn("dd", col("d1") + col("d2"))
        .withColumn("rr", col("r1") + col("r2"))
        .filter(col("rr") > 1)
        .withColumn("e1", col("dd").cast("double") * col("r1") / col("rr"))
        .withColumn("v1",
          col("dd").cast("double") * (col("r1").cast("double") / col("rr")) *
            (lit(1.0) - col("r1").cast("double") / col("rr")) *
            (col("rr") - col("dd")).cast("double") / (col("rr") - 1))
      risk.agg(
          max(col("n1tot")).as("n1"), max(col("n2tot")).as("n2"),
          count(lit(1)).as("n_death_times"),
          sum(col("d1")).as("o1"),
          sum(round(col("e1"), 9).cast(dec)).as("se1"),
          sum(round(col("v1"), 9).cast(dec)).as("sv"))
        .select(col("n1"), col("n2"), col("n_death_times"), col("o1"),
          round(col("se1").cast("double"), 6).as("e1"),
          round((col("o1") - col("se1").cast("double")) /
            sqrt(col("sv").cast("double")), 6).as("z"),
          round(pow((col("o1") - col("se1").cast("double")), 2) /
            col("sv").cast("double"), 6).as("chi2"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
      pu AS (SELECT user_id, MIN(us) AS t0,
          MIN(CASE WHEN event_type = 'purchase' THEN us END) AS tp,
          MAX(us) AS tmax
        FROM ev GROUP BY 1),
      su AS (SELECT CAST(user_id % 2 AS INT) AS grp,
          CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tmax - t0 END AS t,
          CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS d
        FROM pu),
      spine AS (SELECT t,
          CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
          CAST(SUM(CASE WHEN grp = 0 THEN d ELSE 0 END) AS BIGINT) AS d1,
          CAST(SUM(CASE WHEN grp = 1 THEN d ELSE 0 END) AS BIGINT) AS d2
        FROM su GROUP BY 1),
      tot AS (SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1tot,
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2tot
        FROM su),
      risk AS (SELECT spine.*, tot.n1tot, tot.n2tot,
          tot.n1tot - COALESCE(CAST(SUM(c1) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS r1,
          tot.n2tot - COALESCE(CAST(SUM(c2) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS r2
        FROM spine CROSS JOIN tot),
      terms AS (SELECT n1tot, n2tot, d1, d1 + d2 AS dd, r1, r1 + r2 AS rr,
          CAST(d1 + d2 AS DOUBLE) * r1 / (r1 + r2) AS e1,
          CAST(d1 + d2 AS DOUBLE) * (CAST(r1 AS DOUBLE) / (r1 + r2))
            * (1.0 - CAST(r1 AS DOUBLE) / (r1 + r2))
            * CAST(r1 + r2 - d1 - d2 AS DOUBLE) / (r1 + r2 - 1) AS v1
        FROM risk WHERE d1 + d2 > 0 AND r1 + r2 > 1)
      SELECT MAX(n1tot) AS n1, MAX(n2tot) AS n2,
        CAST(COUNT(*) AS BIGINT) AS n_death_times,
        CAST(SUM(d1) AS BIGINT) AS o1,
        round(CAST(SUM(CAST(round(e1, 9) AS DECIMAL(28,10))) AS DOUBLE), 6) AS e1,
        round((SUM(d1) - CAST(SUM(CAST(round(e1, 9) AS DECIMAL(28,10))) AS DOUBLE))
          / sqrt(CAST(SUM(CAST(round(v1, 9) AS DECIMAL(28,10))) AS DOUBLE)), 6) AS z,
        round(pow(SUM(d1) - CAST(SUM(CAST(round(e1, 9) AS DECIMAL(28,10))) AS DOUBLE), 2)
          / CAST(SUM(CAST(round(v1, 9) AS DECIMAL(28,10))) AS DOUBLE), 6) AS chi2
      FROM terms"""))

  val all: Seq[QueryDef] = Seq(q381LlrCollocations, q382LogrankTest)
}
