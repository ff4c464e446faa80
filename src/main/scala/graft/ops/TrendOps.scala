package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Trend & inference wave: Theil-Sen robust slopes and the Mann-Kendall
  * trend test on per-nation daily revenue, Flesch-style readability
  * scoring over documents, and Benjamini-Hochberg FDR control across the
  * per-nation mean tests. The pairwise pieces pair DAYS (calendar-
  * bounded at any data scale — ~700 per nation), never rows: the daily
  * frame is one shuffle aggregation and everything after is model-sized.
  */
object TrendOps {

  private val M = DecimalType(22, 8)

  /** Per-(nation, day) revenue through exact DECIMAL sums — the shared
    * spine of q254/q255, bounded to the 1995 calendar year so the
    * pairwise stage pairs ≤ 365 days per nation regardless of data
    * scale (the full date range saturates ~2400 days at ANY SF, which
    * put 2M pairs × a sort behind every nation — measured 155 s at
    * sf0.1; one year is 66k pairs). `rev` is rounded at 9 dp so both
    * engines sign and sort the identical doubles. */
  private def dailyRevenue(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(M)).cast("double"), 9).as("rev"))
      .select(col("n_name"), datediff(col("day"), lit("1992-01-01")).cast("long").as("d"),
        col("rev"))
  }

  private val dailySql =
    """daily AS (SELECT n.n_name,
          datediff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS d,
          round(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
            AS DECIMAL(22,8))) AS DOUBLE), 9) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1, 2)"""

  /** Theil-Sen robust trend: the median of all pairwise day-slopes of
    * each nation's daily revenue. Breakdown point 29% — one crazy
    * revenue day cannot bend the slope the way it bends OLS (q125). The
    * pair frame is |days|² per nation (calendar-bounded, NOT data-
    * bounded); the median is the exact average of the two middle order
    * statistics with a full deterministic tie order. */
  val q254TheilSen: QueryDef = QueryDef(
    "q254_theil_sen",
    (s, dir) => {
      val daily = dailyRevenue(s, dir).localCheckpoint() // feeds both pair sides
      val pairs = daily.select(col("n_name"), col("d").as("da"), col("rev").as("ra"))
        .join(daily.select(col("n_name"), col("d").as("db"), col("rev").as("rb")),
              Seq("n_name"))
        .filter(col("da") < col("db"))
        .select(col("n_name"), col("da"), col("db"),
          round((col("rb") - col("ra")) / (col("db") - col("da")), 9).as("slope"))
      val wOrd = Window.partitionBy(col("n_name"))
        .orderBy(col("slope").asc, col("da").asc, col("db").asc)
      val wN = Window.partitionBy(col("n_name"))
      pairs
        .withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("np", count(lit(1)).over(wN))
        // floor(): Column `/` is double division; the median order stats
        // need the integer quotients (n+1)/2 and n/2+1
        .filter(col("rn") === floor((col("np") + 1) / 2.0).cast("long") ||
                col("rn") === floor(col("np") / 2.0).cast("long") + 1L)
        .groupBy(col("n_name"))
        .agg(max(col("np")).as("n_pairs"),
          round(sum(col("slope")) / count(lit(1)), 6).as("sen_slope"))
    },
    Some(s"""WITH $dailySql,
      pairs AS (SELECT a.n_name, a.d AS da, b.d AS db,
          round((b.rev - a.rev) / (b.d - a.d), 9) AS slope
        FROM daily a JOIN daily b ON a.n_name = b.n_name AND a.d < b.d),
      ranked AS (SELECT n_name, slope,
          ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY slope, da, db) AS rn,
          COUNT(*) OVER (PARTITION BY n_name) AS np
        FROM pairs)
      SELECT n_name, CAST(MAX(np) AS BIGINT) AS n_pairs,
        round(SUM(slope) / COUNT(*), 6) AS sen_slope
      FROM ranked
      WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
      GROUP BY 1"""))

  /** Mann-Kendall trend test per nation: S = Σ_{i<j} sign(rev_j − rev_i)
    * over day pairs, variance with the full tie correction
    * (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, and the continuity-corrected
    * z. The distribution-free "is there a monotone trend at all" gate
    * run before fitting any slope. Same calendar-bounded pair frame as
    * q254. */
  val q255MannKendall: QueryDef = QueryDef(
    "q255_mann_kendall",
    (s, dir) => {
      val daily = dailyRevenue(s, dir).localCheckpoint()
      val sstat = daily.select(col("n_name"), col("d").as("da"), col("rev").as("ra"))
        .join(daily.select(col("n_name"), col("d").as("db"), col("rev").as("rb")),
              Seq("n_name"))
        .filter(col("da") < col("db"))
        .groupBy(col("n_name"))
        .agg(sum(signum(col("rb") - col("ra")).cast("long")).as("s_stat"))
      val ties = daily.groupBy(col("n_name"), col("rev"))
        .agg(count(lit(1)).as("t"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("long").as("n_distinct"),
          sum(col("t")).as("n_days"),
          sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
      sstat.join(ties, Seq("n_name"))
        .withColumn("var_s",
          (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5) -
            col("tie_term")).cast("double") / 18.0)
        .withColumn("z", round(
          when(col("s_stat") > 0, (col("s_stat") - 1).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0)), 6))
        .select(col("n_name"), col("n_days"), col("s_stat"),
          round(col("var_s"), 6).as("var_s"), col("z"),
          when(col("z") > 1.96, lit("increasing"))
            .when(col("z") < -1.96, lit("decreasing"))
            .otherwise(lit("none")).as("trend"))
    },
    Some(s"""WITH $dailySql,
      sstat AS (SELECT a.n_name,
          CAST(SUM(CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON a.n_name = b.n_name AND a.d < b.d
        GROUP BY 1),
      ties AS (SELECT n_name, CAST(SUM(t) AS BIGINT) AS n_days,
          CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_term
        FROM (SELECT n_name, rev, COUNT(*) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1),
      j AS (SELECT s.n_name, t.n_days, s.s_stat,
          CAST(t.n_days * (t.n_days - 1) * (t.n_days * 2 + 5) - t.tie_term AS DOUBLE) / 18.0 AS var_s
        FROM sstat s JOIN ties t USING (n_name))
      SELECT n_name, n_days, s_stat, round(var_s, 6) AS var_s,
        round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                   WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                   ELSE 0.0 END, 6) AS z,
        CASE WHEN round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                   WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                   ELSE 0.0 END, 6) > 1.96 THEN 'increasing'
             WHEN round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                   WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                   ELSE 0.0 END, 6) < -1.96 THEN 'decreasing'
             ELSE 'none' END AS trend
      FROM j"""))

  /** Flesch-style readability per document: sentences from [.!?] runs,
    * words from the shared tokenizer, syllables approximated by vowel
    * groups per word (the classic proxy), and the standard 206.835 −
    * 1.015·(W/S) − 84.6·(syll/W) score. A corpus-quality gate next to
    * q23's length stats and q76's repetition signals — one projection
    * pass, no joins at all. */
  val q256Readability: QueryDef = QueryDef(
    "q256_readability",
    (s, dir) => Tables(s, dir).documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"),
        greatest(size(split(col("text"), "[.!?]+")) - 1, lit(1)).cast("long").as("n_sents"),
        size(col("toks")).cast("long").as("n_words"),
        expr("""aggregate(transform(toks,
            w -> greatest(size(regexp_extract_all(w, '[aeiouy]+', 0)), 1)),
          0L, (acc, x) -> acc + x)""").as("n_syll"))
      .withColumn("flesch", round(
        lit(206.835) - lit(1.015) * (col("n_words").cast("double") / col("n_sents")) -
          lit(84.6) * (col("n_syll").cast("double") / col("n_words")), 6)),
    Some("""WITH t AS (SELECT doc_id, text,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents)
      SELECT doc_id,
        CAST(greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1) AS BIGINT) AS n_sents,
        CAST(len(toks) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(toks,
          w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS BIGINT) AS n_syll,
        round(206.835
          - 1.015 * (CAST(len(toks) AS DOUBLE)
              / greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1))
          - 84.6 * (CAST(list_sum(list_transform(toks,
              w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS DOUBLE)
              / len(toks)), 6) AS flesch
      FROM t WHERE len(toks) >= 1"""))

  /** Benjamini-Hochberg FDR control (α = 0.1) over the 25 per-nation
    * "does this nation's mean order value differ from the rest"
    * z-tests. p-values use the documented two-sided normal-CDF
    * approximation p ≈ exp(−0.717|z| − 0.416 z²) (Lin 1989) — the same
    * closed form on both engines, so the procedure is exactly
    * reproducible without an erf primitive. The BH step — largest k with
    * p_(k) ≤ αk/m — runs on the 25-row frame with windows; everything
    * corpus-scale is the one moments pass. */
  val q257BhFdr: QueryDef = QueryDef(
    "q257_bh_fdr",
    (s, dir) => {
      val t = Tables(s, dir)
      val dec = DecimalType(18, 4)
      val byNation = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).as("s1"),
          // square in double (deterministic per row), round, DECIMAL-sum —
          // a DECIMAL×DECIMAL square overflows DuckDB's 18-digit multiply
          sum(round(col("o_totalprice") * col("o_totalprice"), 4)
            .cast(DecimalType(28, 6))).as("s2"))
      val wAll = Window.partitionBy()
      val stats = byNation
        .withColumn("gn", sum(col("n")).over(wAll))
        .withColumn("gs1", sum(col("s1")).over(wAll))
        .withColumn("gs2", sum(col("s2")).over(wAll))
        .withColumn("mu", round(col("s1").cast("double") / col("n"), 9))
        .withColumn("rmu", round((col("gs1") - col("s1")).cast("double") /
          (col("gn") - col("n")), 9))
        .withColumn("va", round((col("s2").cast("double") -
          pow(col("s1").cast("double"), 2) / col("n")) / (col("n") - 1), 6))
        .withColumn("vr", round(((col("gs2") - col("s2")).cast("double") -
          pow((col("gs1") - col("s1")).cast("double"), 2) / (col("gn") - col("n"))) /
          (col("gn") - col("n") - 1), 6))
        .withColumn("z", round((col("mu") - col("rmu")) /
          sqrt(col("va") / col("n") + col("vr") / (col("gn") - col("n"))), 6))
        .withColumn("p", round(exp(lit(-0.717) * abs(col("z")) -
          lit(0.416) * col("z") * col("z")), 9))
      val wP = Window.partitionBy().orderBy(col("p").asc, col("n_name").asc)
      val ranked = stats
        .withColumn("k", row_number().over(wP).cast("long"))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("bh_cut", round(lit(0.1) * col("k") / col("m"), 9))
        .withColumn("passes", col("p") <= col("bh_cut"))
      val kMax = ranked
        .withColumn("k_max", max(when(col("passes"), col("k")).otherwise(lit(0L))).over(wAll))
      kMax.select(col("n_name"), col("n"), col("z"), col("p"), col("k"),
        col("bh_cut"), (col("k") <= col("k_max")).as("rejected"))
    },
    Some("""WITH bn AS (SELECT n.n_name, COUNT(*) AS n,
          SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS s1,
          SUM(CAST(round(o.o_totalprice * o.o_totalprice, 4) AS DECIMAL(28,6))) AS s2
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1),
      stats AS (SELECT n_name, n,
          round(CAST(s1 AS DOUBLE) / n, 9) AS mu,
          round(CAST(SUM(s1) OVER () - s1 AS DOUBLE) / (SUM(n) OVER () - n), 9) AS rmu,
          round((CAST(s2 AS DOUBLE) - pow(CAST(s1 AS DOUBLE), 2) / n) / (n - 1), 6) AS va,
          round((CAST(SUM(s2) OVER () - s2 AS DOUBLE)
            - pow(CAST(SUM(s1) OVER () - s1 AS DOUBLE), 2) / (SUM(n) OVER () - n))
            / (SUM(n) OVER () - n - 1), 6) AS vr,
          SUM(n) OVER () AS gn
        FROM bn),
      zp AS (SELECT n_name, CAST(n AS BIGINT) AS n,
          round((mu - rmu) / sqrt(va / n + vr / (gn - n)), 6) AS z
        FROM stats),
      pp AS (SELECT n_name, n, z,
          round(exp(-0.717 * abs(z) - 0.416 * z * z), 9) AS p
        FROM zp),
      ranked AS (SELECT n_name, n, z, p,
          CAST(ROW_NUMBER() OVER (ORDER BY p, n_name) AS BIGINT) AS k,
          COUNT(*) OVER () AS m
        FROM pp),
      cut AS (SELECT *, round(0.1 * k / m, 9) AS bh_cut,
          p <= round(0.1 * k / m, 9) AS passes
        FROM ranked)
      SELECT n_name, n, z, p, k, bh_cut,
        k <= MAX(CASE WHEN passes THEN k ELSE 0 END) OVER () AS rejected
      FROM cut"""))

  val all: Seq[QueryDef] =
    Seq(q254TheilSen, q255MannKendall, q256Readability, q257BhFdr)
}
