package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Variance-decomposition wave: one-way ANOVA — the parametric twin of
  * q421's Kruskal–Wallis on the same design (order value by priority):
  * F from the exact between/within sum-of-squares split, effect sizes
  * (η², ω²), and the Brown–Forsythe robust companion (ANOVA on
  * |v − median_g|) that guards the F against variance heterogeneity —
  * the check Welch's t (q164) does pairwise, done k-group.
  *
  * Determinism: Σv and Σv² are exact DECIMAL sums (v is a 2-dp money
  * value, v² a 4-dp product); all F algebra runs in double on those
  * identical sums. The Brown–Forsythe spread variable is held as
  * 2·|v − med| = |2v − (a+b)| where (a,b) are the two middle order
  * statistics — an exact 2-dp DECIMAL, so its moment sums are exact
  * too (F is scale-invariant, so the ×2 cancels). Per-group terms are
  * rounded at 6 dp and summed across the k=5 rows in DECIMAL (the
  * q417 idiom — order-free).
  *
  * Scale shape: two scans (moments; spreads after a broadcast of the
  * k-row median frame) + one rank window per group for the medians —
  * all shuffle-partitioned on the group key; the F algebra runs on the
  * 5-row frame.
  */
object AnovaOps {

  /** One-way ANOVA of order value by priority: per-group n/mean/sd,
    * global F(df1,df2), η², ω², and the Brown–Forsythe F. */
  val q429OneWayAnova: QueryDef = QueryDef(
    "q429_one_way_anova",
    (s, dir) => {
      val dec2 = DecimalType(18, 2)
      val o = Tables(s, dir).orders
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").cast(dec2).as("v"))
        .localCheckpoint() // moments pass + median pass + spread pass
      val g = o.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_g"),
          sum(col("v")).as("sv"),
          sum((col("v") * col("v")).cast(DecimalType(38, 4))).as("svv"))
      // exact per-group medians via the two middle order statistics
      val wRank = Window.partitionBy(col("grp")).orderBy(col("v"))
      val medSel = o
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("grp"))))
        .where(col("rn") === expr("(n_g + 1) div 2") ||
          col("rn") === expr("(n_g + 2) div 2"))
      val med = medSel.groupBy(col("grp"))
        .agg(sum(col("v")).as("msum"), count(lit(1)).as("mcnt"))
        .withColumn("med2", when(col("mcnt") === 1, col("msum") * 2)
          .otherwise(col("msum")).cast(DecimalType(19, 2)))
      // Brown–Forsythe spread variable: z2 = |2v − med2| (exact 2-dp)
      val zg = o.join(broadcast(med.select(col("grp"), col("med2"))), Seq("grp"))
        .withColumn("z2", abs((col("v") * 2).cast(DecimalType(19, 2)) - col("med2")))
        .groupBy(col("grp"))
        .agg(sum(col("z2")).as("sz"),
          sum((col("z2") * col("z2")).cast(DecimalType(38, 4))).as("szz"))
      val dec6 = DecimalType(28, 6)
      val perG = g.join(zg, Seq("grp"))
        .join(med.select(col("grp"), col("med2")), Seq("grp"))
        .withColumn("sv_d", col("sv").cast("double"))
        .withColumn("svv_d", col("svv").cast("double"))
        .withColumn("sz_d", col("sz").cast("double"))
        .withColumn("szz_d", col("szz").cast("double"))
        // rounded per-group SS terms → DECIMAL sums (order-free, q417 idiom)
        .withColumn("bterm", round(col("sv_d") * col("sv_d") / col("n_g"), 6))
        .withColumn("wterm",
          round(col("svv_d") - col("sv_d") * col("sv_d") / col("n_g"), 6))
        .withColumn("bterm_z", round(col("sz_d") * col("sz_d") / col("n_g"), 6))
        .withColumn("wterm_z",
          round(col("szz_d") - col("sz_d") * col("sz_d") / col("n_g"), 6))
      val w = Window.partitionBy()
      perG
        .withColumn("n", sum(col("n_g")).over(w))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("s_all", sum(col("sv")).over(w).cast("double"))
        .withColumn("ssw", sum(col("wterm").cast(dec6)).over(w).cast("double"))
        .withColumn("ssb", sum(col("bterm").cast(dec6)).over(w).cast("double")
          - col("s_all") * col("s_all") / col("n"))
        .withColumn("sz_all", sum(col("sz")).over(w).cast("double"))
        .withColumn("ssw_z", sum(col("wterm_z").cast(dec6)).over(w).cast("double"))
        .withColumn("ssb_z", sum(col("bterm_z").cast(dec6)).over(w).cast("double")
          - col("sz_all") * col("sz_all") / col("n"))
        .withColumn("df1", (col("k") - 1).cast("long"))
        .withColumn("df2", (col("n") - col("k")).cast("long"))
        .withColumn("msw", col("ssw") / col("df2"))
        .withColumn("f", round(col("ssb") / col("df1") / col("msw"), 6))
        .withColumn("eta2", round(col("ssb") / (col("ssb") + col("ssw")), 6))
        .withColumn("omega2", round(
          (col("ssb") - col("df1") * col("msw")) /
            (col("ssb") + col("ssw") + col("msw")), 6))
        .withColumn("bf_f", round(col("ssb_z") / col("df1") /
          (col("ssw_z") / col("df2")), 6))
        .select(col("grp"), col("n_g"),
          round(col("sv_d") / col("n_g"), 4).as("mean_v"),
          round(sqrt(col("wterm") / (col("n_g") - 1)), 4).as("sd_v"),
          (col("med2").cast("double") / 2).as("median_v"),
          col("f"), col("df1"), col("df2"), col("eta2"), col("omega2"),
          col("bf_f"))
        .orderBy(col("grp"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS grp,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
          SUM(v) AS sv,
          SUM(CAST(v * v AS DECIMAL(38,4))) AS svv
        FROM o GROUP BY 1),
      rnk AS (SELECT grp, v,
          ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v) AS rn,
          COUNT(*) OVER (PARTITION BY grp) AS n_g
        FROM o),
      med AS (SELECT grp,
          CAST(CASE WHEN COUNT(*) = 1 THEN SUM(v) * 2 ELSE SUM(v) END
            AS DECIMAL(19,2)) AS med2
        FROM rnk
        WHERE rn = (n_g + 1) // 2 OR rn = (n_g + 2) // 2
        GROUP BY 1),
      zg AS (SELECT o.grp,
          SUM(abs(CAST(o.v * 2 AS DECIMAL(19,2)) - m.med2)) AS sz,
          SUM(CAST(abs(CAST(o.v * 2 AS DECIMAL(19,2)) - m.med2)
            * abs(CAST(o.v * 2 AS DECIMAL(19,2)) - m.med2)
            AS DECIMAL(38,4))) AS szz
        FROM o JOIN med m ON m.grp = o.grp GROUP BY 1),
      perg AS (SELECT g.grp, g.n_g, g.sv,
          CAST(g.sv AS DOUBLE) AS sv_d, CAST(g.svv AS DOUBLE) AS svv_d,
          zg.sz, CAST(zg.sz AS DOUBLE) AS sz_d,
          CAST(zg.szz AS DOUBLE) AS szz_d, m.med2
        FROM g JOIN zg ON zg.grp = g.grp JOIN med m ON m.grp = g.grp),
      terms AS (SELECT *,
          round(sv_d * sv_d / n_g, 6) AS bterm,
          round(svv_d - sv_d * sv_d / n_g, 6) AS wterm,
          round(sz_d * sz_d / n_g, 6) AS bterm_z,
          round(szz_d - sz_d * sz_d / n_g, 6) AS wterm_z
        FROM perg),
      tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
          CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(sv) AS DOUBLE) AS s_all,
          CAST(SUM(CAST(wterm AS DECIMAL(28,6))) AS DOUBLE) AS ssw,
          CAST(SUM(CAST(bterm AS DECIMAL(28,6))) AS DOUBLE) AS bsum,
          CAST(SUM(sz) AS DOUBLE) AS sz_all,
          CAST(SUM(CAST(wterm_z AS DECIMAL(28,6))) AS DOUBLE) AS ssw_z,
          CAST(SUM(CAST(bterm_z AS DECIMAL(28,6))) AS DOUBLE) AS bsum_z
        FROM terms),
      algebra AS (SELECT n, k,
          bsum - s_all * s_all / n AS ssb, ssw,
          bsum_z - sz_all * sz_all / n AS ssb_z, ssw_z,
          CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
          ssw / (n - k) AS msw
        FROM tot)
      SELECT t.grp, t.n_g,
        round(t.sv_d / t.n_g, 4) AS mean_v,
        round(sqrt(t.wterm / (t.n_g - 1)), 4) AS sd_v,
        CAST(t.med2 AS DOUBLE) / 2 AS median_v,
        round(a.ssb / a.df1 / a.msw, 6) AS f,
        a.df1, a.df2,
        round(a.ssb / (a.ssb + a.ssw), 6) AS eta2,
        round((a.ssb - a.df1 * a.msw) / (a.ssb + a.ssw + a.msw), 6) AS omega2,
        round(a.ssb_z / a.df1 / (a.ssw_z / a.df2), 6) AS bf_f
      FROM terms t, algebra a ORDER BY t.grp"""))

  val all: Seq[QueryDef] = Seq(q429OneWayAnova)
}
