package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Exact-test wave: Fisher's exact test on the 2×2 of order priority ×
  * order value — the small-margin-safe member of the independence
  * family (q170's χ² contingency needs expected counts ≳5; Fisher's
  * hypergeometric enumeration is exact at ANY margin). Two-sided p by
  * the pmf-inclusion rule (sum all tables whose probability does not
  * exceed the observed one, the R `fisher.test` convention with its
  * 1+1e-7 relative tolerance).
  *
  * Determinism: the contingency cells are exact integer counts; the
  * hypergeometric pmf runs in the q322/q424 log-space idiom — an
  * ln-factorial spine of running DECIMAL sums of 9-dp-rounded logs,
  * per-k log-pmfs assembled in one fixed-order expression, each pmf
  * term rounded at 12 dp and summed as DECIMAL — so neither partition
  * order nor libm last-ulp drift can flip the hash.
  *
  * Scale shape: one corpus scan for the four cells, an n-row spine
  * (one explode + one running window, linear in the table size), a
  * support-sized k-sweep (≤ min(r1,c1) rows) with three equi-joins
  * against the spine — never quadratic, no driver-side math.
  */
object FisherOps {

  private val HighValue = 300000.0

  /** Fisher's exact test: urgent priority × high-value (> 300k) orders.
    * Cells, odds ratio, support bounds, left/right/two-sided exact p. */
  val q437FisherExact: QueryDef = QueryDef(
    "q437_fisher_exact",
    (s, dir) => {
      val cells = Tables(s, dir).orders
        .select(
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("u"),
          when(col("o_totalprice") > HighValue, 1L).otherwise(0L).as("h"))
        .agg(
          sum(when(col("u") === 1 && col("h") === 1, 1L).otherwise(0L))
            .as("a"),
          sum(when(col("u") === 1 && col("h") === 0, 1L).otherwise(0L))
            .as("b"),
          sum(when(col("u") === 0 && col("h") === 1, 1L).otherwise(0L))
            .as("c"),
          sum(when(col("u") === 0 && col("h") === 0, 1L).otherwise(0L))
            .as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        .withColumn("r1", col("a") + col("b"))
        .withColumn("c1", col("a") + col("c"))
        .withColumn("lo", greatest(lit(0L), col("r1") + col("c1") - col("n")))
        .withColumn("hi", least(col("r1"), col("c1")))
        .localCheckpoint() // spine pass + k-sweep pass + report pass
      // ln-factorial spine j = 1..n (lf(0) = 0 via coalesce at use).
      // r15: was explode(sequence(1,n)) + a single-partition running
      // window — n grows with the corpus, so both the explode task and
      // the window serialized the ladder; now the distributed exact
      // ladder (Spine.lnFactorialLadder), bit-identical by the DECIMAL
      // prefix argument. The length probe reads the 1-row checkpointed
      // cells frame — model-sized.
      val spine = Spine
        .lnFactorialLadder(s, cells.select(col("n")).head().getLong(0))
        .localCheckpoint() // probed three times by the k-sweep
      def lfOf(keyCol: String, out: String) =
        spine.select(col("j").as(keyCol), col("lf").as(out))
      // constant part of ln pmf: lf(r1)+lf(r2)+lf(c1)+lf(c2)−lf(n)
      val const = cells
        .join(lfOf("r1", "lf_r1"), Seq("r1"), "left")
        .withColumn("r2", col("n") - col("r1"))
        .join(lfOf("r2", "lf_r2"), Seq("r2"), "left")
        .join(lfOf("c1", "lf_c1"), Seq("c1"), "left")
        .withColumn("c2", col("n") - col("c1"))
        .join(lfOf("c2", "lf_c2"), Seq("c2"), "left")
        .join(lfOf("n", "lf_n"), Seq("n"), "left")
        .withColumn("lconst",
          coalesce(col("lf_r1"), lit(0.0)) + coalesce(col("lf_r2"), lit(0.0))
            + coalesce(col("lf_c1"), lit(0.0))
            + coalesce(col("lf_c2"), lit(0.0))
            - coalesce(col("lf_n"), lit(0.0)))
      // per-k log-pmf over the support; k-sweep joined to the spine on
      // each of the four varying factorial arguments
      val ks = const.select(col("a"), col("n"), col("r1"), col("c1"),
        col("lo"), col("hi"), col("lconst"),
        explode(sequence(col("lo"), col("hi"))).as("k"))
        .withColumn("k2", col("r1") - col("k"))
        .withColumn("k3", col("c1") - col("k"))
        .withColumn("k4", col("n") - col("r1") - col("c1") + col("k"))
      val pmf = ks
        .join(lfOf("k", "lf_k"), Seq("k"), "left")
        .join(lfOf("k2", "lf_k2"), Seq("k2"), "left")
        .join(lfOf("k3", "lf_k3"), Seq("k3"), "left")
        .join(lfOf("k4", "lf_k4"), Seq("k4"), "left")
        .withColumn("lnp", round(col("lconst")
          - coalesce(col("lf_k"), lit(0.0))
          - coalesce(col("lf_k2"), lit(0.0))
          - coalesce(col("lf_k3"), lit(0.0))
          - coalesce(col("lf_k4"), lit(0.0)), 9))
        .withColumn("pm", round(exp(col("lnp")), 12))
        .localCheckpoint() // observed-row broadcast + three tail sums
      val obs = pmf.where(col("k") === col("a"))
        .select(col("lnp").as("lnp_obs"))
      val d12 = DecimalType(38, 12)
      val tails = pmf.crossJoin(broadcast(obs)).agg(
        sum(when(col("k") <= col("a"), col("pm")).otherwise(0.0)
          .cast(d12)).as("pl"),
        sum(when(col("k") >= col("a"), col("pm")).otherwise(0.0)
          .cast(d12)).as("pr"),
        // R's fisher.test inclusion rule with relative slack 1e-7
        sum(when(col("lnp") <= col("lnp_obs") + 1e-7, col("pm"))
          .otherwise(0.0).cast(d12)).as("pt"))
      cells.crossJoin(broadcast(tails))
        .select(col("a"), col("b"), col("c"), col("d"), col("n"),
          col("lo").as("support_lo"), col("hi").as("support_hi"),
          when(col("b") * col("c") > 0, round(
            (col("a") * col("d")).cast("double")
              / (col("b") * col("c")), 6)).as("odds_ratio"),
          round(least(lit(1.0), col("pl").cast("double")), 6).as("p_left"),
          round(least(lit(1.0), col("pr").cast("double")), 6).as("p_right"),
          round(least(lit(1.0), col("pt").cast("double")), 6).as("p_two"),
          (round(least(lit(1.0), col("pt").cast("double")), 6) < 0.05)
            .as("reject_5pct"))
    },
    Some(s"""WITH cells0 AS (SELECT
          CAST(SUM(CASE WHEN u = 1 AND h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN u = 1 AND h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(SUM(CASE WHEN u = 0 AND h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN u = 0 AND h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM (SELECT
            CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u,
            CASE WHEN o_totalprice > $HighValue THEN 1 ELSE 0 END AS h
          FROM orders)),
      cells AS (SELECT *, a + b + c + d AS n, a + b AS r1, a + c AS c1,
          GREATEST(0, a + b + a + c - (a + b + c + d)) AS lo,
          LEAST(a + b, a + c) AS hi
        FROM cells0),
      spine AS (SELECT j, CAST(SUM(CAST(round(ln(CAST(j AS DOUBLE)), 9)
            AS DECIMAL(38,9))) OVER (ORDER BY j) AS DOUBLE) AS lf
        FROM (SELECT UNNEST(range(1, n + 1)) AS j FROM cells)),
      const_ AS (SELECT cl.*,
          COALESCE(s1.lf, 0.0) + COALESCE(s2.lf, 0.0)
            + COALESCE(s3.lf, 0.0) + COALESCE(s4.lf, 0.0)
            - COALESCE(s5.lf, 0.0) AS lconst
        FROM cells cl
        LEFT JOIN spine s1 ON s1.j = cl.r1
        LEFT JOIN spine s2 ON s2.j = cl.n - cl.r1
        LEFT JOIN spine s3 ON s3.j = cl.c1
        LEFT JOIN spine s4 ON s4.j = cl.n - cl.c1
        LEFT JOIN spine s5 ON s5.j = cl.n),
      ks AS (SELECT c.*, UNNEST(range(c.lo, c.hi + 1)) AS k FROM const_ c),
      pmf AS (SELECT ks.k, ks.a,
          round(ks.lconst - COALESCE(sk.lf, 0.0) - COALESCE(s2.lf, 0.0)
            - COALESCE(s3.lf, 0.0) - COALESCE(s4.lf, 0.0), 9) AS lnp,
          round(exp(round(ks.lconst - COALESCE(sk.lf, 0.0)
            - COALESCE(s2.lf, 0.0) - COALESCE(s3.lf, 0.0)
            - COALESCE(s4.lf, 0.0), 9)), 12) AS pm
        FROM ks
        LEFT JOIN spine sk ON sk.j = ks.k
        LEFT JOIN spine s2 ON s2.j = ks.r1 - ks.k
        LEFT JOIN spine s3 ON s3.j = ks.c1 - ks.k
        LEFT JOIN spine s4 ON s4.j = ks.n - ks.r1 - ks.c1 + ks.k),
      obs AS (SELECT lnp AS lnp_obs FROM pmf WHERE k = a),
      tails AS (SELECT
          SUM(CASE WHEN p.k <= p.a THEN CAST(p.pm AS DECIMAL(38,12))
            ELSE CAST(0 AS DECIMAL(38,12)) END) AS pl,
          SUM(CASE WHEN p.k >= p.a THEN CAST(p.pm AS DECIMAL(38,12))
            ELSE CAST(0 AS DECIMAL(38,12)) END) AS pr,
          SUM(CASE WHEN p.lnp <= o.lnp_obs + 0.0000001
            THEN CAST(p.pm AS DECIMAL(38,12))
            ELSE CAST(0 AS DECIMAL(38,12)) END) AS pt
        FROM pmf p, obs o)
      SELECT cl.a, cl.b, cl.c, cl.d, cl.n,
        cl.lo AS support_lo, cl.hi AS support_hi,
        CASE WHEN cl.b * cl.c > 0 THEN round(CAST(cl.a * cl.d AS DOUBLE)
          / (cl.b * cl.c), 6) END AS odds_ratio,
        round(LEAST(1.0, CAST(t.pl AS DOUBLE)), 6) AS p_left,
        round(LEAST(1.0, CAST(t.pr AS DOUBLE)), 6) AS p_right,
        round(LEAST(1.0, CAST(t.pt AS DOUBLE)), 6) AS p_two,
        (round(LEAST(1.0, CAST(t.pt AS DOUBLE)), 6) < 0.05) AS reject_5pct
      FROM cells cl, tails t"""))

  val all: Seq[QueryDef] = Seq(q437FisherExact)
}
