package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Link-prediction & release wave: neighborhood link scores and Katz
  * centrality on the product graphs, a differentially-private count
  * release with its utility audit, and Neyman survey allocation with
  * exact largest-remainder rounding.
  */
object LinkOps {

  /** Link prediction on the support-2 co-purchase graph: for every
    * 2-hop candidate pair (an open wedge that is NOT already an edge)
    * score common-neighbors, Jaccard, and Adamic-Adar, and keep the
    * top-3 predictions per node by AA. The candidate set is wedge-
    * bounded (the q111 contract — Σ deg², never |V|²); scoring is one
    * group-by over wedges plus degree joins. The "customers who bought
    * X also buy Y" candidate generator, scored three classic ways. */
  val q262LinkPrediction: QueryDef = QueryDef(
    "q262_link_prediction",
    (s, dir) => {
      val decA = DecimalType(28, 12)
      // r15-opt: the inline edge build was byte-for-byte the shared
      // co-purchase DISTINCT definition — read the GraphBase derived
      // table (a plain parquet leaf scan, already materialized by the
      // graph family) instead of rebuilding the self-join + support
      // filter; feeds neighbors, degrees, and the anti-join unchanged
      val edges = GraphBase.coPurchaseEdgesDistinct(s, dir)
      val und = edges.select(col("pa").as("n"), col("pb").as("m"))
        .union(edges.select(col("pb").as("n"), col("pa").as("m")))
      val deg = und.groupBy(col("n")).agg(count(lit(1)).as("d"))
      // wedges centered at z: (a, z), (z, b) with a < b, (a, b) not an edge
      val wedges = und.select(col("m").as("z"), col("n").as("a"))
        .join(und.select(col("m").as("z"), col("n").as("b")), Seq("z"))
        .filter(col("a") < col("b"))
        .join(deg.withColumnRenamed("n", "z").withColumnRenamed("d", "dz"), Seq("z"))
      val scored = wedges
        .join(edges.withColumnRenamed("pa", "a").withColumnRenamed("pb", "b"),
          Seq("a", "b"), "left_anti")
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cn"),
          sum(round(lit(1.0) / log(col("dz")), 12).cast(decA)).as("aa_sum"))
        .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), Seq("a"))
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), Seq("b"))
        .withColumn("jaccard",
          round(col("cn").cast("double") / (col("da") + col("db") - col("cn")), 6))
        .withColumn("adamic_adar", round(col("aa_sum").cast("double"), 6))
      val wTop = Window.partitionBy(col("a"))
        .orderBy(col("adamic_adar").desc, col("cn").desc, col("b").asc)
      scored
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("a").as("part"), col("rk"), col("b").as("predicted"),
          col("cn"), col("jaccard"), col("adamic_adar"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      und AS (SELECT pa AS n, pb AS m FROM e UNION ALL SELECT pb, pa FROM e),
      deg AS (SELECT n, COUNT(*) AS d FROM und GROUP BY 1),
      wedges AS (SELECT x.n AS a, y.n AS b, x.m AS z
        FROM und x JOIN und y ON x.m = y.m AND x.n < y.n),
      open_w AS (SELECT w.a, w.b, w.z FROM wedges w
        ANTI JOIN e ON e.pa = w.a AND e.pb = w.b),
      scored AS (SELECT o.a, o.b, COUNT(*) AS cn,
          SUM(CAST(round(1.0 / ln(dz.d), 12) AS DECIMAL(28,12))) AS aa_sum
        FROM open_w o JOIN deg dz ON dz.n = o.z
        GROUP BY 1, 2),
      full_s AS (SELECT s.a, s.b, s.cn,
          round(CAST(s.cn AS DOUBLE) / (da.d + db.d - s.cn), 6) AS jaccard,
          round(CAST(s.aa_sum AS DOUBLE), 6) AS adamic_adar
        FROM scored s JOIN deg da ON da.n = s.a JOIN deg db ON db.n = s.b),
      ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY a
          ORDER BY adamic_adar DESC, cn DESC, b) AS BIGINT) AS rk
        FROM full_s)
      SELECT a AS part, rk, b AS predicted, CAST(cn AS BIGINT) AS cn,
        jaccard, adamic_adar
      FROM ranked WHERE rk <= 3"""))

  /** Katz centrality on the undirected part tree, 3 exactly-unrolled
    * iterations of x ← β·A·x + 1 (β = 0.1, safely under 1/λmax for a
    * degree-≤3 tree). Per-node sums have ≤ 3 terms, rounded then
    * DECIMAL-summed so partition order can't shift them; each iteration
    * is one equi-join — O(|E|) per round at any scale with no
    * normalization scalar needed (contrast q246's HITS norms). */
  val q263KatzCentrality: QueryDef = QueryDef(
    "q263_katz_centrality",
    (s, dir) => {
      val decK = DecimalType(28, 12)
      val beta = lit(0.1)
      val part = Tables(s, dir).part
      val e = part.filter(col("p_partkey") >= 2)
        .select(col("p_partkey").as("u"), floor(col("p_partkey") / 2).as("v"))
      val und = e.select(col("u").as("n"), col("v").as("m"))
        .union(e.select(col("v").as("n"), col("u").as("m")))
        .localCheckpoint() // feeds all three rounds
      var x = part.select(col("p_partkey").as("n"), lit(1.0).as("x"))
      for (_ <- 1 to 3) {
        x = und.join(x.withColumnRenamed("n", "m"), Seq("m"))
          .groupBy(col("n"))
          .agg(sum(round(col("x"), 9).cast(decK)).as("sx"))
          .select(col("n"), round(beta * col("sx").cast("double") + 1.0, 9).as("x"))
        // isolated nodes (none in a tree, but keep the frame total):
        x = part.select(col("p_partkey").as("n")).join(x, Seq("n"), "left")
          .select(col("n"), coalesce(col("x"), lit(1.0)).as("x"))
          .localCheckpoint()
      }
      x.select(col("n").as("part"), round(col("x"), 6).as("katz"))
    },
    Some("""WITH e AS (SELECT p_partkey AS u, p_partkey // 2 AS v FROM part WHERE p_partkey >= 2),
      und AS (SELECT u AS n, v AS m FROM e UNION ALL SELECT v, u FROM e),
      x0 AS (SELECT p_partkey AS n, 1.0 AS x FROM part),
      x1r AS (SELECT und.n, round(0.1 * CAST(SUM(CAST(round(x0.x, 9) AS DECIMAL(28,12))) AS DOUBLE) + 1.0, 9) AS x
        FROM und JOIN x0 ON x0.n = und.m GROUP BY 1),
      x1 AS (SELECT p.p_partkey AS n, COALESCE(x1r.x, 1.0) AS x
        FROM part p LEFT JOIN x1r ON x1r.n = p.p_partkey),
      x2r AS (SELECT und.n, round(0.1 * CAST(SUM(CAST(round(x1.x, 9) AS DECIMAL(28,12))) AS DOUBLE) + 1.0, 9) AS x
        FROM und JOIN x1 ON x1.n = und.m GROUP BY 1),
      x2 AS (SELECT p.p_partkey AS n, COALESCE(x2r.x, 1.0) AS x
        FROM part p LEFT JOIN x2r ON x2r.n = p.p_partkey),
      x3r AS (SELECT und.n, round(0.1 * CAST(SUM(CAST(round(x2.x, 9) AS DECIMAL(28,12))) AS DOUBLE) + 1.0, 9) AS x
        FROM und JOIN x2 ON x2.n = und.m GROUP BY 1),
      x3 AS (SELECT p.p_partkey AS n, COALESCE(x3r.x, 1.0) AS x
        FROM part p LEFT JOIN x3r ON x3r.n = p.p_partkey)
      SELECT n AS part, round(x, 6) AS katz FROM x3"""))

  /** Differentially-private count release (ε = 0.5) of the per-
    * (nation, order-year) order counts via md5-seeded Laplace noise,
    * with the utility audit a release pipeline runs before shipping:
    * absolute and relative error per cell and the ε-scale promise
    * |noise| ~ 2/ε on average. Noise is the inverse-CDF transform of
    * the md5 uniform — identical closed form in both engines, so the
    * "random" release is exactly reproducible and oracle-checkable. */
  val q264DpNoisyCounts: QueryDef = QueryDef(
    "q264_dp_noisy_counts",
    (s, dir) => {
      val t = Tables(s, dir)
      val eps = 0.5
      t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("n_true"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("n_name"), col("o_year"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0))
        .withColumn("noise", round(
          lit(-1.0 / eps) * signum(col("u") - 0.5) *
            log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)), 6))
        .withColumn("n_released",
          greatest(round(col("n_true") + col("noise"), 0).cast("long"), lit(0L)))
        .select(col("n_name"), col("o_year"), col("n_true"), col("noise"),
          col("n_released"),
          abs(col("n_released") - col("n_true")).as("abs_err"),
          round(abs(col("n_released") - col("n_true")).cast("double") /
            col("n_true"), 6).as("rel_err"))
    },
    Some("""WITH cells AS (SELECT n.n_name,
          CAST(year(o.o_orderdate) AS BIGINT) AS o_year, COUNT(*) AS n_true
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      nz AS (SELECT n_name, o_year, n_true,
          CAST(('0x' || substr(md5(n_name || '|' || CAST(o_year AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 AS u
        FROM cells),
      rel AS (SELECT n_name, o_year, n_true,
          round(-2.0 * CASE WHEN u > 0.5 THEN 1.0 WHEN u < 0.5 THEN -1.0 ELSE 0.0 END
            * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
        FROM nz)
      SELECT n_name, o_year, CAST(n_true AS BIGINT) AS n_true, noise,
        greatest(CAST(round(n_true + noise, 0) AS BIGINT), 0) AS n_released,
        abs(greatest(CAST(round(n_true + noise, 0) AS BIGINT), 0) - n_true) AS abs_err,
        round(CAST(abs(greatest(CAST(round(n_true + noise, 0) AS BIGINT), 0) - n_true) AS DOUBLE)
          / n_true, 6) AS rel_err
      FROM rel"""))

  /** Neyman optimal survey allocation of a 1000-interview budget across
    * nations: n_h ∝ N_h·S_h (stratum size × stratum sd of order value),
    * integerized by the largest-remainder method so the allocations sum
    * to the budget EXACTLY — the integer twin of q237's water filling.
    * One moments pass; the allocation itself runs on the 25-row stratum
    * frame with windows. */
  val q265NeymanAllocation: QueryDef = QueryDef(
    "q265_neyman_allocation",
    (s, dir) => {
      val t = Tables(s, dir)
      val dec = DecimalType(18, 4)
      val budget = 1000L
      val wAll = Window.partitionBy()
      val strata = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("nh"),
          sum(col("o_totalprice").cast(dec)).as("s1"),
          sum(round(col("o_totalprice") * col("o_totalprice"), 4)
            .cast(DecimalType(28, 6))).as("s2"))
        .withColumn("sh", round(sqrt((col("s2").cast("double") -
          pow(col("s1").cast("double"), 2) / col("nh")) / (col("nh") - 1)), 9))
        .withColumn("wgt", round(col("nh") * col("sh"), 6))
      val alloc = strata
        // DECIMAL-sum the weights so the 25-term total is order-exact
        .withColumn("share", col("wgt") /
          sum(col("wgt").cast(DecimalType(28, 10))).over(wAll).cast("double"))
        .withColumn("exact", round(col("share") * budget, 9))
        .withColumn("base", floor(col("exact")).cast("long"))
        .withColumn("frac", round(col("exact") - col("base"), 9))
      val wFrac = Window.partitionBy()
        .orderBy(col("frac").desc, col("n_name").asc)
      alloc
        .withColumn("short", lit(budget) - sum(col("base")).over(wAll))
        .withColumn("fr", row_number().over(wFrac).cast("long"))
        .select(col("n_name"), col("nh"), round(col("sh"), 6).as("sh"),
          round(col("exact"), 6).as("exact_alloc"),
          (col("base") + when(col("fr") <= col("short"), 1L).otherwise(0L))
            .as("n_alloc"))
    },
    Some("""WITH strata AS (SELECT n.n_name, COUNT(*) AS nh,
          SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS s1,
          SUM(CAST(round(o.o_totalprice * o.o_totalprice, 4) AS DECIMAL(28,6))) AS s2
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1),
      sd AS (SELECT n_name, nh,
          round(sqrt((CAST(s2 AS DOUBLE) - pow(CAST(s1 AS DOUBLE), 2) / nh) / (nh - 1)), 9) AS sh
        FROM strata),
      w AS (SELECT n_name, nh, sh, round(nh * sh, 6) AS wgt FROM sd),
      ex AS (SELECT n_name, nh, sh,
          round(wgt / CAST(SUM(CAST(wgt AS DECIMAL(28,10))) OVER () AS DOUBLE) * 1000, 9) AS exact
        FROM w),
      base AS (SELECT *, CAST(floor(exact) AS BIGINT) AS base,
          round(exact - floor(exact), 9) AS frac
        FROM ex),
      fin AS (SELECT *, 1000 - SUM(base) OVER () AS short,
          CAST(ROW_NUMBER() OVER (ORDER BY frac DESC, n_name) AS BIGINT) AS fr
        FROM base)
      SELECT n_name, CAST(nh AS BIGINT) AS nh, round(sh, 6) AS sh,
        round(exact, 6) AS exact_alloc,
        base + CASE WHEN fr <= short THEN 1 ELSE 0 END AS n_alloc
      FROM fin"""))

  val all: Seq[QueryDef] =
    Seq(q262LinkPrediction, q263KatzCentrality, q264DpNoisyCounts,
        q265NeymanAllocation)
}
