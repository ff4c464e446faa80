package graft.ops

import org.apache.spark.sql.functions._

/** Global & local spatial autocorrelation over a cell lattice — Moran's I
  * (Moran 1950) and the Getis–Ord Gi* hot-spot statistic (Getis & Ord
  * 1992): the two standard answers to "is the customer density map
  * clustered, and WHERE?" (reference: overseer's monitoring/report
  * family; the spatial fixture reuses q487's deterministic md5 grid,
  * src/overseer/executor.clj:12-39's arbitrary-fn contract is what lets the
  * reference run arbitrary spatial UDFs — here the statistic itself is
  * the operator).
  *
  * Scale shape: ONE linear scan buckets every point into a FIXED
  * 10×10 lattice (the analysis frame, not a data-sized object), so the
  * adjacency join, the cross-products, and both statistics run on a
  * 100-row frame regardless of corpus size — the map-side partial
  * aggregation does all the heavy lifting. This is the zone-census
  * pattern every planetary-scale spatial aggregation uses (tile first,
  * correlate tiles after).
  *
  * Exactness: cell values are BIGINT counts; deviations are scaled by
  * N (v_i = N·x_i − T, so no rational mean ever materializes) and both
  * statistics reduce to ratios of exact BIGINT sums with ONE float
  * division at the end (Moran) or a fixed per-row expression (Gi*) —
  * cross-engine deterministic. BIGINT headroom: at sf100 a cell holds
  * ~1.5e6 points, v ≈ 1.5e8, Σv² ≈ 2e18 < 2⁶³.
  */
object SpatialStatOps {

  private val World = 10000L // q487's grid units per axis
  private val Edge  = 1000L  // cell edge → 10×10 lattice
  private val G     = 10L    // lattice cells per axis

  private def coord(key: org.apache.spark.sql.Column, salt: String) =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(World))

  /** Customer counts per lattice cell, with EVERY cell present (empty
    * cells are structural zeros — dropping them biases both statistics). */
  private def cellCounts(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val pts = Tables(s, dir).customer.select(
      floor(coord(col("c_custkey"), "cx|") / Edge).cast("long").as("gx"),
      floor(coord(col("c_custkey"), "cy|") / Edge).cast("long").as("gy"))
    val counts = pts.groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("x"))
    val lattice = s.range(G).select(col("id").as("gx"))
      .crossJoin(s.range(G).select(col("id").as("gy")))
    lattice.join(counts, Seq("gx", "gy"), "left")
      .na.fill(0L, Seq("x"))
  }

  private val latticeSql =
    s"""lattice AS (
        SELECT a.range AS gx, b.range AS gy
        FROM range($G) a CROSS JOIN range($G) b),
      pts AS (
        SELECT
          (('0x' || substr(md5('cx|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
            % $World) // $Edge AS gx,
          (('0x' || substr(md5('cy|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
            % $World) // $Edge AS gy
        FROM customer),
      counts AS (
        SELECT l.gx, l.gy,
          CAST(COALESCE(c.x, 0) AS BIGINT) AS x
        FROM lattice l LEFT JOIN
          (SELECT gx, gy, COUNT(*) AS x FROM pts GROUP BY 1, 2) c
          ON c.gx = l.gx AND c.gy = l.gy)"""

  /** q508: Moran's I with rook adjacency (w_ij = 1 for lattice cells one
    * step apart, 0 otherwise). I = (N/W)·Σ_adj v_i v_j / Σ v_i² with
    * v_i = N·x_i − T; E[I] under CSR is −1/(N−1). */
  val q508MoransI: QueryDef = QueryDef(
    "q508_morans_i",
    (s, dir) => {
      val cells = cellCounts(s, dir).localCheckpoint()
      val tot = cells.agg(sum(col("x")).as("t"), count(lit(1)).as("n"))
      val v = cells.crossJoin(broadcast(tot))
        .select(col("gx"), col("gy"), col("n"),
          (col("n") * col("x") - col("t")).as("v"))
      val a = v.select(col("gx"), col("gy"), col("n"), col("v"))
      val b = v.select(col("gx").as("hx"), col("gy").as("hy"), col("v").as("w"))
      val adj = a.join(b,
        abs(col("gx") - col("hx")) + abs(col("gy") - col("hy")) === 1)
      val num = adj.agg(sum(col("v") * col("w")).as("num"),
        count(lit(1)).as("wsum"), first(col("n")).as("n"))
      val den = v.agg(sum(col("v") * col("v")).as("den"))
      num.crossJoin(den).select(
        col("n").as("n_cells"),
        col("wsum").as("w_pairs"),
        // wsum·den can pass 2⁶³ at sf100 — multiply in double space
        (col("n").cast("double") * col("num") /
          (col("wsum").cast("double") * col("den"))).as("morans_i"),
        (lit(-1.0) / (col("n") - 1)).as("e_i"))
    },
    Some(s"""WITH $latticeSql,
      tot AS (SELECT SUM(x) AS t, COUNT(*) AS n FROM counts),
      v AS (SELECT gx, gy, n.n AS n, n.n * x - n.t AS v
            FROM counts CROSS JOIN tot n),
      adj AS (
        SELECT a.n, a.v AS v, b.v AS w
        FROM v a JOIN v b
          ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1),
      num AS (SELECT CAST(SUM(v * w) AS BIGINT) AS num,
        COUNT(*) AS wsum, MIN(n) AS n FROM adj),
      den AS (SELECT CAST(SUM(v * v) AS BIGINT) AS den FROM v)
      SELECT CAST(n AS BIGINT) AS n_cells,
        CAST(wsum AS BIGINT) AS w_pairs,
        CAST(n AS DOUBLE) * num / (CAST(wsum AS DOUBLE) * den) AS morans_i,
        -1.0 / (n - 1) AS e_i
      FROM num CROSS JOIN den"""))

  /** q509: Getis–Ord Gi* hot spots — per cell, the z-scored difference
    * between its OWN 3×3 neighborhood sum (self included, rook+diagonal)
    * and the expectation under spatial randomness. Top-10 by Gi*. All
    * neighborhood sums are exact BIGINTs; the z is one fixed float
    * expression per row. */
  val q509GetisOrd: QueryDef = QueryDef(
    "q509_getis_ord",
    (s, dir) => {
      val cells = cellCounts(s, dir).localCheckpoint()
      val tot = cells.agg(sum(col("x")).as("t"),
        sum(col("x") * col("x")).as("t2"), count(lit(1)).as("n"))
      val b = cells.select(col("gx").as("hx"), col("gy").as("hy"),
        col("x").as("w"))
      val hood = cells.join(b,
          abs(col("gx") - col("hx")) <= 1 && abs(col("gy") - col("hy")) <= 1)
        .groupBy(col("gx"), col("gy"), col("x"))
        .agg(sum(col("w")).as("hood_sum"), count(lit(1)).as("wi"))
      hood.crossJoin(broadcast(tot))
        .select(col("gx"), col("gy"), col("x"), col("hood_sum"), col("wi"),
          round((col("hood_sum") - col("t").cast("double") / col("n") * col("wi")) /
            (sqrt(col("t2").cast("double") / col("n") -
              (col("t").cast("double") / col("n")) *
                (col("t").cast("double") / col("n"))) *
             sqrt((col("n").cast("double") * col("wi") - col("wi") * col("wi")) /
               (col("n") - 1))), 9).as("gi_star"))
        .orderBy(col("gi_star").desc, col("gx"), col("gy"))
        .limit(10)
    },
    Some(s"""WITH $latticeSql,
      tot AS (SELECT SUM(x) AS t, SUM(x * x) AS t2, COUNT(*) AS n FROM counts),
      hood AS (
        SELECT a.gx, a.gy, a.x,
          CAST(SUM(b.x) AS BIGINT) AS hood_sum,
          CAST(COUNT(*) AS BIGINT) AS wi
        FROM counts a JOIN counts b
          ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
        GROUP BY 1, 2, 3)
      SELECT gx, gy, x, hood_sum, wi,
        round((hood_sum - CAST(t AS DOUBLE) / n * wi) /
          (sqrt(CAST(t2 AS DOUBLE) / n -
            (CAST(t AS DOUBLE) / n) * (CAST(t AS DOUBLE) / n)) *
           sqrt((CAST(n AS DOUBLE) * wi - wi * wi) / (n - 1))), 9) AS gi_star
      FROM hood CROSS JOIN tot
      ORDER BY gi_star DESC, gx, gy LIMIT 10"""))

  val all: Seq[QueryDef] = Seq(q508MoransI, q509GetisOrd)
}
