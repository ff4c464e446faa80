package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Holt–Winters wave: additive triple exponential smoothing of monthly
  * revenue with a 12-month season — the seasonal member of the
  * smoothing family (q294 EWMA smooths level, q411 Holt adds trend;
  * this adds the seasonal state the other two alias into error).
  * α = β = γ = 0.4, classical first-two-season initialization.
  *
  * Determinism — the even-tenths integer-state trick: the state lives
  * as LONGs in 10⁻⁴-dollar units and every update is
  * round((4·a + 6·b)/10) on exact-in-double integers. 4a + 6b is even,
  * so the fraction of /10 is in {0, .2, .4, .6, .8} — a round-half tie
  * can NEVER occur, which is exactly what α = 1/2 cannot promise (half
  * the updates land on .XXXX5 and the engines' round() implementations
  * split on how the binary value leans). Spark folds one array; DuckDB
  * walks a recursive CTE with the seasonal LIST — identical integer
  * trajectories by construction.
  *
  * Scale shape: the corpus collapses to the ~84-month census in one
  * scan; the recursion runs on that model-sized array.
  */
object HoltWintersOps {

  // shared update templates (engine syntax differs only in list access)
  private def lN(y: String, su: String, l: String, b: String) =
    s"CAST(round((4.0 * ($y - $su) + 6.0 * ($l + $b)) / 10.0) AS BIGINT)"

  /** Holt–Winters additive smoothing of monthly order revenue: per
    * month (from the 13th) the state trajectory, one-step forecast and
    * error (all in dollars at 4 dp), plus the shared MAE and
    * next-month forecast. */
  val q449HoltWinters: QueryDef = QueryDef(
    "q449_holt_winters",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("m",
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long"))
      val census = o
        .groupBy(col("m"))
        // y in 1e-4 dollars: cents * 100, an exact LONG
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 10000)
          .cast(DecimalType(18, 0)).cast("long").as("y"))
      // zero-filled month spine: a month with no orders is a real 0 and
      // must not break the k -> k+1 recursion
      val monthly = census
        .agg(min(col("m")).as("mmin"), max(col("m")).as("mmax"))
        .select(col("mmin"),
          explode(sequence(col("mmin"), col("mmax"))).as("m"))
        .join(census, Seq("m"), "left")
        .na.fill(0L, Seq("y"))
        .select((col("m") - col("mmin")).as("k"), col("y"))
      val rs = monthly
        .groupBy()
        .agg(sort_array(collect_list(struct(col("k"), col("y")))).as("rs"))
        // init: floor-divided season means (documented), LONG state
        .selectExpr("rs",
          "CAST(floor(aggregate(slice(rs, 1, 12), 0L, (a, r) -> a + r.y) / 12.0) AS BIGINT) AS l0")
        .selectExpr("rs", "l0",
          "CAST(floor((CAST(floor(aggregate(slice(rs, 13, 12), 0L, (a, r) -> a + r.y) / 12.0) AS BIGINT) - l0) / 12.0) AS BIGINT) AS b0",
          "transform(sequence(1, 12), i -> element_at(rs, i).y - l0) AS s0")
      val su = "element_at(st.s, CAST(r.k % 12 AS INT) + 1)"
      val ln = lN("r.y", su, "st.l", "st.b")
      val fold = s"""aggregate(
        slice(rs, 13, size(rs) - 12),
        named_struct('l', l0, 'b', b0, 's', s0,
          'out', CAST(array() AS ARRAY<STRUCT<k: BIGINT, y: BIGINT,
            level: BIGINT, trend: BIGINT, s_used: BIGINT, fc: BIGINT>>)),
        (st, r) -> named_struct(
          'l', $ln,
          'b', CAST(round((4.0 * ($ln - st.l) + 6.0 * st.b) / 10.0) AS BIGINT),
          's', transform(sequence(1, 12), si ->
            IF(si = CAST(r.k % 12 AS INT) + 1,
              CAST(round((4.0 * (r.y - $ln) + 6.0 * $su) / 10.0) AS BIGINT),
              element_at(st.s, si))),
          'out', st.out || array(named_struct('k', r.k, 'y', r.y,
            'level', $ln,
            'trend', CAST(round((4.0 * ($ln - st.l) + 6.0 * st.b) / 10.0) AS BIGINT),
            's_used', $su,
            'fc', st.l + st.b + $su))),
        st -> named_struct('rows', st.out,
          'fc_next', st.l + st.b
            + element_at(st.s, CAST(size(rs) % 12 AS INT) + 1)))"""
      rs.selectExpr(s"$fold AS f")
        .selectExpr("f.fc_next / 10000.0D AS fc_next", "explode(f.rows) AS r")
        .select(col("r.k").as("k"), (col("r.y") / 10000.0).as("y"),
          (col("r.level") / 10000.0).as("level"),
          (col("r.trend") / 10000.0).as("trend"),
          (col("r.s_used") / 10000.0).as("s_used"),
          (col("r.fc") / 10000.0).as("fc"),
          ((col("r.y") - col("r.fc")) / 10000.0).as("err"),
          abs(col("r.y") - col("r.fc")).as("abserr4"), col("fc_next"))
        .withColumn("mae", round(
          sum(col("abserr4").cast(DecimalType(38, 0)))
            .over(org.apache.spark.sql.expressions.Window.partitionBy())
            .cast("double")
            / count(lit(1)).over(
              org.apache.spark.sql.expressions.Window.partitionBy())
            / 10000.0, 4))
        .drop("abserr4")
        .orderBy(col("k"))
    },
    Some {
      val su = "p.s[CAST(m.k % 12 AS INT) + 1]"
      val ln = lN("m.y", su, "p.l", "p.b")
      s"""WITH RECURSIVE monthly0 AS MATERIALIZED (SELECT
          CAST(EXTRACT(year FROM o_orderdate) * 12
            + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 10000
            AS DECIMAL(18,0)) AS BIGINT) AS y
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(m) AS mmin, MAX(m) AS mmax FROM monthly0),
      spine AS (SELECT UNNEST(range(mmin, mmax + 1)) AS m, mmin FROM bounds),
      monthly AS MATERIALIZED (SELECT s.m - s.mmin AS k, COALESCE(c.y, 0) AS y
        FROM spine s LEFT JOIN monthly0 c ON c.m = s.m),
      nmon AS (SELECT CAST(COUNT(*) AS BIGINT) AS nm FROM monthly),
      init0 AS (SELECT
          CAST(floor(SUM(CASE WHEN k < 12 THEN y END) / 12.0) AS BIGINT)
            AS l0,
          CAST(floor(SUM(CASE WHEN k >= 12 AND k < 24 THEN y END) / 12.0)
            AS BIGINT) AS m2f
        FROM monthly),
      init AS (SELECT l0,
          CAST(floor((m2f - l0) / 12.0) AS BIGINT) AS b0,
          (SELECT list(mm.y - i0.l0 ORDER BY mm.k)
            FROM monthly mm WHERE mm.k < 12) AS s0
        FROM init0 i0),
      pit(k, l, b, s, y, s_used, fc) AS (
        SELECT CAST(11 AS BIGINT), l0, b0, s0,
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM init
        UNION ALL
        SELECT m.k,
          $ln,
          CAST(round((4.0 * ($ln - p.l) + 6.0 * p.b) / 10.0) AS BIGINT),
          list_transform(range(1, 13), si ->
            CASE WHEN si = CAST(m.k % 12 AS INT) + 1
              THEN CAST(round((4.0 * (m.y - $ln) + 6.0 * $su) / 10.0)
                AS BIGINT)
              ELSE p.s[si] END),
          m.y, $su,
          p.l + p.b + $su
        FROM pit p JOIN monthly m ON m.k = p.k + 1),
      fin AS MATERIALIZED (SELECT p.k, p.y, p.l AS level, p.b AS trend,
          p.s_used, p.fc,
          p.l + p.b + p.s[CAST(n.nm % 12 AS INT) + 1] AS fcn,
          (p.k = n.nm - 1) AS is_last
        FROM pit p, nmon n WHERE p.k >= 12)
      SELECT k, y / 10000.0 AS y, level / 10000.0 AS level,
        trend / 10000.0 AS trend, s_used / 10000.0 AS s_used,
        fc / 10000.0 AS fc, (y - fc) / 10000.0 AS err,
        (SELECT fcn / 10000.0 FROM fin WHERE is_last) AS fc_next,
        round(CAST(SUM(CAST(abs(y - fc) AS DECIMAL(38,0)))
            OVER () AS DOUBLE) / COUNT(*) OVER () / 10000.0, 4) AS mae
      FROM fin ORDER BY k"""
    })

  val all: Seq[QueryDef] = Seq(q449HoltWinters)
}
