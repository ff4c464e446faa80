package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequential-monitoring wave: the group-sequential looks table —
  * five interim analyses of a running A/B comparison against
  * O'Brien–Fleming-style spending boundaries, the fixed-schedule
  * counterpart of q352's SPRT.
  *
  * Scale shape: one global sort assigns look numbers, the frame then
  * collapses to 5×2 cumulative count rows before any statistics.
  */
object MonitorOps {

  /** Group-sequential monitoring (Pocock 1977 / O'Brien & Fleming
    * 1979): the event stream is cut into five equal-information looks;
    * at each look the cumulative purchase rates of the two id-parity
    * cohorts are compared with the pooled two-proportion z (q215's
    * statistic on cumulative counts) against the OBF-shaped boundary
    * z_{α/2}·√(K/k) — strict early, nominal at the last look, which is
    * what lets an experimenter peek five times while holding α. The
    * output is the full looks table with crossing flags — the audit a
    * sequential-testing platform publishes per experiment. Counts are
    * exact integers from one 10-row frame; z and boundaries are single
    * double expressions. */
  val q388SequentialLooks: QueryDef = QueryDef(
    "q388_sequential_looks",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val n = ev.count()
      // look assignment by GLOBAL stream position: size-adaptive rank
      // (r15) — window while events fit one task, range-partitioned
      // spine above; the probe reuses the n this query already counts
      val perLook = Spine.adaptiveRank(ev,
          Seq(unix_micros(col("ts")), col("event_id")),
          rankCol = "rn", knownCount = n)
        .withColumn("look",
          least(lit(5L), expr(s"CAST((rn - 1) * 5 DIV $n AS LONG) + 1")))
        .withColumn("grp", pmod(col("user_id"), lit(2)).cast("int"))
        .groupBy(col("look"), col("grp"))
        .agg(count(lit(1)).as("dn"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("dc"))
      val wide = perLook.groupBy(col("look"))
        .agg(sum(when(col("grp") === 0, col("dn")).otherwise(0L)).as("dn1"),
          sum(when(col("grp") === 1, col("dn")).otherwise(0L)).as("dn2"),
          sum(when(col("grp") === 0, col("dc")).otherwise(0L)).as("dc1"),
          sum(when(col("grp") === 1, col("dc")).otherwise(0L)).as("dc2"))
      val wCum = Window.orderBy(col("look"))
        .rowsBetween(Window.unboundedPreceding, 0)
      wide
        .withColumn("n1", sum(col("dn1")).over(wCum))
        .withColumn("n2", sum(col("dn2")).over(wCum))
        .withColumn("c1", sum(col("dc1")).over(wCum))
        .withColumn("c2", sum(col("dc2")).over(wCum))
        .withColumn("p1", col("c1").cast("double") / col("n1"))
        .withColumn("p2", col("c2").cast("double") / col("n2"))
        .withColumn("pp", (col("c1") + col("c2")).cast("double") /
          (col("n1") + col("n2")))
        .withColumn("z", (col("p1") - col("p2")) /
          sqrt(col("pp") * (lit(1.0) - col("pp")) *
            (lit(1.0) / col("n1") + lit(1.0) / col("n2"))))
        .withColumn("boundary",
          lit(1.959964) * sqrt(lit(5.0) / col("look").cast("double")))
        .select(col("look"), col("n1"), col("n2"),
          round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
          round(col("z"), 6).as("z"),
          round(col("boundary"), 6).as("obf_boundary"),
          (abs(col("z")) > col("boundary")).as("crossed"))
        .orderBy(col("look"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type
        FROM events),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
      rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY us, event_id) AS rn FROM ev),
      lk AS (SELECT least(5, ((rn - 1) * 5) // (SELECT n FROM nn) + 1) AS look,
          CAST(user_id % 2 AS INT) AS grp,
          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM rk),
      wide AS (SELECT look,
          CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dn1,
          CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dn2,
          CAST(SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS dc1,
          CAST(SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS dc2
        FROM lk GROUP BY 1),
      cum AS (SELECT look,
          CAST(SUM(dn1) OVER w AS BIGINT) AS n1, CAST(SUM(dn2) OVER w AS BIGINT) AS n2,
          CAST(SUM(dc1) OVER w AS BIGINT) AS c1, CAST(SUM(dc2) OVER w AS BIGINT) AS c2
        FROM wide
        WINDOW w AS (ORDER BY look ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      st AS (SELECT *, CAST(c1 AS DOUBLE) / n1 AS p1, CAST(c2 AS DOUBLE) / n2 AS p2,
          CAST(c1 + c2 AS DOUBLE) / (n1 + n2) AS pp
        FROM cum)
      SELECT look, n1, n2, round(p1, 6) AS p1, round(p2, 6) AS p2,
        round((p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)), 6) AS z,
        round(1.959964 * sqrt(5.0 / CAST(look AS DOUBLE)), 6) AS obf_boundary,
        abs((p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)))
          > 1.959964 * sqrt(5.0 / CAST(look AS DOUBLE)) AS crossed
      FROM st ORDER BY look"""))

  val all: Seq[QueryDef] = Seq(q388SequentialLooks)
}
