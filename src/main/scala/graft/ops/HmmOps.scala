package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** HMM regime decoding over the daily order-volume series — max-product
  * forward AND backward passes (Rabiner 1989 §III), combined into
  * per-day max-marginal states: state_t = argmax_s [f_t(s) + b_t(s)].
  * The 3-state chain (low/mid/high volume regimes, sticky transitions)
  * turns a noisy daily series into labeled REGIME ISLANDS — the
  * monitoring product every ops dashboard wants above raw anomaly
  * flags (reference: overseer's monitoring/series family — arbitrary
  * handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: ONE corpus scan to the calendar-bounded daily census;
  * both DP recursions fold inside codegen `aggregate` higher-order
  * functions over the ≤2,400-step series (the q485/q514 discipline: no
  * driver loop, no per-step shuffle); islands are one window pass over
  * the decoded states.
  *
  * Exactness: observations are tercile symbols cut at EXACT order
  * statistics; transition/emission log-probabilities are integer
  * MICRO-NATS (floor(ln(p)·1e6), compile-time constants identical in
  * both dialects), so every DP cell is an exact BIGINT and the argmax
  * (ties → lower state id) is cross-engine deterministic.
  */
object HmmOps {

  // integer micro-nat log-probs (all driver-side constants)
  private val LnSelf = math.floor(math.log(0.8) * 1e6).toLong // stay
  private val LnMove = math.floor(math.log(0.1) * 1e6).toLong // switch
  private val LnHit  = math.floor(math.log(0.6) * 1e6).toLong // o == s
  private val LnMiss = math.floor(math.log(0.2) * 1e6).toLong // o != s

  /** max over incoming states of prev(s') + tr(s', s), as a SQL string
    * over BIGINT columns `p0,p1,p2` of a struct `$a`. */
  private def stepTo(a: String, s: Int): String = {
    val terms = (0 to 2).map { sp =>
      val tr = if (sp == s) LnSelf else LnMove
      s"$a.p$sp + ${tr}L"
    }
    s"greatest(${terms.mkString(", ")})"
  }

  private def emit(o: String, s: Int): String =
    s"(CASE WHEN $o = $s THEN ${LnHit}L ELSE ${LnMiss}L END)"

  val q517HmmRegimes: QueryDef = QueryDef(
    "q517_hmm_regimes",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"))
      val n = daily.count()
      val r1 = math.ceil(n / 3.0).toLong
      val r2 = math.ceil(2.0 * n / 3.0).toLong
      val wOrd = Window.orderBy(col("x"), col("day"))
      val cuts = daily.withColumn("rk", row_number().over(wOrd))
        .where(col("rk") === r1 || col("rk") === r2)
        .agg(min(col("x")).as("t1"), max(col("x")).as("t2"))
      val obs = daily.crossJoin(broadcast(cuts))
        .select(col("day"),
          when(col("x") <= col("t1"), 0L)
            .when(col("x") <= col("t2"), 1L).otherwise(2L).as("o"))
      // fwd/bwd DP arrays via one fold each over the packed series
      val ser = obs.agg(
        sort_array(collect_list(struct(col("day"), col("o")))).as("ser"))
      val folded = ser.select(col("ser"), expr(s"""
          aggregate(ser,
            named_struct('p0', CAST(0 AS BIGINT), 'p1', CAST(0 AS BIGINT),
                         'p2', CAST(0 AS BIGINT), 'started', false,
                         'arr', CAST(array() AS ARRAY<STRUCT<p0: BIGINT, p1: BIGINT, p2: BIGINT>>)),
            (acc, x) -> CASE WHEN NOT acc.started THEN
                named_struct('p0', ${emit("x.o", 0)},
                             'p1', ${emit("x.o", 1)},
                             'p2', ${emit("x.o", 2)}, 'started', true,
                  'arr', array(named_struct('p0', ${emit("x.o", 0)},
                                            'p1', ${emit("x.o", 1)},
                                            'p2', ${emit("x.o", 2)})))
              ELSE named_struct(
                'p0', ${stepTo("acc", 0)} + ${emit("x.o", 0)},
                'p1', ${stepTo("acc", 1)} + ${emit("x.o", 1)},
                'p2', ${stepTo("acc", 2)} + ${emit("x.o", 2)},
                'started', true,
                'arr', array_append(acc.arr, named_struct(
                  'p0', ${stepTo("acc", 0)} + ${emit("x.o", 0)},
                  'p1', ${stepTo("acc", 1)} + ${emit("x.o", 1)},
                  'p2', ${stepTo("acc", 2)} + ${emit("x.o", 2)})))
              END,
            acc -> acc.arr) AS fwd"""),
          expr(s"""
          reverse(aggregate(reverse(ser),
            named_struct('p0', CAST(0 AS BIGINT), 'p1', CAST(0 AS BIGINT),
                         'p2', CAST(0 AS BIGINT), 'o', CAST(-1 AS BIGINT),
                         'arr', CAST(array() AS ARRAY<STRUCT<p0: BIGINT, p1: BIGINT, p2: BIGINT>>)),
            (acc, x) -> CASE WHEN acc.o < 0 THEN
                named_struct('p0', CAST(0 AS BIGINT), 'p1', CAST(0 AS BIGINT),
                  'p2', CAST(0 AS BIGINT), 'o', x.o,
                  'arr', array(named_struct('p0', CAST(0 AS BIGINT),
                    'p1', CAST(0 AS BIGINT), 'p2', CAST(0 AS BIGINT))))
              ELSE named_struct(
                'p0', greatest(${(0 to 2).map(sp => s"${if (sp == 0) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}),
                'p1', greatest(${(0 to 2).map(sp => s"${if (sp == 1) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}),
                'p2', greatest(${(0 to 2).map(sp => s"${if (sp == 2) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}),
                'o', x.o,
                'arr', array_append(acc.arr, named_struct(
                  'p0', greatest(${(0 to 2).map(sp => s"${if (sp == 0) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}),
                  'p1', greatest(${(0 to 2).map(sp => s"${if (sp == 1) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}),
                  'p2', greatest(${(0 to 2).map(sp => s"${if (sp == 2) LnSelf else LnMove}L + (CASE WHEN acc.o = $sp THEN ${LnHit}L ELSE ${LnMiss}L END) + acc.p$sp").mkString(", ")}))))
              END,
            acc -> acc.arr)) AS bwd"""))
      val decoded = folded
        .select(posexplode(expr("arrays_zip(ser, fwd, bwd)"))
          .as(Seq("pos", "z")))
        .select(col("z.ser.day").as("day"), expr("""
          CASE
            WHEN z.fwd.p0 + z.bwd.p0 >= z.fwd.p1 + z.bwd.p1
             AND z.fwd.p0 + z.bwd.p0 >= z.fwd.p2 + z.bwd.p2 THEN 0L
            WHEN z.fwd.p1 + z.bwd.p1 >= z.fwd.p2 + z.bwd.p2 THEN 1L
            ELSE 2L END""").as("state"))
      // regime islands (gaps-and-islands on the decoded state sequence)
      val wDay = Window.orderBy(col("day"))
      val wSt  = Window.partitionBy(col("state")).orderBy(col("day"))
      decoded
        .withColumn("grp",
          row_number().over(wDay) - row_number().over(wSt))
        .groupBy(col("state"), col("grp"))
        .agg(min(col("day")).as("start_day"), count(lit(1)).as("n_days"))
        .orderBy(col("n_days").desc, col("start_day"))
        .limit(10)
        .select(col("start_day"), col("state"), col("n_days"))
    },
    Some {
      def fwdStep(s: Int) = (0 to 2).map { sp =>
        s"f.p$sp + ${if (sp == s) LnSelf else LnMove}"
      }.mkString("greatest(", ", ", ")")
      def bwdStep(s: Int) = (0 to 2).map { sp =>
        s"${if (sp == s) LnSelf else LnMove} + " +
          s"(CASE WHEN s.o = $sp THEN $LnHit ELSE $LnMiss END) + b.p$sp"
      }.mkString("greatest(", ", ", ")")
      def e(o: String, s: Int) =
        s"(CASE WHEN $o = $s THEN $LnHit ELSE $LnMiss END)"
      s"""WITH RECURSIVE daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM daily),
      ranked AS (SELECT x, row_number() OVER (ORDER BY x, day) AS rk FROM daily),
      cuts AS (
        SELECT MIN(x) AS t1, MAX(x) AS t2 FROM ranked, nn
        WHERE rk = CAST(ceil(n / 3.0) AS BIGINT)
           OR rk = CAST(ceil(2.0 * n / 3.0) AS BIGINT)),
      obs AS (
        SELECT day, CASE WHEN x <= t1 THEN 0 WHEN x <= t2 THEN 1 ELSE 2 END AS o,
          row_number() OVER (ORDER BY day) AS pos,
          COUNT(*) OVER () AS n
        FROM daily CROSS JOIN cuts),
      f AS (
        SELECT pos, CAST(${e("o", 0)} AS BIGINT) AS p0,
          CAST(${e("o", 1)} AS BIGINT) AS p1,
          CAST(${e("o", 2)} AS BIGINT) AS p2
        FROM obs WHERE pos = 1
        UNION ALL
        SELECT s.pos,
          ${fwdStep(0)} + ${e("s.o", 0)},
          ${fwdStep(1)} + ${e("s.o", 1)},
          ${fwdStep(2)} + ${e("s.o", 2)}
        FROM f JOIN obs s ON s.pos = f.pos + 1),
      b AS (
        SELECT pos, CAST(0 AS BIGINT) AS p0, CAST(0 AS BIGINT) AS p1,
          CAST(0 AS BIGINT) AS p2
        FROM obs WHERE pos = n
        UNION ALL
        SELECT s.pos - 1, ${bwdStep(0)}, ${bwdStep(1)}, ${bwdStep(2)}
        FROM b JOIN obs s ON s.pos = b.pos AND s.pos > 1),
      decoded AS (
        SELECT o.day,
          CASE
            WHEN f.p0 + b.p0 >= f.p1 + b.p1 AND f.p0 + b.p0 >= f.p2 + b.p2 THEN 0
            WHEN f.p1 + b.p1 >= f.p2 + b.p2 THEN 1
            ELSE 2 END AS state
        FROM obs o JOIN f ON f.pos = o.pos JOIN b ON b.pos = o.pos),
      grp AS (
        SELECT day, state,
          row_number() OVER (ORDER BY day)
            - row_number() OVER (PARTITION BY state ORDER BY day) AS g
        FROM decoded)
      SELECT MIN(day) AS start_day, CAST(state AS BIGINT) AS state,
        CAST(COUNT(*) AS BIGINT) AS n_days
      FROM grp GROUP BY state, g
      ORDER BY n_days DESC, start_day LIMIT 10"""
    })

  val all: Seq[QueryDef] = Seq(q517HmmRegimes)
}
