package graft.ops

import org.apache.spark.sql.functions._

/** Geometric adstock fit (Broadbent 1979; the media-mix-modeling
  * carryover transform): a_t = x_t + θ·a_{t−1} spreads today's
  * "impressions" (order count) over following days, and the right θ is
  * chosen by sweeping decay rates and correlating each transformed
  * series with the response (daily revenue). The lag-structure scan
  * every MMM pipeline runs before regression (reference: overseer's
  * monitoring/series family — arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q149's time-decay popularity is the
  * per-item cousin).
  *
  * Scale shape: ONE corpus scan to the calendar-bounded daily frame;
  * each θ's recursion folds inside a codegen `aggregate` HOF emitting
  * the whole transformed series (the q485/q514/q517 discipline), and
  * the correlation runs on exact integer sums after quantization.
  *
  * Exactness: θ ∈ {0.25, 0.5, 0.75} are DYADIC, so the fold's doubles
  * round identically in both engines' identical sequential op order;
  * each day's adstock is quantized to whole units
  * (floor(a + 0.5) of the SAME double), making all correlation sums
  * exact BIGINTs with one float expression at the end. BIGINT headroom:
  * n·Σy² stays under 2⁶³ through ~sf10 (the q526 note applies).
  */
object AdstockOps {

  private val Thetas = Seq(0.25, 0.5, 0.75)

  val q538AdstockFit: QueryDef = QueryDef(
    "q538_adstock_fit",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"),
          expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
            "DIV 100000").as("y"))
      val ser = daily.agg(sort_array(collect_list(
        struct(col("day"), col("x"), col("y")))).as("ser"))
      val thetas = s.createDataFrame(Thetas.map(Tuple1(_))).toDF("theta")
      val folded = broadcast(thetas).join(ser, lit(true))
        .select(col("theta"), col("ser"), expr("""
          aggregate(
            ser,
            named_struct('a', CAST(0.0 AS DOUBLE),
                         'arr', CAST(array() AS ARRAY<BIGINT>)),
            (acc, e) -> named_struct(
              'a', CAST(e.x AS DOUBLE) + theta * acc.a,
              'arr', array_append(acc.arr,
                CAST(floor(CAST(e.x AS DOUBLE) + theta * acc.a
                  + 0.5) AS BIGINT))),
            acc -> acc.arr) AS ad"""))
      val rows = folded
        .select(col("theta"),
          posexplode(expr("arrays_zip(ser, ad)")).as(Seq("pos", "z")))
        .select(col("theta"), col("z.ser.y").as("y"), col("z.ad").as("a"))
      rows.groupBy(col("theta"))
        .agg(count(lit(1)).as("n"),
          sum(col("a")).as("sa"), sum(col("y")).as("sy"),
          sum(col("a") * col("y")).as("say"),
          sum(col("a") * col("a")).as("saa"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("theta"), col("n"),
          round((col("n") * col("say") - col("sa") * col("sy")).cast("double") /
            (sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            9).as("corr"))
    },
    Some(s"""WITH RECURSIVE daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS y
        FROM orders GROUP BY 1),
      ser AS (
        SELECT day, x, y, row_number() OVER (ORDER BY day) AS pos,
          COUNT(*) OVER () AS n
        FROM daily),
      thetas AS (SELECT CAST(unnest([${Thetas.mkString(", ")}]) AS DOUBLE)
        AS theta),
      f AS (
        SELECT t.theta, s.pos, s.y,
          CAST(s.x AS DOUBLE) AS a
        FROM ser s CROSS JOIN thetas t WHERE s.pos = 1
        UNION ALL
        SELECT f.theta, s.pos, s.y,
          CAST(s.x AS DOUBLE) + f.theta * f.a
        FROM f JOIN ser s ON s.pos = f.pos + 1),
      q AS (
        SELECT theta, y,
          CAST(floor(a + 0.5) AS BIGINT) AS a
        FROM f),
      sums AS (
        SELECT theta, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(a * y) AS BIGINT) AS say,
          CAST(SUM(a * a) AS BIGINT) AS saa,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM q GROUP BY 1)
      SELECT theta, n,
        round(CAST(n * say - sa * sy AS DOUBLE) /
          (sqrt(CAST(n * saa - sa * sa AS DOUBLE)) *
           sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS corr
      FROM sums"""))

  val all: Seq[QueryDef] = Seq(q538AdstockFit)
}
