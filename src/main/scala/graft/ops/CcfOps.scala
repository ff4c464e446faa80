package graft.ops

import org.apache.spark.sql.functions._

/** Lead–lag cross-correlation function (the CCF of Box & Jenkins 1970,
  * ch. 11) between the hourly 'view' and 'purchase' event series —
  * "does traffic LEAD conversions, and by how many hours?" For every
  * lag L in −12..+12, the Pearson correlation of x_t against y_{t+L}
  * over the dense hourly spine; the argmax lag is the causal-direction
  * screen product analytics runs before attribution (reference:
  * overseer's events/monitoring family — arbitrary handler fns,
  * src/overseer/executor.clj:12-39).
  *
  * Scale shape: ONE event scan aggregates to the calendar-bounded
  * hourly census (map-side partial agg); the 25-lag sweep is a
  * constant fan-out over that calendar-bounded spine — never a
  * data-sized shuffle. Empty hours are structural zeros (a dropped hour would
  * bias every covariance).
  *
  * Exactness: counts are BIGINTs, each lag's five sums are exact
  * integers, and r_L is ONE fixed float expression over them —
  * cross-engine deterministic; rows with a degenerate variance are
  * excluded on both sides.
  */
object CcfOps {

  private val MaxLag = 12

  val q515LeadLagCcf: QueryDef = QueryDef(
    "q515_lead_lag_ccf",
    (s, dir) => {
      val ev = EventOps.events(s, dir) // ts normalized to session-UTC µs
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("h"))
      val counts = ev.groupBy(col("h")).pivot("event_type",
          Seq("view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("view", "purchase"))
      val bounds = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val spine = bounds
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
        .join(counts, Seq("h"), "left")
        .na.fill(0L, Seq("view", "purchase"))
        .select(col("h"), col("view").as("x"), col("purchase").as("y"))
        .localCheckpoint()
      val lags = s.range(-MaxLag, MaxLag + 1).select(col("id").as("lag"))
      val pairs = broadcast(lags)
        .join(spine.select(col("h"), col("x")), lit(true))
        .join(spine.select(col("h").as("hy"), col("y")),
          col("hy") === col("h") + col("lag"))
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .where(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
          col("n") * col("syy") - col("sy") * col("sy") > 0)
        .select(col("lag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
            9).as("r"))
    },
    Some(s"""WITH ev AS (
        SELECT event_type,
          CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h
        FROM events WHERE event_type IN ('view', 'purchase')),
      counts AS (
        SELECT h,
          CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
          CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
        FROM ev GROUP BY 1),
      bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
      spine AS (
        SELECT g.h, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
        FROM (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds) g
        LEFT JOIN counts c ON c.h = g.h),
      lags AS (SELECT unnest(range(-$MaxLag, ${MaxLag + 1})) AS lag),
      pairs AS (
        SELECT l.lag, a.x, b.y
        FROM lags l
        JOIN spine a ON TRUE
        JOIN spine b ON b.h = a.h + l.lag),
      sums AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1)
      SELECT lag, n,
        round(CAST(n * sxy - sx * sy AS DOUBLE) /
          (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS r
      FROM sums
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""))

  val all: Seq[QueryDef] = Seq(q515LeadLagCcf)
}
