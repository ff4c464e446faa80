package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sliding-window distinct counting from MERGEABLE daily sketches — the
  * "7-day active users, every day" dashboard computed the way it must
  * be at 100 TB: build one k-minimum-values sketch PER DAY (q358/q474's
  * md5 convention), then answer every 7-day window by merging seven
  * k-row sketches, never rescanning the week (reference: overseer's
  * rolling-actives dashboards, doc/guide/Introduction.md:3).
  * The exact windowed distinct is computed beside the estimate as the
  * standing error audit — at production scale you'd drop the exact leg
  * and keep the sketch path, which touches 7·K rows per day instead of
  * seven days of raw events.
  *
  * Scale shape: ONE (day,user) dedup shuffle feeds both legs; the daily
  * sketch is a per-day rank window over ≤|users/day| rows keeping K=64;
  * the merge is a generated 7-day explode of K-row sketches (≤7·K rows
  * per output day — model-sized forever). The exact leg pays the 7×
  * pair fan-out — the cost the sketch leg exists to avoid, kept here
  * because the rel_err column is the product.
  *
  * Exactness: the sketch is integer 60-bit hashes end-to-end; the
  * estimator (K−1)·2⁶⁰/θ is one double division (q474's formula, exact
  * below capacity); counts BIGINT; rel_err rounded at 6.
  */
object SlidingDistinctOps {

  private val K = 64
  private val MaxHash = 1152921504606846976.0 // 2^60

  val q499SlidingDistinct: QueryDef = QueryDef(
    "q499_sliding_distinct",
    (s, dir) => {
      val pairs = EventOps.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .localCheckpoint() // feeds the sketch leg AND the exact leg
      val bounds = pairs.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val hashed = pairs.withColumn("h",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      val daily = hashed
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("day")).orderBy(col("h"))))
        .filter(col("rn") <= K)
      // each daily sketch row contributes to the 7 windows ending d..d+6
      val merged = daily
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("wday"), col("h"))
        .distinct() // same user appearing on several days: one hash
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("wday")).orderBy(col("h"))))
        .filter(col("rn") <= K)
        .groupBy(col("wday"))
        .agg(count(lit(1)).as("m"), max(col("h")).as("theta"))
      val exact = broadcast(pairs.select(col("day").as("wday")).distinct())
        .join(pairs, col("day").between(date_sub(col("wday"), 6), col("wday")))
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(merged, Seq("wday"))
        .crossJoin(broadcast(bounds))
        .where(col("wday") >= date_add(col("d0"), 6))
        .withColumn("kmv_est",
          when(col("m") < K, col("m").cast("double"))
            .otherwise(lit((K - 1).toDouble * MaxHash) /
              col("theta").cast("double")))
        .select(col("wday"), col("exact_users"),
          round(col("kmv_est"), 4).as("kmv_est"),
          round(abs(col("kmv_est") - col("exact_users").cast("double")) /
            col("exact_users").cast("double"), 6).as("rel_err"))
        .orderBy(col("wday"))
    },
    Some(s"""WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM pairs),
      hashed AS (
        SELECT day, ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
          ::BIGINT AS h
        FROM pairs),
      daily AS (
        SELECT day, h FROM (
          SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h)
            AS rn FROM hashed) WHERE rn <= $K),
      contrib AS (
        SELECT DISTINCT d.day + CAST(g.i AS INTEGER) AS wday, d.h
        FROM daily d CROSS JOIN range(7) g(i)),
      merged AS (
        SELECT wday, CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS theta FROM (
          SELECT wday, h, row_number() OVER (PARTITION BY wday ORDER BY h)
            AS rn FROM contrib) WHERE rn <= $K GROUP BY 1),
      exact AS (
        SELECT s.wday, CAST(COUNT(DISTINCT p.user_id) AS BIGINT)
          AS exact_users
        FROM (SELECT DISTINCT day AS wday FROM pairs) s
        JOIN pairs p ON p.day BETWEEN s.wday - 6 AND s.wday
        GROUP BY 1),
      est AS (
        SELECT e.wday, e.exact_users,
          CASE WHEN m.m < $K THEN CAST(m.m AS DOUBLE)
            ELSE ${(K - 1).toDouble} * $MaxHash / CAST(m.theta AS DOUBLE)
          END AS kmv_est
        FROM exact e JOIN merged m ON m.wday = e.wday
        CROSS JOIN bounds b WHERE e.wday >= b.d0 + 6)
      SELECT wday, exact_users, round(kmv_est, 4) AS kmv_est,
        round(abs(kmv_est - CAST(exact_users AS DOUBLE)) /
          CAST(exact_users AS DOUBLE), 6) AS rel_err
      FROM est ORDER BY wday"""))

  val all: Seq[QueryDef] = Seq(q499SlidingDistinct)
}
