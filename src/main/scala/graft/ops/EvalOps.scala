package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Estimator-quality and hierarchy operators: jackknife standard
  * errors, score-calibration bins, cumulative-gains deciles, and
  * percent-of-parent rollups — the "how good is the number" layer a
  * metrics pipeline publishes next to every point estimate.
  */
object EvalOps {

  /** Delete-one-day jackknife standard error of each event type's mean
    * value — the error bar for serially-dependent data where the iid
    * CLT lies (days, not rows, are the independent unit). One scan
    * reduces to per-(type, day) exact DECIMAL power sums; type totals
    * are windows over that model-sized frame; each day's leave-out mean
    * is pure arithmetic on exact sums, and the jackknife variance
    * (D−1)/D · Σ(θ₍d₎ − θ̄₍·₎)² closes over one more window pair.
    */
  val q182JackknifeSe: QueryDef = QueryDef(
    "q182_jackknife_se",
    (s, dir) => {
      val wT = Window.partitionBy(col("event_type"))
      val daily = EventOps.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_d"),
             sum(col("value").cast(DecimalType(18, 4))).as("s_d"))
        .withColumn("n", sum(col("n_d")).over(wT))
        .withColumn("s", sum(col("s_d")).over(wT))
        .withColumn("d_days", count(lit(1)).over(wT))
        .withColumn("loo",
          (col("s") - col("s_d")).cast("double") /
            (col("n") - col("n_d")).cast("double"))
        .withColumn("loo_bar", avg(col("loo")).over(wT))
      daily.groupBy(col("event_type"))
        .agg(max(col("d_days")).as("n_days"),
          round(max(col("s")).cast("double") / max(col("n")).cast("double"), 9)
            .as("theta"),
          round(sqrt((max(col("d_days")) - lit(1)).cast("double") /
                     max(col("d_days")).cast("double") *
                     sum((col("loo") - col("loo_bar")) *
                         (col("loo") - col("loo_bar")))), 9).as("jack_se"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
          COUNT(*) AS n_d, SUM(CAST(value AS DECIMAL(18,4))) AS s_d
        FROM events GROUP BY 1, 2),
      tot AS (SELECT *,
          SUM(n_d) OVER (PARTITION BY event_type) AS n,
          SUM(s_d) OVER (PARTITION BY event_type) AS s,
          COUNT(*) OVER (PARTITION BY event_type) AS d_days
        FROM daily),
      loo AS (SELECT *,
          CAST(s - s_d AS DOUBLE) / CAST(n - n_d AS DOUBLE) AS loo
        FROM tot),
      lb AS (SELECT *, AVG(loo) OVER (PARTITION BY event_type) AS loo_bar
        FROM loo)
      SELECT event_type, CAST(MAX(d_days) AS BIGINT) AS n_days,
        round(CAST(MAX(s) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 9) AS theta,
        round(sqrt(CAST(MAX(d_days) - 1 AS DOUBLE) / CAST(MAX(d_days) AS DOUBLE)
          * SUM((loo - loo_bar) * (loo - loo_bar))), 9) AS jack_se
      FROM lb GROUP BY 1"""))

  /** Calibration (reliability) table of a document quality score
    * against the is-English label: equal-width probability bins with
    * observed positive rate and per-bin Brier contribution — the check
    * that a score MEANS its number before anyone thresholds on it. The
    * score is a linear ramp on n_chars (exact rational arithmetic, so
    * both engines bin identically); the whole table is one scan and one
    * model-sized hash agg.
    */
  val q183CalibrationBins: QueryDef = QueryDef(
    "q183_calibration_bins",
    (s, dir) => {
      val w = Window.partitionBy()
      Tables(s, dir).documents
        .withColumn("p", least(greatest(
          (col("n_chars") - lit(100)).cast("double") / lit(900.0), lit(0.0)),
          lit(1.0)))
        .withColumn("y", (col("lang") === "en").cast("long"))
        .withColumn("bin", least(floor(col("p") * 10), lit(9L)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("p")), 6).as("mean_pred"),
          sum(col("y")).as("n_pos"),
          round(sum(col("y")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("obs_rate"),
          sum((col("p") - col("y").cast("double")) *
              (col("p") - col("y").cast("double"))).as("sq_err"))
        .withColumn("brier_contrib",
          round(col("sq_err") / sum(col("n_docs")).over(w).cast("double"), 6))
        .drop("sq_err")
    },
    Some("""WITH sc AS (SELECT
          least(greatest(CAST(n_chars - 100 AS DOUBLE) / 900.0, 0.0), 1.0) AS p,
          CAST(lang = 'en' AS BIGINT) AS y
        FROM documents),
      b AS (SELECT CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, p, y FROM sc),
      agg AS (SELECT bin, COUNT(*) AS n_docs,
          round(AVG(p), 6) AS mean_pred,
          CAST(SUM(y) AS BIGINT) AS n_pos,
          round(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS obs_rate,
          SUM((p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE))) AS sq_err
        FROM b GROUP BY 1)
      SELECT bin, n_docs, mean_pred, n_pos, obs_rate,
        round(sq_err / CAST(SUM(n_docs) OVER () AS DOUBLE), 6) AS brier_contrib
      FROM agg"""))

  /** Cumulative-gains table: rank users into click-count deciles (the
    * q152 exact-percentile cutoffs, broadcast — never a global NTILE
    * sort) and report what share of all purchasers each score band
    * captures, cumulatively from the top — the lift chart that decides
    * whether a targeting score is worth acting on. Two model-sized
    * apply steps over the per-user rollup; all shares are exact-int
    * ratios.
    */
  val q184CumulativeGains: QueryDef = QueryDef(
    "q184_cumulative_gains",
    (s, dir) => {
      val users = EventOps.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
               .as("score"),
             max(when(col("event_type") === "purchase", 1L).otherwise(0L))
               .as("converted"))
        .localCheckpoint() // feeds the cutoff scalar and the binning pass
      val bounds = users.agg(expr(
        """percentile(score,
          |  array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"""
          .stripMargin).as("bounds"))
      val wAll = Window.partitionBy()
      val wCum = Window.partitionBy()
        .orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(bounds))
        .withColumn("band",
          expr("size(filter(bounds, b -> score > b))").cast("long"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
        .withColumn("cum_conv", sum(col("n_conv")).over(wCum))
        .withColumn("capture_rate",
          round(col("cum_conv").cast("double") /
            sum(col("n_conv")).over(wAll).cast("double"), 6))
    },
    Some("""WITH users AS (SELECT user_id,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
            AS score,
          CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
            AS converted
        FROM events GROUP BY 1),
      b AS (SELECT quantile_cont(score,
          [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds FROM users),
      banded AS (SELECT
          CAST(len(list_filter(b.bounds, y -> score > y)) AS BIGINT) AS band,
          converted
        FROM users CROSS JOIN b),
      agg AS (SELECT band, COUNT(*) AS n_users,
          CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM banded GROUP BY 1)
      SELECT band, n_users, n_conv,
        CAST(SUM(n_conv) OVER (ORDER BY band DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_conv,
        round(CAST(SUM(n_conv) OVER (ORDER BY band DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          CAST(SUM(n_conv) OVER () AS DOUBLE), 6) AS capture_rate
      FROM agg"""))

  /** Percent-of-parent revenue rollup over the region → nation
    * hierarchy: every nation reports its share of its region, every
    * region its share of the grand total — the drill-down table every
    * OLAP frontend renders. `rollup` compiles to ONE expand+hash-agg
    * pass; shares are windows keyed by grouping level over the
    * model-sized rollup result. Revenue stays exact DECIMAL until the
    * final share division.
    */
  val q185PercentOfParent: QueryDef = QueryDef(
    "q185_percent_of_parent",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
      val rolled = base
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"),
             grouping_id().as("gid"))
      val wParent = Window.partitionBy(col("gid"), col("r_name"))
      val wLevel = Window.partitionBy(col("gid"))
      rolled
        .withColumn("parent_rev",
          when(col("gid") === 0, sum(col("rev")).over(wParent))
            .otherwise(sum(col("rev")).over(wLevel)))
        .select(col("r_name"), col("n_name"), col("gid"),
          col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double") / col("parent_rev").cast("double"), 6)
            .as("share_of_parent"))
    },
    Some("""WITH base AS (SELECT r_name, n_name, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey),
      rolled AS (SELECT r_name, n_name,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
          CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid
        FROM base GROUP BY ROLLUP (r_name, n_name)),
      sh AS (SELECT *,
          CASE WHEN gid = 0
            THEN SUM(rev) OVER (PARTITION BY gid, r_name)
            ELSE SUM(rev) OVER (PARTITION BY gid) END AS parent_rev
        FROM rolled)
      SELECT r_name, n_name, gid,
        CAST(rev AS DOUBLE) AS revenue,
        round(CAST(rev AS DOUBLE) / CAST(parent_rev AS DOUBLE), 6)
          AS share_of_parent
      FROM sh"""))

  val all: Seq[QueryDef] = Seq(q182JackknifeSe, q183CalibrationBins,
    q184CumulativeGains, q185PercentOfParent)
}
