package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical signal operators over the event stream and corpus: a
  * seasonal-baseline anomaly gate, CUSUM changepoint detection, and
  * per-document n-gram novelty — the monitoring/quality family a
  * production pipeline runs beside its ETL. All three are hash-agg /
  * broadcast-join / window shapes: baselines and totals are tiny model
  * tables, the big side streams past them once.
  *
  * Double parity discipline (see q114/q117): sums are exact DECIMAL,
  * cast to DOUBLE at one node, and every subsequent double expression
  * tree is mirrored verbatim in the oracle SQL.
  */
object SignalOps {

  private val M  = DecimalType(18, 4)
  private val M2 = DecimalType(30, 8)

  /** The (event_type, hour) → (n, mean, variance) baseline model —
    * shared by q129's batch gate and the streaming anomalyGate's static
    * side (EventStream). Buckets need n ≥ 10 and positive variance
    * (degenerate baselines can't score) — 10 keeps the gate alive at the
    * smallest smoke fixture while still rejecting unsupported cells. */
  def hourBaseline(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(col("event_type"), col("hr")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(M)).cast("double").as("s"),
        sum((col("value") * col("value")).cast(M2)).cast("double").as("ss"))
      .withColumn("mean", col("s") / col("n"))
      .withColumn("variance",
        (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
      .filter(col("n") >= 10 && col("variance") > 0.0)

  /** Seasonal anomaly detection: an hour-of-day baseline (mean/variance
    * per (event_type, hour) from decimal-exact Σx, Σx²) and a z-score
    * gate over the raw events. The baseline is ≤ |types|×24 rows at ANY
    * corpus size — a broadcast model table — so the anomaly pass is one
    * linear scan; nothing about this shape changes at 100 TB.
    */
  val q129SeasonalAnomaly: QueryDef = QueryDef(
    "q129_seasonal_anomaly",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
      val base = hourBaseline(ev)
      ev.join(broadcast(base), Seq("event_type", "hr"))
        .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_obs"),
             sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L)).as("n_anomalies"))
    },
    Some("""WITH e AS (SELECT event_type, EXTRACT(hour FROM ts) AS hr, value
          FROM events),
        b AS (SELECT event_type, hr, COUNT(*) AS n,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
            CAST(SUM(CAST(value*value AS DECIMAL(30,8))) AS DOUBLE) AS ss
          FROM e GROUP BY 1, 2),
        v AS (SELECT event_type, hr, n, s/n AS mean,
            (ss - s*s/n)/(n-1) AS variance
          FROM b WHERE n >= 10 AND (ss - s*s/n)/(n-1) > 0.0)
      SELECT e.event_type, COUNT(*) AS n_obs,
        CAST(SUM(CASE WHEN abs((e.value - v.mean)/sqrt(v.variance)) > 3.0
          THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM e JOIN v USING (event_type, hr)
      GROUP BY 1"""))

  /** CUSUM changepoint detection per event type: daily decimal-exact
    * totals, the running cumulative deviation from the series mean
    * (cusum_i = Σ_{j≤i} s_j − i·μ), and the day maximizing |cusum| —
    * the classic single-changepoint estimator. One hash-agg to days
    * (bounded: days × types rows regardless of corpus size), one
    * broadcast of the per-type totals, one ordered window — the 100 TB
    * cost is the first agg's scan.
    */
  val q130CusumChangepoint: QueryDef = QueryDef(
    "q130_cusum_changepoint",
    (s, dir) => {
      val daily = EventOps.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(M)).as("s"))
      val totals = daily.groupBy(col("event_type"))
        .agg(sum(col("s")).cast("double").as("tot"),
             count(lit(1)).as("n_days"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val dev = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("run", sum(col("s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
        .join(broadcast(totals), Seq("event_type"))
        .withColumn("dev",
          abs(col("run") - col("rn") * (col("tot") / col("n_days"))))
      val pick = Window.partitionBy(col("event_type"))
        .orderBy(col("dev").desc, col("day").asc)
      dev.withColumn("pk", row_number().over(pick))
        .filter(col("pk") === 1)
        .select(col("event_type"), col("day").as("changepoint_day"),
                col("dev").as("max_abs_cusum"), col("n_days"))
    },
    Some("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
            SUM(CAST(value AS DECIMAL(18,4))) AS s
          FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(SUM(s) AS DOUBLE) AS tot,
            COUNT(*) AS n_days FROM d GROUP BY 1),
        r AS (SELECT d.event_type, d.day, t.tot, t.n_days,
            ROW_NUMBER() OVER w AS rn,
            CAST(SUM(d.s) OVER (PARTITION BY d.event_type ORDER BY d.day
              ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run
          FROM d JOIN t USING (event_type)
          WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)),
        c AS (SELECT event_type, day,
            abs(run - rn * (tot / n_days)) AS dev, n_days,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY abs(run - rn * (tot / n_days)) DESC, day ASC) AS pk
          FROM r)
      SELECT event_type, day AS changepoint_day, dev AS max_abs_cusum,
        n_days
      FROM c WHERE pk = 1"""))

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * word trigrams that occur in NO other document — the inverse of the
    * q88 duplicated-chunk ratio, and the signal that separates template
    * boilerplate from original text when curating training data. Two
    * shuffles, both keyed and linear: explode → count per trigram →
    * join back → per-doc agg. Documents under 3 tokens have no trigrams
    * and drop out (both engines).
    */
  val q131TrigramNovelty: QueryDef = QueryDef(
    "q131_trigram_novelty",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
      val tris = toks.select(col("doc_id"),
        explode(array_distinct(expr(
          """transform(sequence(0, size(toks)-3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"""
            .stripMargin))).as("tri"))
      val freq = tris.groupBy(col("tri")).agg(count(lit(1)).as("nd"))
      tris.join(freq, Seq("tri"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_trigrams"),
             sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty",
          col("n_unique").cast("double") / col("n_trigrams"))
    },
    Some("""WITH t AS (SELECT doc_id,
            regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
        g AS (SELECT doc_id, list_distinct(list_transform(
            range(0, len(toks)-2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS tris
          FROM t WHERE len(toks) >= 3),
        e AS (SELECT doc_id, unnest(tris) AS tri FROM g),
        f AS (SELECT tri, COUNT(*) AS nd FROM e GROUP BY 1)
      SELECT e.doc_id, COUNT(*) AS n_trigrams,
        CAST(SUM(CASE WHEN f.nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unique,
        CAST(SUM(CASE WHEN f.nd = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) AS novelty
      FROM e JOIN f USING (tri) GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q129SeasonalAnomaly, q130CusumChangepoint, q131TrigramNovelty)
}
