package graft.ops

import org.apache.spark.sql.functions._

/** HBOS — Histogram-Based Outlier Score (Goldstein & Dengel 2012): score
  * every order by the negated log-density of its features under
  * independent per-feature equi-width histograms; the top scores are the
  * anomaly shortlist. The assumption of feature independence is exactly
  * what makes HBOS linear-time and embarrassingly parallel — the
  * published large-scale alternative to quadratic neighborhood methods
  * (q365's LOF is the density-exact sibling; reference: overseer's
  * monitoring family, doc/guide/Monitoring.md:1).
  *
  * Features: order value in exact cents and basket size (lineitem count)
  * — one join + hash agg; histograms are 10 equi-width bins keyed by
  * exact BIGINT arithmetic, so bin ids are deterministic; the final
  * shortlist is a TakeOrdered top-20, never a global sort.
  *
  * Exactness: bins and counts BIGINT; the score is two ln terms added in
  * fixed order, round 6.
  */
object HbosOps {

  private val Bins = 10L
  private val TopK = 20

  val q551HbosOutliers: QueryDef = QueryDef(
    "q551_hbos_outliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val feats = t.orders
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
        .join(t.lineitem.groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("items")), Seq("o_orderkey"))
        .localCheckpoint() // bounds, histograms and scoring all read it
      val b = feats.agg(
        min(col("cents")).as("cmin"), max(col("cents")).as("cmax"),
        min(col("items")).as("imin"), max(col("items")).as("imax"),
        count(lit(1)).as("n"))
      val binned = feats.crossJoin(broadcast(b))
        // DIV, not "/": Spark's Column./ on BIGINTs is DOUBLE division
        .withColumn("cb", least(lit(Bins - 1),
          expr(s"(cents - cmin) * $Bins DIV (cmax - cmin + 1)")))
        .withColumn("ib", least(lit(Bins - 1),
          expr(s"(items - imin) * $Bins DIV (imax - imin + 1)")))
        .localCheckpoint()
      val ch = binned.groupBy(col("cb")).agg(count(lit(1)).as("cn"))
      val ih = binned.groupBy(col("ib")).agg(count(lit(1)).as("in_"))
      binned
        .join(broadcast(ch), Seq("cb"))
        .join(broadcast(ih), Seq("ib"))
        .select(col("o_orderkey"), col("cents"), col("items"),
          col("cb"), col("ib"),
          round(-log(col("cn").cast("double") / col("n").cast("double"))
            - log(col("in_").cast("double") / col("n").cast("double")), 6)
            .as("hbos"))
        .orderBy(col("hbos").desc, col("o_orderkey").asc)
        .limit(TopK)
    },
    Some(s"""WITH feats AS (
        SELECT o.o_orderkey,
          CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
          CAST(COUNT(*) AS BIGINT) AS items
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      b AS (
        SELECT MIN(cents) AS cmin, MAX(cents) AS cmax,
          MIN(items) AS imin, MAX(items) AS imax,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM feats),
      binned AS (
        SELECT f.*, b.n,
          LEAST(${Bins - 1}, (f.cents - b.cmin) * $Bins
            // (b.cmax - b.cmin + 1)) AS cb,
          LEAST(${Bins - 1}, (f.items - b.imin) * $Bins
            // (b.imax - b.imin + 1)) AS ib
        FROM feats f CROSS JOIN b),
      ch AS (SELECT cb, CAST(COUNT(*) AS BIGINT) AS cn
        FROM binned GROUP BY 1),
      ih AS (SELECT ib, CAST(COUNT(*) AS BIGINT) AS in_
        FROM binned GROUP BY 1)
      SELECT x.o_orderkey, x.cents, x.items, x.cb, x.ib,
        round(-ln(CAST(c.cn AS DOUBLE) / CAST(x.n AS DOUBLE))
          - ln(CAST(i.in_ AS DOUBLE) / CAST(x.n AS DOUBLE)), 6) AS hbos
      FROM binned x
      JOIN ch c ON c.cb = x.cb
      JOIN ih i ON i.ib = x.ib
      ORDER BY hbos DESC, x.o_orderkey ASC
      LIMIT $TopK"""))

  val all: Seq[QueryDef] = Seq(q551HbosOutliers)
}
