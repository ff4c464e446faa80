package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Series & ranking wave: TextRank keyword extraction (PageRank on the
  * token co-occurrence graph), an STL-style trend/seasonal/remainder
  * decomposition of daily revenue, offline binary-segmentation
  * changepoint detection by exact SSE reduction, and Kendall's τ
  * between two brand rankings.
  *
  * Scale shapes: the co-occurrence graph is vocabulary-bounded; the
  * decomposition and changepoint run on the calendar-bounded daily
  * spine (prefix sums, no per-split rescans); Kendall pairs the
  * dimension frame. Cross-engine float folds go through pre-rounded
  * DECIMAL terms.
  */
object SeriesOps {

  private val D12 = DecimalType(24, 12)

  /** TextRank keyword extraction: token co-occurrence edges within a
    * ±2 window, 3 unrolled PageRank iterations (d = 0.85) on the
    * vocabulary-bounded graph, top-10 keywords. The corpus pass is one
    * explode; everything after lives on the |V|² co-occurrence frame
    * (vocabulary-bounded at any corpus size). */
  val q334TextrankKeywords: QueryDef = QueryDef(
    "q334_textrank_keywords",
    (s, dir) => {
      // co-occurrence pairs are CONSTRUCTED from the token array (one
      // struct per (i, i+1) and (i, i+2) adjacency) — a self-join on
      // doc_id with a position-window filter evaluates |doc|² predicate
      // pairs per document (measured 70 s at sf1 vs 7 s for this form)
      val tokArr = Tables(s, dir).documents
        .select(TextOps.tokens(col("text")).as("t"))
        .localCheckpoint() // both adjacency distances read one token pass
      def adj(d: Int) = tokArr.filter(size(col("t")) >= d + 1)
        .select(explode(expr(
          s"transform(sequence(1, size(t) - $d), i -> struct(element_at(t, i) as u, element_at(t, i + $d) as v))"))
          .as("e"))
        .select(col("e.u"), col("e.v"))
      val edges = adj(1).unionAll(adj(2)).filter(col("u") =!= col("v"))
      val und = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        .localCheckpoint() // vocabulary-bounded adjacency
      val outW = und.groupBy(col("u")).agg(sum(col("w")).as("wout"))
      val nodes = und.select(col("u").as("token")).distinct().localCheckpoint()
      val nV = broadcast(nodes.agg(count(lit(1)).as("n_v")))
      val norm = und.join(broadcast(outW), Seq("u"))
        .select(col("u"), col("v"),
          round(col("w").cast("double") / col("wout"), 9).as("p"))
        .localCheckpoint()
      def step(rank: DataFrame): DataFrame =
        norm.join(rank.withColumnRenamed("token", "u"), Seq("u"))
          .withColumn("term", round(col("p") * col("r"), 12).cast(D12))
          .groupBy(col("v").as("token"))
          .agg(sum(col("term")).cast("double").as("carry"))
          .join(nodes, Seq("token"), "right")
          .crossJoin(nV)
          .select(col("token"),
            (lit(0.15) / col("n_v") + lit(0.85) * coalesce(col("carry"), lit(0.0)))
              .as("r"))
      val r0 = nodes.crossJoin(nV)
        .select(col("token"), (lit(1.0) / col("n_v")).as("r"))
      val r3 = (1 to 3).foldLeft(r0)((r, _) => step(r))
      // top-10 via distributed TakeOrdered; the rank window then runs
      // over 10 rows, never the corpus-growing token frame (r15)
      r3.orderBy(col("r").desc, col("token").asc).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("r").desc, col("token").asc)).cast("long"))
        .select(col("rk"), col("token"), round(col("r"), 6).as("score"))
        .orderBy(col("rk"))
    },
    Some("""WITH toks AS (SELECT doc_id, t.pos, t.token
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS arr
          FROM documents),
          LATERAL (SELECT UNNEST(generate_series(1, len(arr))) AS pos,
            UNNEST(arr) AS token) t),
      edges AS (SELECT a.token AS u, b.token AS v
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id
          AND b.pos > a.pos AND b.pos <= a.pos + 2 AND a.token <> b.token),
      und AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w FROM (
          SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges)
        GROUP BY 1, 2),
      outw AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wout FROM und GROUP BY 1),
      nodes AS (SELECT DISTINCT u AS token FROM und),
      nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_v FROM nodes),
      norm AS (SELECT und.u, und.v,
          round(CAST(und.w AS DOUBLE) / outw.wout, 9) AS p
        FROM und JOIN outw USING (u)),
      r0 AS (SELECT token, 1.0 / nv.n_v AS r FROM nodes, nv),
      r1 AS (SELECT n.token,
          0.15 / nv.n_v + 0.85 * COALESCE(c.carry, 0) AS r
        FROM nodes n CROSS JOIN nv
        LEFT JOIN (SELECT norm.v AS token,
            CAST(SUM(CAST(round(norm.p * r0.r, 12) AS DECIMAL(24,12))) AS DOUBLE)
              AS carry
          FROM norm JOIN r0 ON r0.token = norm.u GROUP BY 1) c USING (token)),
      r2 AS (SELECT n.token,
          0.15 / nv.n_v + 0.85 * COALESCE(c.carry, 0) AS r
        FROM nodes n CROSS JOIN nv
        LEFT JOIN (SELECT norm.v AS token,
            CAST(SUM(CAST(round(norm.p * r1.r, 12) AS DECIMAL(24,12))) AS DOUBLE)
              AS carry
          FROM norm JOIN r1 ON r1.token = norm.u GROUP BY 1) c USING (token)),
      r3 AS (SELECT n.token,
          0.15 / nv.n_v + 0.85 * COALESCE(c.carry, 0) AS r
        FROM nodes n CROSS JOIN nv
        LEFT JOIN (SELECT norm.v AS token,
            CAST(SUM(CAST(round(norm.p * r2.r, 12) AS DECIMAL(24,12))) AS DOUBLE)
              AS carry
          FROM norm JOIN r2 ON r2.token = norm.u GROUP BY 1) c USING (token))
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, token) AS BIGINT) AS rk,
        token, round(r, 6) AS score
      FROM r3 QUALIFY rk <= 10 ORDER BY rk"""))

  /** STL-style decomposition of daily revenue: trend = centered 7-day
    * moving average (exact DECIMAL window), seasonal = weekday mean of
    * the detrended series, remainder = the rest; reports per-component
    * variance shares — how much of revenue is trend, how much weekly
    * rhythm, how much noise. Everything on the daily spine. */
  val q335StlDecomposition: QueryDef = QueryDef(
    "q335_stl_decomposition",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
        .withColumn("d", datediff(col("day"), lit("1992-01-01")).cast("long"))
        .withColumn("dow", pmod(col("d"), lit(7L)))
        .localCheckpoint()
      val wMa = Window.orderBy(col("d")).rowsBetween(-3, 3)
      val trended = daily
        .withColumn("n_win", count(lit(1)).over(wMa))
        .withColumn("trend",
          sum(col("rev")).over(wMa).cast("double") / col("n_win"))
        .filter(col("n_win") === 7) // full windows only — no edge bias
        .withColumn("detrended",
          round(col("rev").cast("double") - col("trend"), 6))
        .localCheckpoint()
      val seasonal = trended.groupBy(col("dow"))
        .agg((sum(round(col("detrended"), 6).cast(DecimalType(24, 6)))
          .cast("double") / count(lit(1))).as("seas"))
      val parts = trended.join(broadcast(seasonal), Seq("dow"))
        .withColumn("remainder",
          round(col("detrended") - col("seas"), 6))
      def varOf(c: String) = {
        val x = round(col(c), 6).cast(DecimalType(24, 6))
        (sum(x * x).cast("double") / count(lit(1))) -
          (sum(x).cast("double") / count(lit(1))) *
          (sum(x).cast("double") / count(lit(1)))
      }
      parts
        .withColumn("revd", col("rev").cast("double"))
        .agg(count(lit(1)).as("n_days"),
          round(varOf("revd"), 2).as("var_total"),
          round(varOf("trend"), 2).as("var_trend"),
          round(varOf("detrended"), 2).as("var_detrended"),
          round(varOf("remainder"), 2).as("var_remainder"))
        .withColumn("trend_share",
          round(lit(1.0) - col("var_detrended") / col("var_total"), 6))
        .withColumn("seasonal_share",
          round((col("var_detrended") - col("var_remainder")) / col("var_total"), 6))
        .select(col("n_days"), col("var_total"), col("var_trend"),
          col("var_remainder"), col("trend_share"), col("seasonal_share"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
          CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS d
        FROM orders GROUP BY 1, 3),
      dd AS (SELECT *, d % 7 AS dow FROM daily),
      ma AS (SELECT *, COUNT(*) OVER w AS n_win,
          CAST(SUM(rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend
        FROM dd WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tr AS (SELECT *, round(CAST(rev AS DOUBLE) - trend, 6) AS detrended
        FROM ma WHERE n_win = 7),
      seas AS (SELECT dow,
          CAST(SUM(CAST(round(detrended, 6) AS DECIMAL(24,6))) AS DOUBLE)
            / COUNT(*) AS seas
        FROM tr GROUP BY 1),
      parts AS (SELECT tr.*, seas.seas,
          round(tr.detrended - seas.seas, 6) AS remainder,
          CAST(tr.rev AS DOUBLE) AS revd
        FROM tr JOIN seas USING (dow)),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          round(CAST(SUM(CAST(round(revd,6) AS DECIMAL(24,6)) * CAST(round(revd,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
            - (CAST(SUM(CAST(round(revd,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(CAST(round(revd,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)), 2) AS var_total,
          round(CAST(SUM(CAST(round(trend,6) AS DECIMAL(24,6)) * CAST(round(trend,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
            - (CAST(SUM(CAST(round(trend,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(CAST(round(trend,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)), 2) AS var_trend,
          round(CAST(SUM(CAST(round(detrended,6) AS DECIMAL(24,6)) * CAST(round(detrended,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
            - (CAST(SUM(CAST(round(detrended,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(CAST(round(detrended,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)), 2) AS var_detrended,
          round(CAST(SUM(CAST(round(remainder,6) AS DECIMAL(24,6)) * CAST(round(remainder,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)
            - (CAST(SUM(CAST(round(remainder,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(CAST(round(remainder,6) AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*)), 2) AS var_remainder
        FROM parts)
      SELECT n_days, var_total, var_trend, var_remainder,
        round(1.0 - var_detrended / var_total, 6) AS trend_share,
        round((var_detrended - var_remainder) / var_total, 6) AS seasonal_share
      FROM agg"""))

  /** Offline changepoint by binary segmentation: the split day that
    * maximizes the between-segment SSE reduction of daily order counts,
    * found in ONE pass from prefix sums (gain(t) = n_L·n_R/n·(μ_L−μ_R)²
    * — no per-split rescan). Reports the argmax split, its gain, and
    * the two segment means — the offline complement of q130's CUSUM. */
  val q336BinsegChangepoint: QueryDef = QueryDef(
    "q336_binseg_changepoint",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("y"))
      val wCum = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w = Window.partitionBy()
      val gains = daily
        .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
        .withColumn("s_cum", sum(col("y")).over(wCum))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s_tot", sum(col("y")).over(w))
        .filter(col("i") < col("n"))
        .withColumn("mu_l", col("s_cum").cast("double") / col("i"))
        .withColumn("mu_r", (col("s_tot") - col("s_cum")).cast("double") /
          (col("n") - col("i")))
        .withColumn("gain", round(
          col("i").cast("double") * (col("n") - col("i")) / col("n") *
            (col("mu_l") - col("mu_r")) * (col("mu_l") - col("mu_r")), 6))
      gains
        .withColumn("rk", row_number().over(
          Window.orderBy(col("gain").desc, col("day").asc)))
        .filter(col("rk") === 1)
        .select(col("day").as("split_day"), col("i").as("n_left"),
          (col("n") - col("i")).as("n_right"),
          round(col("mu_l"), 6).as("mean_left"),
          round(col("mu_r"), 6).as("mean_right"), col("gain"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS y FROM orders GROUP BY 1),
      cum AS (SELECT day, y,
          CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
          CAST(SUM(y) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_cum,
          CAST(COUNT(*) OVER () AS BIGINT) AS n,
          CAST(SUM(y) OVER () AS BIGINT) AS s_tot
        FROM daily),
      gains AS (SELECT *, CAST(s_cum AS DOUBLE) / i AS mu_l,
          CAST(s_tot - s_cum AS DOUBLE) / (n - i) AS mu_r,
          round(CAST(i AS DOUBLE) * (n - i) / n *
            (CAST(s_cum AS DOUBLE) / i - CAST(s_tot - s_cum AS DOUBLE) / (n - i))
            * (CAST(s_cum AS DOUBLE) / i - CAST(s_tot - s_cum AS DOUBLE) / (n - i)),
            6) AS gain
        FROM cum WHERE i < n)
      SELECT day AS split_day, i AS n_left, n - i AS n_right,
        round(mu_l, 6) AS mean_left, round(mu_r, 6) AS mean_right, gain
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gain DESC, day) AS rk
        FROM gains) WHERE rk = 1"""))

  /** Kendall's τ-b between two brand rankings — by total revenue vs by
    * total quantity: exact concordant/discordant/tie counts over brand
    * pairs (dimension-bounded), with the tie-corrected denominator.
    * Answers "do the two rankings tell the same story" with the
    * rank-correlation the Mann-Kendall test (q255) builds on. */
  val q337KendallTau: QueryDef = QueryDef(
    "q337_kendall_tau",
    (s, dir) => {
      val M = DecimalType(22, 4)
      val brands = Tables(s, dir).lineitem
        .join(broadcast(Tables(s, dir).part),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(M)).as("rev"),
          sum(col("l_quantity").cast(M)).as("qty"))
        .localCheckpoint() // both pair sides
      val a = brands.select(col("brand").as("ba"), col("rev").as("ra"),
        col("qty").as("qa"))
      val b = brands.select(col("brand").as("bb"), col("rev").as("rb"),
        col("qty").as("qb"))
      a.join(b, col("ba") < col("bb"))
        .withColumn("sr", signum((col("ra") - col("rb")).cast("double")))
        .withColumn("sq", signum((col("qa") - col("qb")).cast("double")))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("sr") * col("sq") > 0).cast("long")).as("concordant"),
          sum((col("sr") * col("sq") < 0).cast("long")).as("discordant"),
          sum((col("sr") === 0).cast("long")).as("ties_rev"),
          sum((col("sq") === 0).cast("long")).as("ties_qty"))
        .withColumn("tau", round(
          (col("concordant") - col("discordant")).cast("double") /
            sqrt((col("n_pairs") - col("ties_rev")).cast("double") *
              (col("n_pairs") - col("ties_qty")).cast("double")), 6))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          col("ties_rev"), col("ties_qty"), col("tau"))
    },
    Some("""WITH brands AS (SELECT p.p_brand AS brand,
          SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,4))) AS rev,
          SUM(CAST(l_quantity AS DECIMAL(22,4))) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1),
      pairs AS (SELECT sign(CAST(a.rev - b.rev AS DOUBLE)) AS sr,
          sign(CAST(a.qty - b.qty AS DOUBLE)) AS sq
        FROM brands a JOIN brands b ON a.brand < b.brand),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CASE WHEN sr * sq > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
          CAST(SUM(CASE WHEN sr * sq < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
          CAST(SUM(CASE WHEN sr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_rev,
          CAST(SUM(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_qty
        FROM pairs)
      SELECT n_pairs, concordant, discordant, ties_rev, ties_qty,
        round(CAST(concordant - discordant AS DOUBLE) /
          sqrt(CAST(n_pairs - ties_rev AS DOUBLE)
            * CAST(n_pairs - ties_qty AS DOUBLE)), 6) AS tau
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q334TextrankKeywords, q335StlDecomposition,
    q336BinsegChangepoint, q337KendallTau)
}
