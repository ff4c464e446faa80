package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Allocation & selection wave: the UCB1 bandit allocation audit over
  * logged arms, and mRMR greedy feature selection over an MI grid.
  *
  * Scale shapes: q376 is one conditional aggregation per arm + 1-row
  * total broadcast; q377 computes its 2×2 contingencies in one scan
  * per pair (all model-sized frames) and runs the greedy on the
  * collected 7×7 MI matrix — the q342/q230 driver-bounded-loop idiom.
  */
object SelectOps {

  private val dec = DecimalType(28, 10)

  /** UCB1 allocation audit (Auer, Cesa-Bianchi & Fischer 2002) of the
    * logged event stream as a bandit history: arms = event types,
    * reward = the event's value clearing 100. Per arm: pulls, exact
    * mean reward, the UCB1 index mean + √(2·ln N / n) (what an optimist
    * would explore next), the suboptimality gap Δ to the best arm, the
    * logarithmic bound 8·ln N/Δ on how many pulls UCB1 would have
    * wasted there, and the realized regret n·Δ of the logged policy —
    * the audit that says whether logging traffic was allocated anywhere
    * near optimally. Means ride DECIMAL sums; ln/√ doubles are single
    * expressions rounded at 6. */
  val q376UcbAllocation: QueryDef = QueryDef(
    "q376_ucb_allocation",
    (s, dir) => {
      val arms = EventOps.events(s, dir)
        .select(col("event_type"),
          when(col("value") > 100.0, 1L).otherwise(0L).as("r"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pulls"), sum(col("r")).as("sr"))
        .withColumn("mean_reward", col("sr").cast("double") / col("n_pulls"))
        .localCheckpoint() // feeds the totals and the per-arm report
      val tot = arms.agg(sum(col("n_pulls")).as("n_total"),
        max(col("mean_reward")).as("best_mean"))
      arms.crossJoin(tot)
        .withColumn("gap", col("best_mean") - col("mean_reward"))
        .select(col("event_type"), col("n_pulls"),
          round(col("mean_reward"), 6).as("mean_reward"),
          round(col("mean_reward") +
            sqrt(lit(2.0) * log(col("n_total").cast("double")) /
              col("n_pulls").cast("double")), 6).as("ucb_index"),
          round(col("gap"), 6).as("gap"),
          when(col("gap") > 0, round(lit(8.0) *
            log(col("n_total").cast("double")) / col("gap"), 2))
            .otherwise(lit(null).cast("double")).as("ucb_pull_bound"),
          round(col("n_pulls") * col("gap"), 2).as("realized_regret"))
        .orderBy(col("event_type"))
    },
    Some("""WITH arms AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pulls,
          CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS mean_reward
        FROM events GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS n_total,
          MAX(mean_reward) AS best_mean FROM arms)
      SELECT event_type, n_pulls, round(mean_reward, 6) AS mean_reward,
        round(mean_reward + sqrt(2.0 * ln(CAST(n_total AS DOUBLE))
          / CAST(n_pulls AS DOUBLE)), 6) AS ucb_index,
        round(best_mean - mean_reward, 6) AS gap,
        CASE WHEN best_mean - mean_reward > 0
          THEN round(8.0 * ln(CAST(n_total AS DOUBLE)) / (best_mean - mean_reward), 2)
          END AS ucb_pull_bound,
        round(n_pulls * (best_mean - mean_reward), 2) AS realized_regret
      FROM arms CROSS JOIN tot
      ORDER BY event_type"""))

  private val feats = Seq("f_price", "f_urgent", "f_h1", "f_even", "f_early", "f_mod3")

  /** mRMR greedy feature selection (Peng, Long & Ding 2005 — maximum
    * relevance, minimum redundancy): six binary order features scored
    * by MI against the 'order finalized' label; selection picks, four
    * times, the feature maximizing MI(f; y) − mean_{s∈S} MI(f; s).
    * All 21 MIs come from 2×2 contingencies (the q272 term discipline)
    * in one scan; the greedy runs over the collected 7×7 matrix — a
    * driver-bounded model-sized loop (the q342/q230 idiom), with the
    * oracle unrolling the identical four rounds in SQL. The output is
    * the selection ORDER with each round's relevance/redundancy split —
    * the feature-budget planning table. */
  val q377MrmrFeatures: QueryDef = QueryDef(
    "q377_mrmr_features",
    (s, dir) => {
      val base = Tables(s, dir).orders.select(
          (col("o_totalprice") > 150000.0).cast("long").as("f_price"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").as("f_urgent"),
          (month(col("o_orderdate")) <= 6).cast("long").as("f_h1"),
          (pmod(col("o_custkey"), lit(2)) === 0).cast("long").as("f_even"),
          (dayofmonth(col("o_orderdate")) <= 15).cast("long").as("f_early"),
          (pmod(col("o_orderkey"), lit(3)) === 0).cast("long").as("f_mod3"),
          (col("o_orderstatus") === "F").cast("long").as("y"))
        .localCheckpoint() // one scan feeds all 21 contingencies
      val all = feats :+ "y"
      // all 21 contingencies in ONE pass: melt each row into its pair
      // structs, a single shuffle on (a, b, va, vb) — 21 separate
      // aggregation jobs measured 3.7 s at sf0.1, this shape 0.6 s
      val pairCols = for { a <- all; b <- all if a < b } yield
        struct(lit(a).as("a"), lit(b).as("b"), col(a).as("va"), col(b).as("vb"))
      val cells = base.select(explode(array(pairCols: _*)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"),
          col("p.va").as("va"), col("p.vb").as("vb"))
        .agg(count(lit(1)).as("nab"))
      val grid = cells
        .withColumn("n", sum(col("nab")).over(
          Window.partitionBy(col("a"), col("b"))))
        .withColumn("na", sum(col("nab")).over(
          Window.partitionBy(col("a"), col("b"), col("va"))))
        .withColumn("nb", sum(col("nab")).over(
          Window.partitionBy(col("a"), col("b"), col("vb"))))
        .withColumn("term", round(col("nab").cast("double") / col("n") *
          log((col("nab").cast("double") * col("n")) / (col("na") * col("nb"))), 12))
        .groupBy(col("a"), col("b")).agg(round(sum(col("term")), 6).as("mi"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      def m(a: String, b: String): Double =
        if (a < b) grid((a, b)) else grid((b, a))
      // greedy mRMR over the model-sized matrix (driver-bounded loop)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
      while (sel.length < 4) {
        val chosen = feats.filterNot(f => sel.exists(_._1 == f)).map { f =>
          val red = if (sel.isEmpty) 0.0
            else BigDecimal(sel.map(t => m(f, t._1)).sum / sel.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (f, m(f, "y"), red)
        }.maxBy { case (f, rel, red) =>
          (BigDecimal(rel - red).setScale(6, BigDecimal.RoundingMode.HALF_UP), f)
        }(Ordering.Tuple2(Ordering[BigDecimal], Ordering[String].reverse))
        sel += chosen
      }
      val rows = sel.zipWithIndex.map { case ((f, rel, red), i) =>
        (i + 1L, f, rel, red,
          BigDecimal(rel - red).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
      s.createDataFrame(rows)
        .toDF("rank", "feature", "relevance", "redundancy", "mrmr_score")
        .orderBy(col("rank"))
    },
    Some("""WITH base AS (SELECT
          CAST(o_totalprice > 150000.0 AS BIGINT) AS f_price,
          CAST(o_orderpriority IN ('1-URGENT','2-HIGH') AS BIGINT) AS f_urgent,
          CAST(month(o_orderdate) <= 6 AS BIGINT) AS f_h1,
          CAST(o_custkey % 2 = 0 AS BIGINT) AS f_even,
          CAST(day(o_orderdate) <= 15 AS BIGINT) AS f_early,
          CAST(o_orderkey % 3 = 0 AS BIGINT) AS f_mod3,
          CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders),
      names AS (SELECT UNNEST(['f_price','f_urgent','f_h1','f_even','f_early','f_mod3','y']) AS c),
      vals AS (SELECT l.c AS a, r.c AS b,
          CASE l.c WHEN 'f_price' THEN base.f_price WHEN 'f_urgent' THEN base.f_urgent
            WHEN 'f_h1' THEN base.f_h1 WHEN 'f_even' THEN base.f_even
            WHEN 'f_early' THEN base.f_early WHEN 'f_mod3' THEN base.f_mod3
            ELSE base.y END AS va,
          CASE r.c WHEN 'f_price' THEN base.f_price WHEN 'f_urgent' THEN base.f_urgent
            WHEN 'f_h1' THEN base.f_h1 WHEN 'f_even' THEN base.f_even
            WHEN 'f_early' THEN base.f_early WHEN 'f_mod3' THEN base.f_mod3
            ELSE base.y END AS vb
        FROM base CROSS JOIN names l CROSS JOIN names r WHERE l.c < r.c),
      cells AS (SELECT a, b, va, vb, COUNT(*) AS nab FROM vals GROUP BY 1, 2, 3, 4),
      cellsw AS (SELECT a, b, nab,
          SUM(nab) OVER (PARTITION BY a, b) AS n,
          SUM(nab) OVER (PARTITION BY a, b, va) AS na,
          SUM(nab) OVER (PARTITION BY a, b, vb) AS nb
        FROM cells),
      mi AS (SELECT a, b, round(SUM(round(CAST(nab AS DOUBLE) / n
            * ln(CAST(nab AS DOUBLE) * n / (na * nb)), 12)), 6) AS mi
        FROM cellsw GROUP BY 1, 2),
      rel AS (SELECT a AS f, mi FROM mi WHERE b = 'y'),
      red AS (SELECT a, b, mi FROM mi WHERE b <> 'y'),
      s1 AS (SELECT f, mi AS rel, 0.0 AS redv FROM rel ORDER BY round(mi, 6) DESC, f LIMIT 1),
      s2 AS (SELECT r.f, r.mi AS rel,
          round((SELECT mi FROM red WHERE (a = r.f AND b = (SELECT f FROM s1))
              OR (b = r.f AND a = (SELECT f FROM s1))), 6) AS redv
        FROM rel r WHERE r.f NOT IN (SELECT f FROM s1)
        ORDER BY round(r.mi - round((SELECT mi FROM red
            WHERE (a = r.f AND b = (SELECT f FROM s1))
              OR (b = r.f AND a = (SELECT f FROM s1))), 6), 6) DESC, r.f LIMIT 1),
      s3 AS (SELECT r.f, r.mi AS rel,
          round((SELECT AVG(mi) FROM red, (SELECT f FROM s1 UNION ALL SELECT f FROM s2) ss(sf)
            WHERE (a = r.f AND b = sf) OR (b = r.f AND a = sf)), 6) AS redv
        FROM rel r WHERE r.f NOT IN (SELECT f FROM s1 UNION ALL SELECT f FROM s2)
        ORDER BY round(r.mi - round((SELECT AVG(mi) FROM red,
            (SELECT f FROM s1 UNION ALL SELECT f FROM s2) ss(sf)
            WHERE (a = r.f AND b = sf) OR (b = r.f AND a = sf)), 6), 6) DESC, r.f LIMIT 1),
      s4 AS (SELECT r.f, r.mi AS rel,
          round((SELECT AVG(mi) FROM red,
            (SELECT f FROM s1 UNION ALL SELECT f FROM s2 UNION ALL SELECT f FROM s3) ss(sf)
            WHERE (a = r.f AND b = sf) OR (b = r.f AND a = sf)), 6) AS redv
        FROM rel r WHERE r.f NOT IN
          (SELECT f FROM s1 UNION ALL SELECT f FROM s2 UNION ALL SELECT f FROM s3)
        ORDER BY round(r.mi - round((SELECT AVG(mi) FROM red,
            (SELECT f FROM s1 UNION ALL SELECT f FROM s2 UNION ALL SELECT f FROM s3) ss(sf)
            WHERE (a = r.f AND b = sf) OR (b = r.f AND a = sf)), 6), 6) DESC, r.f LIMIT 1)
      SELECT CAST(rk AS BIGINT) AS rank, f AS feature, round(rel, 6) AS relevance,
        round(redv, 6) AS redundancy, round(round(rel, 6) - round(redv, 6), 6) AS mrmr_score
      FROM (SELECT 1 AS rk, * FROM s1 UNION ALL SELECT 2, * FROM s2
        UNION ALL SELECT 3, * FROM s3 UNION ALL SELECT 4, * FROM s4)
      ORDER BY rank"""))

  val all: Seq[QueryDef] = Seq(q376UcbAllocation, q377MrmrFeatures)
}
