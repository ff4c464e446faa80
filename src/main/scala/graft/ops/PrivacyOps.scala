package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Privacy-audit wave, completing q261 (k-anonymity) and q264 (DP count
  * release) into the full anonymization toolkit: l-diversity and
  * t-closeness over the same quasi-identifier classes, a
  * differentially-private histogram with measured utility, and the
  * randomized-response estimator with its bias correction.
  *
  * Scale shapes: every operator is one or two hash aggregations over
  * the quasi-identifier classes (cardinality-bounded) plus model-sized
  * audit math; the DP noise is md5-seeded so both engines draw the
  * identical noise vector.
  */
object PrivacyOps {

  /** Quasi-identifier classes shared with q261: (nation, balance band,
    * segment). */
  private def classes(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).customer
      .select(col("c_custkey"), col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"),
        col("c_mktsegment").as("seg"))

  private val classesSql =
    """classes AS (SELECT c_custkey, c_nationkey AS nat,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
        c_mktsegment AS seg
      FROM customer)"""

  /** l-diversity audit: within each quasi-identifier equivalence class,
    * how many DISTINCT sensitive values (order priority of the
    * customer's orders) appear? Reports the class-size-weighted share
    * of records in classes below l = 3 — the attribute-disclosure
    * companion to q261's k-anonymity. Two hash aggregations. */
  val q326LDiversity: QueryDef = QueryDef(
    "q326_l_diversity",
    (s, dir) => {
      val sensitive = classes(s, dir)
        .join(Tables(s, dir).orders.select(col("o_custkey"),
          col("o_orderpriority").as("sv")), col("c_custkey") === col("o_custkey"))
      val byClass = sensitive.groupBy(col("nat"), col("band"), col("seg"))
        .agg(count(lit(1)).as("n_records"), countDistinct(col("sv")).as("l"))
      val w = Window.partitionBy()
      byClass.agg(
        count(lit(1)).as("n_classes"),
        sum(col("n_records")).as("n_records"),
        min(col("l")).as("l_min"),
        sum(when(col("l") < 3, col("n_records")).otherwise(0L)).as("at_risk"))
        .select(col("n_classes"), col("n_records"), col("l_min"),
          col("at_risk"),
          round(col("at_risk").cast("double") / col("n_records"), 6)
            .as("at_risk_share"))
    },
    Some(s"""WITH $classesSql,
      sens AS (SELECT c.nat, c.band, c.seg, o.o_orderpriority AS sv
        FROM classes c JOIN orders o ON c.c_custkey = o.o_custkey),
      byclass AS (SELECT nat, band, seg, CAST(COUNT(*) AS BIGINT) AS n_records,
          CAST(COUNT(DISTINCT sv) AS BIGINT) AS l
        FROM sens GROUP BY 1, 2, 3)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(n_records) AS BIGINT) AS n_records,
        CAST(MIN(l) AS BIGINT) AS l_min,
        CAST(SUM(CASE WHEN l < 3 THEN n_records ELSE 0 END) AS BIGINT) AS at_risk,
        round(CAST(SUM(CASE WHEN l < 3 THEN n_records ELSE 0 END) AS DOUBLE)
          / SUM(n_records), 6) AS at_risk_share
      FROM byclass"""))

  /** Differentially-private histogram release: the per-nation customer
    * counts get md5-seeded Laplace(1/ε) noise (ε = 0.5, inverse-CDF
    * from a deterministic uniform, the q264 mechanism) and are clamped
    * at zero; utility is reported per bin (true, released, abs error)
    * plus the L1 error the analyst actually suffers. One aggregation;
    * the noise math runs on the |nations| frame. */
  val q327DpHistogram: QueryDef = QueryDef(
    "q327_dp_histogram",
    (s, dir) => {
      val eps = 0.5
      val hist = Tables(s, dir).customer
        .groupBy(col("c_nationkey").as("nat")).agg(count(lit(1)).as("true_n"))
        .withColumn("u",
          (conv(substring(md5(concat(lit("dphist:"), col("nat"))), 1, 8), 16, 10)
            .cast("double") + 0.5) / 4294967296.0 - 0.5)
        .withColumn("noise", round(
          -signum(col("u")) * log(lit(1.0) - lit(2.0) * abs(col("u"))) / eps, 6))
        .withColumn("released",
          greatest(round(col("true_n") + col("noise")), lit(0.0)).cast("long"))
      hist
        .withColumn("abs_err", abs(col("released") - col("true_n")))
        .withColumn("l1_total", sum(col("abs_err")).over(Window.partitionBy()))
        .select(col("nat"), col("true_n"), col("released"), col("abs_err"),
          col("l1_total"))
        .orderBy(col("nat"))
    },
    Some("""WITH hist AS (SELECT c_nationkey AS nat, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM customer GROUP BY 1),
      nz AS (SELECT nat, true_n,
          (('0x' || substr(md5('dphist:' || nat), 1, 8))::BIGINT + 0.5)
            / 4294967296.0 - 0.5 AS u
        FROM hist),
      rel AS (SELECT nat, true_n,
          round(-sign(u) * ln(1.0 - 2.0 * abs(u)) / 0.5, 6) AS noise
        FROM nz),
      rr AS (SELECT nat, true_n,
          CAST(greatest(round(true_n + noise), 0.0) AS BIGINT) AS released
        FROM rel)
      SELECT nat, true_n, released,
        abs(released - true_n) AS abs_err,
        CAST(SUM(abs(released - true_n)) OVER () AS BIGINT) AS l1_total
      FROM rr ORDER BY nat"""))

  /** Randomized response (Warner): each customer reports their true
    * "high balance" bit with probability p = 0.75, else the flipped
    * bit (md5-coin), and the analyst recovers the population rate via
    * the unbiased estimator (p̂_obs + p − 1)/(2p − 1). Reports the true
    * rate, observed rate, corrected estimate, and the error — the
    * plausible-deniability mechanism audited end to end. One
    * projection + one aggregation. */
  val q328RandomizedResponse: QueryDef = QueryDef(
    "q328_randomized_response",
    (s, dir) => {
      val p = 0.75
      val resp = Tables(s, dir).customer
        .withColumn("truth", (col("c_acctbal") > 5000.0).cast("long"))
        .withColumn("keep",
          (conv(substring(md5(concat(lit("rr:"), col("c_custkey"))), 1, 8), 16, 10)
            .cast("double") / 4294967296.0) < p)
        .withColumn("report",
          when(col("keep"), col("truth")).otherwise(lit(1L) - col("truth")))
      resp.agg(count(lit(1)).as("n"),
        sum(col("truth")).as("n_true"),
        sum(col("report")).as("n_reported"))
        .withColumn("true_rate", col("n_true").cast("double") / col("n"))
        .withColumn("obs_rate", col("n_reported").cast("double") / col("n"))
        .withColumn("est_rate",
          (col("obs_rate") + lit(p) - 1.0) / (lit(2.0) * p - 1.0))
        .select(col("n"), round(col("true_rate"), 6).as("true_rate"),
          round(col("obs_rate"), 6).as("obs_rate"),
          round(col("est_rate"), 6).as("est_rate"),
          round(abs(col("est_rate") - col("true_rate")), 6).as("abs_err"))
    },
    Some("""WITH resp AS (SELECT
          CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END AS truth,
          (('0x' || substr(md5('rr:' || c_custkey), 1, 8))::BIGINT
            / 4294967296.0) < 0.75 AS keep
        FROM customer),
      rr AS (SELECT truth,
          CASE WHEN keep THEN truth ELSE 1 - truth END AS report FROM resp),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(truth) AS BIGINT) AS n_true,
          CAST(SUM(report) AS BIGINT) AS n_reported
        FROM rr),
      fin AS (SELECT n, CAST(n_true AS DOUBLE) / n AS true_rate,
          CAST(n_reported AS DOUBLE) / n AS obs_rate
        FROM agg)
      SELECT n, round(true_rate, 6) AS true_rate, round(obs_rate, 6) AS obs_rate,
        round((obs_rate + 0.75 - 1.0) / 0.5, 6) AS est_rate,
        round(abs((obs_rate + 0.75 - 1.0) / 0.5 - true_rate), 6) AS abs_err
      FROM fin"""))

  /** t-closeness audit: the distance between each quasi-identifier
    * class's sensitive-value distribution (order priority, an ordered
    * attribute) and the global distribution, as the Earth Mover's
    * Distance over the ordered categories (= mean |cumulative
    * difference|). Reports the worst class and the share of records in
    * classes with EMD > t = 0.2 — the distribution-disclosure audit
    * k-anonymity and l-diversity both miss. Runs on the class ×
    * 5-priority frame. */
  val q329TCloseness: QueryDef = QueryDef(
    "q329_t_closeness",
    (s, dir) => {
      val sens = classes(s, dir)
        .join(Tables(s, dir).orders.select(col("o_custkey"),
          col("o_orderpriority").as("sv")), col("c_custkey") === col("o_custkey"))
        .localCheckpoint() // feeds the class cells AND the global marginal
      val cells = sens.groupBy(col("nat"), col("band"), col("seg"), col("sv"))
        .agg(count(lit(1)).as("c"))
      val classTot = cells.groupBy(col("nat"), col("band"), col("seg"))
        .agg(sum(col("c")).as("n_class"))
      val global = broadcast(sens.groupBy(col("sv")).agg(count(lit(1)).as("g"))
        .withColumn("n_all", sum(col("g")).over(Window.partitionBy()))
        .select(col("sv"), (col("g").cast("double") / col("n_all")).as("p_global")))
      // complete the class × priority grid so absent cells count as 0
      val grid = classTot.crossJoin(broadcast(global.select(col("sv"), col("p_global"))))
        .join(cells, Seq("nat", "band", "seg", "sv"), "left")
        .withColumn("p_class",
          coalesce(col("c"), lit(0L)).cast("double") / col("n_class"))
      val wCum = Window.partitionBy(col("nat"), col("band"), col("seg"))
        .orderBy(col("sv").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val emd = grid
        .withColumn("cum_diff",
          sum(round(col("p_class") - col("p_global"), 9)
            .cast(DecimalType(20, 9))).over(wCum))
        .groupBy(col("nat"), col("band"), col("seg"), col("n_class"))
        .agg(round((sum(abs(col("cum_diff"))).cast("double") / count(lit(1))), 6)
          .as("emd"))
      val w = Window.partitionBy()
      emd.agg(count(lit(1)).as("n_classes"),
        sum(col("n_class")).as("n_records"),
        round(max(col("emd")), 6).as("emd_max"),
        sum(when(col("emd") > 0.2, col("n_class")).otherwise(0L)).as("at_risk"))
        .select(col("n_classes"), col("n_records"), col("emd_max"),
          col("at_risk"),
          round(col("at_risk").cast("double") / col("n_records"), 6)
            .as("at_risk_share"))
    },
    Some(s"""WITH $classesSql,
      sens AS (SELECT c.nat, c.band, c.seg, o.o_orderpriority AS sv
        FROM classes c JOIN orders o ON c.c_custkey = o.o_custkey),
      cells AS (SELECT nat, band, seg, sv, CAST(COUNT(*) AS BIGINT) AS c
        FROM sens GROUP BY 1, 2, 3, 4),
      ctot AS (SELECT nat, band, seg, CAST(SUM(c) AS BIGINT) AS n_class
        FROM cells GROUP BY 1, 2, 3),
      gdist AS (SELECT sv, CAST(COUNT(*) AS DOUBLE)
            / (SELECT COUNT(*) FROM sens) AS p_global
        FROM sens GROUP BY 1),
      grid AS (SELECT ct.nat, ct.band, ct.seg, ct.n_class, g.sv, g.p_global,
          CAST(COALESCE(cells.c, 0) AS DOUBLE) / ct.n_class AS p_class
        FROM ctot ct CROSS JOIN gdist g
        LEFT JOIN cells ON cells.nat = ct.nat AND cells.band = ct.band
          AND cells.seg = ct.seg AND cells.sv = g.sv),
      cum AS (SELECT *, SUM(CAST(round(p_class - p_global, 9) AS DECIMAL(20,9)))
            OVER (PARTITION BY nat, band, seg ORDER BY sv
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_diff
        FROM grid),
      emd AS (SELECT nat, band, seg, n_class,
          round(CAST(SUM(abs(cum_diff)) AS DOUBLE) / COUNT(*), 6) AS emd
        FROM cum GROUP BY 1, 2, 3, 4)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(SUM(n_class) AS BIGINT) AS n_records,
        round(MAX(emd), 6) AS emd_max,
        CAST(SUM(CASE WHEN emd > 0.2 THEN n_class ELSE 0 END) AS BIGINT) AS at_risk,
        round(CAST(SUM(CASE WHEN emd > 0.2 THEN n_class ELSE 0 END) AS DOUBLE)
          / SUM(n_class), 6) AS at_risk_share
      FROM emd"""))

  val all: Seq[QueryDef] = Seq(q326LDiversity, q327DpHistogram,
    q328RandomizedResponse, q329TCloseness)
}
