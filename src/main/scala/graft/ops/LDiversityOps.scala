package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** l-diversity wave: the missing member of the disclosure-audit family
  * (q345 k-anonymity lattice, q329 t-closeness) — k-anonymity says each
  * quasi-identifier group is big enough, l-diversity says the SENSITIVE
  * attribute inside each group is varied enough (Machanavajjhala et al.,
  * ICDE'06): distinct-l and entropy-l both, since 99 identical values
  * plus one outlier passes distinct-l yet discloses.
  *
  * Scale shape: one scan to (QI-group × sensitive-value) counts, then
  * group-level aggregation — the audit frame is group-count-sized.
  */
object LDiversityOps {

  /** QI = (mktsegment, nation), sensitive = account-balance quartile
    * band. Per QI group: k, distinct sensitive values, sensitive-value
    * entropy, and the distinct-l / entropy-l verdicts at l = 3
    * (entropy-l requires H ≥ ln l — the stricter test). */
  val q403LDiversity: QueryDef = QueryDef(
    "q403_l_diversity",
    (s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.join(t.nation,
        col("c_nationkey") === col("n_nationkey"))
        .withColumn("sens",
          when(col("c_acctbal") < 0, "debt")
            .when(col("c_acctbal") < 3000, "low")
            .when(col("c_acctbal") < 7000, "mid")
            .otherwise("high"))
        .select(col("c_mktsegment").as("segment"),
          col("n_name").as("nation"), col("sens"))
      val cell = c.groupBy(col("segment"), col("nation"), col("sens"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      cell.groupBy(col("segment"), col("nation"))
        .agg(sum(col("cnt")).as("k"),
          count(lit(1)).cast("long").as("distinct_l"),
          sum(round(-(col("cnt") * lit(1.0)) *
            log(col("cnt").cast("double")), 9).cast(DecimalType(28, 9)))
            .as("nlogn"))
        .withColumn("entropy", round(
          log(col("k").cast("double")) +
            col("nlogn").cast("double") / col("k"), 6))
        .withColumn("meets_distinct_l3", col("distinct_l") >= 3)
        .withColumn("meets_entropy_l3",
          col("entropy") >= math.log(3.0) - 1e-9)
        .select(col("segment"), col("nation"), col("k"),
          col("distinct_l"), col("entropy"),
          col("meets_distinct_l3"), col("meets_entropy_l3"))
        .orderBy(col("segment"), col("nation"))
    },
    Some("""WITH c AS (SELECT c_mktsegment AS segment, n_name AS nation,
          CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS sens
        FROM customer JOIN nation ON c_nationkey = n_nationkey),
      cell AS (SELECT segment, nation, sens,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM c GROUP BY 1, 2, 3),
      g AS (SELECT segment, nation, CAST(SUM(cnt) AS BIGINT) AS k,
          CAST(COUNT(*) AS BIGINT) AS distinct_l,
          SUM(CAST(round(-(cnt * 1.0) * ln(CAST(cnt AS DOUBLE)), 9)
            AS DECIMAL(28,9))) AS nlogn
        FROM cell GROUP BY 1, 2)
      SELECT segment, nation, k, distinct_l,
        round(ln(CAST(k AS DOUBLE)) + CAST(nlogn AS DOUBLE) / k, 6)
          AS entropy,
        distinct_l >= 3 AS meets_distinct_l3,
        round(ln(CAST(k AS DOUBLE)) + CAST(nlogn AS DOUBLE) / k, 6)
          >= ln(3.0) - 1e-9 AS meets_entropy_l3
      FROM g ORDER BY segment, nation"""))

  val all: Seq[QueryDef] = Seq(q403LDiversity)
}
