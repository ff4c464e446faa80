package graft.ops

import org.apache.spark.sql.functions._

/** Permutation (approximate-randomization) test — "is the URGENT vs LOW
  * order-value gap explainable by chance?" answered WITHOUT parametric
  * assumptions, the way an experimentation platform validates a metric
  * diff (reference: overseer's ab-test stat family,
  * doc/guide/Introduction.md:3). The observed statistic is
  * mean(cents | 1-URGENT) − mean(cents | 5-LOW); each of R=64 replicates
  * re-labels every order by a DETERMINISTIC md5 coin u(orderkey, r) <
  * n_a/n (so both engines draw the identical "random" relabeling — the
  * house q112/q358 hash convention), recomputes the mean gap, and the
  * p-value is the add-one-smoothed share of replicates at least as
  * extreme: (1 + #{|stat_r| ≥ |obs|}) / (R + 1).
  *
  * Scale shape: the replicate fan-out is a GENERATED dimension
  * (explode(sequence(0,R−1)) — pure codegen, no shuffle), and the only
  * shuffle is the R-group hash agg whose partial aggregates combine
  * map-side: the reduce state is R rows of BIGINT sums no matter how
  * many orders are scanned. The 1-row observed frame rides along as a
  * broadcast. This is the textbook "resampling as a generated column"
  * plan — the alternative (R shuffled copies of the table) is R× the IO
  * and dies first at 100 TB.
  *
  * Exactness: per-replicate sums are BIGINT cents (no float
  * accumulation); the mean-gap arithmetic is the same IEEE division/
  * subtraction chain both engines; the ≥ comparison operates on
  * bit-identical doubles. Rounding only at the surfaced columns.
  */
object PermTestOps {

  private val R = 64
  private val MaxHash = 1152921504606846976.0 // 2^60, house convention

  val q495PermTest: QueryDef = QueryDef(
    "q495_perm_test",
    (s, dir) => {
      val base = Tables(s, dir).orders
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_orderkey"),
          (col("o_orderpriority") === lit("1-URGENT")).as("is_a"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      val sizes = base.agg(
        sum(when(col("is_a"), lit(1L)).otherwise(lit(0L))).as("n_a"),
        count(lit(1)).as("n"),
        sum(when(col("is_a"), col("cents")).otherwise(lit(0L))).as("sum_a"),
        sum(col("cents")).as("sum_tot"))
      val obs = sizes.select(col("n_a"), col("n"), col("sum_a"), col("sum_tot"),
        (col("sum_a").cast("double") / col("n_a").cast("double") -
          (col("sum_tot") - col("sum_a")).cast("double") /
            (col("n") - col("n_a")).cast("double")).as("obs_diff"))
      val stats = base
        .select(col("o_orderkey"), col("cents"),
          explode(sequence(lit(0), lit(R - 1))).as("r"))
        .crossJoin(broadcast(obs.select(col("n_a").as("na0"), col("n").as("n0"))))
        .withColumn("u",
          (conv(substring(md5(concat(col("o_orderkey").cast("string"),
            lit("_"), col("r").cast("string"))), 1, 15), 16, 10)
            .cast("double") + 1.0) / MaxHash)
        .withColumn("in_a",
          col("u") < col("na0").cast("double") / col("n0").cast("double"))
        .groupBy(col("r"))
        .agg(sum(when(col("in_a"), col("cents")).otherwise(lit(0L))).as("s_a"),
          sum(when(col("in_a"), lit(1L)).otherwise(lit(0L))).as("c_a"),
          sum(col("cents")).as("s_tot"), count(lit(1)).as("c_tot"))
        .select(col("r"),
          (col("s_a").cast("double") / col("c_a").cast("double") -
            (col("s_tot") - col("s_a")).cast("double") /
              (col("c_tot") - col("c_a")).cast("double")).as("stat"))
      stats
        .crossJoin(broadcast(obs.select(col("obs_diff"))))
        .agg(sum(when(abs(col("stat")) >= abs(col("obs_diff")), lit(1L))
          .otherwise(lit(0L))).as("n_extreme"))
        .crossJoin(broadcast(obs))
        .select(col("n_a"), (col("n") - col("n_a")).as("n_b"),
          round(col("obs_diff"), 4).as("obs_diff"),
          lit(R.toLong).as("n_perm"), col("n_extreme"),
          round((col("n_extreme").cast("double") + 1.0) / lit((R + 1).toDouble),
            6).as("p_value"))
    },
    Some(s"""WITH base AS (
        SELECT o_orderkey,
          o_orderpriority = '1-URGENT' AS is_a,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      sizes AS (
        SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN is_a THEN cents ELSE 0 END) AS BIGINT) AS sum_a,
          CAST(SUM(cents) AS BIGINT) AS sum_tot
        FROM base),
      obs AS (
        SELECT n_a, n, sum_a, sum_tot,
          CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
            CAST(sum_tot - sum_a AS DOUBLE) / CAST(n - n_a AS DOUBLE)
            AS obs_diff
        FROM sizes),
      perms AS (
        SELECT b.cents, t.r,
          (('0x' || substr(md5(CAST(b.o_orderkey AS VARCHAR) || '_' ||
            CAST(t.r AS VARCHAR)), 1, 15))::BIGINT + 1.0) / $MaxHash
            < CAST(o.n_a AS DOUBLE) / CAST(o.n AS DOUBLE) AS in_a
        FROM base b CROSS JOIN range($R) t(r) CROSS JOIN obs o),
      stats AS (
        SELECT r,
          CAST(SUM(CASE WHEN in_a THEN cents ELSE 0 END) AS DOUBLE) /
            CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS DOUBLE) -
          CAST(SUM(cents) - SUM(CASE WHEN in_a THEN cents ELSE 0 END)
            AS DOUBLE) /
            CAST(COUNT(*) - SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS DOUBLE)
            AS stat
        FROM perms GROUP BY 1),
      extreme AS (
        SELECT CAST(SUM(CASE WHEN abs(s.stat) >= abs(o.obs_diff)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        FROM stats s CROSS JOIN obs o)
      SELECT o.n_a, o.n - o.n_a AS n_b,
        round(o.obs_diff, 4) AS obs_diff,
        CAST($R AS BIGINT) AS n_perm, e.n_extreme,
        round((CAST(e.n_extreme AS DOUBLE) + 1.0) / ${R + 1}.0, 6) AS p_value
      FROM extreme e CROSS JOIN obs o"""))

  val all: Seq[QueryDef] = Seq(q495PermTest)
}
