package graft.ops

import org.apache.spark.sql.functions._

/** Shard-management wave: what moves when the cluster grows (q478,
  * consistent-hash ring rebalance vs modulo resharding) and what a
  * sample is worth (q480, stratified design effect) — both planning
  * reads a 100 TB fleet runs before touching data.
  */
object ShardOps {

  /** Consistent-hash rebalance audit (Karger et al. 1997): place every
    * customer key on an md5 ring against 4 servers × 32 vnodes, add a
    * 5th server, and measure the moved-key fraction — the claim to
    * verify is ≈ 1/5 moved for the ring vs ≈ 4/5 for modulo resharding
    * (pmod(key, 4) → pmod(key, 5)). The ring is a model-sized derived
    * table (160 points, pure function of the server names — computed
    * driver-side and broadcast); ownership is one ascending-successor
    * probe per key, an array HOF over the broadcast ring inside
    * whole-stage codegen. The oracle rebuilds the identical md5 ring
    * and probes it with correlated min() subqueries. */
  val q478ConsistentHash: QueryDef = QueryDef(
    "q478_consistent_hash",
    (s, dir) => {
      val vnodes = 32
      def ringOf(servers: Seq[String]): Seq[(Long, String)] =
        (for (sv <- servers; vn <- 0 until vnodes) yield {
          val h = java.lang.Long.parseLong(
            org.apache.commons.codec.digest.DigestUtils
              .md5Hex(s"$sv#$vn").take(15), 16)
          (h, sv)
        }).sortBy(_._1)
      val servers4 = (0 until 4).map(i => s"s$i")
      val servers5 = (0 until 5).map(i => s"s$i")
      def ownerCol(ring: Seq[(Long, String)], keyHash: org.apache.spark.sql.Column) = {
        val arr = array(ring.map { case (h, sv) =>
          struct(lit(h).as("h"), lit(sv).as("sv")) }: _*)
        // ascending successor on the ring; wrap to the first point
        coalesce(
          get(filter(arr, p => p("h") >= keyHash), lit(0))("sv"),
          lit(ring.head._2))
      }
      val keys = Tables(s, dir).customer
        .select(col("c_custkey").as("k"))
        .withColumn("kh",
          conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
            .cast("long"))
      val placed = keys
        .withColumn("own4", ownerCol(ringOf(servers4), col("kh")))
        .withColumn("own5", ownerCol(ringOf(servers5), col("kh")))
        .withColumn("mod4", concat(lit("s"), pmod(col("k"), lit(4))))
        .withColumn("mod5", concat(lit("s"), pmod(col("k"), lit(5))))
      placed.agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("own4") =!= col("own5"), 1L).otherwise(0L)).as("ring_moved"),
          sum(when(col("mod4") =!= col("mod5"), 1L).otherwise(0L)).as("mod_moved"))
        .select(col("n_keys"), col("ring_moved"),
          round(col("ring_moved").cast("double") / col("n_keys"), 6)
            .as("ring_moved_frac"),
          col("mod_moved"),
          round(col("mod_moved").cast("double") / col("n_keys"), 6)
            .as("mod_moved_frac"))
    },
    Some("""WITH ring5 AS (
        SELECT ('0x' || substr(md5('s' || s.i || '#' || v.i), 1, 15))::BIGINT AS h,
          's' || s.i AS sv, s.i < 4 AS in4
        FROM range(5) s(i), range(32) v(i)),
      keys AS (SELECT c_custkey AS k,
          ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS kh
        FROM customer),
      placed AS (SELECT k, kh,
          COALESCE(
            (SELECT sv FROM ring5 WHERE in4 AND h >= kh ORDER BY h LIMIT 1),
            (SELECT sv FROM ring5 WHERE in4 ORDER BY h LIMIT 1)) AS own4,
          COALESCE(
            (SELECT sv FROM ring5 WHERE h >= kh ORDER BY h LIMIT 1),
            (SELECT sv FROM ring5 ORDER BY h LIMIT 1)) AS own5,
          's' || (k % 4) AS mod4, 's' || (k % 5) AS mod5
        FROM keys)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        CAST(SUM(CASE WHEN own4 <> own5 THEN 1 ELSE 0 END) AS BIGINT)
          AS ring_moved,
        round(SUM(CASE WHEN own4 <> own5 THEN 1 ELSE 0 END)
          / CAST(COUNT(*) AS DOUBLE), 6) AS ring_moved_frac,
        CAST(SUM(CASE WHEN mod4 <> mod5 THEN 1 ELSE 0 END) AS BIGINT)
          AS mod_moved,
        round(SUM(CASE WHEN mod4 <> mod5 THEN 1 ELSE 0 END)
          / CAST(COUNT(*) AS DOUBLE), 6) AS mod_moved_frac
      FROM placed"""))

  /** Stratified-sampling design effect (Kish): for estimating mean order
    * value with n = 1000 draws, compare SRS variance S²/n against
    * proportionally-allocated stratification by market segment —
    * deff = Σ W_h·S_h² / S² (<1 exactly when strata separate means).
    * All variances from exact DECIMAL moments in one aggregate pass;
    * the report carries each stratum's weight/mean/variance plus the
    * global deff and the effective sample size n/deff — the numbers
    * that size every sampling job upstream of labeling or eval. */
  val q480DesignEffect: QueryDef = QueryDef(
    "q480_design_effect",
    (s, dir) => {
      // exact integer cents (q169's convention) so the second moments
      // stay exact through DECIMAL sums in Spark / HUGEINT sums in the
      // oracle; deff is scale-invariant so cents^2 variances are fine
      val o = Tables(s, dir).orders
        .join(Tables(s, dir).customer,
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          expr("CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS DECIMAL(18,0))")
            .as("x"))
        .localCheckpoint() // feeds strata AND the global moments
      val strata = o.groupBy(col("segment"))
        .agg(count(lit(1)).as("n_h"),
          sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"))
      val global = o.agg(count(lit(1)).as("n"),
        sum(col("x")).as("g1"), sum(col("x") * col("x")).as("g2"))
      // population variances (divide by N — the design-effect convention)
      strata.crossJoin(broadcast(global))
        .withColumn("w_h", col("n_h").cast("double") / col("n"))
        .withColumn("var_h",
          (col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("n_h")) /
            col("n_h"))
        .withColumn("var_g",
          (col("g2").cast("double") -
            col("g1").cast("double") * col("g1").cast("double") / col("n")) /
            col("n"))
        .withColumn("deff",
          sum(col("w_h") * col("var_h"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy()) /
            col("var_g"))
        .select(col("segment"), col("n_h"), round(col("w_h"), 6).as("w_h"),
          round(col("s1").cast("double") / col("n_h") / 100.0, 4).as("mean_h"),
          round(col("var_h"), 4).as("var_h"),
          round(col("deff"), 6).as("deff"),
          round(lit(1000.0) / col("deff"), 2).as("effective_n_at_1000"))
    },
    Some("""WITH o AS (SELECT c.c_mktsegment AS segment,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS x
        FROM orders JOIN customer c ON c.c_custkey = o_custkey),
      strata AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_h,
          SUM(x) AS s1, SUM(x * x) AS s2
        FROM o GROUP BY 1),
      g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS g1,
          SUM(x * x) AS g2 FROM o),
      rep AS (SELECT segment, n_h,
          CAST(n_h AS DOUBLE) / n AS w_h,
          (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
            / n_h AS var_h,
          (CAST(g2 AS DOUBLE) - CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE) / n)
            / n AS var_g,
          CAST(s1 AS DOUBLE) / n_h AS mean_h
        FROM strata CROSS JOIN g)
      SELECT segment, n_h, round(w_h, 6) AS w_h,
        round(mean_h / 100.0, 4) AS mean_h,
        round(var_h, 4) AS var_h,
        round(SUM(w_h * var_h) OVER () / var_g, 6) AS deff,
        round(1000.0 / (SUM(w_h * var_h) OVER () / var_g), 2)
          AS effective_n_at_1000
      FROM rep"""))

  val all: Seq[QueryDef] = Seq(q478ConsistentHash, q480DesignEffect)
}
