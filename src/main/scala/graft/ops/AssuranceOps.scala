package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Assurance operators: Grubbs extreme-value statistics, two-proportion
  * experiment tests, price-ending audits, and star-schema referential
  * integrity — the checks that certify a dataset before anyone ships a
  * number derived from it.
  */
object AssuranceOps {

  /** Grubbs statistic per event type: how many standard deviations out
    * is the MOST extreme reading, and which reading is it — the single-
    * outlier test that names its suspect (q124's MAD gate flags many;
    * Grubbs indicts one). Mean/sd from the q54 exact power sums in one
    * scan; the suspect is an argmax ranking window over the same pass.
    */
  val q214GrubbsStatistic: QueryDef = QueryDef(
    "q214_grubbs_statistic",
    (s, dir) => {
      val wT = Window.partitionBy(col("event_type"))
      val wPick = Window.partitionBy(col("event_type"))
        .orderBy(col("dev").desc, col("event_id").asc)
      val n  = col("n").cast("double")
      val ev = EventOps.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("n", count(lit(1)).over(wT))
        .withColumn("s1", sum(col("value").cast(DecimalType(18, 4))).over(wT)
          .cast("double"))
        .withColumn("s2", sum((col("value") * col("value"))
          .cast(DecimalType(30, 8))).over(wT).cast("double"))
        .withColumn("mean", col("s1") / n)
        .withColumn("sd", sqrt((col("s2") - col("s1") * col("s1") / n) /
          (n - lit(1.0))))
        .withColumn("dev", abs(col("value") - col("mean")))
      ev.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n").as("n_obs"),
          round(col("value"), 6).as("suspect_value"),
          col("event_id").as("suspect_id"),
          round(col("dev") / col("sd"), 6).as("grubbs_g"))
    },
    Some("""WITH m AS (SELECT event_type, event_id, value,
          COUNT(*) OVER (PARTITION BY event_type) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,4)))
            OVER (PARTITION BY event_type) AS DOUBLE) AS s1,
          CAST(SUM(CAST(value * value AS DECIMAL(30,8)))
            OVER (PARTITION BY event_type) AS DOUBLE) AS s2
        FROM events),
      d AS (SELECT *,
          s1 / CAST(n AS DOUBLE) AS mean,
          sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
            AS sd,
          abs(value - s1 / CAST(n AS DOUBLE)) AS dev
        FROM m),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY dev DESC, event_id ASC) AS rn FROM d)
      SELECT event_type, CAST(n AS BIGINT) AS n_obs,
        round(value, 6) AS suspect_value,
        event_id AS suspect_id,
        round(dev / sd, 6) AS grubbs_g
      FROM r WHERE rn = 1"""))

  /** Two-proportion z-test between the md5-parity A/B arms (q208's
    * assignment) on each event type's user→purchaser conversion — the
    * effect readout that pairs with the SRM denominator check: pooled
    * SE, exact-int counts, closed-form z. Under a null experiment the
    * z's should hover near 0; a persistent drift means the hash is
    * correlated with behavior (or the bucketing is broken).
    */
  val q215TwoProportionZ: QueryDef = QueryDef(
    "q215_two_proportion_z",
    (s, dir) => {
      // unit = (user, day): at user grain the fixture saturates (everyone
      // purchases eventually), which would zero the pooled SE
      val byUser = EventOps.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm",
          when(conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 2 === 0, "A").otherwise("B"))
      val agg = byUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val a = agg.filter(col("arm") === "A")
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
      val b = agg.filter(col("arm") === "B")
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
      val na = col("n_a").cast("double")
      val nb = col("n_b").cast("double")
      val pa = col("conv_a").cast("double") / na
      val pb = col("conv_b").cast("double") / nb
      val pp = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
      a.crossJoin(broadcast(b))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
          round((pa - pb) /
            sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb)), 6)
            .as("z"))
    },
    Some("""WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2),
      armed AS (SELECT *,
          CASE WHEN CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        FROM u),
      agg AS (SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
        FROM armed GROUP BY 1),
      ab AS (SELECT
          (SELECT n FROM agg WHERE arm = 'A') AS n_a,
          (SELECT conv FROM agg WHERE arm = 'A') AS conv_a,
          (SELECT n FROM agg WHERE arm = 'B') AS n_b,
          (SELECT conv FROM agg WHERE arm = 'B') AS conv_b)
      SELECT n_a, conv_a, n_b, conv_b,
        round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
        round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
        round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
               CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
          sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
               (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
               (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6) AS z
      FROM ab"""))

  /** Price-ending audit: the cents distribution of extended prices —
    * are amounts machine-uniform or human-clustered (.00/.99)? The
    * forensic twin of q162's Benford first-digit test, aimed at the
    * LAST digits, where fabricated or rounded data betrays itself.
    * Exact integer cents extraction; top-10 endings with shares from
    * a windowed total over the 100-row profile.
    */
  val q216PriceEndings: QueryDef = QueryDef(
    "q216_price_endings",
    (s, dir) => {
      val wAll = Window.partitionBy()
      Tables(s, dir).lineitem
        .select((floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") % 100)
          .as("cents"))
        .groupBy(col("cents"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          round(col("n").cast("double") /
            sum(col("n")).over(wAll).cast("double"), 6))
        .orderBy(col("n").desc, col("cents").asc)
        .limit(10)
    },
    Some("""WITH c AS (SELECT
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) % 100 AS cents
        FROM lineitem),
      agg AS (SELECT cents, COUNT(*) AS n FROM c GROUP BY 1)
      SELECT cents, n,
        round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share
      FROM agg ORDER BY n DESC, cents ASC LIMIT 10"""))

  /** Star-schema referential-integrity sweep: every FK edge of the
    * schema — lineitem→orders, lineitem→part, lineitem→supplier,
    * orders→customer, customer→nation, supplier→nation, nation→region
    * — audited for orphans in ONE union report. Each edge is a
    * distinct-key anti-join (child keys vs parent keys), so the sweep
    * costs one distinct per side per edge and scales with key
    * cardinality, not row count. The first query a data contract runs.
    */
  val q217FkIntegrity: QueryDef = QueryDef(
    "q217_fk_integrity",
    (s, dir) => {
      val t = Tables(s, dir)
      def edge(name: String, child: org.apache.spark.sql.DataFrame,
               ck: String, parent: org.apache.spark.sql.DataFrame,
               pk: String): org.apache.spark.sql.DataFrame = {
        val ckeys = child.select(col(ck).as("k")).distinct()
        val pkeys = parent.select(col(pk).as("k")).distinct()
        val orphans = ckeys.join(pkeys, Seq("k"), "left_anti")
        ckeys.agg(count(lit(1)).as("n_child_keys"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphan_keys")))
          .select(lit(name).as("fk_edge"), col("n_child_keys"),
            col("n_orphan_keys"))
      }
      edge("lineitem->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
        .unionByName(edge("lineitem->part", t.lineitem, "l_partkey",
          t.part, "p_partkey"))
        .unionByName(edge("lineitem->supplier", t.lineitem, "l_suppkey",
          t.supplier, "s_suppkey"))
        .unionByName(edge("orders->customer", t.orders, "o_custkey",
          t.customer, "c_custkey"))
        .unionByName(edge("customer->nation", t.customer, "c_nationkey",
          t.nation, "n_nationkey"))
        .unionByName(edge("supplier->nation", t.supplier, "s_nationkey",
          t.nation, "n_nationkey"))
        .unionByName(edge("nation->region", t.nation, "n_regionkey",
          t.region, "r_regionkey"))
    },
    Some("""SELECT 'lineitem->orders' AS fk_edge,
        (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_child_keys,
        (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = c.l_orderkey))
          AS n_orphan_keys
      UNION ALL SELECT 'lineitem->part',
        (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
        (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = c.l_partkey))
      UNION ALL SELECT 'lineitem->supplier',
        (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
        (SELECT COUNT(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
          WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = c.l_suppkey))
      UNION ALL SELECT 'orders->customer',
        (SELECT COUNT(DISTINCT o_custkey) FROM orders),
        (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders) c
          WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = c.o_custkey))
      UNION ALL SELECT 'customer->nation',
        (SELECT COUNT(DISTINCT c_nationkey) FROM customer),
        (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey FROM customer) c
          WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c.c_nationkey))
      UNION ALL SELECT 'supplier->nation',
        (SELECT COUNT(DISTINCT s_nationkey) FROM supplier),
        (SELECT COUNT(*) FROM (SELECT DISTINCT s_nationkey FROM supplier) c
          WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c.s_nationkey))
      UNION ALL SELECT 'nation->region',
        (SELECT COUNT(DISTINCT n_regionkey) FROM nation),
        (SELECT COUNT(*) FROM (SELECT DISTINCT n_regionkey FROM nation) c
          WHERE NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = c.n_regionkey))"""))

  val all: Seq[QueryDef] = Seq(q214GrubbsStatistic, q215TwoProportionZ,
    q216PriceEndings, q217FkIntegrity)
}
