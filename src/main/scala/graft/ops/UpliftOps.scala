package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Qini uplift deciles (Radcliffe 2007) — the incremental-impact curve
  * of a targeting score under a randomized treatment: rank customers
  * by account balance, split each decile into its md5-randomized
  * treatment/control arms, and report per-decile incremental
  * conversions (treated rate − control rate, control scaled to the
  * treated arm's size). The campaign-evaluation read every growth team
  * computes before trusting a targeting model (reference: overseer's
  * arbitrary handler fns, src/overseer/executor.clj:12-39; q184's
  * cumulative-gains sibling WITH a control arm).
  *
  * Scale shape: one customer scan + one orders semi-aggregate; decile
  * assignment uses NTILE over the customer frame (|customers| window —
  * the q152 exact-decile idiom); per-decile arm censuses are hash-aggs.
  *
  * Exactness: the treatment coin is md5-deterministic; conversions are
  * BIGINT counts; the per-decile uplift is scaled to integer
  * micro-units via one fixed float expression over exact counts —
  * cross-engine deterministic.
  */
object UpliftOps {

  val q535QiniDeciles: QueryDef = QueryDef(
    "q535_qini_deciles",
    (s, dir) => {
      val t = Tables(s, dir)
      val conv = t.orders
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey").as("c_custkey")).distinct()
        .withColumn("converted", lit(1L))
      val scored = t.customer
        .select(col("c_custkey"),
          floor(col("c_acctbal") * 100 + lit(0.5)).cast("long").as("bal"),
          expr("pmod(CAST(conv(substring(md5(concat('arm|', " +
            "CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT), 2)")
            .as("treated"))
        .join(conv, Seq("c_custkey"), "left")
        .na.fill(0L, Seq("converted"))
      // size-adaptive deciles (r15): single-task sort at bench scale,
      // range-partitioned spine once the customer frame outgrows it.
      // |scored| == |customer| exactly (left join on a distinct key),
      // so the size probe is a free parquet metadata count
      val decd = Spine.adaptiveNtile(scored,
        Seq(col("bal").desc, col("c_custkey")), 10, "decile",
        knownCount = t.customer.count())
      decd.groupBy(col("decile"))
        .agg(sum(when(col("treated") === 1, 1L).otherwise(0L)).as("n_t"),
          sum(when(col("treated") === 0, 1L).otherwise(0L)).as("n_c"),
          sum(when(col("treated") === 1, col("converted")).otherwise(0L))
            .as("pos_t"),
          sum(when(col("treated") === 0, col("converted")).otherwise(0L))
            .as("pos_c"))
        .select(col("decile"), col("n_t"), col("n_c"), col("pos_t"),
          col("pos_c"),
          round(lit(1e6) * (col("pos_t").cast("double") -
            col("pos_c").cast("double") * col("n_t") / col("n_c")), 3)
            .as("qini_micro"))
    },
    Some("""WITH conv AS (
        SELECT DISTINCT o_custkey AS c_custkey, CAST(1 AS BIGINT) AS converted
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
      scored AS (
        SELECT c.c_custkey,
          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
          ('0x' || substr(md5('arm|' || CAST(c.c_custkey AS VARCHAR)), 1, 15))
            ::BIGINT % 2 AS treated,
          COALESCE(v.converted, 0) AS converted
        FROM customer c LEFT JOIN conv v ON v.c_custkey = c.c_custkey),
      decd AS (
        SELECT *, CAST(ntile(10) OVER (ORDER BY bal DESC, c_custkey)
          AS BIGINT) AS decile
        FROM scored)
      SELECT decile,
        CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN treated = 1 THEN converted ELSE 0 END) AS BIGINT)
          AS pos_t,
        CAST(SUM(CASE WHEN treated = 0 THEN converted ELSE 0 END) AS BIGINT)
          AS pos_c,
        round(1e6 * (CAST(SUM(CASE WHEN treated = 1 THEN converted ELSE 0 END)
            AS DOUBLE) -
          CAST(SUM(CASE WHEN treated = 0 THEN converted ELSE 0 END) AS DOUBLE)
            * SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END)
            / SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END)), 3)
          AS qini_micro
      FROM decd GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q535QiniDeciles)
}
