package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Herfindahl-Hirschman market-concentration index per supplier nation
  * — HHI = Σᵢ sᵢ² over each supplier's revenue share within its nation,
  * on the antitrust 0–10000 scale (reference: overseer's per-entity
  * report rollups, doc/guide/Monitoring.md:1; the concentration sibling
  * of the Gini/Theil inequality rows).
  *
  * Scale shape: one lineitem⋈supplier join (supplier side broadcast —
  * dimension-sized), a (nation, supplier) hash agg, then a |suppliers|-
  * row window/agg per nation. The corpus pass is single.
  *
  * Exactness: revenue in exact cents (DECIMAL→floor→BIGINT, the q547
  * discipline); each share² term is quantized round(·,12) and summed as
  * DECIMAL(28,12) — order-free — then scaled and surfaced round 6.
  */
object ConcentrationOps {

  val q566Herfindahl: QueryDef = QueryDef(
    "q566_herfindahl",
    (s, dir) => {
      val t = Tables(s, dir)
      val cents = t.lineitem
        .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("s_suppkey"))
        .agg(floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(22, 8))) * 100).cast("long").as("cents"))
      val totals = cents.groupBy(col("nation"))
        .agg(sum(col("cents")).as("total_cents"),
          count(lit(1)).as("n_suppliers"),
          max(col("cents")).as("top_cents"))
      cents.join(totals, Seq("nation"))
        .select(col("nation"), col("n_suppliers"), col("total_cents"),
          col("top_cents"),
          round(pow(col("cents").cast("double")
            / col("total_cents").cast("double"), 2), 12)
            .cast(DecimalType(28, 12)).as("term"))
        .groupBy(col("nation"), col("n_suppliers"), col("total_cents"),
          col("top_cents"))
        .agg(round(sum(col("term")).cast("double") * 10000, 6).as("hhi"))
        .select(col("nation"), col("n_suppliers"), col("total_cents"),
          round(col("top_cents").cast("double")
            / col("total_cents").cast("double"), 6).as("top_share"),
          col("hhi"))
        .orderBy(col("nation"))
    },
    Some("""WITH cents AS (
        SELECT n.n_name AS nation, s.s_suppkey,
          CAST(floor(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
            AS DECIMAL(22,8))) * 100) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY 1, 2),
      totals AS (
        SELECT nation, CAST(SUM(cents) AS BIGINT) AS total_cents,
          CAST(COUNT(*) AS BIGINT) AS n_suppliers,
          CAST(MAX(cents) AS BIGINT) AS top_cents
        FROM cents GROUP BY 1)
      SELECT c.nation, t.n_suppliers, t.total_cents,
        round(CAST(t.top_cents AS DOUBLE) / CAST(t.total_cents AS DOUBLE), 6)
          AS top_share,
        round(CAST(SUM(CAST(round(pow(CAST(c.cents AS DOUBLE)
            / CAST(t.total_cents AS DOUBLE), 2), 12) AS DECIMAL(28,12)))
          AS DOUBLE) * 10000, 6) AS hhi
      FROM cents c
      JOIN totals t ON t.nation = c.nation
      GROUP BY c.nation, t.n_suppliers, t.total_cents, t.top_cents
      ORDER BY c.nation"""))

  val all: Seq[QueryDef] = Seq(q566Herfindahl)
}
