package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bitemporal time travel — "what did the database say at tx-time T
  * about the world at valid-time V?" — the second Datomic signature
  * beside q501/q502's datalog rules (reference store/datomic.clj: a
  * Datomic `db` is an immutable as-of view; this is that semantics over
  * an EAV-style fact log in parquet). The fact log is built
  * deterministically from orders: an on-time priority assertion at
  * order date, a RETROACTIVE reclassification for a 10% md5 coin
  * (same valid time, tx 30 days later — the fact that made bitemporal
  * necessary), and a forward close for 'F' orders (valid and tx 60
  * days later). A 2×2 grid of (valid, tx) cutoffs is reconstituted;
  * the counts differ along BOTH axes, which is the whole point.
  *
  * Scale shape: facts × the 4-row generated cutoff grid (broadcast,
  * PlanGuard-declared), then ONE rank window per (cutoff, entity) —
  * max valid, tie max tx, tie max seq — and a model-sized count
  * rollup. This is the standard bitemporal reconstitution plan: linear
  * in |facts| × |snapshots|, no self-joins. At production scale the
  * fact log is entity-partitioned and each snapshot is one sorted pass
  * over it.
  *
  * Exactness: cutoffs and times compare as DATEs; counts BIGINT; the
  * winner per entity is unique (seq is distinct per entity), so the
  * rank tie-break chain is total.
  */
object BitemporalOps {

  private val MaxHash = 1152921504606846976.0 // 2^60

  val q503BitemporalAsof: QueryDef = QueryDef(
    "q503_bitemporal_asof",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderkey").as("e"), col("o_orderpriority"),
          col("o_orderstatus"), to_date(col("o_orderdate")).as("d"))
        .withColumn("coin",
          (conv(substring(md5(concat(lit("bt|"),
            col("e").cast("string"))), 1, 15), 16, 10)
            .cast("double") + 1.0) / MaxHash)
      val onTime = o.select(col("e"), col("o_orderpriority").as("v"),
        col("d").as("valid"), col("d").as("tx"), lit(0L).as("seq"))
      val reclass = o.where(col("coin") < 0.10)
        .select(col("e"), lit("RECLASS").as("v"), col("d").as("valid"),
          date_add(col("d"), 30).as("tx"), lit(1L).as("seq"))
      val closed = o.where(col("o_orderstatus") === "F")
        .select(col("e"), lit("CLOSED").as("v"),
          date_add(col("d"), 60).as("valid"),
          date_add(col("d"), 60).as("tx"), lit(2L).as("seq"))
      val facts = onTime.unionByName(reclass).unionByName(closed)
      import s.implicits._
      val grid = Seq(("1994-07-01", "1994-07-01"), ("1994-07-01", "1997-07-01"),
        ("1997-07-01", "1994-07-01"), ("1997-07-01", "1997-07-01"))
        .toDF("v_cut_s", "t_cut_s")
        .select(to_date(col("v_cut_s")).as("v_cut"),
          to_date(col("t_cut_s")).as("t_cut"))
      val w = Window.partitionBy(col("v_cut"), col("t_cut"), col("e"))
        .orderBy(col("valid").desc, col("tx").desc, col("seq").desc)
      facts.crossJoin(broadcast(grid))
        .where(col("valid") <= col("v_cut") && col("tx") <= col("t_cut"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("v_cut"), col("t_cut"), col("v").as("value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("v_cut"), col("t_cut"), col("value"))
    },
    Some(s"""WITH o AS (
        SELECT o_orderkey AS e, o_orderpriority, o_orderstatus,
          CAST(o_orderdate AS DATE) AS d,
          (('0x' || substr(md5('bt|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
            ::BIGINT + 1.0) / $MaxHash AS coin
        FROM orders),
      facts AS (
        SELECT e, o_orderpriority AS v, d AS valid, d AS tx, 0 AS seq FROM o
        UNION ALL
        SELECT e, 'RECLASS', d, d + 30, 1 FROM o WHERE coin < 0.10
        UNION ALL
        SELECT e, 'CLOSED', d + 60, d + 60, 2 FROM o
          WHERE o_orderstatus = 'F'),
      grid AS (SELECT CAST(v_cut_s AS DATE) AS v_cut,
          CAST(t_cut_s AS DATE) AS t_cut
        FROM (VALUES ('1994-07-01', '1994-07-01'),
          ('1994-07-01', '1997-07-01'), ('1997-07-01', '1994-07-01'),
          ('1997-07-01', '1997-07-01')) g(v_cut_s, t_cut_s)),
      ranked AS (
        SELECT g.v_cut, g.t_cut, f.e, f.v,
          row_number() OVER (PARTITION BY g.v_cut, g.t_cut, f.e
            ORDER BY f.valid DESC, f.tx DESC, f.seq DESC) AS rn
        FROM facts f CROSS JOIN grid g
        WHERE f.valid <= g.v_cut AND f.tx <= g.t_cut)
      SELECT v_cut, t_cut, v AS value, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked WHERE rn = 1
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  val all: Seq[QueryDef] = Seq(q503BitemporalAsof)
}
