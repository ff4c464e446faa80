package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC upsert compaction + apply audit — MERGE-INTO semantics as one
  * last-writer-wins window: apply a change log (inserts, updates,
  * deletes, with multiple sequenced ops per key) to a base snapshot and
  * publish the reconciliation ledger every ingestion pipeline keeps
  * beside its merge (reference: overseer's idempotent-handler ingestion
  * contract, doc/guide/BasicGraphsHandlers.md "Important!" — re-applying
  * the same log must land the same table). The log is deterministic
  * from orders via md5 coins: 5% DELETE, 10% UPDATE (+$10), 3% INSERT
  * (key shifted into a disjoint range), and a 1% key gets UPDATE THEN
  * DELETE (seq 1, 2) so last-wins ordering is actually exercised.
  *
  * Scale shape: base ∪ log is ONE union (no join), compacted by ONE
  * rank window per key (max seq wins) — the standard CDC compaction
  * plan; at 100 TB the log is a fraction of the base and AQE handles
  * the size asymmetry, where a MERGE expressed as full outer join
  * shuffles both sides twice. The audit ledger is a handful of
  * conditional sums over the same pass.
  *
  * Exactness: cents and counts BIGINT end-to-end; the final-state
  * checksum is Σ key·31 + cents (BIGINT overflow wraps identically in
  * Spark and DuckDB only if kept in range — keys ≤ 2·10⁹ and cents ≤
  * 10⁸ keep Σ below 2⁶³ at any test SF, stated not hoped).
  */
object CdcOps {

  private val MaxHash = 1152921504606846976.0 // 2^60
  private val InsertShift = 1000000000L

  val q505CdcUpsert: QueryDef = QueryDef(
    "q505_cdc_upsert",
    (s, dir) => {
      val base = Tables(s, dir).orders
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
        .withColumn("coin",
          (conv(substring(md5(concat(lit("cdc|"),
            col("k").cast("string"))), 1, 15), 16, 10)
            .cast("double") + 1.0) / MaxHash)
        .localCheckpoint() // feeds snapshot, log derivation, and audit
      val snapshot = base.select(col("k"), col("cents"),
        lit("load").as("op"), lit(0L).as("seq"))
      val deletes = base.where(col("coin") < 0.05)
        .select(col("k"), lit(0L).as("cents"), lit("delete").as("op"),
          lit(1L).as("seq"))
      val updates = base.where(col("coin") >= 0.05 && col("coin") < 0.15)
        .select(col("k"), (col("cents") + 1000L).as("cents"),
          lit("update").as("op"), lit(1L).as("seq"))
      val inserts = base.where(col("coin") >= 0.15 && col("coin") < 0.18)
        .select((col("k") + InsertShift).as("k"), col("cents"),
          lit("insert").as("op"), lit(1L).as("seq"))
      val lateDeletes = base.where(col("coin") >= 0.05 && col("coin") < 0.06)
        .select(col("k"), lit(0L).as("cents"), lit("delete").as("op"),
          lit(2L).as("seq")) // update THEN delete: last-wins must drop it
      val log = deletes.unionByName(updates).unionByName(inserts)
        .unionByName(lateDeletes)
      val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
      val finalState = snapshot.unionByName(log)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op") =!= "delete")
      val ledger = log.groupBy(col("op")).agg(count(lit(1)).as("n"))
      val fin = finalState.agg(count(lit(1)).as("n_final"),
        sum(col("cents")).as("final_cents"),
        sum(col("k") * 31 + col("cents")).as("final_checksum"))
      val b = base.agg(count(lit(1)).as("n_base"),
        sum(col("cents")).as("base_cents"))
      b.crossJoin(broadcast(ledger.groupBy()
          .pivot("op", Seq("delete", "update", "insert"))
          .sum("n")))
        .crossJoin(broadcast(fin))
        .select(col("n_base"), col("base_cents"),
          col("delete").as("n_delete"), col("update").as("n_update"),
          col("insert").as("n_insert"), col("n_final"),
          col("final_cents"), col("final_checksum"))
    },
    Some(s"""WITH base AS (
        SELECT o_orderkey AS k,
          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
          (('0x' || substr(md5('cdc|' || CAST(o_orderkey AS VARCHAR)), 1, 15))
            ::BIGINT + 1.0) / $MaxHash AS coin
        FROM orders),
      log AS (
        SELECT k, CAST(0 AS BIGINT) AS cents, 'delete' AS op,
          CAST(1 AS BIGINT) AS seq FROM base WHERE coin < 0.05
        UNION ALL
        SELECT k, cents + 1000, 'update', 1 FROM base
          WHERE coin >= 0.05 AND coin < 0.15
        UNION ALL
        SELECT k + $InsertShift, cents, 'insert', 1 FROM base
          WHERE coin >= 0.15 AND coin < 0.18
        UNION ALL
        SELECT k, 0, 'delete', 2 FROM base
          WHERE coin >= 0.05 AND coin < 0.06),
      allrows AS (
        SELECT k, cents, 'load' AS op, CAST(0 AS BIGINT) AS seq FROM base
        UNION ALL SELECT k, cents, op, seq FROM log),
      finals AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC)
            AS rn FROM allrows) WHERE rn = 1 AND op <> 'delete')
      SELECT
        CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_base,
        CAST((SELECT SUM(cents) FROM base) AS BIGINT) AS base_cents,
        CAST((SELECT COUNT(*) FROM log WHERE op = 'delete') AS BIGINT)
          AS n_delete,
        CAST((SELECT COUNT(*) FROM log WHERE op = 'update') AS BIGINT)
          AS n_update,
        CAST((SELECT COUNT(*) FROM log WHERE op = 'insert') AS BIGINT)
          AS n_insert,
        CAST((SELECT COUNT(*) FROM finals) AS BIGINT) AS n_final,
        CAST((SELECT SUM(cents) FROM finals) AS BIGINT) AS final_cents,
        CAST((SELECT SUM(k * 31 + cents) FROM finals) AS BIGINT)
          AS final_checksum"""))

  val all: Seq[QueryDef] = Seq(q505CdcUpsert)
}
