package graft.ops

import org.apache.spark.sql.functions._

/** Partition-level Merkle diff between two table snapshots — the
  * anti-entropy primitive of replication repair (Dynamo/Cassandra) and
  * of incremental table sync: digest each of 32 hash partitions on both
  * sides (order-independent XOR of row fingerprints, q169's checksum
  * algebra), compare digest + count per bucket, and emit the REPAIR
  * PLAN: which buckets must be rescanned and how many rows that
  * rescan touches. At 100 TB this is how you avoid comparing two
  * copies row-by-row — 2×32 digest rows decide where the full reads
  * go, and the rescan cost is proportional to the DIVERGED fraction.
  *
  * Snapshots here: orders as-of 1998-01-01 (the "replica") vs the full
  * table (the "primary") — the q106 snapshot pair re-used at the
  * physical-layout layer. Every digest is exact integer algebra; the
  * oracle mirrors fingerprints bit-for-bit (q169's md5-prefix
  * convention).
  *
  * Collision bound (the standard Merkle trade-off): XOR cancels any
  * duplicated fingerprint pair, so two DIVERGED buckets with EQUAL row
  * counts can collide and report in_sync with probability ~2^-60 per
  * bucket (60-bit fingerprints) — an anti-entropy sketch, not a proof.
  * For THIS snapshot pair the check happens to be exact: the replica is
  * a strict subset of the primary (a time cut), so any divergence shows
  * up in the count comparison before the digest is even consulted.
  */
object MerkleOps {

  val q476MerkleDiff: QueryDef = QueryDef(
    "q476_merkle_diff",
    (s, dir) => {
      val fp = expr(
        """CAST(conv(substring(md5(concat_ws('|',
           CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),
           o_orderstatus,
           CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING),
           CAST(CAST(o_orderdate AS DATE) AS STRING))), 1, 15), 16, 10)
           AS BIGINT)""")
      val o = Tables(s, dir).orders
        .withColumn("bucket", pmod(col("o_orderkey"), lit(32)))
        .withColumn("fp", fp)
      def digests(df: org.apache.spark.sql.DataFrame, side: String) = df
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_$side"),
             expr("bit_xor(fp)").as(s"digest_$side"))
      val replica = digests(
        o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        "replica")
      val primary = digests(o, "primary")
      primary.join(replica, Seq("bucket"), "left")
        .na.fill(0L, Seq("n_replica"))
        .withColumn("in_sync",
          col("digest_replica").isNotNull &&
          col("digest_replica") === col("digest_primary") &&
          col("n_replica") === col("n_primary"))
        .select(col("bucket"), col("n_primary"), col("n_replica"),
          col("in_sync"),
          when(col("in_sync"), lit(0L)).otherwise(col("n_primary"))
            .as("rows_to_rescan"),
          (col("n_primary") - col("n_replica")).as("row_lag"))
    },
    Some("""WITH fp AS (SELECT o_orderkey % 32 AS bucket, o_orderdate,
          CAST(concat('0x', substr(md5(concat_ws('|',
            CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
            o_orderstatus,
            CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
            CAST(CAST(o_orderdate AS DATE) AS VARCHAR))), 1, 15)) AS BIGINT)
            AS fp
        FROM orders),
      replica AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_replica,
          bit_xor(fp) AS digest_replica
        FROM fp WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
      prim AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_primary,
          bit_xor(fp) AS digest_primary
        FROM fp GROUP BY 1)
      SELECT p.bucket, p.n_primary, COALESCE(r.n_replica, 0) AS n_replica,
        (r.digest_replica IS NOT NULL
          AND r.digest_replica = p.digest_primary
          AND r.n_replica = p.n_primary) AS in_sync,
        CASE WHEN (r.digest_replica IS NOT NULL
          AND r.digest_replica = p.digest_primary
          AND r.n_replica = p.n_primary) THEN 0 ELSE p.n_primary END
          AS rows_to_rescan,
        p.n_primary - COALESCE(r.n_replica, 0) AS row_lag
      FROM prim p LEFT JOIN replica r ON r.bucket = p.bucket"""))

  val all: Seq[QueryDef] = Seq(q476MerkleDiff)
}
