package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal-graph wave: earliest-arrival reachability over a
  * time-respecting edge set — reachability where a path may only
  * traverse edges whose timestamps do not precede the arrival at the
  * tail (Wu et al., VLDB'14's earliest-arrival semantics). The static
  * transitive closure (q21) answers "is there a path"; this answers
  * "is there a path *forward in time*", the right notion for contact
  * tracing, supply-chain propagation, and incident blast-radius.
  *
  * Scale shape: semi-naive value iteration — each round is one
  * equi-join of the O(|E|) edge set against the O(|V|) min-arrival
  * frontier, checkpointed per round (the q21 discipline). Keeping only
  * the per-node minimum arrival is lossless for this semantics (an
  * earlier arrival enables a superset of onward edges), which is what
  * makes the frontier |V|-bounded instead of path-enumerating; the
  * DuckDB oracle deliberately runs the path-enumerating WITH RECURSIVE
  * form, so the pruned iteration is checked against the unpruned one.
  */
object TemporalGraphOps {

  /** Supplier contact network: within each part, consecutive shipments
    * (by shipdate, supplier tie-break) link the earlier supplier to the
    * later one at the later shipment's time. Seeds are suppliers 1-3 at
    * epoch 1995-01-01; four rounds of earliest-arrival propagation
    * publish each reached supplier's earliest arrival time and the
    * first round it became reachable. */
  val q395TemporalReach: QueryDef = QueryDef(
    "q395_temporal_reach",
    (s, dir) => {
      // r16: the consecutive-shipment handoff pass is the shared
      // GraphBase.contactHandoffs base (q409 and the nation-trade family
      // run the identical lineitem window) — this query only dedups it
      val edges = GraphBase.contactHandoffs(s, dir)
        .select(col("u"), col("v"), col("t"))
        .distinct()
        .localCheckpoint()
      val seedArr = java.time.LocalDate.of(1995, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
      var arrivals = Tables(s, dir).supplier
        .where(col("s_suppkey") <= 3)
        .select(col("s_suppkey").as("node"), lit(seedArr).as("arr"),
          lit(0L).as("wave"))
        .localCheckpoint()
      for (r <- 1 to 4) {
        val next = edges
          .join(arrivals.select(col("node").as("u"), col("arr").as("uarr")), Seq("u"))
          .where(col("uarr") <= col("t"))
          .groupBy(col("v").as("node"))
          .agg(min(col("t")).as("arr"))
          .withColumn("wave", lit(r.toLong))
        arrivals = arrivals.unionByName(next)
          .groupBy(col("node"))
          .agg(min(col("arr")).as("arr"), min(col("wave")).as("wave"))
          .localCheckpoint()
      }
      arrivals
        .select(col("node").as("supplier"),
          to_date(timestamp_micros(col("arr"))).as("arrival_date"),
          col("wave"))
        .orderBy(col("wave"), col("supplier"))
    },
    Some("""WITH RECURSIVE
      sh AS (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(l_shipdate) AS t
        FROM lineitem),
      seq AS (SELECT sid,
          LEAD(sid) OVER (PARTITION BY p ORDER BY t, sid) AS nv,
          LEAD(t) OVER (PARTITION BY p ORDER BY t, sid) AS nt
        FROM sh),
      edges AS (SELECT DISTINCT sid AS u, nv AS v, nt AS t
        FROM seq WHERE nv IS NOT NULL AND nv <> sid),
      reach(node, arr, wave) AS (
        SELECT s_suppkey, epoch_us(TIMESTAMP '1995-01-01'), CAST(0 AS BIGINT)
          FROM supplier WHERE s_suppkey <= 3
        UNION
        SELECT e.v, e.t, r.wave + 1
        FROM reach r JOIN edges e ON e.u = r.node AND r.arr <= e.t
        WHERE r.wave < 4)
      SELECT node AS supplier,
        CAST(to_timestamp(MIN(arr) / 1000000) AS DATE) AS arrival_date,
        CAST(MIN(wave) AS BIGINT) AS wave
      FROM reach GROUP BY 1
      ORDER BY wave, supplier"""))

  val all: Seq[QueryDef] = Seq(q395TemporalReach)
}
