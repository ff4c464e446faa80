package graft.ops

import org.apache.spark.sql.functions._

/** Physical-design planning wave: the two decisions a 100 TB warehouse
  * automates — WHICH aggregates to materialize (q477, the
  * Harinarayan–Rajaraman–Ullman greedy cube selection) and WHETHER the
  * optimizer's cardinality arithmetic can be trusted (q479, q-error
  * feedback on the textbook estimator q458's DP runs on).
  */
object PlannerOps {

  /** HRU greedy view selection (Harinarayan et al. 1996): over the
    * 8-view lattice of {returnflag, linestatus, ship-year}, pick 3
    * views to materialize (base cube always held), each round taking
    * the view with the largest total benefit
    * Σ_w⊆v max(0, cost(w) − size(v)), costs = size of the smallest
    * materialized ancestor. View sizes are ONE cube pass (every
    * grouping's row count from a single scan + grouping_id); the
    * lattice is 2^d rows — model-sized at any corpus scale, so the
    * greedy argmax is a driver-bounded decision (the q342/q458 idiom)
    * and the oracle unrolls the same 3 rounds as generated CTEs with
    * bitmask subset tests. */
  val q477ViewSelection: QueryDef = QueryDef(
    "q477_view_selection",
    (s, dir) => {
      val li = Tables(s, dir).lineitem.select(
        col("l_returnflag").as("r"), col("l_linestatus").as("st"),
        year(col("l_shipdate")).as("y"))
      // one cube pass: present-dimension mask -> view row count
      val sizes = li.cube(col("r"), col("st"), col("y"))
        .agg((((lit(1) - grouping(col("r"))) * 4 +
               (lit(1) - grouping(col("st"))) * 2 +
               (lit(1) - grouping(col("y")))).cast("int")).as("vmask"))
        .groupBy(col("vmask")).agg(count(lit(1)).as("size"))
        .collect().map(rw => rw.getInt(0) -> rw.getLong(1)).toMap
      // HRU greedy on the 8-entry lattice (driver-bounded decision)
      val allViews = (0 to 7).toSeq
      def subsets(v: Int): Seq[Int] = allViews.filter(w => (w & v) == w)
      var mat = Set(7)
      def cost(w: Int): Long =
        mat.filter(v => (w & v) == w).map(sizes).min
      val picks = (1 to 3).map { round =>
        val best = allViews.filterNot(mat.contains).map { v =>
          val b = subsets(v).map(w => math.max(0L, cost(w) - sizes(v))).sum
          (v, b)
        }.sortBy { case (v, b) => (-b, sizes(v), v) }.head
        mat += best._1
        val totalCost = allViews.map(cost).sum
        (round.toLong, best._1.toLong, sizes(best._1), best._2, totalCost)
      }
      s.createDataFrame(picks)
        .toDF("round", "view_mask", "view_size", "benefit", "total_cost_after")
    },
    Some {
      // the same 3 greedy rounds, unrolled: mat_k = materialized set,
      // costs recomputed per round, argmax by (benefit desc, size, mask)
      val rounds = (1 to 3).map { k =>
        val mats = (0 until k).map(i => s"(SELECT view_mask FROM pick$i)")
          .mkString(", ")
        s"""cost$k AS (SELECT w.vmask AS w, MIN(v.size) AS c
           |  FROM sizes w JOIN sizes v
           |    ON (w.vmask & v.vmask) = w.vmask
           |   AND (v.vmask = 7 OR v.vmask IN ($mats))
           |  GROUP BY 1),
           |ben$k AS (SELECT v.vmask, v.size,
           |    CAST(SUM(GREATEST(0, c.c - v.size)) AS BIGINT) AS benefit
           |  FROM sizes v JOIN cost$k c ON (c.w & v.vmask) = c.w
           |  WHERE v.vmask <> 7 AND v.vmask NOT IN ($mats)
           |  GROUP BY 1, 2),
           |pick$k AS (SELECT vmask AS view_mask, size, benefit
           |  FROM ben$k ORDER BY benefit DESC, size, vmask LIMIT 1),
           |after$k AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM (
           |  SELECT w.vmask, MIN(v.size) AS c FROM sizes w JOIN sizes v
           |    ON (w.vmask & v.vmask) = w.vmask
           |   AND (v.vmask = 7 OR v.vmask IN ($mats,
           |     (SELECT view_mask FROM pick$k)))
           |  GROUP BY 1))""".stripMargin
      }.mkString(",\n")
      val out = (1 to 3).map { k =>
        s"""SELECT ${k}::BIGINT AS round,
           |  CAST((SELECT view_mask FROM pick$k) AS BIGINT) AS view_mask,
           |  (SELECT size FROM pick$k) AS view_size,
           |  (SELECT benefit FROM pick$k) AS benefit,
           |  (SELECT total FROM after$k) AS total_cost_after""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH g AS (SELECT l_returnflag AS r, l_linestatus AS st,
         |    EXTRACT(year FROM l_shipdate) AS y,
         |    (1 - GROUPING(l_returnflag)) * 4
         |      + (1 - GROUPING(l_linestatus)) * 2
         |      + (1 - GROUPING(EXTRACT(year FROM l_shipdate))) AS vmask
         |  FROM lineitem
         |  GROUP BY CUBE(l_returnflag, l_linestatus,
         |    EXTRACT(year FROM l_shipdate))),
         |sizes AS (SELECT vmask, CAST(COUNT(*) AS BIGINT) AS size
         |  FROM g GROUP BY 1),
         |pick0 AS (SELECT 7 AS view_mask),
         |$rounds
         |$out""".stripMargin
    })

  /** Cardinality-feedback q-error audit: the textbook estimator q458's
    * Selinger DP trusts — |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) —
    * scored against the EXACT join cardinality (q156's Σ c_a·c_b, no
    * join materialized) for the star schema's four fact joins.
    * q-error = max(est/act, act/est) is the optimizer-diagnostics
    * number (Leis et al. 2015: plans degrade once q-error reaches
    * 10–100). One count/ndv aggregate per side + one key-profile join
    * per edge; everything exact integers until the final ratios. */
  val q479QerrorAudit: QueryDef = QueryDef(
    "q479_qerror_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      def profile(df: org.apache.spark.sql.DataFrame, key: String) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def edge(a: org.apache.spark.sql.DataFrame, ka: String,
               b: org.apache.spark.sql.DataFrame, kb: String, tag: String) = {
        val pa = profile(a, ka).localCheckpoint()
        val pb = profile(b, kb).localCheckpoint()
        val statsA = pa.agg(sum(col("c")).as("na"), count(lit(1)).as("da"))
        val statsB = pb.agg(sum(col("c")).as("nb"), count(lit(1)).as("db"))
        val actual = pa.join(pb.select(col("k"), col("c").as("c2")), Seq("k"))
          .agg(coalesce(sum(col("c") * col("c2")), lit(0L)).as("actual_rows"))
        statsA.crossJoin(statsB).crossJoin(actual)
          .select(lit(tag).as("join_edge"),
            col("na"), col("nb"), col("da").as("ndv_a"), col("db").as("ndv_b"),
            ((col("na") * col("nb")).cast("double") /
              greatest(col("da"), col("db")).cast("double")).as("est"),
            col("actual_rows"))
          .select(col("join_edge"), col("na"), col("nb"),
            col("ndv_a"), col("ndv_b"),
            round(col("est"), 4).as("est_rows"), col("actual_rows"),
            round(greatest(col("est") / col("actual_rows").cast("double"),
              col("actual_rows").cast("double") / col("est")), 6).as("q_error"))
      }
      edge(t.orders, "o_orderkey", t.lineitem, "l_orderkey", "orders*lineitem")
        .unionByName(edge(t.customer, "c_custkey", t.orders, "o_custkey",
          "customer*orders"))
        .unionByName(edge(t.part, "p_partkey", t.lineitem, "l_partkey",
          "part*lineitem"))
        .unionByName(edge(t.supplier, "s_suppkey", t.lineitem, "l_suppkey",
          "supplier*lineitem"))
    },
    Some("""WITH e AS (
        SELECT 'orders*lineitem' AS join_edge,
          (SELECT COUNT(*) FROM orders) AS na,
          (SELECT COUNT(*) FROM lineitem) AS nb,
          (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_a,
          (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_b,
          (SELECT SUM(a.c * b.c) FROM
            (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1) a
            JOIN (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) b
            USING (k)) AS actual_rows
        UNION ALL
        SELECT 'customer*orders',
          (SELECT COUNT(*) FROM customer), (SELECT COUNT(*) FROM orders),
          (SELECT COUNT(DISTINCT c_custkey) FROM customer),
          (SELECT COUNT(DISTINCT o_custkey) FROM orders),
          (SELECT SUM(a.c * b.c) FROM
            (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1) a
            JOIN (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1) b
            USING (k))
        UNION ALL
        SELECT 'part*lineitem',
          (SELECT COUNT(*) FROM part), (SELECT COUNT(*) FROM lineitem),
          (SELECT COUNT(DISTINCT p_partkey) FROM part),
          (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
          (SELECT SUM(a.c * b.c) FROM
            (SELECT p_partkey AS k, COUNT(*) AS c FROM part GROUP BY 1) a
            JOIN (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) b
            USING (k))
        UNION ALL
        SELECT 'supplier*lineitem',
          (SELECT COUNT(*) FROM supplier), (SELECT COUNT(*) FROM lineitem),
          (SELECT COUNT(DISTINCT s_suppkey) FROM supplier),
          (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
          (SELECT SUM(a.c * b.c) FROM
            (SELECT s_suppkey AS k, COUNT(*) AS c FROM supplier GROUP BY 1) a
            JOIN (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) b
            USING (k)))
      SELECT join_edge,
        CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        CAST(ndv_a AS BIGINT) AS ndv_a, CAST(ndv_b AS BIGINT) AS ndv_b,
        round(CAST(na AS DOUBLE) * nb / GREATEST(ndv_a, ndv_b), 4) AS est_rows,
        CAST(actual_rows AS BIGINT) AS actual_rows,
        round(GREATEST(
          (CAST(na AS DOUBLE) * nb / GREATEST(ndv_a, ndv_b)) / actual_rows,
          actual_rows / (CAST(na AS DOUBLE) * nb / GREATEST(ndv_a, ndv_b))), 6)
          AS q_error
      FROM e"""))

  val all: Seq[QueryDef] = Seq(q477ViewSelection, q479QerrorAudit)
}
