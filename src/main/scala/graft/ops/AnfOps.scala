package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Neighborhood-function wave: ANF/HyperANF-style estimation of every
  * node's r-hop ball size with mergeable bit-register sketches (Palmer
  * et al. KDD'02; Boldi et al. WWW'11), audited per round against the
  * exact ball sizes — the graph twin of the NDV-sketch audit (q221):
  * at 100 TB the exact pair-expansion is the thing you CANNOT run, and
  * this measures precisely what the linear-size sketch gives up.
  *
  * Scale shape: a sketch here is 4 long registers per node (sparse
  * (node, word, mask) rows); one propagation round is one equi-join of
  * the symmetric edge list with the sketch frame and a bit_or
  * re-aggregate — O(|E|) rows shuffled per round, vs the exact side's
  * O(Σ ball sizes) pair frame, which the degree cap keeps test-sized.
  */
object AnfOps {

  private val Rounds = 3

  /** 252-bit linear-counting register file per node over the capped
    * co-purchase graph (q380's construction): node v sets bit
    * md5(v) mod 252; round r ORs every neighbor's registers into v.
    * est(v) = −252·ln(1 − bits/252) (capped one short of saturation),
    * and the per-round report compares the sketch's mean ball estimate
    * with the exact mean ball size from the unrolled pair expansion. */
  val q398AnfSketch: QueryDef = QueryDef(
    "q398_anf_sketch",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      // shared derived base table (GraphBase): capped co-purchase edges
      val edges = GraphBase.cappedCoPurchase(s, dir, 8)
      val sym = edges.select(col("x").as("u"), col("y").as("v"))
        .unionAll(edges.select(col("y").as("u"), col("x").as("v")))
        .localCheckpoint()
      val nodes = sym.select(col("u").as("node")).distinct()
      var sketch = nodes
        .withColumn("pos", pmod(md5Long(concat(lit("anf|"), col("node"))), lit(252L)))
        .select(col("node"), (col("pos") / 63L).cast("long").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("m"))
        .localCheckpoint()
      var pairs = nodes.select(col("node"), col("node").as("member"))
        .localCheckpoint()
      def report(r: Int): org.apache.spark.sql.DataFrame = {
        val est = sketch.groupBy(col("node"))
          .agg(sum(bit_count(col("m"))).as("bits"))
          .withColumn("est", round(lit(-252.0) *
            log(lit(1.0) - least(col("bits"), lit(251L)) / lit(252.0)), 6))
        val exact = pairs.groupBy(col("node"))
          .agg(count(lit(1)).cast("long").as("ball"))
        est.join(exact, Seq("node"))
          .agg(count(lit(1)).cast("long").as("n_nodes"),
            sum(col("est").cast("decimal(24,6)")).as("est_sum"),
            sum(col("ball")).as("ball_sum"),
            sum(round(abs(col("est") - col("ball")) / col("ball"), 6)
              .cast("decimal(24,6)")).as("err_sum"))
          .select(lit(r.toLong).as("round"), col("n_nodes"),
            round(col("est_sum").cast("double") / col("n_nodes"), 4).as("avg_est"),
            round(col("ball_sum").cast("double") / col("n_nodes"), 4).as("avg_exact"),
            round(col("err_sum").cast("double") / col("n_nodes"), 4).as("avg_rel_err"))
      }
      var out = report(0)
      for (r <- 1 to Rounds) {
        sketch = sketch.join(sym.select(col("u"), col("v").as("node2")),
            col("node") === col("u"))
          .select(col("node2").as("node"), col("w"), col("m"))
          .unionByName(sketch)
          .groupBy(col("node"), col("w"))
          .agg(expr("bit_or(m)").as("m"))
          .localCheckpoint()
        pairs = pairs.join(sym.select(col("u"), col("v").as("node2")),
            col("node") === col("u"))
          .select(col("node2").as("node"), col("member"))
          .unionByName(pairs)
          .distinct()
          .localCheckpoint()
        out = out.unionByName(report(r))
      }
      out.orderBy(col("round"))
    },
    Some {
      // sign-extend hi32 then scale: equals Spark's (hi << 32) | lo in
      // two's-complement without DuckDB's range-checked shift
      def md5sql(e: String): String =
        s"""((('0x' || substr(md5($e), 1, 8))::BIGINT
           | - CASE WHEN ('0x' || substr(md5($e), 1, 8))::BIGINT >= 2147483648
           |   THEN 4294967296 ELSE 0 END) * 4294967296
           | + ('0x' || substr(md5($e), 9, 8))::BIGINT)""".stripMargin.replace("\n", " ")
      val rounds = (1 to Rounds).map { r =>
        s"""sk$r AS MATERIALIZED (SELECT node, w, bit_or(m) AS m FROM (
           |    SELECT e.v AS node, s.w, s.m FROM sk${r - 1} s JOIN sym e ON e.u = s.node
           |    UNION ALL SELECT node, w, m FROM sk${r - 1}) GROUP BY 1, 2),
           |pr$r AS MATERIALIZED (SELECT DISTINCT node, member FROM (
           |    SELECT e.v AS node, p.member FROM pr${r - 1} p JOIN sym e ON e.u = p.node
           |    UNION ALL SELECT node, member FROM pr${r - 1}))""".stripMargin
      }.mkString(",\n")
      val reports = (0 to Rounds).map { r =>
        s"""SELECT ${r}::BIGINT AS round,
           |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
           |  round(CAST(SUM(CAST(est AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*), 4) AS avg_est,
           |  round(CAST(SUM(ball) AS DOUBLE) / COUNT(*), 4) AS avg_exact,
           |  round(CAST(SUM(CAST(round(abs(est - ball) / ball, 6) AS DECIMAL(24,6))) AS DOUBLE)
           |    / COUNT(*), 4) AS avg_rel_err
           |FROM (
           |  SELECT s.node, round(-252.0 * ln(1.0 - least(s.bits, 251) / 252.0), 6) AS est,
           |    b.ball
           |  FROM (SELECT node, SUM(bit_count(m)) AS bits FROM sk$r GROUP BY 1) s
           |  JOIN (SELECT node, CAST(COUNT(*) AS BIGINT) AS ball FROM pr$r GROUP BY 1) b
           |    ON b.node = s.node)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e0src AS MATERIALIZED (SELECT a.l_partkey AS x, b.l_partkey AS y
         |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         |  WHERE a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |adj AS (SELECT x AS v, y AS n FROM e0src UNION ALL SELECT y, x FROM e0src),
         |rk AS (SELECT v, n, ROW_NUMBER() OVER (PARTITION BY v ORDER BY n) AS rk FROM adj),
         |kd AS MATERIALIZED (SELECT v, n FROM rk WHERE rk <= 8),
         |kept AS MATERIALIZED (SELECT lo.v AS x, lo.n AS y
         |  FROM (SELECT * FROM kd WHERE v < n) lo
         |  WHERE EXISTS (SELECT 1 FROM kd hi WHERE hi.v = lo.n AND hi.n = lo.v)),
         |sym AS MATERIALIZED (SELECT x AS u, y AS v FROM kept
         |  UNION ALL SELECT y, x FROM kept),
         |nodes AS (SELECT DISTINCT u AS node FROM sym),
         |sk0 AS MATERIALIZED (SELECT node,
         |    pos // 63 AS w, 1::BIGINT << CAST(pos % 63 AS INT) AS m
         |  FROM (SELECT node,
         |      ((${md5sql("'anf|' || node")} % 252) + 252) % 252 AS pos
         |    FROM nodes)),
         |pr0 AS (SELECT node, node AS member FROM nodes),
         |$rounds
         |SELECT * FROM ($reports) ORDER BY round""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q398AnfSketch)
}
