package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Layout & allocation wave: rendezvous-hash shard stability, two-sample
  * Kolmogorov–Smirnov drift per source, degree assortativity of the
  * co-purchase graph, and water-filling token-budget allocation. All four
  * reduce corpus-scale scans to model-sized frames (shard counts, source
  * CDFs, one correlation row, per-source allocations) before any
  * expensive step.
  */
object AllocOps {

  /** Rendezvous (highest-random-weight) sharding audit: every doc scores
    * each shard with md5Long(doc_id|shard) and lands on the argmax — the
    * layout whose defining property is MINIMAL movement under resharding
    * (mod-N moves ~all keys when N changes; HRW moves exactly the keys
    * the NEW shard wins). The audit computes per-shard populations under
    * 8 and under 9 shards plus how many docs each shard loses to the
    * newcomer; the spec asserts the HRW law (a doc either keeps its shard
    * or moves to shard 8). Pure projection + one tiny agg — shard scoring
    * is argmax over 9 in-row literals, embarrassingly parallel at any
    * scale; md5 keeps the oracle bit-identical. */
  val q234RendezvousSharding: QueryDef = QueryDef(
    "q234_rendezvous_sharding",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      def score(sh: Int): Column =
        struct(md5Long(concat_ws("|", col("doc_id"), lit(sh))).as("h"),
               lit(sh).as("sh"))
      def argmax(n: Int): Column =
        greatest((0 until n).map(score): _*).getField("sh").cast("long")
      val assigned = Tables(s, dir).documents
        .select(col("doc_id"),
                argmax(8).as("shard8"), argmax(9).as("shard9"))
      assigned
        .groupBy(col("shard8").as("shard"))
        .agg(count(lit(1)).as("n8"),
             sum(when(col("shard9") === col("shard8"), 1L).otherwise(0L)).as("n_stay"),
             sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L)).as("n_moved_away"))
        .unionByName(
          assigned.filter(col("shard9") === 8)
            .agg(count(lit(1)).as("n_moved_in"))
            .select(lit(8L).as("shard"), lit(0L).as("n8"),
                    col("n_moved_in").as("n_stay"), lit(0L).as("n_moved_away")))
        .withColumn("n9", col("n_stay"))
    },
    Some("""WITH raw AS (SELECT doc_id, r.s AS sh,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(r.s AS VARCHAR)), 1, 8))::BIGINT AS h_hi,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(r.s AS VARCHAR)), 9, 8))::BIGINT AS h_lo
        FROM documents CROSS JOIN range(0, 9) r(s)),
      sc AS (SELECT doc_id, sh,
          (h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo AS h
        FROM raw),
      a8 AS (SELECT doc_id, sh AS shard8 FROM (
          SELECT doc_id, sh, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY h DESC, sh) AS rn FROM sc WHERE sh < 8) WHERE rn = 1),
      a9 AS (SELECT doc_id, sh AS shard9 FROM (
          SELECT doc_id, sh, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY h DESC, sh) AS rn FROM sc) WHERE rn = 1),
      j AS (SELECT a8.doc_id, shard8, shard9 FROM a8 JOIN a9 USING (doc_id))
      SELECT CAST(shard8 AS BIGINT) AS shard,
        CAST(COUNT(*) AS BIGINT) AS n8,
        CAST(SUM(CASE WHEN shard9 = shard8 THEN 1 ELSE 0 END) AS BIGINT) AS n_stay,
        CAST(SUM(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_away,
        CAST(SUM(CASE WHEN shard9 = shard8 THEN 1 ELSE 0 END) AS BIGINT) AS n9
      FROM j GROUP BY 1
      UNION ALL
      SELECT 8, 0,
        CAST(COUNT(*) AS BIGINT), 0, CAST(COUNT(*) AS BIGINT)
      FROM j WHERE shard9 = 8"""))

  /** Two-sample Kolmogorov–Smirnov drift test of each source's quality
    * distribution (type-token ratio) against the rest of the corpus:
    * D_s = max over the merged sample of |F_source − F_rest|, with the
    * scaled statistic sqrt(n·m/(n+m))·D. The per-source indicator fan-out
    * is |sources| × N rows — sources are a model-sized set, so the blowup
    * is a constant factor on a linear pass, and every CDF value is an
    * exact integer ratio (the max over them needs no tolerance). The
    * nonparametric complement to q164's Welch t (means) and q174's PSI
    * (binned): KS sees ANY distributional difference, unbinned. */
  val q235KsDrift: QueryDef = QueryDef(
    "q235_ks_drift",
    (s, dir) => {
      val scored = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("source"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("score"))
      val srcs = scored.select(col("source").as("s")).distinct()
      val fan = scored.crossJoin(broadcast(srcs))
        .withColumn("ind", when(col("source") === col("s"), 1L).otherwise(0L))
      val w = Window.partitionBy(col("s"))
        .orderBy(col("score").asc, col("doc_id").asc)
      val wAll = Window.partitionBy(col("s"))
      val cdf = fan
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum_s", sum(col("ind")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_s", sum(col("ind")).over(wAll))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("gap", abs(
          col("cum_s").cast("double") / col("n_s") -
          (col("i") - col("cum_s")).cast("double") / (col("n") - col("n_s"))))
      cdf.groupBy(col("s").as("source"))
        .agg(max(col("n_s")).as("n_source"),
             round(max(col("gap")), 6).as("ks_d"),
             round(max(col("gap")) * sqrt(
               (max(col("n_s")) * (max(col("n")) - max(col("n_s")))).cast("double") /
                 max(col("n"))), 6).as("ks_stat"))
    },
    Some("""WITH t AS (SELECT doc_id, source,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      scored AS (SELECT doc_id, source,
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS score
        FROM t WHERE len(toks) > 0),
      srcs AS (SELECT DISTINCT source AS s FROM scored),
      fan AS (SELECT sc.doc_id, sc.source, sc.score, srcs.s,
          CASE WHEN sc.source = srcs.s THEN 1 ELSE 0 END AS ind
        FROM scored sc CROSS JOIN srcs),
      cdf AS (SELECT s,
          ROW_NUMBER() OVER win AS i,
          SUM(ind) OVER (win ROWS UNBOUNDED PRECEDING) AS cum_s,
          SUM(ind) OVER (PARTITION BY s) AS n_s,
          COUNT(*) OVER (PARTITION BY s) AS n
        FROM fan
        WINDOW win AS (PARTITION BY s ORDER BY score, doc_id)),
      gaps AS (SELECT s, n_s, n,
          abs(CAST(cum_s AS DOUBLE) / n_s
            - CAST(i - cum_s AS DOUBLE) / (n - n_s)) AS gap
        FROM cdf)
      SELECT s AS source, CAST(MAX(n_s) AS BIGINT) AS n_source,
        round(MAX(gap), 6) AS ks_d,
        round(MAX(gap) * sqrt(CAST(MAX(n_s) * (MAX(n) - MAX(n_s)) AS DOUBLE) / MAX(n)), 6) AS ks_stat
      FROM gaps GROUP BY 1"""))

  /** Degree assortativity of the support-2 co-purchase graph (q228's edge
    * set): the Pearson correlation of endpoint degrees across edges —
    * positive means hubs buy with hubs (assortative mixing), negative
    * means hubs pair with the periphery. All five correlation sums are
    * exact integers (degrees × directed edge list), so the single-row
    * closed form is bit-identical on both engines. One self-join on the
    * order key, one degree agg, one 1-row reduce. */
  val q236DegreeAssortativity: QueryDef = QueryDef(
    "q236_degree_assortativity",
    (s, dir) => {
      // shared derived base table (GraphBase, distinct-support variant):
      // feeds degrees AND the directed edge list
      val edges = GraphBase.coPurchaseEdgesDistinct(s, dir)
      val und = edges.select(col("pa").as("n"), col("pb").as("m"))
        .union(edges.select(col("pb").as("n"), col("pa").as("m")))
      val deg = und.groupBy(col("n")).agg(count(lit(1)).as("deg"))
      und
        .join(deg.select(col("n"), col("deg").as("dx")), Seq("n"))
        .join(deg.select(col("n").as("m"), col("deg").as("dy")), Seq("m"))
        .agg(count(lit(1)).as("m_edges"),
             sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
             sum(col("dx") * col("dy")).as("sxy"),
             sum(col("dx") * col("dx")).as("sxx"),
             sum(col("dy") * col("dy")).as("syy"))
        .select(
          expr("m_edges div 2").as("n_edges"),
          round((col("m_edges") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("m_edges") * col("sxx") - col("sx") * col("sx")).cast("double")) *
             sqrt((col("m_edges") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
            .as("assortativity"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      und AS (SELECT pa AS n, pb AS m FROM e UNION ALL SELECT pb, pa FROM e),
      deg AS (SELECT n, COUNT(*) AS deg FROM und GROUP BY 1),
      j AS (SELECT dx.deg AS dx, dy.deg AS dy
        FROM und JOIN deg dx ON und.n = dx.n JOIN deg dy ON und.m = dy.n),
      sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges,
          CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
          CAST(SUM(dx * dy) AS BIGINT) AS sxy,
          CAST(SUM(dx * dx) AS BIGINT) AS sxx,
          CAST(SUM(dy * dy) AS BIGINT) AS syy
        FROM j)
      SELECT m_edges // 2 AS n_edges,
        round(CAST(m_edges * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(m_edges * sxx - sx * sx AS DOUBLE))
           * sqrt(CAST(m_edges * syy - sy * sy AS DOUBLE))), 6) AS assortativity
      FROM sums"""))

  /** Water-filling token-budget allocation (max-min fairness with caps):
    * split a global training-token budget B = ⌊Σcaps/2⌋ across sources,
    * each capped by its own token count — sources below the water level L
    * keep everything, the rest are cut to L, with Σ min(cap, L) = B. L
    * has the closed form (B − prefix_k)/(n − k) on the ascending-cap
    * prefix where the bracket condition holds; every input to the bracket
    * test and to L is an exact integer, so both engines pick the same
    * bracket and compute the same L. The corpus-scale work is one token
    * count; the solve runs on the model-sized source frame. */
  val q237WaterFilling: QueryDef = QueryDef(
    "q237_water_filling",
    (s, dir) => {
      val caps = Tables(s, dir).documents
        .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("cap"))
      val wOrd = Window.partitionBy().orderBy(col("cap").asc, col("source").asc)
      val wAll = Window.partitionBy()
      val ranked = caps
        .withColumn("k", row_number().over(wOrd) - 1L) // sources saturated before this one
        .withColumn("prefix", sum(col("cap")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("prefix", coalesce(col("prefix"), lit(0L)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("b", floor(sum(col("cap")).over(wAll) / 2.0).cast("long"))
      // bracket: level computed with k sources saturated is valid when it
      // clears every saturated cap and does not exceed the current cap
      val lvl = ranked
        .withColumn("l", (col("b") - col("prefix")).cast("double") / (col("n") - col("k")))
        .withColumn("prev_cap", lag(col("cap"), 1).over(wOrd))
        .filter((col("k") === 0L || col("prev_cap").cast("double") <= col("l")) &&
                col("l") <= col("cap").cast("double"))
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") === 1)
        .select(col("l").as("level"), col("b").as("budget"))
      caps.crossJoin(broadcast(lvl))
        .select(col("source"), col("cap"), col("budget"),
                round(least(col("cap").cast("double"), col("level")), 6).as("alloc"),
                (col("cap").cast("double") <= col("level")).as("kept_all"))
    },
    Some("""WITH caps AS (
        SELECT source, CAST(SUM(len(regexp_extract_all(lower(text), '\w+'))) AS BIGINT) AS cap
        FROM documents GROUP BY 1),
      ranked AS (SELECT source, cap,
          ROW_NUMBER() OVER wo - 1 AS k,
          COALESCE(SUM(cap) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
          LAG(cap) OVER wo AS prev_cap,
          COUNT(*) OVER () AS n,
          CAST(SUM(cap) OVER () // 2 AS BIGINT) AS b
        FROM caps
        WINDOW wo AS (ORDER BY cap, source)),
      lvl AS (SELECT CAST(b - prefix AS DOUBLE) / (n - k) AS level, b AS budget
        FROM ranked
        WHERE (k = 0 OR CAST(prev_cap AS DOUBLE) <= CAST(b - prefix AS DOUBLE) / (n - k))
          AND CAST(b - prefix AS DOUBLE) / (n - k) <= CAST(cap AS DOUBLE)
        ORDER BY k LIMIT 1)
      SELECT c.source, c.cap, l.budget,
        round(least(CAST(c.cap AS DOUBLE), l.level), 6) AS alloc,
        CAST(c.cap AS DOUBLE) <= l.level AS kept_all
      FROM caps c CROSS JOIN lvl l"""))

  val all: Seq[QueryDef] =
    Seq(q234RendezvousSharding, q235KsDrift, q236DegreeAssortativity,
        q237WaterFilling)
}
