package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Segmentation & reshaping operators: pivot/crosstab, RFM customer
  * segmentation, and asymmetric containment dedup (quote detection) —
  * the BI-facing reshape ops plus the one near-dup contract the
  * Jaccard family can't express.
  */
object SegmentOps {

  private val M = DecimalType(18, 4)

  /** Pivot/crosstab: nation × order-year revenue matrix — the reshape
    * every BI layer asks of an engine. Spark's `pivot` with an EXPLICIT
    * value list compiles to one hash aggregate of conditional sums (no
    * second pass to discover pivot values, no driver-side distinct) —
    * exactly the CASE-WHEN matrix the oracle spells out. Money sums run
    * in DECIMAL then cast, so partitioning cannot perturb cells. Scale:
    * one shuffle by n_name; the year dimension is bounded (7 columns),
    * dims broadcast.
    */
  val q158PivotMatrix: QueryDef = QueryDef(
    "q158_pivot_matrix",
    (s, dir) => {
      val t = Tables(s, dir)
      val years = 1995 to 2001
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("yr"),
                col("o_totalprice").cast(M).as("p"))
      val pivoted = base.groupBy(col("n_name"))
        .pivot("yr", years.map(_.asInstanceOf[AnyRef]))
        .agg(round(sum(col("p")).cast("double"), 2))
      years.foldLeft(pivoted)((d, y) => d.withColumnRenamed(y.toString, s"y$y"))
    },
    Some("""WITH base AS (SELECT n_name,
          EXTRACT(year FROM o_orderdate) AS yr,
          CAST(o_totalprice AS DECIMAL(18,4)) AS p
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey)
      SELECT n_name,
        round(CAST(SUM(CASE WHEN yr = 1995 THEN p END) AS DOUBLE), 2) AS y1995,
        round(CAST(SUM(CASE WHEN yr = 1996 THEN p END) AS DOUBLE), 2) AS y1996,
        round(CAST(SUM(CASE WHEN yr = 1997 THEN p END) AS DOUBLE), 2) AS y1997,
        round(CAST(SUM(CASE WHEN yr = 1998 THEN p END) AS DOUBLE), 2) AS y1998,
        round(CAST(SUM(CASE WHEN yr = 1999 THEN p END) AS DOUBLE), 2) AS y1999,
        round(CAST(SUM(CASE WHEN yr = 2000 THEN p END) AS DOUBLE), 2) AS y2000,
        round(CAST(SUM(CASE WHEN yr = 2001 THEN p END) AS DOUBLE), 2) AS y2001
      FROM base GROUP BY 1"""))

  /** RFM customer segmentation (recency / frequency / monetary), the
    * classic CRM operator — but scored against broadcast PERCENTILE
    * cutoffs instead of a global NTILE window: ntile needs one total
    * order over every customer (a single-partition sort that dies at
    * 100 TB), while tercile thresholds are a 1-row aggregate broadcast
    * back onto a keyed scan (the q145 winsorize idiom). Customer rollup
    * is checkpointed once and feeds both the threshold agg and the
    * scoring pass. Monetary sums in DECIMAL; scores are deterministic
    * comparisons against exact interpolated percentiles.
    */
  val q159RfmSegments: QueryDef = QueryDef(
    "q159_rfm_segments",
    (s, dir) => {
      val per = Tables(s, dir).orders
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_ts"),
             count(lit(1)).as("f"),
             sum(col("o_totalprice").cast(M)).as("m_dec"))
        .withColumn("m", col("m_dec").cast("double"))
        .localCheckpoint()
      val ref = per.agg(max(col("last_ts")).as("ref_ts"),
        expr("percentile(f, 0.33)").as("f33"),
        expr("percentile(f, 0.67)").as("f67"),
        expr("percentile(m, 0.33)").as("m33"),
        expr("percentile(m, 0.67)").as("m67"))
      val withR = per.crossJoin(broadcast(ref))
        .withColumn("r_days",
          datediff(to_date(col("ref_ts")), to_date(col("last_ts"))).cast("long"))
      val rth = withR.agg(
        expr("percentile(r_days, 0.33)").as("r33"),
        expr("percentile(r_days, 0.67)").as("r67"))
      withR.crossJoin(broadcast(rth))
        .withColumn("score_r", lit(1L) +
          (col("r_days") <= col("r67")).cast("long") +
          (col("r_days") <= col("r33")).cast("long"))
        .withColumn("score_f", lit(1L) +
          (col("f") > col("f33")).cast("long") +
          (col("f") > col("f67")).cast("long"))
        .withColumn("score_m", lit(1L) +
          (col("m") > col("m33")).cast("long") +
          (col("m") > col("m67")).cast("long"))
        .withColumn("segment", concat(lit("r"), col("score_r").cast("string"),
          lit("f"), col("score_f").cast("string"),
          lit("m"), col("score_m").cast("string")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("m_dec")).cast("double") / count(lit(1)), 4)
            .as("avg_monetary"),
          round(sum(col("r_days")).cast("double") / count(lit(1)), 4)
            .as("avg_recency_days"))
    },
    Some("""WITH per AS (SELECT o_custkey, MAX(o_orderdate) AS last_ts,
          COUNT(*) AS f,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS m_dec,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS m
        FROM orders GROUP BY 1),
      ref AS (SELECT MAX(last_ts) AS ref_ts,
          quantile_cont(f, 0.33) AS f33, quantile_cont(f, 0.67) AS f67,
          quantile_cont(m, 0.33) AS m33, quantile_cont(m, 0.67) AS m67
        FROM per),
      wr AS (SELECT per.*, ref.*,
          CAST(date_diff('day', CAST(last_ts AS DATE), CAST(ref_ts AS DATE))
            AS BIGINT) AS r_days
        FROM per, ref),
      rth AS (SELECT quantile_cont(r_days, 0.33) AS r33,
          quantile_cont(r_days, 0.67) AS r67 FROM wr),
      sc AS (SELECT wr.*,
          1 + CASE WHEN r_days <= r67 THEN 1 ELSE 0 END
            + CASE WHEN r_days <= r33 THEN 1 ELSE 0 END AS score_r,
          1 + CASE WHEN f > f33 THEN 1 ELSE 0 END
            + CASE WHEN f > f67 THEN 1 ELSE 0 END AS score_f,
          1 + CASE WHEN m > m33 THEN 1 ELSE 0 END
            + CASE WHEN m > m67 THEN 1 ELSE 0 END AS score_m
        FROM wr, rth)
      SELECT concat('r', score_r, 'f', score_f, 'm', score_m) AS segment,
        COUNT(*) AS n_customers,
        round(CAST(SUM(m_dec) AS DOUBLE) / COUNT(*), 4) AS avg_monetary,
        round(CAST(SUM(r_days) AS DOUBLE) / COUNT(*), 4) AS avg_recency_days
      FROM sc GROUP BY 1"""))

  /** Asymmetric containment join (quote / subset detection): pairs where
    * ≥ 80% of src's 3-token shingles appear in dst — the near-dup
    * contract Jaccard CANNOT express (a short doc quoted inside a long
    * one has high containment but low Jaccard, so q28/q109 never see
    * it; this is how excerpt/boilerplate inclusion is found in LLM
    * corpora). Same prefix-filter completeness argument as q109, but
    * one-sided: a dst covering ≥ τ·|src| shingles can miss at most
    * ⌊(1−τ)·|src|⌋ of them, so it MUST share one of src's
    * ⌊(1−τ)·|src|⌋+1 rarest shingles. Candidates come from an equi-join
    * of src PREFIXES against dst's full shingle list (plus the
    * |dst| ≥ τ·|src| size prune); exact array-intersect verifies. At
    * 100 TB: df is a hash-agg, the join touches rare shingles only,
    * no quadratic stage. Shingle strings ↔ xxhash64 triples are
    * bijective modulo 64-bit collisions (same caveat as q109).
    */
  val q160ContainmentJoin: QueryDef = QueryDef(
    "q160_containment_join",
    (s, dir) => {
      val tau = 0.8
      // Checkpoint the BARE (doc_id, shd) projection: referencing the
      // shingle HOF from a later filter/size() makes Catalyst inline the
      // expensive expression into the predicate and every referencing
      // output column (CollapseProject + predicate pushdown), tripling
      // its evaluation — measured 10 s vs 3 s at sf0.1. Derive sz and
      // the min-size gate from the materialized arrays instead.
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .withColumn("shd", array_distinct(
          expr("transform(sequence(0, size(toks)-3), i -> xxhash64(toks[i], toks[i+1], toks[i+2]))")))
        .select(col("doc_id"), col("shd"))
        .localCheckpoint() // one shingle pass feeds prefix build AND verify
        .withColumn("sz", size(col("shd")))
        .filter(col("sz") >= 5)
      val sh = docs.select(col("doc_id"), col("sz"), explode(col("shd")).as("h"))
      val df = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      // (r16 examined: the q109-style collect_list prefix build measured
      // slower than this window here too — 2.04 → 2.54 s dedicated; kept.)
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("df").asc, col("h").asc)
      val prefix = sh.join(df, "h")
        .withColumn("pos", row_number().over(wDoc))
        .filter(col("pos") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
        .select(col("h"), col("doc_id").as("src_id"), col("sz").as("src_sz"))
      val cand = prefix
        .join(sh.select(col("h"), col("doc_id").as("dst_id"), col("sz").as("dst_sz")), "h")
        .filter(col("src_id") =!= col("dst_id") &&
                col("dst_sz") >= lit(tau) * col("src_sz"))
        .select(col("src_id"), col("dst_id"))
        .distinct()
      cand
        .join(docs.select(col("doc_id").as("src_id"), col("shd").as("sh_a"),
                          col("sz").as("src_sz")), "src_id")
        .join(docs.select(col("doc_id").as("dst_id"), col("shd").as("sh_b")), "dst_id")
        .withColumn("containment",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / col("src_sz"))
        .filter(col("containment") >= tau)
        .select(col("src_id"), col("dst_id"), col("containment"))
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      s AS (SELECT doc_id,
          list_distinct(list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3),
      f AS (SELECT doc_id, sh, len(sh) AS sz FROM s WHERE len(sh) >= 5)
      SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / a.sz AS containment
      FROM f a JOIN f b ON a.doc_id <> b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / a.sz >= 0.8"""))

  /** Unpivot/melt — the inverse reshape of q158: a wide per-nation
    * profile (customer, supplier, order counts) melts into tidy
    * (entity, metric, value) rows, the layout metric stores and chart
    * layers consume. Spark's native `unpivot` expands columns to rows
    * in the projection — no shuffle beyond the profile build, and the
    * profile itself is three keyed counts stitched by broadcast join
    * onto the 25-row nation dim. Explicit value-column list (never the
    * infer-all overload): at 100 TB you melt the columns you mean.
    */
  val q168Unpivot: QueryDef = QueryDef(
    "q168_unpivot",
    (s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_customers"))
      val su = t.supplier.groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_suppliers"))
      val o = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_orders"))
      t.nation.select(col("n_nationkey").as("nk"), col("n_name"))
        .join(broadcast(c), Seq("nk"), "left")
        .join(broadcast(su), Seq("nk"), "left")
        .join(broadcast(o), Seq("nk"), "left")
        .select(col("n_name"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .unpivot(Array(col("n_name")),
          Array(col("n_customers"), col("n_suppliers"), col("n_orders")),
          "metric", "value")
    },
    Some("""WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer GROUP BY 1),
      su AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY 1),
      o AS (SELECT c_nationkey AS nk, COUNT(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
      wide AS (SELECT n_name,
          COALESCE(c.n_customers, 0) AS n_customers,
          COALESCE(su.n_suppliers, 0) AS n_suppliers,
          COALESCE(o.n_orders, 0) AS n_orders
        FROM nation
        LEFT JOIN c ON n_nationkey = c.nk
        LEFT JOIN su ON n_nationkey = su.nk
        LEFT JOIN o ON n_nationkey = o.nk)
      SELECT n_name, 'n_customers' AS metric, n_customers AS value FROM wide
      UNION ALL
      SELECT n_name, 'n_suppliers', n_suppliers FROM wide
      UNION ALL
      SELECT n_name, 'n_orders', n_orders FROM wide"""))

  val all: Seq[QueryDef] = Seq(q158PivotMatrix, q159RfmSegments,
    q160ContainmentJoin, q168Unpivot)
}
