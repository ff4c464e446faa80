package graft.ops

import org.apache.spark.sql.functions._

/** AMS inner-product join-size estimation (Alon–Gibbons–Matias–Szegedy
  * 1999) — the two-stream extension of q483's F2 sketch and the planner
  * primitive it exists for: |R ⋈_k S| = Σ_k f^R_k·f^S_k is the EXACT
  * equi-join output size, and the product of two independently-built
  * tug-of-war counters t^R_j·t^S_j is an unbiased estimate of it. Each
  * side keeps 64 signed BIGINT counters built with the SAME sign hash —
  * so the sketches compose across tables that never co-reside, which is
  * the whole point: a catalog stores 64 longs per (table, key) and
  * prices ANY join between them without touching data.
  *
  * The audited join here is events.user_id ⋈ orders.o_custkey — the
  * activity×purchases join whose size no FK constraint pins down.
  *
  * Exactness across engines: q483's md5 sign convention on the shared
  * key domain, BIGINT counter algebra, group means as BIGINT-product
  * sums over 8.0, the median spelled (m[4]+m[5])/2 on the sorted means;
  * the exact truth is one join-free inner product of the two frequency
  * frames.
  *
  * Scale shape: one hash-agg per side to key-frequency frames (the only
  * corpus-sized shuffles), estimator fan-out rides the key frames, the
  * exact truth joins the two KEY frames (|keys|, not |rows|), and the
  * final combine is 1-row × 1-row (PlanGuard-declared broadcast).
  */
object JoinSizeOps {

  private val R = 64
  private val G = 8

  val q493JoinSizeSketch: QueryDef = QueryDef(
    "q493_join_size_sketch",
    (s, dir) => {
      val t = Tables(s, dir)
      def counters(freq: org.apache.spark.sql.DataFrame, side: String) = freq
        .select(col("k"), col("f"),
          explode(sequence(lit(0), lit(R - 1))).as("j"))
        .withColumn("sgn",
          lit(1L) - lit(2L) * pmod(
            conv(substring(md5(concat_ws("|",
              col("k").cast("string"), col("j").cast("string"))), 1, 1),
              16, 10).cast("long"), lit(2L)))
        .groupBy(col("j"))
        .agg(sum(col("f") * col("sgn")).as(s"t_$side"))
      val fE = EventOps.events(s, dir)
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("f"))
        .localCheckpoint() // feeds sketch + exact truth
      val fO = t.orders
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("f"))
        .localCheckpoint()
      val est = counters(fE, "e").join(counters(fO, "o"), Seq("j"))
        .groupBy((col("j") / lit(R / G)).cast("long").as("g"))
        .agg((sum(col("t_e") * col("t_o")) / lit((R / G).toDouble)).as("m"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(((element_at(col("ms"), G / 2) +
          element_at(col("ms"), G / 2 + 1)) / lit(2.0)).as("join_est_raw"))
      val exact = fE.join(fO, Seq("k"))
        .agg(count(lit(1)).as("n_shared_keys"),
          sum(fE("f") * fO("f")).as("join_exact"))
      exact.crossJoin(broadcast(est))
        .select(col("n_shared_keys"), col("join_exact"),
          round(col("join_est_raw"), 4).as("join_est"),
          round(abs(col("join_est_raw") - col("join_exact").cast("double")) /
            col("join_exact").cast("double"), 6).as("rel_err"))
    },
    Some(s"""WITH fe AS (
        SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS f
        FROM events GROUP BY 1),
      fo AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS f
        FROM orders GROUP BY 1),
      se AS (
        SELECT j, CAST(SUM(f * (1 - 2 * (('0x' || substr(md5(
            CAST(k AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1))::BIGINT
            % 2))) AS BIGINT) AS t_e
        FROM fe, range($R) r(j) GROUP BY 1),
      so AS (
        SELECT j, CAST(SUM(f * (1 - 2 * (('0x' || substr(md5(
            CAST(k AS VARCHAR) || '|' || CAST(j AS VARCHAR)), 1, 1))::BIGINT
            % 2))) AS BIGINT) AS t_o
        FROM fo, range($R) r(j) GROUP BY 1),
      grp AS (
        SELECT se.j // ${R / G} AS g,
          SUM(se.t_e * so.t_o) / ${(R / G).toDouble} AS m
        FROM se JOIN so ON se.j = so.j GROUP BY 1),
      est AS (
        SELECT (ms[${G / 2}] + ms[${G / 2 + 1}]) / 2.0 AS join_est_raw
        FROM (SELECT list_sort(list(m)) AS ms FROM grp)),
      ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shared_keys,
          CAST(SUM(fe.f * fo.f) AS BIGINT) AS join_exact
        FROM fe JOIN fo ON fe.k = fo.k)
      SELECT ex.n_shared_keys, ex.join_exact,
        round(est.join_est_raw, 4) AS join_est,
        round(abs(est.join_est_raw - CAST(ex.join_exact AS DOUBLE)) /
          CAST(ex.join_exact AS DOUBLE), 6) AS rel_err
      FROM ex CROSS JOIN est"""))

  val all: Seq[QueryDef] = Seq(q493JoinSizeSketch)
}
