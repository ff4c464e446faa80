package graft.ops

import org.apache.spark.sql.functions._

/** Dynamic time warping (Sakoe–Chiba 1978) between each nation's weekly
  * demand curve and a reference nation's — the alignment distance that
  * tolerates phase shift (a nation ordering the same seasonal pattern two
  * weeks late is CLOSE under DTW, far under lockstep L1). Emitted beside
  * the lockstep L1 cost, the warp_gain column says how much of each
  * nation's apparent divergence is pure timing.
  *
  * Execution shape — the wavefront trick: the DTW recurrence
  * dp(i,j) = cost(i,j) + min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1)) is
  * sequential in rows but embarrassingly parallel along ANTI-DIAGONALS
  * (cells with i+j = d depend only on diagonals d-1 and d-2). Both
  * engines run the same 62-step diagonal fold over two carried arrays:
  * Spark as one codegen'd `aggregate` HOF over the per-nation series
  * pair (a 32×32 solve is model-sized arithmetic — framing it as 62
  * checkpointed joins would pay 62 tiny jobs for microseconds of work,
  * the q448 lesson), DuckDB as a recursive CTE over LIST columns. All
  * costs are |count−count| BIGINT integers with a 10^15 sentinel for
  * out-of-band cells, so the fold is exact and the engines agree
  * bit-for-bit.
  *
  * Scale shape: one orders scan aggregates to the (nation × 32 weeks)
  * grid (the only corpus-sized shuffle); everything after is a 25-row
  * frame. The 1-row reference-series broadcast is PlanGuard-declared.
  * At 100 TB with millions of series the same plan holds: the fold is a
  * per-row expression, so DTW cost is linear in series count with zero
  * extra shuffles.
  */
object DtwOps {

  private val N   = 32               // weeks per series
  private val Inf = "1000000000000000L"

  val q485DtwWarp: QueryDef = QueryDef(
    "q485_dtw_warp",
    (s, dir) => {
      val t = Tables(s, dir)
      val cnt = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_nationkey").as("nk"))), col("o_custkey") === col("c_custkey"))
        .select(col("nk"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).as("dd"))
        // filter the RAW day offset before the /7 division: cast_long
        // truncates toward zero, so dd in -6..-1 would otherwise land in
        // week 0 while the oracle's BETWEEN 0 AND 7N-1 excludes it
        .filter(col("dd") >= 0 && col("dd") < 7 * N)
        .select(col("nk"), (col("dd") / 7).cast("long").as("pos"))
        .groupBy(col("nk"), col("pos")).agg(count(lit(1)).as("c"))
      val spine = t.nation.select(col("n_nationkey").as("nk"), col("n_name"),
        explode(sequence(lit(0L), lit((N - 1).toLong))).as("pos"))
      val ser = spine.join(cnt, Seq("nk", "pos"), "left")
        .na.fill(0L, Seq("c"))
        .groupBy(col("nk"), col("n_name"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
          .as("a"))
        .localCheckpoint() // feeds both sides of the reference broadcast
      val ref = ser.filter(col("nk") === 0).select(col("a").as("b"))
      ser.crossJoin(broadcast(ref)) // 1-row reference series
        .withColumn("dtw_cost", expr(
          s"""aggregate(
                sequence(3, ${2 * N}),
                named_struct(
                  'cur', transform(sequence(1, $N),
                           i -> IF(i = 1, abs(a[0] - b[0]), $Inf)),
                  'prev', transform(sequence(1, $N), i -> $Inf)),
                (acc, d) -> named_struct(
                  'cur', transform(sequence(1, $N), i ->
                    IF(d - i >= 1 AND d - i <= $N,
                       abs(element_at(a, i) - element_at(b, d - i)) + least(
                         IF(i >= 2, element_at(acc.cur, i - 1), $Inf),
                         element_at(acc.cur, i),
                         IF(i >= 2, element_at(acc.prev, i - 1), $Inf)),
                       $Inf)),
                  'prev', acc.cur),
                acc -> element_at(acc.cur, $N))"""))
        .withColumn("lockstep_cost", expr(
          "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, (s, x) -> s + x)"))
        .select(col("n_name"), col("dtw_cost"), col("lockstep_cost"),
          when(col("lockstep_cost") === 0, lit(0.0))
            .otherwise(round((col("lockstep_cost") - col("dtw_cost"))
              .cast("double") / col("lockstep_cost").cast("double"), 6))
            .as("warp_gain"))
    },
    Some(s"""WITH RECURSIVE cnt AS (
        SELECT c.c_nationkey AS nk,
          date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)) // 7
            AS pos,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE))
          BETWEEN 0 AND ${7 * N - 1}
        GROUP BY 1, 2),
      ser AS (
        SELECT n.n_nationkey AS nk, n.n_name,
          list(COALESCE(cnt.c, 0) ORDER BY sp.pos) AS a
        FROM nation n
        CROSS JOIN range($N) sp(pos)
        LEFT JOIN cnt ON cnt.nk = n.n_nationkey AND cnt.pos = sp.pos
        GROUP BY 1, 2),
      ref AS (SELECT a AS b FROM ser WHERE nk = 0),
      dp AS (
        SELECT s.nk, s.n_name, s.a, r.b, 2 AS d,
          list_transform(range(1, ${N + 1}), i ->
            CASE WHEN i = 1 THEN abs(s.a[1] - r.b[1])
                 ELSE 1000000000000000 END) AS cur,
          list_transform(range(1, ${N + 1}), i -> 1000000000000000) AS prev
        FROM ser s, ref r
        UNION ALL
        SELECT nk, n_name, a, b, d + 1,
          list_transform(range(1, ${N + 1}), i ->
            CASE WHEN d + 1 - i BETWEEN 1 AND $N THEN
              abs(a[i] - b[d + 1 - i]) + least(
                CASE WHEN i >= 2 THEN cur[i - 1] ELSE 1000000000000000 END,
                cur[i],
                CASE WHEN i >= 2 THEN prev[i - 1] ELSE 1000000000000000 END)
            ELSE 1000000000000000 END) AS cur,
          cur AS prev
        FROM dp WHERE d < ${2 * N})
      SELECT n_name, CAST(cur[$N] AS BIGINT) AS dtw_cost,
        CAST(list_sum(list_transform(range(1, ${N + 1}),
          i -> abs(a[i] - b[i]))) AS BIGINT) AS lockstep_cost,
        CASE WHEN list_sum(list_transform(range(1, ${N + 1}),
            i -> abs(a[i] - b[i]))) = 0 THEN 0.0
          ELSE round((CAST(list_sum(list_transform(range(1, ${N + 1}),
              i -> abs(a[i] - b[i]))) AS BIGINT)
            - CAST(cur[$N] AS BIGINT)) /
            CAST(list_sum(list_transform(range(1, ${N + 1}),
              i -> abs(a[i] - b[i]))) AS DOUBLE), 6)
        END AS warp_gain
      FROM dp WHERE d = ${2 * N}"""))

  val all: Seq[QueryDef] = Seq(q485DtwWarp)
}
