package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sequential skill rating (Elo 1978) over a daily round-robin: the five
  * focus brands "play" each other every trading day — higher exact daily
  * revenue wins, equal cents draw — and ratings advance through the
  * classic logistic update R ← R + K(S − E), E = 1/(1+10^((Rб−Rа)/400)),
  * batch-updated per day from the PRE-day ratings (reference: overseer's
  * sequential report pipelines, doc/guide/Introduction.md:3; q376's UCB
  * and q352's SPRT are the other sequential-decision folds).
  *
  * Scale shape: the corpus-sized work is ONE join + hash agg to daily
  * per-brand cents; the recursion is calendar-bounded (≤ |days| steps
  * over a 5-wide state) and runs inside a single codegen `aggregate`
  * HOF over the sorted day array — the q485 wavefront discipline; no
  * driver loop, no per-step shuffle.
  *
  * Exactness: wins/losses are BIGINT over exact DECIMAL→cents
  * comparisons; the rating state is quantized round(·,9) every step so
  * both engines fold the identical sequence (pow-ulp differences are
  * ~1e-15 per step, far below the quantum); additions are written in
  * the same left-to-right order in both dialects; surfaced ratings
  * round at 6.
  */
object RatingOps {

  private[ops] val Brands = Seq("Brand#1", "Brand#2", "Brand#3", "Brand#4",
    "Brand#5")
  private val K = 32.0

  /** The daily round-robin inputs: one row per trading day with the 5
    * exact per-brand cent totals (day, c0..c4) — shared by q547's batch
    * fold and q560's store-dashboard replay so both feed the identical
    * sequence. */
  private[ops] def dailyCents(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    val t = Tables(s, dir)
    val cents = t.lineitem
      .join(broadcast(t.part.filter(col("p_brand").isin(Brands: _*))
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("day"), col("p_brand"))
      .agg(floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 8))) * 100).cast("long").as("cents"))
    val dayCols = Brands.zipWithIndex.map { case (b, i) =>
      coalesce(sum(when(col("p_brand") === b, col("cents"))), lit(0L))
        .as(s"c$i")
    }
    cents.groupBy(col("day")).agg(dayCols.head, dayCols.tail: _*)
  }

  /** The shared DuckDB CTE chain (cents → daily → idx → recursive elo →
    * final): q547 appends its win census; q560 reads final directly. */
  private[ops] def eloCteSql: String = {
    val brandIn = Brands.map(b => s"'$b'").mkString(", ")
    // per-rating update: the j-terms in ascending j order, left-assoc —
    // exactly the Spark fold's addition order
    def upd(i: Int): String = {
      val terms = (0 to 4).filter(_ != i).map { j =>
        s"""((CASE WHEN d.c$i > d.c$j THEN 1.0 WHEN d.c$i < d.c$j THEN 0.0 ELSE 0.5 END)
            - 1.0 / (1.0 + power(10.0, (e.r$j - e.r$i) / 400.0)))"""
      }
      s"round(e.r$i + 32.0 * (${terms.mkString(" + ")}), 9)"
    }
    s"""cents AS (
        SELECT CAST(o.o_orderdate AS DATE) AS day, p.p_brand,
          CAST(floor(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
            AS DECIMAL(22,8))) * 100) AS BIGINT) AS cents
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
          AND p.p_brand IN ($brandIn)
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2),
      daily AS (
        SELECT day,
          ${Brands.zipWithIndex.map { case (b, i) =>
            s"COALESCE(SUM(CASE WHEN p_brand = '$b' THEN cents END), 0) AS c$i"
          }.mkString(",\n          ")}
        FROM cents GROUP BY 1),
      idx AS (SELECT *, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily),
      elo(t, r0, r1, r2, r3, r4) AS (
        -- DOUBLE base case: a bare 1500.0 literal would pin every
        -- recursive column to DECIMAL(5,1) and quantize the whole fold
        SELECT 0, CAST(1500.0 AS DOUBLE), CAST(1500.0 AS DOUBLE),
          CAST(1500.0 AS DOUBLE), CAST(1500.0 AS DOUBLE),
          CAST(1500.0 AS DOUBLE)
        UNION ALL
        SELECT e.t + 1, ${(0 to 4).map(upd).mkString(",\n          ")}
        FROM elo e JOIN idx d ON d.t = e.t + 1),
      final AS (
        SELECT * FROM elo ORDER BY t DESC LIMIT 1)"""
  }

  val q547EloRatings: QueryDef = QueryDef(
    "q547_elo_ratings",
    (s, dir) => {
      val daily = dailyCents(s, dir)
        .localCheckpoint() // the fold row and the win census both read it
      // the whole day sequence as ONE sorted array in ONE row; the Elo
      // fold is a single codegen aggregate over it
      val folded = daily
        .agg(sort_array(collect_list(struct(col("day"),
          array((0 until 5).map(i => col(s"c$i")): _*).as("cs")))).as("days"))
        .selectExpr(
          """aggregate(days, array_repeat(1500.0D, 5), (st, d) ->
               transform(st, (r, i) ->
                 round(r + 32.0D * aggregate(sequence(0, 4), 0.0D,
                   (acc, j) -> acc + IF(j = i, 0.0D,
                     (CASE WHEN element_at(d.cs, i + 1) > element_at(d.cs, j + 1) THEN 1.0D
                           WHEN element_at(d.cs, i + 1) < element_at(d.cs, j + 1) THEN 0.0D
                           ELSE 0.5D END)
                     - 1.0D / (1.0D + power(10.0D,
                         (element_at(st, j + 1) - element_at(st, i + 1)) / 400.0D)))),
                 9))) AS ratings""",
          "size(days) AS n_days")
        .select(posexplode(col("ratings")).as(Seq("i", "rating")),
          col("n_days"))
      // exact win/loss census, the cross-check column
      val census = daily.select(
        explode(expr(
          """transform(sequence(0, 4), i -> named_struct(
               'i', i,
               'w', aggregate(sequence(0, 4), 0L, (a, j) ->
                 a + IF(j != i AND element_at(array(c0,c1,c2,c3,c4), i + 1)
                     > element_at(array(c0,c1,c2,c3,c4), j + 1), 1L, 0L)),
               'l', aggregate(sequence(0, 4), 0L, (a, j) ->
                 a + IF(j != i AND element_at(array(c0,c1,c2,c3,c4), i + 1)
                     < element_at(array(c0,c1,c2,c3,c4), j + 1), 1L, 0L))))"""))
          .as("e"))
        .groupBy(col("e.i").as("i"))
        .agg(sum(col("e.w")).as("wins"), sum(col("e.l")).as("losses"))
      val brandName = Brands.zipWithIndex.map { case (b, i) => (i, b) }
      import s.implicits._
      folded
        .join(census, Seq("i"))
        .join(broadcast(brandName.toDF("i", "brand")), Seq("i"))
        .select(col("brand"), col("n_days").cast("long").as("n_days"),
          col("wins"), col("losses"), round(col("rating"), 6).as("elo"))
        .orderBy(col("brand"))
    },
    Some {
      s"""WITH RECURSIVE $eloCteSql,
      census AS (
        SELECT ${(0 to 4).map { i =>
          val w = (0 to 4).filter(_ != i)
            .map(j => s"CASE WHEN c$i > c$j THEN 1 ELSE 0 END").mkString(" + ")
          val l = (0 to 4).filter(_ != i)
            .map(j => s"CASE WHEN c$i < c$j THEN 1 ELSE 0 END").mkString(" + ")
          s"CAST(SUM($w) AS BIGINT) AS w$i, CAST(SUM($l) AS BIGINT) AS l$i"
        }.mkString(",\n          ")},
          CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily)
      SELECT b.brand, c.n_days, b.wins, b.losses, b.elo
      FROM (
        ${Brands.zipWithIndex.map { case (b, i) =>
          s"SELECT '$b' AS brand, (SELECT w$i FROM census) AS wins, " +
            s"(SELECT l$i FROM census) AS losses, " +
            s"round((SELECT r$i FROM final), 6) AS elo"
        }.mkString("\n        UNION ALL\n        ")}
      ) b CROSS JOIN census c
      ORDER BY b.brand"""
    })

  val all: Seq[QueryDef] = Seq(q547EloRatings)
}
