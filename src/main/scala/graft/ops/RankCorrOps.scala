package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Rank-correlation wave: Spearman's ρ with tie-averaged ranks — the
  * monotone-association measure Pearson (q125's OLS machinery) and
  * Kendall's τ-b (q337, O(pairs)) bracket. Spearman is the O(n log n)
  * member: rank both measures, then Pearson on the ranks.
  *
  * Determinism: average ranks are held as 2·rank integers
  * (2·RANK() + ties − 1, always integral), so every moment sum is an
  * exact DECIMAL(38,0) integer in both engines and ρ is computed once,
  * in double, from identical sums.
  *
  * Scale shape: one lineitem aggregation to the per-part frame, one
  * melt to (pair, a, b), two rank windows per pair partition, one
  * moment aggregation — all shuffle-partitioned by pair.
  */
object RankCorrOps {

  /** Spearman ρ between per-part demand, revenue, retail price, and
    * size, for three measure pairs. */
  val q412SpearmanCorr: QueryDef = QueryDef(
    "q412_spearman_corr",
    (s, dir) => {
      val t = Tables(s, dir)
      val perPart = t.lineitem
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("rev"))
        .join(t.part.select(col("p_partkey").as("partkey"),
          col("p_retailprice").as("price"),
          col("p_size").cast("double").as("psize")), Seq("partkey"))
      val melted = perPart.select(explode(array(
        struct(lit("qty_price").as("pair"), col("qty").cast("double").as("a"),
          col("price").as("b")),
        struct(lit("qty_size").as("pair"), col("qty").cast("double").as("a"),
          col("psize").as("b")),
        struct(lit("rev_price").as("pair"), col("rev").as("a"),
          col("price").as("b")))).as("r"))
        .select(col("r.pair").as("pair"), col("r.a").as("a"), col("r.b").as("b"))
      def avgRank2(c: String) =
        (rank().over(Window.partitionBy(col("pair")).orderBy(col(c))) * 2 +
          count(lit(1)).over(Window.partitionBy(col("pair"), col(c))) - 1)
          .cast("long")
      val ranked = melted
        .withColumn("ra", avgRank2("a"))
        .withColumn("rb", avgRank2("b"))
      val dec = DecimalType(38, 0)
      ranked.groupBy(col("pair"))
        .agg(count(lit(1)).as("n"),
          sum(col("ra").cast(dec)).as("sa"), sum(col("rb").cast(dec)).as("sb"),
          sum((col("ra") * col("rb")).cast(dec)).as("sab"),
          sum((col("ra") * col("ra")).cast(dec)).as("saa"),
          sum((col("rb") * col("rb")).cast(dec)).as("sbb"))
        .select(col("pair"), col("n"),
          round((col("n") * col("sab").cast("double") -
            col("sa").cast("double") * col("sb").cast("double")) /
            sqrt((col("n") * col("saa").cast("double") -
              col("sa").cast("double") * col("sa").cast("double")) *
              (col("n") * col("sbb").cast("double") -
                col("sb").cast("double") * col("sb").cast("double"))), 6)
            .as("rho"))
        .orderBy(col("pair"))
    },
    Some("""WITH perpart AS (SELECT l.l_partkey AS partkey,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
          ANY_VALUE(p.p_retailprice) AS price,
          ANY_VALUE(CAST(p.p_size AS DOUBLE)) AS psize
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1),
      melted AS (
        SELECT 'qty_price' AS pair, CAST(qty AS DOUBLE) AS a, price AS b
          FROM perpart
        UNION ALL
        SELECT 'qty_size', CAST(qty AS DOUBLE), psize FROM perpart
        UNION ALL
        SELECT 'rev_price', rev, price FROM perpart),
      ranked AS (SELECT pair,
          CAST(RANK() OVER (PARTITION BY pair ORDER BY a) * 2
            + COUNT(*) OVER (PARTITION BY pair, a) - 1 AS BIGINT) AS ra,
          CAST(RANK() OVER (PARTITION BY pair ORDER BY b) * 2
            + COUNT(*) OVER (PARTITION BY pair, b) - 1 AS BIGINT) AS rb
        FROM melted),
      agg AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(ra AS DECIMAL(38,0))) AS sa,
          SUM(CAST(rb AS DECIMAL(38,0))) AS sb,
          SUM(CAST(ra * rb AS DECIMAL(38,0))) AS sab,
          SUM(CAST(ra * ra AS DECIMAL(38,0))) AS saa,
          SUM(CAST(rb * rb AS DECIMAL(38,0))) AS sbb
        FROM ranked GROUP BY 1)
      SELECT pair, n,
        round((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
          / sqrt((n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * (n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))),
          6) AS rho
      FROM agg ORDER BY pair"""))

  val all: Seq[QueryDef] = Seq(q412SpearmanCorr)
}
