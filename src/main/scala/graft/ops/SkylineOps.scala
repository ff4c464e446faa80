package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skyline wave: the Pareto-frontier (skyline) operator — the classic
  * "not dominated on any criterion" query (Börzsönyi et al., ICDE'01)
  * that no amount of group-by/top-k composition expresses directly.
  *
  * Scale shape: the naive skyline is an O(n²) dominance anti-join. The
  * sort-based sweep used here is the scalable form — one shuffle to
  * order each brand's parts by price, a distinct-price running max, and
  * a hash join back. Work is O(n log n) per brand at any corpus size,
  * and the DuckDB oracle deliberately runs the *other* algorithm (the
  * quadratic NOT EXISTS) so the two dialects cross-check each other.
  */
object SkylineOps {

  /** Per-brand price/size skyline of the part catalog: a part is on the
    * frontier iff no same-brand part is cheaper-or-equal AND
    * larger-or-equal with at least one strict. The sweep decomposes
    * dominance into (a) a strictly-cheaper part with size ≥ mine —
    * caught by the running max of per-price max-size over *distinct*
    * prices, shifted one row — and (b) a same-price part with size >
    * mine — caught by the per-price max itself. Equal (price, size)
    * twins do not dominate each other and both survive, exactly as the
    * NOT EXISTS oracle has it. */
  val q389ParetoSkyline: QueryDef = QueryDef(
    "q389_pareto_skyline",
    (s, dir) => {
      val p = Tables(s, dir).part
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          col("p_size"))
      // per distinct (brand, price): the best size seen at that price
      val perPrice = p.groupBy(col("p_brand"), col("p_retailprice"))
        .agg(max(col("p_size")).as("pmax"))
      val wPrev = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = perPrice
        .withColumn("run_prev", max(col("pmax")).over(wPrev))
      p.join(frontier, Seq("p_brand", "p_retailprice"))
        .where(coalesce(col("run_prev") < col("p_size"), lit(true)) &&
          col("pmax") === col("p_size"))
        .groupBy(col("p_brand"), col("p_retailprice"), col("p_size"))
        .agg(count(lit(1)).cast("long").as("n_parts"),
          min(col("p_partkey")).as("exemplar_part"))
        .withColumn("frontier_rank", row_number().over(
          Window.partitionBy(col("p_brand"))
            .orderBy(col("p_retailprice"), col("p_size"))).cast("long"))
        .select(col("p_brand").as("brand"),
          col("p_retailprice").as("price"), col("p_size").as("size"),
          col("n_parts"), col("exemplar_part"), col("frontier_rank"))
        .orderBy(col("brand"), col("frontier_rank"))
    },
    Some("""WITH p AS (SELECT p_partkey, p_brand, p_retailprice, p_size
        FROM part),
      sky AS (SELECT * FROM p q WHERE NOT EXISTS (
        SELECT 1 FROM p d WHERE d.p_brand = q.p_brand
          AND d.p_retailprice <= q.p_retailprice AND d.p_size >= q.p_size
          AND (d.p_retailprice < q.p_retailprice OR d.p_size > q.p_size)))
      SELECT p_brand AS brand, p_retailprice AS price, p_size AS size,
        CAST(COUNT(*) AS BIGINT) AS n_parts,
        MIN(p_partkey) AS exemplar_part,
        CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
          ORDER BY p_retailprice, p_size) AS BIGINT) AS frontier_rank
      FROM sky GROUP BY 1, 2, 3
      ORDER BY brand, frontier_rank"""))

  val all: Seq[QueryDef] = Seq(q389ParetoSkyline)
}
