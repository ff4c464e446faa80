package graft.ops

import org.apache.spark.sql.functions._

/** Grid-bucketed spatial radius join — the bounded-join pattern every
  * distributed spatial engine (GeoSpark/Sedona, PostGIS tiling) uses at
  * scale: snap points to a grid whose cell edge equals the query radius,
  * probe each query point's 3×3 neighbor cells with an EQUI join on the
  * cell key, then apply the exact distance predicate. No pair ever
  * crosses a shuffle unless its cells are adjacent, so the join volume
  * is density-bounded instead of |A|·|B|.
  *
  * Fixture: suppliers and customers get deterministic integer locations
  * on a 10000×10000 grid from md5 of their keys (two salted digests —
  * the q358 hash convention), and the audit reports each supplier's
  * service-area density: customers within radius R=500 units plus the
  * nearest customer's exact squared distance. All geometry is BIGINT
  * algebra (dx²+dy² against R²), so both engines agree bit-for-bit; the
  * DuckDB oracle states the same join radius-first (its input is small
  * enough that the grid is an execution detail, not a semantic one).
  *
  * Scale shape: two linear scans derive the located points, the probe
  * side fans out 9× (a constant), and the join is a plain hash equi-join
  * on the cell id — the exact shape a 100 TB point corpus wants, with
  * cell ids doubling as the partition key for any downstream tiling.
  */
object SpatialOps {

  private val World = 10000L // grid units per axis
  private val R     = 500L   // radius in grid units (= cell edge)

  private def coord(key: org.apache.spark.sql.Column, salt: String) =
    pmod(conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(World))

  val q487GridSpatialJoin: QueryDef = QueryDef(
    "q487_grid_spatial_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val cust = t.customer.select(col("c_custkey"),
          coord(col("c_custkey"), "cx|").as("x"),
          coord(col("c_custkey"), "cy|").as("y"))
        .withColumn("cell",
          floor(col("x") / R).cast("long") * lit(64L) +
            floor(col("y") / R).cast("long"))
      val supp = t.supplier.select(col("s_suppkey"),
          coord(col("s_suppkey"), "sx|").as("sx"),
          coord(col("s_suppkey"), "sy|").as("sy"))
      // 3×3 neighbor-cell probe fan-out (constant factor, never a cross)
      val probes = supp.select(col("s_suppkey"), col("sx"), col("sy"),
        explode(flatten(transform(sequence(lit(-1L), lit(1L)), {
          dx => transform(sequence(lit(-1L), lit(1L)), { dy =>
            (floor(col("sx") / R).cast("long") + dx) * lit(64L) +
              (floor(col("sy") / R).cast("long") + dy)
          })
        }))).as("cell"))
      val hits = probes.join(cust, Seq("cell"))
        .filter((col("sx") - col("x")) * (col("sx") - col("x")) +
          (col("sy") - col("y")) * (col("sy") - col("y")) <= R * R)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_within"),
          min((col("sx") - col("x")) * (col("sx") - col("x")) +
            (col("sy") - col("y")) * (col("sy") - col("y")))
            .as("nearest_d2"))
      supp.select(col("s_suppkey"))
        .join(hits, Seq("s_suppkey"), "left")
        .na.fill(0L, Seq("n_within"))
        .na.fill(-1L, Seq("nearest_d2"))
    },
    Some(s"""WITH cust AS (
        SELECT c_custkey,
          ('0x' || substr(md5('cx|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
            % $World AS x,
          ('0x' || substr(md5('cy|' || CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
            % $World AS y
        FROM customer),
      supp AS (
        SELECT s_suppkey,
          ('0x' || substr(md5('sx|' || CAST(s_suppkey AS VARCHAR)), 1, 15))::BIGINT
            % $World AS sx,
          ('0x' || substr(md5('sy|' || CAST(s_suppkey AS VARCHAR)), 1, 15))::BIGINT
            % $World AS sy
        FROM supplier),
      hits AS (
        SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_within,
          CAST(MIN((s.sx - c.x) * (s.sx - c.x) +
            (s.sy - c.y) * (s.sy - c.y)) AS BIGINT) AS nearest_d2
        FROM supp s JOIN cust c
          ON (s.sx - c.x) * (s.sx - c.x) + (s.sy - c.y) * (s.sy - c.y)
            <= ${R * R}
        GROUP BY 1)
      SELECT sp.s_suppkey,
        COALESCE(h.n_within, 0) AS n_within,
        COALESCE(h.nearest_d2, -1) AS nearest_d2
      FROM supp sp LEFT JOIN hits h ON h.s_suppkey = sp.s_suppkey"""))

  val all: Seq[QueryDef] = Seq(q487GridSpatialJoin)
}
