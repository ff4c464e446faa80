package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SemDeDup (Abbas et al. 2023): semantic deduplication in embedding
  * space — drop documents whose embeddings are near-identical to an
  * earlier-kept one INSIDE a cluster cell, so the pairwise check never
  * goes corpus × corpus. Cells here are (assigned centroid cluster ×
  * adaptive md5 shard): the E-step assigns each vector to its
  * best-cosine label centroid (q62's discipline), and the shard count
  * S = ⌈N/500⌉ keeps cells ~500 vectors, so total pair work is
  * ~250·N — LINEAR in corpus size, the paper's cells-grow-with-N
  * contract made explicit. Drop rule: b is dropped iff some kept a < b
  * in its cell has cos(a,b) ≥ τ; with the deliberately low fixture
  * τ = 0.3 (the test embeddings are near-isotropic — production uses
  * ~0.95 on real encoder output) the rule actually fires.
  *
  * Exactness: centroids round 9 (q62), cosines round 6, everything
  * else integer censuses; the md5 shard is the house hex-parse parity
  * idiom.
  */
object SemDedupOps {

  private val Tau       = 0.3
  private val CellRows  = 500L

  val q576Semdedup: QueryDef = QueryDef(
    "q576_semdedup",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val nVec = emb.count() // metadata count — sizes the shard grid
      val nShards = math.max(1L, (nVec + CellRows - 1) / CellRows)
      val flat = emb
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("dim"),
                col("col").cast("double").as("v"))
        .localCheckpoint() // centroid pass + assignment + pair pass
      val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
        .agg(round(avg(col("v")), 9).as("c"))
      val assigned = flat.join(broadcast(cent), Seq("dim"))
        .groupBy(col("vec_id"), col("clabel"))
        .agg(sum(col("v") * col("c")).as("dot"),
             sum(col("v") * col("v")).as("v2"),
             sum(col("c") * col("c")).as("c2"))
        .select(col("vec_id"), col("clabel"),
          round(col("dot") / (sqrt(col("v2")) * sqrt(col("c2"))), 6).as("cos"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("clabel").asc)))
        .filter(col("rn") === 1)
        .select(col("vec_id"),
          col("clabel").as("cluster"),
          expr(s"pmod(CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 15), " +
            s"16, 10) AS BIGINT), $nShards)").as("shard"))
        .localCheckpoint() // both sides of the cell self-join
      val members = flat.join(assigned, Seq("vec_id"))
      val pairs = members.alias("a")
        .join(members.alias("b"),
          col("a.cluster") === col("b.cluster") &&
          col("a.shard") === col("b.shard") &&
          col("a.dim") === col("b.dim") &&
          col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          col("a.cluster").as("cluster"))
        .agg(sum(col("a.v") * col("b.v")).as("dot"),
             sum(col("a.v") * col("a.v")).as("a2"),
             sum(col("b.v") * col("b.v")).as("b2"))
        .select(col("cluster"), col("ia"), col("ib"),
          round(col("dot") / (sqrt(col("a2")) * sqrt(col("b2"))), 6).as("cos"))
        .localCheckpoint() // dup census + max-cos report
      val dups = pairs.filter(col("cos") >= Tau)
      val dropped = dups.select(col("cluster"), col("ib").as("vec_id")).distinct()
      val perCluster = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
      perCluster
        .join(dups.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_dup_pairs")), Seq("cluster"), "left")
        .join(dropped.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_dropped")), Seq("cluster"), "left")
        .join(pairs.groupBy(col("cluster"))
          .agg(max(col("cos")).as("max_cos")), Seq("cluster"), "left")
        .na.fill(0L, Seq("n_dup_pairs", "n_dropped"))
        .select(col("cluster"), col("n_members"), col("n_dup_pairs"),
          col("n_dropped"),
          (col("n_members") - col("n_dropped")).as("n_kept"),
          col("max_cos"))
        .orderBy(col("cluster"))
    },
    Some(s"""WITH n AS (SELECT COUNT(*) AS nv FROM embeddings),
      flat AS (SELECT vec_id, label, t.gs AS dim,
          CAST(embedding[t.gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      cent AS (SELECT label AS clabel, dim, round(avg(v), 9) AS c
        FROM flat GROUP BY 1, 2),
      scored AS (SELECT f.vec_id, c.clabel,
          round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
        FROM flat f JOIN cent c ON f.dim = c.dim GROUP BY 1, 2),
      assigned AS (
        SELECT vec_id, clabel AS cluster,
          ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
            % GREATEST(1, CAST(CEIL(nv / $CellRows.0) AS BIGINT)) AS shard
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, clabel) AS rn FROM scored), n
        WHERE rn = 1),
      members AS (SELECT f.vec_id, a.cluster, a.shard, f.dim, f.v
        FROM flat f JOIN assigned a USING (vec_id)),
      pairs AS (
        SELECT a.cluster, a.vec_id AS ia, b.vec_id AS ib,
          round(SUM(a.v * b.v) / (sqrt(SUM(a.v * a.v)) * sqrt(SUM(b.v * b.v))), 6) AS cos
        FROM members a JOIN members b
          ON a.cluster = b.cluster AND a.shard = b.shard
          AND a.dim = b.dim AND a.vec_id < b.vec_id
        GROUP BY 1, 2, 3),
      dups AS (SELECT * FROM pairs WHERE cos >= $Tau),
      dropped AS (SELECT DISTINCT cluster, ib AS vec_id FROM dups),
      per_cluster AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM assigned GROUP BY 1)
      SELECT p.cluster, p.n_members,
        COALESCE(d.n_dup_pairs, 0) AS n_dup_pairs,
        COALESCE(dr.n_dropped, 0) AS n_dropped,
        p.n_members - COALESCE(dr.n_dropped, 0) AS n_kept,
        mc.max_cos
      FROM per_cluster p
      LEFT JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
        FROM dups GROUP BY 1) d USING (cluster)
      LEFT JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_dropped
        FROM dropped GROUP BY 1) dr USING (cluster)
      LEFT JOIN (SELECT cluster, MAX(cos) AS max_cos
        FROM pairs GROUP BY 1) mc USING (cluster)
      ORDER BY p.cluster"""))

  val all: Seq[QueryDef] = Seq(q576Semdedup)
}
