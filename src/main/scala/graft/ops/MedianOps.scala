package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Geometric-median wave: the robust multivariate center of each label's
  * embedding cloud by Weiszfeld iteration (Weiszfeld 1937; the 1-center
  * / spatial-median) — the mean minimizes Σd², one far-out vector drags
  * it; the geometric median minimizes Σd and is the robust anchor
  * outlier-gating (q99) and centroid ops (q62/q80) actually want.
  *
  * Scale shape: each Weiszfeld round is one join of the exploded
  * (vec, dim, val) frame with the (label, dim) center frame, one
  * per-vector distance reduce, one weighted per-dim re-aggregate — all
  * corpus-linear, DECIMAL-summed so partition order can't perturb the
  * center. 4 rounds, checkpointed (the q21 discipline).
  */
object MedianOps {

  private val Rounds = 4

  /** Per-label geometric median after 4 Weiszfeld rounds from the mean
    * seed, reporting the robust-vs-mean improvement: Σ distances to the
    * median vs to the mean, and the center shift. Weights are
    * 1/max(d, 1e-9) with distances rounded at 9 — both engines iterate
    * identically. */
  val q405GeometricMedian: QueryDef = QueryDef(
    "q405_geometric_median",
    (s, dir) => {
      val pts = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("v", col("v").cast("double"))
        .localCheckpoint()
      // mean seed per (label, dim) — DECIMAL-exact over rounded coords
      val mean = pts.groupBy(col("label"), col("dim"))
        .agg((sum(round(col("v"), 9).cast(DecimalType(28, 9)))
          .cast("double") / count(lit(1))).as("c"))
        .withColumn("c", round(col("c"), 9))
        .localCheckpoint()
      def distances(center: DataFrame): DataFrame =
        pts.join(center, Seq("label", "dim"))
          .groupBy(col("label"), col("vec_id"))
          .agg(round(sqrt(sum(round((col("v") - col("c")) *
            (col("v") - col("c")), 12).cast(DecimalType(30, 12)))
            .cast("double")), 9).as("d"))
      var center = mean
      for (_ <- 1 to Rounds) {
        val w = distances(center)
        center = pts.join(w, Seq("label", "vec_id"))
          .groupBy(col("label"), col("dim"))
          .agg(
            sum(round(col("v") / greatest(col("d"), lit(1e-9)), 9)
              .cast(DecimalType(28, 9))).as("swv"),
            sum(round(lit(1.0) / greatest(col("d"), lit(1e-9)), 9)
              .cast(DecimalType(28, 9))).as("sw"))
          .select(col("label"), col("dim"),
            round(col("swv").cast("double") / col("sw").cast("double"), 9)
              .as("c"))
          .localCheckpoint()
      }
      val sumTo = (c: DataFrame) => distances(c)
        .groupBy(col("label"))
        .agg(sum(col("d").cast(DecimalType(28, 9))).as("sd"),
          count(lit(1)).cast("long").as("n"))
      val toMean = sumTo(mean)
        .select(col("label"), col("sd").as("sd_mean"), col("n"))
      val toMed = sumTo(center)
        .select(col("label"), col("sd").as("sd_median"))
      val shift = mean.join(center.withColumnRenamed("c", "c2"),
          Seq("label", "dim"))
        .groupBy(col("label"))
        .agg(round(sqrt(sum(round((col("c") - col("c2")) *
          (col("c") - col("c2")), 12).cast(DecimalType(30, 12)))
          .cast("double")), 6).as("center_shift"))
      toMean.join(toMed, Seq("label")).join(shift, Seq("label"))
        .select(col("label"), col("n"),
          round(col("sd_mean").cast("double"), 4).as("sum_dist_mean"),
          round(col("sd_median").cast("double"), 4).as("sum_dist_median"),
          round((col("sd_mean") - col("sd_median")).cast("double"), 4)
            .as("improvement"),
          col("center_shift"))
        .orderBy(col("label"))
    },
    Some {
      def dist(centerCte: String): String =
        s"""SELECT p.label, p.vec_id,
           |  round(sqrt(CAST(SUM(CAST(round((p.v - c.c) * (p.v - c.c), 12)
           |    AS DECIMAL(30,12))) AS DOUBLE)), 9) AS d
           |FROM pts p JOIN $centerCte c ON c.label = p.label AND c.dim = p.dim
           |GROUP BY 1, 2""".stripMargin
      val rounds = (1 to Rounds).map { r =>
        s"""d$r AS MATERIALIZED (${dist(s"c${r - 1}")}),
           |c$r AS MATERIALIZED (SELECT p.label, p.dim,
           |    round(CAST(SUM(CAST(round(p.v / greatest(w.d, 1e-9), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE)
           |    / CAST(SUM(CAST(round(1.0 / greatest(w.d, 1e-9), 9)
           |      AS DECIMAL(28,9))) AS DOUBLE), 9) AS c
           |  FROM pts p JOIN d$r w ON w.label = p.label AND w.vec_id = p.vec_id
           |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH pts AS MATERIALIZED (SELECT vec_id, label,
         |    t.gs - 1 AS dim, CAST(embedding[t.gs] AS DOUBLE) AS v
         |  FROM embeddings,
         |    UNNEST(generate_series(1, len(embedding))) AS t(gs)),
         |c0 AS MATERIALIZED (SELECT label, dim,
         |    round(CAST(SUM(CAST(round(v, 9) AS DECIMAL(28,9))) AS DOUBLE)
         |      / COUNT(*), 9) AS c
         |  FROM pts GROUP BY 1, 2),
         |dmean AS (${dist("c0")}),
         |$rounds,
         |dmed AS (${dist(s"c$Rounds")}),
         |am AS (SELECT label, SUM(CAST(d AS DECIMAL(28,9))) AS sd_mean,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM dmean GROUP BY 1),
         |ad AS (SELECT label, SUM(CAST(d AS DECIMAL(28,9))) AS sd_median
         |  FROM dmed GROUP BY 1),
         |sh AS (SELECT a.label,
         |    round(sqrt(CAST(SUM(CAST(round((a.c - b.c) * (a.c - b.c), 12)
         |      AS DECIMAL(30,12))) AS DOUBLE)), 6) AS center_shift
         |  FROM c0 a JOIN c$Rounds b ON b.label = a.label AND b.dim = a.dim
         |  GROUP BY 1)
         |SELECT am.label, am.n,
         |  round(CAST(am.sd_mean AS DOUBLE), 4) AS sum_dist_mean,
         |  round(CAST(ad.sd_median AS DOUBLE), 4) AS sum_dist_median,
         |  round(CAST(am.sd_mean - ad.sd_median AS DOUBLE), 4) AS improvement,
         |  sh.center_shift
         |FROM am JOIN ad ON ad.label = am.label
         |JOIN sh ON sh.label = am.label
         |ORDER BY am.label""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q405GeometricMedian)
}
