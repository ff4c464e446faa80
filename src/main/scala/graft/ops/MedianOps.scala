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
  * Scale shape (r16): each Weiszfeld round is ONE linear pass over the
  * array-form corpus — broadcast the (label, center-array) frame, compute
  * the per-vector distance in-row ([[graft.functions.DecimalSqDistSkip]]),
  * and fold the weighted re-center sums in one vector-at-a-time aggregate
  * ([[graft.functions.DecimalVecWSum]]) — all DECIMAL-summed so partition
  * order can't perturb the center. 4 rounds, checkpointed (the q21
  * discipline). The previous dim-exploded form paid a corpus×64-row join
  * + aggregate AND a corpus⋈corpus weight re-attach join per round.
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
      import graft.functions.VectorFunctions.{decimal_sqdist_skip, decimal_vec_wsum}
      // Vector-at-a-time Weiszfeld (r16): the embedding stays ONE array
      // row; each round is a broadcast of the ≤|labels| center-array
      // frame, an IN-ROW distance (DecimalSqDistSkip — the exploded
      // form's SUM(CAST(round((v-c)²,12) AS DECIMAL(30,12))) with
      // identical null-skip semantics) and one DecimalVecWSum aggregate
      // for the re-center sums. The dim-exploded original paid, per
      // round, a corpus×64-row join + aggregate AND a corpus⋈corpus
      // sort-merge join re-attaching per-vector weights; DECIMAL sums
      // are order-free so the fused shape is bit-identical
      // (MedianOpsSpec pins it; the oracle still runs the exploded SQL).
      val emb = Tables(s, dir).embeddings
        // spread the corpus across the pool: the in-row distance work has
        // no downstream exchange to re-parallelize a single-row-group scan
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .filter(size(col("v")) > 0) // posexplode emitted NO row for a
                                    // null/empty embedding — keep parity
        .localCheckpoint()
      // center frames are (label, cv: array<double>), dim = array index.
      // mean seed: sums/counts from the same aggregate with divisor 1.0
      // (round(v/1.0, 9) ≡ round(v, 9)).
      val mean = emb.groupBy(col("label"))
        .agg(decimal_vec_wsum(col("v"), lit(1.0)).as("m"))
        .select(col("label"), expr(
          "zip_with(m.sums, m.counts, (a, b) -> round(cast(a as double) / b, 9))").as("cv"))
        .localCheckpoint()
      def distances(center: DataFrame): DataFrame =
        emb.join(broadcast(center), Seq("label"))
          .select(col("label"), col("vec_id"), col("v"),
            round(sqrt(decimal_sqdist_skip(col("v"), col("cv"))), 9).as("d"))
      var center = mean
      for (_ <- 1 to Rounds) {
        center = distances(center)
          .groupBy(col("label"))
          .agg(decimal_vec_wsum(col("v"), greatest(col("d"), lit(1e-9))).as("m"))
          .select(col("label"), expr(
            "zip_with(m.sums, m.wsums, (a, b) -> round(cast(a as double) / cast(b as double), 9))").as("cv"))
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
      val shift = mean.join(center.withColumnRenamed("cv", "cv2"), Seq("label"))
        .select(col("label"),
          round(sqrt(decimal_sqdist_skip(col("cv"), col("cv2"))), 6).as("center_shift"))
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
