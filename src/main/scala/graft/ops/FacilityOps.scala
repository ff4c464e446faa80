package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Facility-location wave: greedy submodular data selection — pick the
  * k corpus exemplars maximizing Σ_v max(0, max_{s∈S} cos(s, v)), the
  * facility-location objective used for coreset/data-subset selection
  * (Nemhauser et al.'s 1−1/e greedy; the data-selection use is the
  * SimilaritySelect/CRAIG family). q342's k-center picks far-apart
  * seeds (coverage radius); this maximizes total *representation* —
  * the two selections differ on the same fixture and serve different
  * curation goals.
  *
  * Scale shape: the candidate pool is hash-bounded (≤ model-sized), so
  * the sim matrix is a candidates × corpus frame built once and
  * checkpointed; each greedy round is one agg over it plus a 1-row
  * driver read (the rung-decision pattern of the successive-halving
  * tuner). The DuckDB oracle replays the identical six rounds as a
  * generated CTE chain, q380-style.
  */
object FacilityOps {

  private val K = 6

  /** Six greedy facility-location picks from a 13-candidate pool over
    * the embedding corpus, with marginal gain and the running objective
    * after each pick. Gains are DECIMAL sums of round(·,9) coverage
    * increments, so greedy tie-breaks (gain desc, candidate asc) are
    * engine-independent. */
  val q397FacilityLocation: QueryDef = QueryDef(
    "q397_facility_location",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val cands = emb.where(col("vec_id") % 40 === 0 && col("vec_id") < 4000)
        .select(col("vec_id").as("c"), col("embedding").as("c_emb"))
      // r16: ONE state frame (v, simArr sorted by candidate id, cur)
      // instead of a (c, v, sim) frame re-joined against a (v, cur) frame
      // every round. The greedy loop previously paid, per round, a
      // corpus⋈corpus gains join, a corpus⋈slice update join and three
      // driver jobs; now gains are one explode + partial-agg pass (no
      // join — cur rides the row), the update is an in-row element_at on
      // the pick's driver-known index, and the superseded state
      // checkpoint is unpersisted. Same per-(c,v) gain terms, same
      // DECIMAL sums (order-free), same tie-breaks — oracle-pinned.
      var state = emb.select(col("vec_id").as("v"), col("embedding"))
        .crossJoin(broadcast(cands))
        .withColumn("sim", round(Similarity.cosine(col("c_emb"), col("embedding")), 9))
        .groupBy(col("v"))
        .agg(sort_array(collect_list(struct(col("c"), col("sim")))).as("simArr"))
        .withColumn("cur", lit(0.0))
        .localCheckpoint()
      // the ≤13 candidate ids, ordered as simArr is — a model-sized driver
      // read (the q342/q385 bounded-argmax idiom), used only to turn the
      // round's pick into an array index
      val candIds = cands.select(col("c")).orderBy(col("c"))
        .collect().map(_.getLong(0))
      val picksB = Seq.newBuilder[(Long, Long, Double, Double)]
      var chosen = Set.empty[Long]
      for (r <- 1 to K) {
        val gains = state
          .select(col("cur"), explode(col("simArr")).as("e"))
          .select(col("e.c").as("c"), col("e.sim").as("sim"), col("cur"))
          .where(!col("c").isInCollection(if (chosen.isEmpty) Seq(-1L) else chosen.toSeq))
          .groupBy(col("c"))
          .agg(sum(round(greatest(col("sim") - col("cur"), lit(0.0)), 9)
            .cast(DecimalType(24, 9))).as("g"))
          .orderBy(col("g").desc, col("c"))
          .head()
        val pick = gains.getLong(0)
        val gain = gains.getDecimal(1).doubleValue()
        chosen += pick
        val pickIdx = candIds.indexOf(pick) + 1 // element_at is 1-based
        val prev = state
        state = state
          .withColumn("cur", greatest(col("cur"),
            element_at(col("simArr"), pickIdx).getField("sim"), lit(0.0)))
          .localCheckpoint()
        prev.unpersist()
        val objective = state.agg(sum(round(col("cur"), 9)
          .cast(DecimalType(24, 9))).as("o")).head().getDecimal(0).doubleValue()
        picksB += ((r.toLong, pick, gain, objective))
      }
      val sess: SparkSession = s
      import sess.implicits._
      picksB.result().toDF("round", "picked", "gain", "objective")
        .orderBy(col("round"))
    },
    Some {
      val rounds = (1 to K).map { r =>
        val prevCur = if (r == 1) "cur0" else s"cur${r - 1}"
        val prevPicks = (1 until r).map(i => s"(SELECT c FROM pick$i)")
        val notIn = if (prevPicks.isEmpty) ""
          else s"WHERE m.c NOT IN (${prevPicks.mkString(", ")})"
        s"""gain$r AS MATERIALIZED (SELECT m.c,
           |    SUM(CAST(round(greatest(m.sim - p.cur, 0.0), 9) AS DECIMAL(24,9))) AS g
           |  FROM simmat m JOIN $prevCur p ON p.v = m.v $notIn GROUP BY 1),
           |pick$r AS MATERIALIZED (SELECT c, g FROM gain$r ORDER BY g DESC, c LIMIT 1),
           |cur$r AS MATERIALIZED (SELECT p.v,
           |    greatest(p.cur, m.sim, 0.0) AS cur
           |  FROM $prevCur p JOIN simmat m
           |    ON m.v = p.v AND m.c = (SELECT c FROM pick$r))""".stripMargin
      }.mkString(",\n")
      val rows = (1 to K).map { r =>
        s"""SELECT ${r}::BIGINT AS round, (SELECT c FROM pick$r) AS picked,
           |  CAST((SELECT g FROM pick$r) AS DOUBLE) AS gain,
           |  CAST((SELECT SUM(CAST(round(cur, 9) AS DECIMAL(24,9)))
           |    FROM cur$r) AS DOUBLE) AS objective""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH cands AS (SELECT vec_id AS c, embedding AS c_emb
         |  FROM embeddings WHERE vec_id % 40 = 0 AND vec_id < 4000),
         |simmat AS MATERIALIZED (SELECT c.c, e.vec_id AS v,
         |    round(list_sum(list_transform(list_zip(c.c_emb, e.embedding),
         |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform(c.c_emb,
         |        w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))))
         |     * sqrt(list_sum(list_transform(e.embedding,
         |        w -> CAST(w AS DOUBLE) * CAST(w AS DOUBLE))))), 9) AS sim
         |  FROM embeddings e CROSS JOIN cands c),
         |cur0 AS (SELECT vec_id AS v, 0.0::DOUBLE AS cur FROM embeddings),
         |$rounds
         |SELECT * FROM ($rows) ORDER BY round""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q397FacilityLocation)
}
