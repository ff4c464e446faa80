package graft.ops

import org.apache.spark.sql.functions._

/** Greedy set cover over the corpus vocabulary — "which sources, in
  * what order, buy the most NEW vocabulary?" The classic (1 − 1/e)
  * greedy (Chvátal 1979) that data-acquisition and eval-suite planning
  * both run: universe = distinct word tokens, sets = each source's
  * token inventory, pick the source with the largest uncovered gain,
  * 8 rounds, ties to the lexicographically first source (reference:
  * overseer's arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: ONE tokenize scan to the distinct (source, token)
  * inventory (hash-agg, token-mass linear); each greedy round is an
  * anti-join of that inventory against the covered-token set plus a
  * per-source count — all equi-joins, |sources| result rows; the
  * covered set is checkpointed per round (the q79/q102 loop
  * discipline). Rounds are a constant (8), not data-sized.
  *
  * Exactness: every column is a BIGINT count except the final coverage
  * share (ONE division of exact integers, rounded for display).
  */
object SetCoverOps {

  private val Rounds = 8

  val q519SetCover: QueryDef = QueryDef(
    "q519_set_cover",
    (s, dir) => {
      val st = Tables(s, dir).documents
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("tok"))
        .distinct()
        .localCheckpoint()
      val universe = st.select(col("tok")).distinct().count()
      var covered = st.select(col("tok")).where(lit(false)).localCheckpoint()
      var pickedSources = Set.empty[String]
      var cum = 0L
      val rows = (1 to Rounds).map { round =>
        val gains = st
          .filter(!col("source").isin(pickedSources.toSeq: _*))
          .join(covered, Seq("tok"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("gain"))
        // sources whose whole inventory is covered drop out of `gains`;
        // keep them pickable at gain 0 so both engines see one frame
        val all = st.select(col("source")).distinct()
          .filter(!col("source").isin(pickedSources.toSeq: _*))
          .join(gains, Seq("source"), "left").na.fill(0L, Seq("gain"))
        val pick = all.orderBy(col("gain").desc, col("source")).limit(1)
          .collect().head
        val (src, gain) = (pick.getString(0), pick.getLong(1))
        pickedSources += src
        cum += gain
        covered = covered
          .union(st.where(col("source") === src).select(col("tok")))
          .distinct().localCheckpoint()
        (round.toLong, src, gain, cum)
      }
      s.createDataFrame(rows).toDF("round", "source", "gain", "cum_covered")
        .withColumn("cum_share",
          round(col("cum_covered").cast("double") / universe, 9))
    },
    Some {
      // NOT EXISTS anti-joins against a per-round MATERIALIZED covered
      // set — NOT IN on the token column makes DuckDB null-paranoid and
      // quadratic; the anti-join form is a plain hash anti join
      val steps = (2 to Rounds).map { k =>
        s"""
      cov${k - 1} AS MATERIALIZED (
        SELECT DISTINCT tok FROM st JOIN picked${k - 1} USING (source)),
      g$k AS (
        SELECT s.source, CAST(COUNT(*) AS BIGINT) AS gain
        FROM st s
        WHERE NOT EXISTS (SELECT 1 FROM picked${k - 1} p
            WHERE p.source = s.source)
          AND NOT EXISTS (SELECT 1 FROM cov${k - 1} c WHERE c.tok = s.tok)
        GROUP BY 1),
      p$k AS MATERIALIZED (
        SELECT $k AS round, a.source, COALESCE(g.gain, 0) AS gain
        FROM (SELECT DISTINCT source FROM st s
              WHERE NOT EXISTS (SELECT 1 FROM picked${k - 1} p
                WHERE p.source = s.source)) a
        LEFT JOIN g$k g ON g.source = a.source
        ORDER BY gain DESC, a.source LIMIT 1),
      picked$k AS MATERIALIZED (SELECT source FROM picked${k - 1}
        UNION ALL SELECT source FROM p$k)"""
      }.mkString(",")
      s"""WITH st AS MATERIALIZED (
        SELECT DISTINCT source,
          unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
        FROM documents),
      uni AS (SELECT COUNT(DISTINCT tok) AS u FROM st),
      g1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS gain
        FROM st GROUP BY 1),
      p1 AS MATERIALIZED (SELECT 1 AS round, source, gain FROM g1
        ORDER BY gain DESC, source LIMIT 1),
      picked1 AS MATERIALIZED (SELECT source FROM p1),
      $steps,
      allp AS (${(1 to Rounds).map(k => s"SELECT * FROM p$k").mkString(" UNION ALL ")})
      SELECT CAST(round AS BIGINT) AS round, source,
        CAST(gain AS BIGINT) AS gain,
        CAST(SUM(gain) OVER (ORDER BY round) AS BIGINT) AS cum_covered,
        round(CAST(SUM(gain) OVER (ORDER BY round) AS DOUBLE) / u, 9)
          AS cum_share
      FROM allp CROSS JOIN uni"""
    })

  val all: Seq[QueryDef] = Seq(q519SetCover)
}
