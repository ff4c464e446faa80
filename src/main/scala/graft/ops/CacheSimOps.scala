package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LRU reuse-distance profile (Mattson et al. 1970) of the event stream —
  * the one-pass answer to "what cache size would this workload want":
  * an access hits an LRU cache of capacity C iff its stack distance (the
  * number of distinct keys touched since the previous access to the same
  * key, that key included) is ≤ C, so ONE distance histogram prices every
  * candidate capacity at once. The emitted report is the hit-ratio curve
  * over C ∈ {4, 16, 64, 256} — the cache-sizing pre-flight a feature
  * store or shuffle-service tier runs before provisioning.
  *
  * Distance, exactly and join-shaped: with j the previous access position
  * of the key and i the current one, the distinct keys in (j, i) are
  * EXACTLY the accesses p ∈ (j, i) that are the LAST touch of their key
  * before i (next-touch(p) ≥ i) — so distance = that count + 1, a range
  * join + count instead of a sequential stack walk. Positions are the
  * stream's arrival index (event_id — the driver stream is id-ordered),
  * so no global sort is ever planned.
  *
  * Scale shape: the gap is CAPPED at G=256 positions (gaps beyond G are
  * reported as the far_misses class — at any plausible C ≤ G they miss
  * anyway unless the trace degenerates to <C keys alternating over a
  * long window; the cap is the declared contract). The cap turns the
  * range join into a bin-range join (q119's pattern): each access probes
  * its gap's 2 possible G-buckets, so the join is equi on bucket and the
  * per-row work is bounded by G at any scale. One window shuffle
  * (user_id), one bounded join shuffle (bucket), then model-sized
  * histogram algebra; the 1-row totals broadcast is PlanGuard-declared.
  */
object CacheSimOps {

  private val G     = 256L                   // gap cap (positions)
  private val Sizes = Seq(4L, 16L, 64L, 256L) // priced LRU capacities

  val q486ReuseDistance: QueryDef = QueryDef(
    "q486_reuse_distance",
    (s, dir) => {
      val acc = EventOps.events(s, dir)
        .select(col("event_id").as("pos"), col("user_id").as("k"))
      val wk = Window.partitionBy(col("k")).orderBy(col("pos"))
      val marked = acc
        .withColumn("prv", lag(col("pos"), 1).over(wk))
        .withColumn("nxt", lead(col("pos"), 1).over(wk))
        .localCheckpoint() // probe side AND build side of the range join
      // probe rows: in-cap reuses, exploded to the 2 candidate G-buckets
      val probes = marked
        .filter(col("prv").isNotNull && col("pos") - col("prv") <= G)
        .select(col("pos").as("i"), col("prv").as("j"),
          explode(array(floor(col("prv") / G).cast("long"),
            floor(col("prv") / G).cast("long") + 1)).as("bucket"))
      // build rows: every access, keyed by its own G-bucket
      val lasts = marked
        .select(col("pos").as("p"), col("nxt"),
          floor(col("pos") / G).cast("long").as("bucket"))
      val dist = probes.join(lasts, Seq("bucket"))
        .filter(col("p") > col("j") && col("p") < col("i") &&
          (col("nxt").isNull || col("nxt") >= col("i")))
        .groupBy(col("i")).agg(count(lit(1)).as("n_between"))
      val reuses = marked
        .filter(col("prv").isNotNull && col("pos") - col("prv") <= G)
        .select(col("pos").as("i"))
        .join(dist, Seq("i"), "left")
        .na.fill(0L, Seq("n_between"))
        .select((col("n_between") + 1).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n")) // <= G+1 rows
      val classes = marked.agg(
        count(lit(1)).as("total"),
        sum(when(col("prv").isNull, 1L).otherwise(0L)).as("cold_misses"),
        sum(when(col("prv").isNotNull && col("pos") - col("prv") > G, 1L)
          .otherwise(0L)).as("far_misses"))
      // drive the curve from the Sizes spine (not from reuses): a trace
      // with zero in-cap reuses must still emit the 4-row curve with
      // hits=0 rather than silently dropping the report
      val sizesDf = s.range(1)
        .select(explode(array(Sizes.map(lit(_)): _*)).as("cache_size"))
      val hitsBySize = reuses
        .select(explode(array(Sizes.map(lit(_)): _*)).as("cache_size"),
          col("d"), col("n"))
        .groupBy(col("cache_size"))
        .agg(sum(when(col("d") <= col("cache_size"), col("n"))
          .otherwise(0L)).as("hits"))
      val curve = sizesDf
        .join(hitsBySize, Seq("cache_size"), "left")
        .na.fill(0L, Seq("hits"))
        .crossJoin(broadcast(classes)) // 1-row class totals
      curve.select(col("cache_size"), col("hits"),
        (col("total") - col("cold_misses") - col("far_misses") - col("hits"))
          .as("capped_misses"),
        col("far_misses"), col("cold_misses"), col("total"),
        round(col("hits").cast("double") / col("total").cast("double"), 6)
          .as("hit_rate"))
    },
    Some(s"""WITH acc AS (
        SELECT event_id AS pos, user_id AS k FROM events),
      marked AS (
        SELECT pos, k,
          lag(pos) OVER (PARTITION BY k ORDER BY pos) AS prv,
          lead(pos) OVER (PARTITION BY k ORDER BY pos) AS nxt
        FROM acc),
      dist AS (
        SELECT b.pos AS i, CAST(COUNT(*) AS BIGINT) AS n_between
        FROM marked b JOIN marked a
          ON a.pos > b.prv AND a.pos < b.pos
          AND (a.nxt IS NULL OR a.nxt >= b.pos)
        WHERE b.prv IS NOT NULL AND b.pos - b.prv <= $G
        GROUP BY 1),
      reuses AS (
        SELECT COALESCE(d.n_between, 0) + 1 AS d, CAST(COUNT(*) AS BIGINT) AS n
        FROM marked m LEFT JOIN dist d ON d.i = m.pos
        WHERE m.prv IS NOT NULL AND m.pos - m.prv <= $G
        GROUP BY 1),
      classes AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
          CAST(SUM(CASE WHEN prv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS cold_misses,
          CAST(SUM(CASE WHEN prv IS NOT NULL AND pos - prv > $G
            THEN 1 ELSE 0 END) AS BIGINT) AS far_misses
        FROM marked),
      curve AS (
        -- LEFT JOIN from the size spine: a trace with no in-cap reuses
        -- still yields the 4-row curve with hits=0
        SELECT cs.cache_size,
          CAST(COALESCE(SUM(CASE WHEN r.d <= cs.cache_size THEN r.n
            ELSE 0 END), 0) AS BIGINT) AS hits
        FROM (VALUES ${Sizes.map(c => s"($c)").mkString(", ")})
          cs(cache_size) LEFT JOIN reuses r ON TRUE
        GROUP BY 1)
      SELECT CAST(cv.cache_size AS BIGINT) AS cache_size, cv.hits,
        c.total - c.cold_misses - c.far_misses - cv.hits AS capped_misses,
        c.far_misses, c.cold_misses, c.total,
        round(CAST(cv.hits AS DOUBLE) / CAST(c.total AS DOUBLE), 6)
          AS hit_rate
      FROM curve cv, classes c"""))

  val all: Seq[QueryDef] = Seq(q486ReuseDistance)
}
