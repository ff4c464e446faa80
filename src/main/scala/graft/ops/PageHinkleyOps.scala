package graft.ops

import org.apache.spark.sql.functions._

/** Page-Hinkley drift detector over the daily mean event value — the
  * classic sequential change-point monitor (Page 1954, Hinkley 1971;
  * the standard upward-drift test in stream-mining libraries): running
  * cumulative deviation m_t = Σ(x_i − x̄_i − δ) against its running
  * minimum, alarm when the excursion m_t − min m exceeds λ. The
  * sequential sibling of q534's Hampel and q537's Western Electric
  * rules (reference: overseer's monitoring family,
  * doc/guide/Monitoring.md:1).
  *
  * Scale shape: the corpus pass is one (day) hash agg to exact
  * micro-unit sums; the detector folds once over the calendar-bounded
  * day array inside a single codegen `aggregate` (the q485/q514
  * discipline — no driver loop, no per-step shuffle).
  *
  * Exactness: day means from exact BIGINT micro-sums via an identical
  * division chain both engines (round 12); every fold step quantizes
  * round(·,9) so pow/ln-free arithmetic stays bit-identical; surfaced
  * stats round 6.
  */
object PageHinkleyOps {

  private val Delta  = 0.005
  private val Lambda = 0.05

  val q568PageHinkley: QueryDef = QueryDef(
    "q568_page_hinkley",
    (s, dir) => {
      val daily = EventOps.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 1000000 + 0.5).cast("long")).as("micro"),
          count(lit(1)).as("cnt"))
        .select(col("day").cast("string").as("day"),
          round(col("micro").cast("double") / 1000000.0
            / col("cnt").cast("double"), 12).as("x"))
      daily
        .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("ser"))
        .select(size(col("ser")).cast("long").as("n_days"),
          expr(s"""aggregate(
            ser,
            named_struct('t', CAST(0 AS BIGINT), 'mean', CAST(0.0 AS DOUBLE),
                         'm', CAST(0.0 AS DOUBLE), 'mmin', CAST(0.0 AS DOUBLE),
                         'exc', CAST(0.0 AS DOUBLE),
                         'alarm', CAST(NULL AS STRING)),
            (acc, d) -> named_struct(
              't', acc.t + 1L,
              'mean', round(acc.mean + (d.x - acc.mean)
                        / CAST(acc.t + 1L AS DOUBLE), 9),
              'm', round(acc.m + d.x
                     - round(acc.mean + (d.x - acc.mean)
                         / CAST(acc.t + 1L AS DOUBLE), 9)
                     - CAST($Delta AS DOUBLE), 9),
              'mmin', least(acc.mmin,
                round(acc.m + d.x
                  - round(acc.mean + (d.x - acc.mean)
                      / CAST(acc.t + 1L AS DOUBLE), 9)
                  - CAST($Delta AS DOUBLE), 9)),
              'exc', greatest(acc.exc,
                round(round(acc.m + d.x
                    - round(acc.mean + (d.x - acc.mean)
                        / CAST(acc.t + 1L AS DOUBLE), 9)
                    - CAST($Delta AS DOUBLE), 9)
                  - least(acc.mmin,
                      round(acc.m + d.x
                        - round(acc.mean + (d.x - acc.mean)
                            / CAST(acc.t + 1L AS DOUBLE), 9)
                        - CAST($Delta AS DOUBLE), 9)), 9)),
              'alarm', CASE WHEN acc.alarm IS NOT NULL THEN acc.alarm
                WHEN round(round(acc.m + d.x
                      - round(acc.mean + (d.x - acc.mean)
                          / CAST(acc.t + 1L AS DOUBLE), 9)
                      - CAST($Delta AS DOUBLE), 9)
                    - least(acc.mmin,
                        round(acc.m + d.x
                          - round(acc.mean + (d.x - acc.mean)
                              / CAST(acc.t + 1L AS DOUBLE), 9)
                          - CAST($Delta AS DOUBLE), 9)), 9)
                  > CAST($Lambda AS DOUBLE) THEN d.day
                ELSE CAST(NULL AS STRING) END)) AS st"""))
        .select(col("n_days"),
          round(col("st.mean"), 6).as("final_mean"),
          round(col("st.m"), 6).as("ph_m"),
          round(col("st.mmin"), 6).as("ph_min"),
          round(col("st.exc"), 6).as("max_excursion"),
          col("st.alarm").isNotNull.as("alarmed"),
          col("st.alarm").as("alarm_day"))
    },
    Some(s"""WITH RECURSIVE daily AS (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
          round(CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
              AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE), 12) AS x
        FROM events GROUP BY 1),
      ser AS (
        SELECT day, x, row_number() OVER (ORDER BY day) AS pos,
          COUNT(*) OVER () AS n_days
        FROM daily),
      f(pos, t, mean, m, mmin, exc, alarm) AS (
        SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
          CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
          CAST(NULL AS VARCHAR)
        UNION ALL
        SELECT s.pos, f.t + 1,
          round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9),
          round(f.m + s.x
            - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
            - $Delta, 9),
          least(f.mmin, round(f.m + s.x
            - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
            - $Delta, 9)),
          greatest(f.exc, round(round(f.m + s.x
              - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
              - $Delta, 9)
            - least(f.mmin, round(f.m + s.x
              - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
              - $Delta, 9)), 9)),
          CASE WHEN f.alarm IS NOT NULL THEN f.alarm
            WHEN round(round(f.m + s.x
                - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
                - $Delta, 9)
              - least(f.mmin, round(f.m + s.x
                - round(f.mean + (s.x - f.mean) / CAST(f.t + 1 AS DOUBLE), 9)
                - $Delta, 9)), 9) > $Lambda THEN s.day
            ELSE NULL END
        FROM f JOIN ser s ON s.pos = f.pos + 1)
      SELECT (SELECT CAST(MAX(n_days) AS BIGINT) FROM ser) AS n_days,
        round(mean, 6) AS final_mean,
        round(m, 6) AS ph_m,
        round(mmin, 6) AS ph_min,
        round(exc, 6) AS max_excursion,
        (alarm IS NOT NULL) AS alarmed,
        alarm AS alarm_day
      FROM f ORDER BY pos DESC LIMIT 1"""))

  val all: Seq[QueryDef] = Seq(q568PageHinkley)
}
