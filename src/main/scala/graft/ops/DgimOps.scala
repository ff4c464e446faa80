package graft.ops

import org.apache.spark.sql.functions._

/** DGIM sliding-window bit counting (Datar-Gionis-Indyk-Motwani 2002):
  * approximate "how many `click` events in the last W events" in
  * O(log² W) state — THE textbook sketch for windowed counts a
  * streaming monitor keeps per key when storing the window is too
  * expensive. Buckets hold exponentially-growing powers of two, at most
  * two per size; the estimate is all full buckets plus half the oldest,
  * and the certificate |est − true| ≤ ⌈oldest/2⌉ (≤50% relative) holds
  * for ANY stream — so the readout emits certified booleans beside the
  * exact count, the q544/q490 idiom (the oracle recomputes the exact
  * side and pins the certificates TRUE).
  *
  * Scale shape: the detector state depends only on a bounded stream
  * tail (it is initialized at position n − 16384, documented), so the
  * packed fold is CONSTANT-size at any corpus scale; the exact check
  * and the stream length are distributed aggregates. At cluster scale
  * this fold is per-key state inside mapGroupsWithState; here it is
  * one codegen `aggregate` so the oracle can see it.
  *
  * Exactness: everything is exact BIGINT arithmetic — no floats in the
  * estimator at all.
  */
object DgimOps {

  private val W    = 2048
  private val Tail = 16384

  /** The DGIM transition as ONE SQL aggregate over a packed bit-array
    * column `bits` (state = (t, buckets newest-first)) — shared
    * VERBATIM by q567 and DgimStreamSpec, so the online store
    * (streaming/DgimStream) is certified against the exact fold it
    * twins. */
  private[graft] def dgimFoldSql(w: Int): String = s"""aggregate(
            bits,
            named_struct('t', CAST(-1 AS BIGINT),
                         'bk', CAST(array() AS ARRAY<STRUCT<sz: BIGINT, tm: BIGINT>>)),
            (acc, bit) -> named_struct(
              't', acc.t + 1L,
              'bk', CASE WHEN bit = 0L THEN
                  filter(acc.bk, b -> b.tm > acc.t + 1L - $w)
                ELSE
                  -- prepend the new 1-bucket, then cascade: 12 passes,
                  -- each merging the two OLDEST of the first size that
                  -- has three buckets (sizes are ordered newest-first,
                  -- so equal sizes are adjacent)
                  aggregate(sequence(1, 12),
                    concat(array(named_struct('sz', 1L, 'tm', acc.t + 1L)),
                      filter(acc.bk, b -> b.tm > acc.t + 1L - $w)),
                    (st, _) -> CASE WHEN size(st) >= 3 AND size(
                        filter(sequence(0, size(st) - 3),
                          i -> element_at(st, i + 1).sz
                            = element_at(st, i + 3).sz)) > 0 THEN
                        -- first index whose size repeats thrice
                        concat(
                          slice(st, 1, element_at(
                            filter(sequence(0, size(st) - 3),
                              i -> element_at(st, i + 1).sz
                                = element_at(st, i + 3).sz), 1) + 1),
                          array(named_struct(
                            'sz', element_at(st, element_at(
                              filter(sequence(0, size(st) - 3),
                                i -> element_at(st, i + 1).sz
                                  = element_at(st, i + 3).sz), 1) + 2).sz * 2L,
                            'tm', element_at(st, element_at(
                              filter(sequence(0, size(st) - 3),
                                i -> element_at(st, i + 1).sz
                                  = element_at(st, i + 3).sz), 1) + 2).tm)),
                          slice(st, element_at(
                            filter(sequence(0, size(st) - 3),
                              i -> element_at(st, i + 1).sz
                                = element_at(st, i + 3).sz), 1) + 4,
                            size(st)))
                      ELSE st END)
                END))"""

  val q567DgimWindow: QueryDef = QueryDef(
    "q567_dgim_window",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("bit"))
        .localCheckpoint() // tail, exact window count and n all read it
      val n = ev.count()
      // bounded tail, newest Tail events in stream order
      val tail = ev.orderBy(col("ts_us").desc, col("event_id").desc)
        .limit(Tail)
        .orderBy(col("ts_us"), col("event_id"))
      val trueOnes = ev.orderBy(col("ts_us").desc, col("event_id").desc)
        .limit(W)
        .agg(sum(col("bit")).as("true_ones"))
      // the DGIM fold: state = buckets newest-first (size, time), ≤2 per
      // size after the cascade; time = index within the tail
      val folded = tail
        .agg(collect_list(col("bit")).as("bits"))
        .select(expr(s"${dgimFoldSql(W)} AS st"))
        .select(expr("""CASE WHEN size(st.bk) = 0 THEN 0L
            WHEN size(st.bk) = 1 THEN element_at(st.bk, 1).sz
            ELSE aggregate(slice(st.bk, 1, size(st.bk) - 1), 0L,
                   (a, b) -> a + b.sz)
              + CAST(element_at(st.bk, size(st.bk)).sz / 2 AS BIGINT)
            END AS est"""),
          expr("""CASE WHEN size(st.bk) = 0 THEN 0L
            ELSE CAST((element_at(st.bk, size(st.bk)).sz + 1) / 2 AS BIGINT)
            END AS bound"""),
          // the DGIM state invariant: sizes are powers of two,
          // non-decreasing newest-first, at most two buckets per size
          expr("""size(filter(sequence(0, size(st.bk) - 1), i ->
              (element_at(st.bk, i + 1).sz
                & (element_at(st.bk, i + 1).sz - 1L)) != 0L
              OR (i > 0 AND element_at(st.bk, i + 1).sz
                    < element_at(st.bk, i).sz)
              OR (i > 1 AND element_at(st.bk, i + 1).sz
                    = element_at(st.bk, i - 1).sz))) = 0
            AS invariant_ok"""))
      import s.implicits._
      folded.crossJoin(broadcast(trueOnes))
        .select(lit(n).as("n_stream"), lit(W.toLong).as("w"),
          col("true_ones"),
          // unconditional: only the OLDEST bucket can straddle the
          // window boundary, so |est − true| ≤ ⌈oldest/2⌉ always
          (abs(col("est") - col("true_ones")) <= col("bound")).as("cert_ok"),
          col("invariant_ok"))
    },
    Some(s"""WITH ordered AS (
        SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS bit,
          row_number() OVER (ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_stream,
        CAST($W AS BIGINT) AS w,
        (SELECT CAST(SUM(bit) AS BIGINT) FROM ordered WHERE rn <= $W)
          AS true_ones,
        TRUE AS cert_ok,
        TRUE AS invariant_ok"""))

  private val Wk    = 512
  private val TailK = 4096

  /** Keyed DGIM dashboard (r15) — the cluster shape of q567 and the
    * oracle-checked face of `streaming/KeyedDgimStream`: one DGIM
    * window of width Wk PER event_type ("even-user events among this
    * type's last 512"), every key's fold running as an independent
    * codegen `aggregate` over its own bounded tail — embarrassingly
    * parallel across keys, exactly the mapGroupsWithState layout the
    * streaming twin keeps as state. Readout per key: exact window
    * count + the unconditional half-oldest certificate + the bucket
    * invariant, both pinned TRUE by the oracle (the q567 idiom).
    *
    * Scale shape: the per-key window rank bounds every key's state
    * input to TailK rows; fold state is O(log² Wk) per key; the exact
    * check and stream lengths are distributed aggregates. */
  val q572KeyedDgimDashboard: QueryDef = QueryDef(
    "q572_keyed_dgim_dashboard",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = EventOps.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"),
          when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(0L)
            .as("bit"))
        .localCheckpoint() // per-key tail, exact counts and totals read it
      val wK = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      val ranked = ev.withColumn("rn", row_number().over(wK))
      val totals = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_type"))
      val trueOnes = ranked.filter(col("rn") <= Wk)
        .groupBy(col("event_type"))
        .agg(sum(col("bit")).as("true_ones"))
      // newest TailK bits per key, re-ordered oldest-first inside the
      // per-key array — the fold input, bounded per key by construction
      val folded = ranked.filter(col("rn") <= TailK)
        .groupBy(col("event_type"))
        .agg(expr("""transform(
            array_sort(collect_list(named_struct(
              'ts', ts_us, 'id', event_id, 'b', bit))),
            x -> x.b)""").as("bits"))
        .select(col("event_type"), expr(s"${dgimFoldSql(Wk)} AS st"))
        .select(col("event_type"),
          expr("""CASE WHEN size(st.bk) = 0 THEN 0L
            WHEN size(st.bk) = 1 THEN element_at(st.bk, 1).sz
            ELSE aggregate(slice(st.bk, 1, size(st.bk) - 1), 0L,
                   (a, b) -> a + b.sz)
              + CAST(element_at(st.bk, size(st.bk)).sz / 2 AS BIGINT)
            END AS est"""),
          expr("""CASE WHEN size(st.bk) = 0 THEN 0L
            ELSE CAST((element_at(st.bk, size(st.bk)).sz + 1) / 2 AS BIGINT)
            END AS bound"""),
          expr("""size(filter(sequence(0, size(st.bk) - 1), i ->
              (element_at(st.bk, i + 1).sz
                & (element_at(st.bk, i + 1).sz - 1L)) != 0L
              OR (i > 0 AND element_at(st.bk, i + 1).sz
                    < element_at(st.bk, i).sz)
              OR (i > 1 AND element_at(st.bk, i + 1).sz
                    = element_at(st.bk, i - 1).sz))) = 0
            AS invariant_ok"""))
      folded.join(totals, Seq("event_type"))
        .join(trueOnes, Seq("event_type"))
        .select(col("event_type"), col("n_type"), lit(Wk.toLong).as("w"),
          col("true_ones"),
          (abs(col("est") - col("true_ones")) <= col("bound")).as("cert_ok"),
          col("invariant_ok"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH ordered AS (
        SELECT event_type,
          CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS bit,
          row_number() OVER (PARTITION BY event_type
            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events),
      tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type
        FROM events GROUP BY 1),
      tr AS (SELECT event_type, CAST(SUM(bit) AS BIGINT) AS true_ones
        FROM ordered WHERE rn <= $Wk GROUP BY 1)
      SELECT t.event_type, t.n_type, CAST($Wk AS BIGINT) AS w,
        tr.true_ones, TRUE AS cert_ok, TRUE AS invariant_ok
      FROM tot t JOIN tr USING (event_type)
      ORDER BY event_type"""))

  val all: Seq[QueryDef] = Seq(q567DgimWindow, q572KeyedDgimDashboard)
}
