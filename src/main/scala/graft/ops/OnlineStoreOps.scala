package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Oracle-visible dashboard reads of the ONLINE stores — the q491
  * precedent extended to the round-12 streaming modules: the same
  * standing state the streaming twins maintain (QuantileStream's KLL
  * buffer, MarkovStream's transition counts) is built here through the
  * stores' own merge path over deterministic slices of the batch tables,
  * then read out as an oracle-checked frame. The streaming specs
  * (QuantileStreamSpec / MarkovStreamSpec) prove `maintain()` feeds the
  * store identically under any time-ordered slicing; these queries make
  * the store READ-OUT itself part of the correctness gate, so the online
  * half of each family is no longer spec-only (reference: the Monitoring
  * dashboards a worker fleet watches, doc/guide/Monitoring.md:1 —
  * re-expressed over Spark state stores instead of a polled SQL table).
  *
  * Scale shape: all corpus-sized work is distributed — the quantile
  * deltas are constant-size per-partition folds (never a row leaves the
  * executor un-sketched), the transition counts are a lead() window +
  * map-side-combinable hash agg with ≤|types|² rows per slice reaching
  * the store (MarkovStream.maintain's own foreachBatch contract).
  *
  * Exactness: q544 emits the sketch's CERTIFIED booleans (guaranteed
  * true for any merge history — q490's idiom) plus the exact n; q545's
  * snapshot equals q496's lead-window transition matrix exactly
  * (BIGINT counts), including one deliberately re-delivered slice that
  * the store's batch-id high-water mark must skip.
  */
object OnlineStoreOps {

  private val Phis = Seq(0.01, 0.25, 0.50, 0.75, 0.99)
  private val Slices = 4

  /** QuantileStream store dashboard: maintain the standing KLL buffer
    * from `Slices` deterministic hash-slices of the lineitem cents
    * column (each slice's delta folded distributed, exactly
    * QuantileStream.maintain's per-batch shape), then read out every
    * phi with its certified rank bracket checked against TRUE ranks. */
  val q544QuantileStoreDashboard: QueryDef = QueryDef(
    "q544_quantile_store_dashboard",
    (s, dir) => {
      import s.implicits._
      import graft.functions.Aggregators.QuantileSketch
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"),
          floor(col("l_extendedprice") * 100 + lit(0.5))
            .cast("long").as("c"))
      val store = new graft.streaming.QuantileStream.QuantileStore
      (0 until Slices).foreach { i =>
        val delta = li
          .filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(Slices)) === i)
          .select(col("c")).as[Long].rdd
          .mapPartitions(it =>
            if (it.isEmpty) Iterator.empty
            else Iterator.single(QuantileSketch.foldPartition(it, 256)))
          .collect() // ≤|partitions| constant-size partials
        if (delta.nonEmpty)
          store.merge(i.toLong, delta.reduceLeft(QuantileSketch.k256.merge))
      }
      val n = store.n
      val ests = Phis.map { phi =>
        val (v, budget) = store.estimate(phi)
        (phi, math.ceil(phi * n).toLong, v, budget)
      }
      // one distributed pass for the true ranks of every estimate
      val rankCols = ests.flatMap { case (phi, _, v, _) =>
        Seq(sum(when(col("c") <= lit(v), 1L).otherwise(0L)).as(s"le$phi"),
          sum(when(col("c") < lit(v), 1L).otherwise(0L)).as(s"lt$phi"))
      }
      val trueRanks = li.agg(rankCols.head, rankCols.tail: _*).head()
      val audits = ests.zipWithIndex.map { case ((phi, t, _, budget), i) =>
        val (le, lt) = (trueRanks.getLong(2 * i), trueRanks.getLong(2 * i + 1))
        (phi, n, le >= t - budget && lt <= t + budget, budget * 8 <= n)
      }
      audits.toDF("phi", "n", "sketch_ok", "bound_ok").orderBy(col("phi"))
    },
    Some("""SELECT CAST(phi AS DOUBLE) AS phi,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n,
        TRUE AS sketch_ok, TRUE AS bound_ok
      FROM (VALUES (0.01), (0.25), (0.50), (0.75), (0.99)) p(phi)
      ORDER BY phi"""))

  /** MarkovStream store dashboard: maintain the standing transition
    * counts from `Slices` event-time slices of the events table. Each
    * slice contributes its in-slice lead() pairs PLUS the bridge pair
    * from each user's previous-slice last event (exactly
    * MarkovStream.stepUser's state semantics, computed as a distributed
    * lag over the per-(user, slice) first/last frame rather than driver
    * state). Slice 2 is delivered twice — the store's high-water mark
    * must ignore the replay for the snapshot to match q496's matrix. */
  val q545MarkovStoreDashboard: QueryDef = QueryDef(
    "q545_markov_store_dashboard",
    (s, dir) => {
      import s.implicits._
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
      val head = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (tmin, tmax) = (head.getLong(0), head.getLong(1))
      val width = (tmax - tmin) / Slices + 1
      val sliced = ev
        .withColumn("slice", ((col("ts_us") - tmin) / width).cast("int"))
        .localCheckpoint() // pairs + per-(user,slice) spans both read this
      val wIn = Window.partitionBy(col("user_id"), col("slice"))
        .orderBy(col("ts_us"), col("event_id"))
      val inPairs = sliced
        .withColumn("nxt", lead(col("event_type"), 1).over(wIn))
        .where(col("nxt").isNotNull)
        .select(col("slice"), col("event_type").as("cur"), col("nxt"))
      val spans = sliced
        .groupBy(col("user_id"), col("slice"))
        .agg(min(struct(col("ts_us"), col("event_id"), col("event_type")))
            .as("first"),
          max(struct(col("ts_us"), col("event_id"), col("event_type")))
            .as("last"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("slice"))
      val bridges = spans
        .withColumn("prev_last", lag(col("last.event_type"), 1).over(wU))
        .where(col("prev_last").isNotNull)
        .select(col("slice"), col("prev_last").as("cur"),
          col("first.event_type").as("nxt"))
      // ≤ Slices × |types|² rows reach the driver — model-sized
      val perSlice = inPairs.unionByName(bridges)
        .groupBy(col("slice"), col("cur"), col("nxt"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getInt(0))
      val store = new graft.streaming.MarkovStream.TransStore
      perSlice.keys.toSeq.sorted.foreach { sl =>
        val rows = perSlice(sl).map(r =>
          ((r.getString(1), r.getString(2)), r.getLong(3))).toSeq
        store.merge(sl.toLong, rows)
        if (sl == 2) store.merge(sl.toLong, rows) // replayed delivery
      }
      store.snapshot.toSeq
        .map { case ((c, x), v) => (c, x, v) }
        .toDF("cur", "nxt", "cnt")
        .orderBy(col("cur"), col("nxt"))
    },
    Some("""WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        FROM events),
      pairs AS (
        SELECT event_type AS cur,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS nxt
        FROM ev)
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs WHERE nxt IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** EloStream store dashboard: maintain the standing ratings from
    * `Slices` contiguous day-range batches of q547's daily cents frame
    * (each batch is exactly EloStream.maintain's shape — one
    * day-aggregated row per day, day-ordered across batches), with
    * batch 2 deliberately delivered twice: the store's batch-id
    * high-water mark must skip the replay or every batch-2 day would
    * fold twice and all later ratings drift. Readout = the standing
    * ratings + day count, which must equal q547's batch fold
    * BIT-FOR-BIT (identical recurrence, identical round(·,9) per-step
    * quantization, identical j-term order — EloStreamSpec proves the
    * slicing invariance; this query makes the store READ-OUT itself
    * oracle-checked, closing the one streaming store that had no
    * dashboard).
    *
    * Scale shape: the corpus-sized work (join + hash agg to daily
    * cents) is distributed; only |days| day-aggregated rows reach the
    * driver — model-sized by the calendar (the TPC-H orderdate span is
    * ~2.4k days at EVERY scale factor), the same bound
    * EloStream.maintain's own foreachBatch collect carries. */
  val q560EloStoreDashboard: QueryDef = QueryDef(
    "q560_elo_store_dashboard",
    (s, dir) => {
      import s.implicits._
      // |days| rows, calendar-bounded — see the scale note above
      val dayRows = RatingOps.dailyCents(s, dir)
        .orderBy(col("day"))
        .select(col("day").cast("string"),
          col("c0"), col("c1"), col("c2"), col("c3"), col("c4"))
        .collect()
        .map(r => (r.getString(0), Array.tabulate(5)(i => r.getLong(i + 1))))
      val store = new graft.streaming.EloStream.EloStore(5)
      val per = math.max(1, (dayRows.length + Slices - 1) / Slices)
      dayRows.grouped(per).zipWithIndex.foreach { case (batch, i) =>
        store.merge(i.toLong, batch.toIndexedSeq)
        if (i == 2) store.merge(i.toLong, batch.toIndexedSeq) // replayed delivery
      }
      val ratings = store.snapshot
      RatingOps.Brands.zipWithIndex.map { case (b, i) =>
        (b, store.nDays,
          BigDecimal(ratings(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }.toDF("brand", "n_days", "elo").orderBy(col("brand"))
    },
    Some {
      s"""WITH RECURSIVE ${RatingOps.eloCteSql}
      SELECT b.brand,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
        b.elo
      FROM (
        ${RatingOps.Brands.zipWithIndex.map { case (b, i) =>
          s"SELECT '$b' AS brand, round((SELECT r$i FROM final), 6) AS elo"
        }.mkString("\n        UNION ALL\n        ")}
      ) b
      ORDER BY b.brand"""
    })

  val all: Seq[QueryDef] =
    Seq(q544QuantileStoreDashboard, q545MarkovStoreDashboard,
      q560EloStoreDashboard)
}
