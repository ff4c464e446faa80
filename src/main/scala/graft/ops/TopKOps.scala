package graft.ops

import org.apache.spark.sql.functions._

/** Per-key exact top-k through the typed UDAF surface — the
  * [[graft.functions.Aggregators.TopKEarliest]] Aggregator promoted from
  * SkewBench's measured experiment to an oracle-checked query: the first
  * 3 events of every user, computed with BOUNDED ≤k-pair partial state
  * per (task, key) instead of a window sort. SkewBench's sf10 numbers
  * are the why: vs the row_number window this plan shuffles 5× fewer
  * records (150k vs 750k of 10M) and runs ~25% faster, uniform AND
  * Zipf-whale key shapes alike — partial aggregation with bounded state
  * is structurally skew-immune, which no window partition is.
  *
  * The oracle is the window spelling (row_number ≤ 3 over (ts, id)) —
  * proving the aggregator's merge algebra equals the sort semantics on
  * the full corpus, the same claim SkewBench checksums at sf10.
  */
object TopKOps {

  val q475TopkPerUser: QueryDef = QueryDef(
    "q475_topk_per_user",
    (s, dir) => {
      import s.implicits._
      val agg = new graft.functions.Aggregators.TopKEarliest(3).toColumn
      EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_id"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.name("top"))
        .select(col("key").as("user_id"), posexplode(col("top")))
        .select(col("user_id"), (col("pos") + 1).cast("long").as("rk"),
          col("col._2").as("event_id"), col("col._1").as("ts_us"))
    },
    Some("""SELECT user_id, CAST(rn AS BIGINT) AS rk, event_id, ts_us
      FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS rn
        FROM events)
      WHERE rn <= 3"""))

  val all: Seq[QueryDef] = Seq(q475TopkPerUser)
}
