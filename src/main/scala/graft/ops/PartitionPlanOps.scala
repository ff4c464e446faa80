package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Layout-planning wave: range-partition boundary planner — the exact
  * computation inside every range shuffle (Spark's RangePartitioner,
  * sort-merge bucketing): pick P−1 key boundaries from exact ranks,
  * respect the same-key-same-partition constraint, and audit the
  * resulting balance against md5-hash partitioning. q209 audits a
  * GIVEN hash layout; this PLANS the range layout and quantifies the
  * tie-induced skew that rank-splitting would hide.
  *
  * Scale shape: one key census (distinct keys + counts), one cum-sum
  * window, boundaries as a 15-element broadcast array probed with a
  * filter() HOF — never a per-row × per-boundary explode.
  */
object PartitionPlanOps {

  private val P = 16

  /** Plan P=16 range partitions for lineitem.l_orderkey: per partition
    * the key range, range-partition row count, and the md5-hash row
    * count, plus both schemes' max/avg skew ratios. */
  val q428RangePlanner: QueryDef = QueryDef(
    "q428_range_planner",
    (s, dir) => {
      val keys = Tables(s, dir).lineitem
        .groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // cum pass + assign pass + hash pass
      val tot = keys.agg(sum(col("cnt")).as("n"))
      // size-adaptive cumulative counts over the key census (r15):
      // window at bench scale, spine above; probe scans the checkpoint
      val cum = Spine.adaptiveRank(keys, Seq(col("k")), Seq("cnt"))
        .withColumnRenamed("cum_cnt", "cum").drop("pos")
      // boundary i = first key whose cumulative count reaches i·N/P,
      // i = 1..P−1 (floor-crossing test: ceil would flag the first key)
      val bounds = cum.crossJoin(broadcast(tot))
        .withColumn("fprev",
          floor((col("cum") - col("cnt")) * P / col("n")).cast("long"))
        .withColumn("fcur", floor(col("cum") * P / col("n")).cast("long"))
        .where(col("fcur") > col("fprev") && col("fprev") < P - 1)
        .select(col("k"))
      val barr = bounds.agg(sort_array(collect_list(col("k"))).as("barr"))
      val assigned = keys.crossJoin(broadcast(barr))
        .withColumn("part", expr("size(filter(barr, b -> b < k))").cast("long"))
      val range = assigned.groupBy(col("part"))
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi"),
          sum(col("cnt")).as("n_range"))
      val hash = keys
        .withColumn("part",
          conv(substring(md5(col("k").cast("string")), 1, 8), 16, 10)
            .cast("long") % P)
        .groupBy(col("part")).agg(sum(col("cnt")).as("n_hash"))
      val joined = range.join(hash, Seq("part"), "outer")
        .na.fill(0L, Seq("n_range", "n_hash"))
        .localCheckpoint()
      val dec6 = DecimalType(18, 6)
      val skew = joined.agg(
        max(col("n_range")).as("mx_r"), max(col("n_hash")).as("mx_h"),
        sum(col("n_range")).as("tr"))
        .select(
          round(col("mx_r").cast("double") * P / col("tr"), 4).as("skew_range"),
          round(col("mx_h").cast("double") * P / col("tr"), 4).as("skew_hash"))
      joined.crossJoin(broadcast(skew))
        .select(col("part"), col("lo"), col("hi"), col("n_range"),
          col("n_hash"), col("skew_range"), col("skew_hash"))
        .orderBy(col("part"))
    },
    Some(s"""WITH keys AS (SELECT l_orderkey AS k,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM keys),
      cum AS (SELECT k, cnt,
          SUM(cnt) OVER (ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM keys),
      bounds AS (SELECT c.k FROM cum c, tot t
        WHERE CAST(floor(c.cum * $P / CAST(t.n AS DOUBLE)) AS BIGINT)
            > CAST(floor((c.cum - c.cnt) * $P / CAST(t.n AS DOUBLE)) AS BIGINT)
          AND CAST(floor((c.cum - c.cnt) * $P / CAST(t.n AS DOUBLE)) AS BIGINT)
            < $P - 1),
      barr AS (SELECT list_sort(list(k)) AS barr FROM bounds),
      assigned AS (SELECT ky.k, ky.cnt,
          CAST(len(list_filter(b.barr, x -> x < ky.k)) AS BIGINT) AS part
        FROM keys ky, barr b),
      rng AS (SELECT part, MIN(k) AS lo, MAX(k) AS hi,
          CAST(SUM(cnt) AS BIGINT) AS n_range
        FROM assigned GROUP BY 1),
      hsh AS (SELECT
          ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % $P AS part,
          CAST(SUM(cnt) AS BIGINT) AS n_hash
        FROM keys GROUP BY 1),
      joined AS (SELECT COALESCE(r.part, h.part) AS part,
          r.lo, r.hi, COALESCE(r.n_range, 0) AS n_range,
          COALESCE(h.n_hash, 0) AS n_hash
        FROM rng r FULL OUTER JOIN hsh h ON h.part = r.part),
      skew AS (SELECT
          round(CAST(MAX(n_range) AS DOUBLE) * $P / SUM(n_range), 4)
            AS skew_range,
          round(CAST(MAX(n_hash) AS DOUBLE) * $P / SUM(n_range), 4)
            AS skew_hash
        FROM joined)
      SELECT j.part, j.lo, j.hi, j.n_range, j.n_hash,
        s.skew_range, s.skew_hash
      FROM joined j, skew s ORDER BY j.part"""))

  val all: Seq[QueryDef] = Seq(q428RangePlanner)
}
