package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Records-theory wave: running-record census per nation (q466) and
  * Goh–Barabási burstiness of inter-purchase times (q467) — two
  * sequence diagnostics that need no model: Rényi's theorem says a
  * memoryless order stream produces H_n records in n orders, so the
  * observed record count IS a drift test (a trending market breaks
  * records too often); burstiness B = (σ−μ)/(σ+μ) places each
  * nation's purchase rhythm on the [-1, 1] periodic↔bursty axis
  * (q173's Fano factor is the count-window cousin; B is the
  * inter-arrival form).
  *
  * Determinism: records ride a strict running max over the exact
  * (date, orderkey) total order on DECIMAL values; harmonic moments
  * H_n, H_n⁽²⁾ are DECIMAL sums of 12-dp-rounded reciprocals off a
  * per-nation explode; burstiness moments are exact integer day sums.
  *
  * Scale shape: everything stays keyed by nation — windows partition
  * by nation, the harmonic spine is a per-nation explode, and no
  * scalar broadcast or nested-loop join appears in the plan.
  */
object RecordsOps {

  /** Per-nation record census: observed strict running records vs the
    * Rényi expectation H_n with variance H_n − H_n⁽²⁾, z-scored. */
  val q466RecordCensus: QueryDef = QueryDef(
    "q466_record_census",
    (s, dir) => {
      val t = Tables(s, dir)
      val o = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nk")), Seq("o_custkey"))
        .select(col("nk"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("d"),
          col("o_orderkey").as("okey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      val wPrev = Window.partitionBy(col("nk")).orderBy(col("d"), col("okey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val recs = o
        .withColumn("prevmax", max(col("v")).over(wPrev))
        .groupBy(col("nk"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("prevmax").isNull || col("v") > col("prevmax"), 1L)
            .otherwise(0L)).as("n_records"))
      // per-nation harmonic moments off an explode spine
      val d12 = DecimalType(38, 12)
      val harm = recs
        .select(col("nk"), explode(sequence(lit(1L), col("n_orders"))).as("k"))
        .groupBy(col("nk"))
        .agg(sum(round(lit(1.0) / col("k"), 12).cast(d12)).as("h1"),
          sum(round(lit(1.0) / (col("k") * col("k")), 12).cast(d12)).as("h2"))
      recs.join(harm, Seq("nk"))
        .withColumn("e_records", col("h1").cast("double"))
        .withColumn("var_records",
          col("h1").cast("double") - col("h2").cast("double"))
        .withColumn("z", round(
          (col("n_records") - col("e_records")) / sqrt(col("var_records")), 4))
        .select(col("nk").cast("long").as("nation"), col("n_orders"),
          col("n_records"), round(col("e_records"), 4).as("e_records"),
          round(col("var_records"), 4).as("var_records"), col("z"),
          (abs(col("z")) > 1.959963984540054).as("anomalous_5pct"))
        .orderBy(col("nation"))
    },
    Some("""WITH o AS MATERIALIZED (SELECT cu.c_nationkey AS nk,
          CAST(datediff('day', DATE '1992-01-01', o.o_orderdate) AS BIGINT)
            AS d,
          o.o_orderkey AS okey,
          CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey),
      recs AS MATERIALIZED (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM(CASE WHEN prevmax IS NULL OR v > prevmax THEN 1 ELSE 0
            END) AS BIGINT) AS n_records
        FROM (SELECT *, MAX(v) OVER (PARTITION BY nk ORDER BY d, okey
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
          FROM o)
        GROUP BY 1),
      harm AS (SELECT r.nk,
          SUM(CAST(round(1.0 / kk.k, 12) AS DECIMAL(38,12))) AS h1,
          SUM(CAST(round(1.0 / (kk.k * kk.k), 12) AS DECIMAL(38,12))) AS h2
        FROM recs r, UNNEST(range(1, r.n_orders + 1)) AS kk(k)
        GROUP BY 1)
      SELECT CAST(r.nk AS BIGINT) AS nation, r.n_orders, r.n_records,
        round(CAST(h.h1 AS DOUBLE), 4) AS e_records,
        round(CAST(h.h1 AS DOUBLE) - CAST(h.h2 AS DOUBLE), 4) AS var_records,
        round((r.n_records - CAST(h.h1 AS DOUBLE))
          / sqrt(CAST(h.h1 AS DOUBLE) - CAST(h.h2 AS DOUBLE)), 4) AS z,
        (abs(round((r.n_records - CAST(h.h1 AS DOUBLE))
          / sqrt(CAST(h.h1 AS DOUBLE) - CAST(h.h2 AS DOUBLE)), 4))
          > 1.959963984540054) AS anomalous_5pct
      FROM recs r JOIN harm h ON h.nk = r.nk
      ORDER BY nation"""))

  /** Per-nation Goh–Barabási burstiness of inter-purchase gaps:
    * B = (σ−μ)/(σ+μ) ∈ [-1, 1] from exact integer day moments. */
  val q467Burstiness: QueryDef = QueryDef(
    "q467_burstiness",
    (s, dir) => {
      val t = Tables(s, dir)
      val o = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nk")), Seq("o_custkey"))
        .select(col("nk"), col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("d"),
          col("o_orderkey").as("okey"))
      val wC = Window.partitionBy(col("ck")).orderBy(col("d"), col("okey"))
      val gaps = o
        .withColumn("gap", col("d") - lag(col("d"), 1).over(wC))
        .where(col("gap").isNotNull)
      val d38 = DecimalType(38, 0)
      gaps.groupBy(col("nk"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap").cast(d38)).as("sg"),
          sum((col("gap") * col("gap")).cast(d38)).as("sgg"))
        .withColumn("mu", col("sg").cast("double") / col("n_gaps"))
        .withColumn("sd", sqrt(col("sgg").cast("double") / col("n_gaps")
          - col("mu") * col("mu")))
        .select(col("nk").cast("long").as("nation"), col("n_gaps"),
          round(col("mu"), 4).as("mean_gap"),
          round(col("sd") / col("mu"), 6).as("cv"),
          round((col("sd") - col("mu")) / (col("sd") + col("mu")), 6)
            .as("burstiness"),
          ((col("sd") - col("mu")) / (col("sd") + col("mu")) > 0)
            .as("bursty"))
        .orderBy(col("nation"))
    },
    Some("""WITH o AS (SELECT cu.c_nationkey AS nk, o.o_custkey AS ck,
          CAST(datediff('day', DATE '1992-01-01', o.o_orderdate) AS BIGINT)
            AS d,
          o.o_orderkey AS okey
        FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey),
      gaps AS (SELECT nk, gap FROM (SELECT nk,
          d - LAG(d) OVER (PARTITION BY ck ORDER BY d, okey) AS gap
        FROM o) WHERE gap IS NOT NULL),
      mom AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          SUM(CAST(gap AS DECIMAL(38,0))) AS sg,
          SUM(CAST(gap * gap AS DECIMAL(38,0))) AS sgg
        FROM gaps GROUP BY 1),
      alg AS (SELECT *, CAST(sg AS DOUBLE) / n_gaps AS mu,
          sqrt(CAST(sgg AS DOUBLE) / n_gaps
            - (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))
            AS sd
        FROM mom)
      SELECT CAST(nk AS BIGINT) AS nation, n_gaps,
        round(mu, 4) AS mean_gap,
        round(sd / mu, 6) AS cv,
        round((sd - mu) / (sd + mu), 6) AS burstiness,
        ((sd - mu) / (sd + mu) > 0) AS bursty
      FROM alg ORDER BY nation"""))

  val all: Seq[QueryDef] = Seq(q466RecordCensus, q467Burstiness)
}
