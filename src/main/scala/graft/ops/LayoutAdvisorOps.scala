package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Physical-design advisor wave II: what ENCODING each column wants
  * (q481 — the ANALYZE-for-encoding pass a columnar writer runs) and
  * what SORT KEY the table wants (q482 — zone-map scan fractions under
  * candidate layouts, extending q210's single-layout what-if to the
  * advisor decision). Both are planning reads: model-sized outputs,
  * exact integer evidence, no data rewritten.
  *
  * Canonical row order for run/delta statistics is (l_orderkey,
  * l_linenumber, <every analyzed column>) — the driver data carries
  * duplicate (order, linenumber) pairs, so the key is extended until
  * ties are only between identical rows and adjacencies are engine-
  * invariant. The global rank/lag windows are the q152
  * single-partition bound: fine to ~10⁸ rows, range-partition the sort
  * beyond that.
  */
object LayoutAdvisorOps {

  /** Column encoding advisor: run-length / NDV / delta statistics per
    * candidate column under the PK order, and the writer's decision by
    * the standard ladder — RLE when the average run is ≥ 4 (compared as
    * 4·runs ≤ n, exact integers), else DICT when the dictionary fits
    * 16 bits, else DELTA when an integer column's max adjacent step
    * fits 16 bits, else PLAIN.
    *
    * Scale shape: NO global sort. The PK order is recovered from
    * VALUE-RANGE buckets of l_orderkey (order-preserving across buckets
    * because the bucket is a monotone function of the leading key and
    * l_linenumber never crosses buckets): adjacency statistics run
    * inside each bucket's window in parallel, and the one adjacency per
    * bucket BOUNDARY is stitched from a model-sized (first, last)-row
    * frame — the SkewBench hot/cold-split stitch, here as the default
    * plan. The oracle keeps the one-window global-order spelling:
    * identical results, clarity over speed on the oracle side. */
  val q481EncodingAdvisor: QueryDef = QueryDef(
    "q481_encoding_advisor",
    (s, dir) => {
      val li = Tables(s, dir).lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("l_qty"),
        col("l_returnflag"), col("l_linestatus"))
        .withColumn("bkt", (col("l_orderkey") / 1024L).cast("long"))
      val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_qty")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val allCols = intCols ++ strCols
      // (l_orderkey, l_linenumber) is NOT unique in the driver data —
      // the canonical order appends every analyzed column, so ties are
      // only between fully-identical rows and run statistics are
      // order-invariant in both engines
      val canonical = Seq("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "l_qty", "l_returnflag", "l_linestatus").map(col)
      val w = Window.partitionBy(col("bkt")).orderBy(canonical: _*)
      val lagged = allCols.foldLeft(li) { (df, c) =>
        df.withColumn(s"${c}_prev", lag(col(c), 1).over(w))
      }
      val aggs = allCols.flatMap { c =>
        Seq(
          countDistinct(col(c)).as(s"${c}_ndv"),
          (lit(1L) + sum(when(col(s"${c}_prev").isNotNull &&
            col(c) =!= col(s"${c}_prev"), 1L).otherwise(0L))).as(s"${c}_runs"))
      } ++ intCols.map { c =>
        max(when(col(s"${c}_prev").isNotNull,
          abs(col(c) - col(s"${c}_prev")))).as(s"${c}_delta")
      } :+ count(lit(1)).as("n")
      val inBucket = lagged.agg(aggs.head, aggs.tail: _*)
      // boundary stitch: each bucket's first/last row (min/max of the
      // PK-led struct), then the one adjacency per consecutive-bucket
      // pair over the model-sized bucket frame
      val rowStruct = struct(canonical: _*)
      val edges = li.groupBy(col("bkt"))
        .agg(min(rowStruct).as("first"), max(rowStruct).as("last"))
      val wB = Window.orderBy(col("bkt"))
      val boundary = edges
        .withColumn("prev_last", lag(col("last"), 1).over(wB))
        .filter(col("prev_last").isNotNull)
      val bAggs = allCols.map { c =>
        sum(when(col(s"first.$c") =!= col(s"prev_last.$c"), 1L)
          .otherwise(0L)).as(s"${c}_bruns")
      } ++ intCols.map { c =>
        max(abs(col(s"first.$c") - col(s"prev_last.$c"))).as(s"${c}_bdelta")
      }
      val bWide = boundary.agg(bAggs.head, bAggs.tail: _*)
      // total runs = 1 + within-bucket breaks + boundary breaks;
      // max delta = max(within, boundary)
      val wide = inBucket.crossJoin(broadcast(bWide))
        .select((Seq(col("n")) ++ allCols.flatMap { c =>
          Seq(col(s"${c}_ndv"),
            (col(s"${c}_runs") + coalesce(col(s"${c}_bruns"), lit(0L)))
              .as(s"${c}_runs"))
        } ++ intCols.map { c =>
          greatest(col(s"${c}_delta"), coalesce(col(s"${c}_bdelta"), lit(0L)))
            .as(s"${c}_delta")
        }): _*)
      val stackExpr = (intCols.map { c =>
        s"'$c', ${c}_ndv, ${c}_runs, ${c}_delta"
      } ++ strCols.map { c =>
        s"'$c', ${c}_ndv, ${c}_runs, CAST(NULL AS BIGINT)"
      }).mkString(s"stack(${intCols.size + strCols.size}, ", ", ",
        ") AS (col_name, ndv, n_runs, max_abs_delta)")
      wide.select(col("n"), expr(stackExpr))
        .select(col("col_name"), col("n"), col("ndv"), col("n_runs"),
          round(col("n").cast("double") / col("n_runs"), 4).as("avg_run_len"),
          col("max_abs_delta"),
          when(col("n_runs") * 4 <= col("n"), lit("rle"))
            .when(col("ndv") <= 65536, lit("dict"))
            .when(col("max_abs_delta").isNotNull &&
              col("max_abs_delta") <= 65536, lit("delta"))
            .otherwise(lit("plain")).as("encoding"))
    },
    Some {
      val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_qty")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val per = (intCols.map { c =>
        s"""SELECT '$c' AS col_name, n, ${c}_ndv AS ndv, ${c}_runs AS n_runs,
           |  ${c}_delta AS max_abs_delta FROM wide""".stripMargin
      } ++ strCols.map { c =>
        s"""SELECT '$c', n, ${c}_ndv, ${c}_runs, CAST(NULL AS BIGINT)
           |  FROM wide""".stripMargin
      }).mkString("\nUNION ALL\n")
      val aggInt = intCols.map { c =>
        s"""COUNT(DISTINCT $c) AS ${c}_ndv,
           |1 + CAST(SUM(CASE WHEN ${c}_prev IS NOT NULL AND $c <> ${c}_prev
           |  THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_runs,
           |CAST(MAX(CASE WHEN ${c}_prev IS NOT NULL
           |  THEN abs($c - ${c}_prev) END) AS BIGINT) AS ${c}_delta""".stripMargin
      }.mkString(",\n")
      val aggStr = strCols.map { c =>
        s"""COUNT(DISTINCT $c) AS ${c}_ndv,
           |1 + CAST(SUM(CASE WHEN ${c}_prev IS NOT NULL AND $c <> ${c}_prev
           |  THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_runs""".stripMargin
      }.mkString(",\n")
      val canonicalSql = "l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        "l_qty, l_returnflag, l_linestatus"
      val lags = (intCols ++ strCols).map { c =>
        s"LAG($c, 1) OVER (ORDER BY $canonicalSql) AS ${c}_prev"
      }.mkString(",\n")
      s"""WITH li AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |    CAST(l_quantity AS BIGINT) AS l_qty, l_returnflag, l_linestatus
         |  FROM lineitem),
         |lagged AS (SELECT *,
         |$lags
         |  FROM li),
         |wide AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |$aggInt,
         |$aggStr
         |  FROM lagged),
         |stacked AS ($per)
         |SELECT col_name, n, CAST(ndv AS BIGINT) AS ndv, n_runs,
         |  round(CAST(n AS DOUBLE) / n_runs, 4) AS avg_run_len,
         |  max_abs_delta,
         |  CASE WHEN n_runs * 4 <= n THEN 'rle'
         |       WHEN ndv <= 65536 THEN 'dict'
         |       WHEN max_abs_delta IS NOT NULL AND max_abs_delta <= 65536
         |         THEN 'delta'
         |       ELSE 'plain' END AS encoding
         |FROM stacked""".stripMargin
    })

  /** Sort-key advisor: zone-map scan fractions for a 3-predicate
    * workload under 3 candidate layouts (PK order, ship-date order,
    * part-key order), each simulated as 64 NTILE buckets with min/max
    * zone maps on the filter columns — q210's pruning what-if promoted
    * to the layout DECISION. The advisor's law: a predicate's own sort
    * key prunes best; the output makes the trade explicit per workload
    * entry. */
  val q482SortKeyAdvisor: QueryDef = QueryDef(
    "q482_sort_key_advisor",
    (s, dir) => {
      val li = Tables(s, dir).lineitem.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), unix_micros(col("l_shipdate").cast("timestamp"))
          .as("ship_us"))
      // same tie hazard as q481: extend every layout key until ties are
      // only between rows identical in all audited columns, so bucket
      // assignment (and therefore every zone map) is engine-invariant
      val tieTail = Seq(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("ship_us"))
      val layouts = Seq(
        "pk"       -> tieTail,
        "shipdate" -> (col("ship_us") +: tieTail),
        "partkey"  -> (col("l_partkey") +: tieTail))
      val loEpoch = 820454400000000L  // 1996-01-01 UTC, µs
      val hiEpoch = 828316800000000L  // 1996-04-01 UTC, µs (exclusive)
      val nLi = li.count() // parquet metadata count — the size probe, once
      val frames = layouts.map { case (name, key) =>
        // size-adaptive 64-way bucketing (r15): the fact-table frame
        // takes the single-task sort only while it provably fits one
        // task; past the threshold the range-partitioned spine +
        // exact-ntile formula keeps it distributed
        val zones = Spine.adaptiveNtile(li, key, 64, "bucket",
            knownCount = nLi)
          .withColumn("bucket", col("bucket").cast("int"))
          .groupBy(col("bucket"))
          .agg(min(col("ship_us")).as("ship_lo"), max(col("ship_us")).as("ship_hi"),
            min(col("l_partkey")).as("pk_lo"), max(col("l_partkey")).as("pk_hi"),
            min(col("l_suppkey")).as("sk_lo"), max(col("l_suppkey")).as("sk_hi"))
        zones.agg(
            count(lit(1)).as("n_buckets"),
            sum(when(col("ship_hi") >= loEpoch && col("ship_lo") < hiEpoch, 1L)
              .otherwise(0L)).as("ship_range_scan"),
            sum(when(col("pk_lo") <= 17L && col("pk_hi") >= 17L, 1L)
              .otherwise(0L)).as("partkey_point_scan"),
            sum(when(col("sk_lo") <= 3L && col("sk_hi") >= 3L, 1L)
              .otherwise(0L)).as("suppkey_point_scan"))
          .select(lit(name).as("layout"), col("n_buckets"),
            col("ship_range_scan"),
            round(col("ship_range_scan").cast("double") / col("n_buckets"), 4)
              .as("ship_range_frac"),
            col("partkey_point_scan"),
            round(col("partkey_point_scan").cast("double") / col("n_buckets"), 4)
              .as("partkey_point_frac"),
            col("suppkey_point_scan"),
            round(col("suppkey_point_scan").cast("double") / col("n_buckets"), 4)
              .as("suppkey_point_frac"))
      }
      frames.reduce(_.unionByName(_))
    },
    Some {
      val tieTail = "l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        "epoch_us(l_shipdate)"
      val layouts = Seq(
        "pk"       -> tieTail,
        "shipdate" -> s"epoch_us(l_shipdate), $tieTail",
        "partkey"  -> s"l_partkey, $tieTail")
      layouts.map { case (name, key) =>
        s"""SELECT '$name' AS layout,
           |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
           |  CAST(SUM(CASE WHEN ship_hi >= 820454400000000
           |    AND ship_lo < 828316800000000 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS ship_range_scan,
           |  round(SUM(CASE WHEN ship_hi >= 820454400000000
           |    AND ship_lo < 828316800000000 THEN 1 ELSE 0 END)
           |    / CAST(COUNT(*) AS DOUBLE), 4) AS ship_range_frac,
           |  CAST(SUM(CASE WHEN pk_lo <= 17 AND pk_hi >= 17 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS partkey_point_scan,
           |  round(SUM(CASE WHEN pk_lo <= 17 AND pk_hi >= 17 THEN 1 ELSE 0 END)
           |    / CAST(COUNT(*) AS DOUBLE), 4) AS partkey_point_frac,
           |  CAST(SUM(CASE WHEN sk_lo <= 3 AND sk_hi >= 3 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS suppkey_point_scan,
           |  round(SUM(CASE WHEN sk_lo <= 3 AND sk_hi >= 3 THEN 1 ELSE 0 END)
           |    / CAST(COUNT(*) AS DOUBLE), 4) AS suppkey_point_frac
           |FROM (
           |  SELECT bucket, MIN(ship_us) AS ship_lo, MAX(ship_us) AS ship_hi,
           |    MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
           |    MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi
           |  FROM (SELECT l_partkey, l_suppkey, epoch_us(l_shipdate) AS ship_us,
           |      NTILE(64) OVER (ORDER BY $key) AS bucket
           |    FROM lineitem)
           |  GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL\n")
    })

  val all: Seq[QueryDef] = Seq(q481EncodingAdvisor, q482SortKeyAdvisor)
}
