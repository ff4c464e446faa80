package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Storage-layout & serving wave: delta-encoding what-if across candidate
  * sort orders, an honest distributed Bloom-filter FPR sweep, a
  * small-file compaction planner, and access-based hot/cold tiering —
  * the physical-design questions a 100 TB lake asks before rewriting a
  * table.
  *
  * Scale shapes: q302/q304 run their windows INSIDE day/month partitions
  * (encoding and compaction are per-file decisions — the windows
  * parallelize by partition and never global-sort); q303's bit array is
  * a distinct-position frame joined by position (exactly how a
  * distributed Bloom build shards); q305 is two era aggregations and a
  * key join.
  */
object StorageOps {

  /** Delta-encoding what-if: for each candidate within-file sort order
    * (the natural l_orderkey clustering vs a p_partkey re-cluster),
    * measure what delta encoding and RLE would get: mean |Δl_orderkey|
    * between consecutive rows, the bit width of the largest delta
    * (length of its binary form — no float log2 at the edge), and the
    * run count of l_returnflag. Windows are per ship-day (the file
    * grain), so the measurement parallelizes at any scale and matches
    * what a per-file encoder would actually see. */
  val q302DeltaLayout: QueryDef = QueryDef(
    "q302_delta_layout",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(to_date(col("l_shipdate")).as("day"), col("l_orderkey"),
          col("l_partkey"), col("l_linenumber"), col("l_returnflag"))
        .localCheckpoint() // one scan feeds both candidate orders
      // (l_orderkey, l_linenumber) is NOT unique in the fixture (dup line
      // numbers exist), so every candidate order ends in l_returnflag:
      // rows still tied after that share both the delta key and the flag,
      // making the delta/run statistics invariant to their relative order
      def layout(name: String, ord: Seq[org.apache.spark.sql.Column]) = {
        val w = Window.partitionBy(col("day")).orderBy(ord: _*)
        li
          .withColumn("delta", col("l_orderkey") - lag(col("l_orderkey"), 1).over(w))
          .withColumn("run_start",
            (col("l_returnflag") =!= lag(col("l_returnflag"), 1).over(w)) ||
              lag(col("l_returnflag"), 1).over(w).isNull)
          .agg(count(lit(1)).as("n_rows"),
            count(col("delta")).as("n_deltas"),
            sum(abs(col("delta"))).as("sum_abs"),
            max(abs(col("delta"))).as("max_abs"),
            sum(col("run_start").cast("long")).as("n_runs"))
          .select(lit(name).as("layout"), col("n_rows"), col("n_deltas"),
            round(col("sum_abs").cast("double") / col("n_deltas"), 6)
              .as("avg_abs_delta"),
            length(bin(col("max_abs"))).cast("long").as("delta_bits"),
            col("n_runs"),
            round(col("n_runs").cast("double") / col("n_rows"), 6).as("rle_ratio"))
      }
      layout("by_orderkey", Seq(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_returnflag").asc))
        .union(layout("by_partkey", Seq(col("l_partkey").asc,
          col("l_orderkey").asc, col("l_linenumber").asc, col("l_returnflag").asc)))
    },
    Some("""WITH li AS (SELECT CAST(l_shipdate AS DATE) AS day, l_orderkey,
          l_partkey, l_linenumber, l_returnflag FROM lineitem),
      o1 AS (SELECT l_orderkey, l_returnflag,
          l_orderkey - lag(l_orderkey) OVER (PARTITION BY day
            ORDER BY l_orderkey, l_linenumber, l_returnflag) AS delta,
          (l_returnflag <> lag(l_returnflag) OVER (PARTITION BY day
             ORDER BY l_orderkey, l_linenumber, l_returnflag)
           OR lag(l_returnflag) OVER (PARTITION BY day
             ORDER BY l_orderkey, l_linenumber, l_returnflag) IS NULL) AS run_start
        FROM li),
      o2 AS (SELECT l_orderkey, l_returnflag,
          l_orderkey - lag(l_orderkey) OVER (PARTITION BY day
            ORDER BY l_partkey, l_orderkey, l_linenumber, l_returnflag) AS delta,
          (l_returnflag <> lag(l_returnflag) OVER (PARTITION BY day
             ORDER BY l_partkey, l_orderkey, l_linenumber, l_returnflag)
           OR lag(l_returnflag) OVER (PARTITION BY day
             ORDER BY l_partkey, l_orderkey, l_linenumber, l_returnflag) IS NULL) AS run_start
        FROM li),
      s1 AS (SELECT 'by_orderkey' AS layout, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(delta) AS BIGINT) AS n_deltas,
          round(CAST(SUM(abs(delta)) AS DOUBLE) / COUNT(delta), 6) AS avg_abs_delta,
          CAST(length(bin(MAX(abs(delta)))) AS BIGINT) AS delta_bits,
          CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
          round(CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS rle_ratio
        FROM o1),
      s2 AS (SELECT 'by_partkey' AS layout, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(delta) AS BIGINT) AS n_deltas,
          round(CAST(SUM(abs(delta)) AS DOUBLE) / COUNT(delta), 6) AS avg_abs_delta,
          CAST(length(bin(MAX(abs(delta)))) AS BIGINT) AS delta_bits,
          CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
          round(CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS rle_ratio
        FROM o2)
      SELECT * FROM s1 UNION ALL SELECT * FROM s2"""))

  /** Distributed Bloom-filter FPR sweep: build the filter the way a
    * cluster actually does — the member keys (every referenced part) hash
    * to k = round(ln2·bpk) positions in an m = bpk·n bit space, the
    * occupied-position set is a distinct frame — then probe with an
    * equal-sized set of guaranteed non-members (every member key shifted
    * past the key-space maximum) and call a probe a false positive when
    * all k of its positions are occupied. Empirical FPR vs the
    * (1−e^(−k/bpk))^k prediction, at 8 and 16 bits/key. The position
    * frames are (n·k)-sized and every step is an equi-join or hash
    * aggregate. */
  val q303BloomFprSweep: QueryDef = QueryDef(
    "q303_bloom_fpr_sweep",
    (s, dir) => {
      val members = Tables(s, dir).lineitem
        .select(col("l_partkey").as("key")).distinct().localCheckpoint()
      // guaranteed non-members: the same key set translated past the
      // key-space max — the standard held-out probe set for measuring FPR
      val probes = members
        .crossJoin(broadcast(members.agg(max(col("key")).as("mx"))))
        .select((col("key") + col("mx") + 1).as("key"))
        .localCheckpoint()
      // everything below is ONE plan: the member count that sizes the bit
      // space and the probe count ride 1-row broadcasts (the q122 idiom —
      // never a driver-side .count()), the 2-geometry sweep is a 2-row
      // broadcast fan-out
      val nm = broadcast(members.agg(count(lit(1)).as("n_members")))
      val np = broadcast(probes.agg(count(lit(1)).as("n_probes")))
      val geo = broadcast(Tables(s, dir).region.limit(1) // 1-row seed frame
        .select(explode(array(
          struct(lit(8L).as("bpk"), lit(6L).as("k")),
          struct(lit(16L).as("bpk"), lit(11L).as("k")))).as("g"))
        .select(col("g.bpk"), col("g.k")))
      def positions(df: DataFrame) = df
        .crossJoin(geo).crossJoin(nm)
        .withColumn("i", explode(sequence(lit(0L), col("k") - 1)))
        .withColumn("pos",
          pmod(conv(substring(md5(concat_ws(":", col("key"), col("i"))), 1, 8),
            16, 10).cast("long"), col("bpk") * col("n_members")))
      val occupied = positions(members)
        .select(col("bpk"), col("k"), col("pos")).distinct()
        .localCheckpoint() // feeds the occupancy count AND the probe join
      val occn = occupied.groupBy(col("bpk"), col("k"))
        .agg(count(lit(1)).as("n_occ"))
      val fp = positions(probes)
        .join(occupied, Seq("bpk", "k", "pos"), "left_semi")
        .groupBy(col("bpk"), col("k"), col("key")).agg(count(lit(1)).as("hits"))
        .filter(col("hits") === col("k"))
        .groupBy(col("bpk"), col("k")).agg(count(lit(1)).as("n_fp"))
      occn.join(fp, Seq("bpk", "k"), "left")
        .crossJoin(nm).crossJoin(np)
        .select(col("bpk").as("bits_per_key"), col("k").as("k_hashes"),
          col("n_members"), col("n_probes"),
          round(col("n_occ").cast("double") / (col("bpk") * col("n_members")), 6)
            .as("occupancy"),
          round(coalesce(col("n_fp"), lit(0L)).cast("double") / col("n_probes"), 6)
            .as("fpr_emp"),
          round(pow(lit(1.0) - exp(-col("k").cast("double") / col("bpk")),
            col("k").cast("double")), 6).as("fpr_pred"))
    },
    Some("""WITH members AS (SELECT DISTINCT l_partkey AS key FROM lineitem),
      mx AS (SELECT MAX(key) AS mx FROM members),
      probes AS (SELECT key + mx.mx + 1 AS key FROM members, mx),
      nm AS (SELECT COUNT(*) AS n FROM members),
      geo AS (SELECT * FROM (VALUES (8, 6), (16, 11)) g(bpk, k)),
      mpos AS (SELECT g.bpk, g.k,
          ('0x' || substr(md5(m.key || ':' || i.i), 1, 8))::BIGINT
            % (g.bpk * nm.n) AS pos
        FROM members m, geo g, nm, range(0, 11) i(i) WHERE i.i < g.k),
      occ AS (SELECT bpk, k, pos FROM mpos GROUP BY 1, 2, 3),
      occn AS (SELECT bpk, k, CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM occ GROUP BY 1, 2),
      ppos AS (SELECT g.bpk, g.k, p.key,
          ('0x' || substr(md5(p.key || ':' || i.i), 1, 8))::BIGINT
            % (g.bpk * nm.n) AS pos
        FROM probes p, geo g, nm, range(0, 11) i(i) WHERE i.i < g.k),
      hits AS (SELECT pp.bpk, pp.k, pp.key, CAST(COUNT(*) AS BIGINT) AS h
        FROM ppos pp JOIN occ ON occ.bpk = pp.bpk AND occ.k = pp.k
          AND occ.pos = pp.pos
        GROUP BY 1, 2, 3),
      fp AS (SELECT bpk, k, CAST(COUNT(*) AS BIGINT) AS n_fp
        FROM hits WHERE h = k GROUP BY 1, 2),
      np AS (SELECT COUNT(*) AS n FROM probes)
      SELECT CAST(occn.bpk AS BIGINT) AS bits_per_key,
        CAST(occn.k AS BIGINT) AS k_hashes,
        CAST(nm.n AS BIGINT) AS n_members, CAST(np.n AS BIGINT) AS n_probes,
        round(CAST(occn.n_occ AS DOUBLE) / (occn.bpk * nm.n), 6) AS occupancy,
        round(CAST(COALESCE(fp.n_fp, 0) AS DOUBLE) / np.n, 6) AS fpr_emp,
        round(power(1.0 - exp(-CAST(occn.k AS DOUBLE) / occn.bpk), occn.k), 6)
          AS fpr_pred
      FROM occn
      LEFT JOIN fp ON fp.bpk = occn.bpk AND fp.k = occn.k
      CROSS JOIN nm CROSS JOIN np"""))

  /** Small-file compaction planner: daily ship-date slices are the
    * incoming "files" (bytes = rows × a fixed 100-byte row estimate);
    * within each month the planner runs next-fit packing into 256 KiB
    * target bins (bin = cumulative-bytes-before ÷ target — one
    * prefix-sum window per month, no sequential loop) and reports the
    * plan: file and bin counts, mean fill, and the largest bin. Months
    * pack independently, so the plan parallelizes by month at any
    * scale. */
  val q304CompactionPlan: QueryDef = QueryDef(
    "q304_compaction_plan",
    (s, dir) => {
      val target = 262144L
      val files = Tables(s, dir).lineitem
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg((count(lit(1)) * 100L).as("bytes"))
        .withColumn("month", date_trunc("month", col("day")).cast("date"))
      val w = Window.partitionBy(col("month")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      files
        .withColumn("cum", sum(col("bytes")).over(w))
        .withColumn("bin", ((col("cum") - col("bytes")) / target).cast("long"))
        .groupBy(col("month"), col("bin")).agg(
          count(lit(1)).as("files_in_bin"), sum(col("bytes")).as("bin_bytes"))
        .groupBy(col("month")).agg(
          sum(col("files_in_bin")).as("n_files"),
          sum(col("bin_bytes")).as("total_bytes"),
          count(lit(1)).as("n_bins"),
          max(col("bin_bytes")).as("max_bin_bytes"))
        .withColumn("mean_fill",
          round(col("total_bytes").cast("double") / (col("n_bins") * target), 6))
        .select(col("month"), col("n_files"), col("total_bytes"), col("n_bins"),
          col("max_bin_bytes"), col("mean_fill"))
    },
    Some("""WITH files AS (SELECT CAST(l_shipdate AS DATE) AS day,
          CAST(COUNT(*) * 100 AS BIGINT) AS bytes,
          CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS month
        FROM lineitem GROUP BY 1, 3),
      packed AS (SELECT month, bytes,
          CAST((SUM(bytes) OVER (PARTITION BY month ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)
            // 262144 AS BIGINT) AS bin
        FROM files),
      bins AS (SELECT month, bin, CAST(COUNT(*) AS BIGINT) AS files_in_bin,
          CAST(SUM(bytes) AS BIGINT) AS bin_bytes
        FROM packed GROUP BY 1, 2)
      SELECT month, CAST(SUM(files_in_bin) AS BIGINT) AS n_files,
        CAST(SUM(bin_bytes) AS BIGINT) AS total_bytes,
        CAST(COUNT(*) AS BIGINT) AS n_bins,
        CAST(MAX(bin_bytes) AS BIGINT) AS max_bin_bytes,
        round(CAST(SUM(bin_bytes) AS DOUBLE) / (COUNT(*) * 262144), 6) AS mean_fill
      FROM bins GROUP BY 1"""))

  /** Access-based hot/cold tiering what-if: score every part on its
    * train-era access history (frequency, then recency, then key — a
    * full deterministic order), cut the ranking at 10% / 40% into
    * hot/warm/cold tiers, and grade the policy on the eval era: what
    * share of future accesses does each tier absorb, and how much does
    * the never-seen tail miss? Two era aggregates + one key join; the
    * ranking window runs on the part-level frame (dimension-sized). */
  val q305HotColdTiering: QueryDef = QueryDef(
    "q305_hot_cold_tiering",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey").as("key"), to_date(col("l_shipdate")).as("day"))
      val train = li.filter(col("day") < lit("1999-01-01"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("freq"), max(col("day")).as("last_day"))
      // size-adaptive tier ranking (r15). r15-opt: the physical
      // window-vs-spine probe is a metadata-cheap |part| upper bound
      // (train is one row per part key), and |train| — which the 10 %/
      // 40 % cuts need as a VALUE — rides the plan via totalCol (count
      // window on the rank's own exchange at bench scale, free from
      // the spine's totals pass above it) instead of the extra
      // localCheckpoint + count job the first rewrite paid (measured
      // 0.86 s vs the 0.43 s floor at sf0.1).
      val nBound = Tables(s, dir).part.count()
      val tiers = Spine.adaptiveRank(train,
          Seq(col("freq").desc, col("last_day").desc, col("key").asc),
          rankCol = "rk", knownCount = nBound, totalCol = Some("__n"))
        .withColumn("tier",
          when(col("rk") <= ceil(col("__n") * 0.1).cast("long"), "hot")
            .when(col("rk") <= ceil(col("__n") * 0.4).cast("long"), "warm")
            .otherwise("cold"))
      val evalAcc = li.filter(col("day") >= lit("1999-01-01"))
      evalAcc.join(tiers.select(col("key"), col("tier"), col("freq")), Seq("key"), "left")
        .withColumn("tier", coalesce(col("tier"), lit("unseen")))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("eval_accesses"),
          countDistinct(col("key")).as("n_parts"),
          sum(coalesce(col("freq"), lit(0L))).as("train_accesses"))
        .withColumn("eval_share", round(col("eval_accesses").cast("double") /
          sum(col("eval_accesses")).over(Window.partitionBy()), 6))
        .select(col("tier"), col("n_parts"), col("train_accesses"),
          col("eval_accesses"), col("eval_share"))
    },
    Some("""WITH li AS (SELECT l_partkey AS key, CAST(l_shipdate AS DATE) AS day
          FROM lineitem),
      train AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS freq, MAX(day) AS last_day
        FROM li WHERE day < DATE '1999-01-01' GROUP BY 1),
      tiers AS (SELECT key, freq,
          CASE WHEN rk <= ceil(n * 0.1) THEN 'hot'
               WHEN rk <= ceil(n * 0.4) THEN 'warm'
               ELSE 'cold' END AS tier
        FROM (SELECT key, freq,
            CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, last_day DESC, key)
              AS BIGINT) AS rk,
            COUNT(*) OVER () AS n
          FROM train)),
      ev AS (SELECT li.key, COALESCE(t.tier, 'unseen') AS tier,
          COALESCE(t.freq, 0) AS freq
        FROM li LEFT JOIN tiers t USING (key)
        WHERE li.day >= DATE '1999-01-01'),
      agg AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS eval_accesses,
          CAST(COUNT(DISTINCT key) AS BIGINT) AS n_parts,
          CAST(SUM(freq) AS BIGINT) AS train_accesses
        FROM ev GROUP BY 1)
      SELECT tier, n_parts, train_accesses, eval_accesses,
        round(CAST(eval_accesses AS DOUBLE) / SUM(eval_accesses) OVER (), 6)
          AS eval_share
      FROM agg"""))

  val all: Seq[QueryDef] =
    Seq(q302DeltaLayout, q303BloomFprSweep, q304CompactionPlan, q305HotColdTiering)
}
