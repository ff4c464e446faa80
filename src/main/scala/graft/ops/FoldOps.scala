package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-validation-fold wave: the group-leakage audit every ML split
  * pipeline needs — rows of the same GROUP (here: user) appearing in
  * different folds leak information across the train/validation
  * boundary. The audit contrasts two assignment schemes on the same
  * events: naive row-level hashing (event_id) vs group-level hashing
  * (user_id) — the naive scheme scatters almost every multi-event user
  * across folds; the group scheme provably cannot.
  *
  * Scale shape: one scan per scheme to (group → fold-set) aggregates;
  * the audit frame is |groups|-sized, the report 2 rows.
  */
object FoldOps {

  /** 5-fold assignment audit: per scheme, the group count, how many
    * groups span >1 fold, the share of ROWS sitting in leaky groups
    * (the quantity that corrupts a validation metric), and the fold
    * balance ratio max/min. Folds come from md5-derived hashes so both
    * engines assign identically. */
  val q404FoldLeakage: QueryDef = QueryDef(
    "q404_fold_leakage",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      val ev = EventOps.events(s, dir)
        .select(col("event_id"), col("user_id"))
      val assigned = ev
        .withColumn("row_fold",
          pmod(md5Long(concat(lit("row|"), col("event_id"))), lit(5L)))
        .withColumn("grp_fold",
          pmod(md5Long(concat(lit("grp|"), col("user_id"))), lit(5L)))
        .localCheckpoint()
      def audit(scheme: String, foldCol: String) = {
        val perGroup = assigned.groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_rows"),
            countDistinct(col(foldCol)).cast("long").as("n_folds"))
        val folds = assigned.groupBy(col(foldCol).as("fold"))
          .agg(count(lit(1)).cast("long").as("fn"))
          .agg(max(col("fn")).as("fmax"), min(col("fn")).as("fmin"))
        perGroup.agg(
          count(lit(1)).cast("long").as("n_groups"),
          sum(when(col("n_folds") > 1, 1L).otherwise(0L)).as("leaky_groups"),
          sum(col("n_rows")).as("n_rows_tot"),
          sum(when(col("n_folds") > 1, col("n_rows")).otherwise(0L))
            .as("leaky_rows"))
          .crossJoin(folds)
          .select(lit(scheme).as("scheme"), col("n_groups"),
            col("leaky_groups"),
            round(col("leaky_rows").cast("double") / col("n_rows_tot"), 6)
              .as("leaky_row_share"),
            round(col("fmax").cast("double") / col("fmin"), 4)
              .as("balance_ratio"))
      }
      audit("row_hash", "row_fold")
        .unionByName(audit("group_hash", "grp_fold"))
        .orderBy(col("scheme"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id FROM events),
      asg AS (SELECT event_id, user_id,
          ((((('0x' || substr(md5('row|' || event_id), 1, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5('row|' || event_id), 1, 8))::BIGINT
              >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296
            + ('0x' || substr(md5('row|' || event_id), 9, 8))::BIGINT)
            % 5) + 5) % 5 AS row_fold,
          ((((('0x' || substr(md5('grp|' || user_id), 1, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5('grp|' || user_id), 1, 8))::BIGINT
              >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296
            + ('0x' || substr(md5('grp|' || user_id), 9, 8))::BIGINT)
            % 5) + 5) % 5 AS grp_fold
        FROM ev),
      row_g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(DISTINCT row_fold) AS BIGINT) AS n_folds
        FROM asg GROUP BY 1),
      grp_g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT(DISTINCT grp_fold) AS BIGINT) AS n_folds
        FROM asg GROUP BY 1),
      row_f AS (SELECT MAX(fn) AS fmax, MIN(fn) AS fmin FROM (
        SELECT row_fold, CAST(COUNT(*) AS BIGINT) AS fn FROM asg GROUP BY 1)),
      grp_f AS (SELECT MAX(fn) AS fmax, MIN(fn) AS fmin FROM (
        SELECT grp_fold, CAST(COUNT(*) AS BIGINT) AS fn FROM asg GROUP BY 1)),
      row_a AS (SELECT 'row_hash' AS scheme,
          CAST(COUNT(*) AS BIGINT) AS n_groups,
          CAST(SUM(CASE WHEN n_folds > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS leaky_groups,
          round(CAST(SUM(CASE WHEN n_folds > 1 THEN n_rows ELSE 0 END)
            AS DOUBLE) / SUM(n_rows), 6) AS leaky_row_share,
          (SELECT round(CAST(fmax AS DOUBLE) / fmin, 4) FROM row_f)
            AS balance_ratio
        FROM row_g),
      grp_a AS (SELECT 'group_hash' AS scheme,
          CAST(COUNT(*) AS BIGINT) AS n_groups,
          CAST(SUM(CASE WHEN n_folds > 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS leaky_groups,
          round(CAST(SUM(CASE WHEN n_folds > 1 THEN n_rows ELSE 0 END)
            AS DOUBLE) / SUM(n_rows), 6) AS leaky_row_share,
          (SELECT round(CAST(fmax AS DOUBLE) / fmin, 4) FROM grp_f)
            AS balance_ratio
        FROM grp_g)
      SELECT * FROM row_a UNION ALL SELECT * FROM grp_a
      ORDER BY scheme"""))

  val all: Seq[QueryDef] = Seq(q404FoldLeakage)
}
