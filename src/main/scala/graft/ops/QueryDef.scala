package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator: a Spark implementation over the test tables plus
  * (where SQL-expressible) a DuckDB oracle computing the same result with
  * the same column names and types.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §5):
  *  - money/measure aggregates go through exact DECIMAL arithmetic and are
  *    cast to DOUBLE at the end, so summation order (which differs between
  *    engines and between Spark partitionings) cannot perturb the result;
  *  - averages are written sum/count on the already-exact sums;
  *  - counts/ranks are cast to BIGINT on both sides;
  *  - timestamps are surfaced as epoch microseconds or DATE;
  *  - every computed column is aliased identically in both dialects.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
