package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's private[sql] Column↔Expression conversions, needed
  * to expose custom Catalyst expressions as user-facing Columns (in Spark
  * ≤3.x this was public `new Column(expr)` / `col.expr`). Lives under the
  * org.apache.spark.sql package solely for access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom expression under a SQL-callable name on an existing
    * session (sessionState is private[sql]; SparkSessionExtensions covers
    * the at-startup path, this covers live sessions). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Drain the async listener bus (private[spark]) so SparkListener-based
    * metric counters are complete before they are read — a fixed sleep
    * silently undercounts on a loaded machine. */
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — the entry point for whole-operator extensions like
    * graft.plans.AsofJoinPlan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Build a DataFrame over an RDD of InternalRows, declaring the hash
    * partitioning the rows physically have (LogicalRDD and Dataset.ofRows
    * are private[sql]) — the bridge graft.plans.Datalog's solution-set
    * fixpoint uses to hand zipPartitions-merged facts back to Catalyst
    * as an exchange-free scan. `hashCols` empty ⇒ UnknownPartitioning.
    * The caller owns the truth of the declaration: the rows MUST already
    * be laid out by HashPartitioning(hashCols, numPartitions), or
    * Catalyst will elide exchanges it actually needed. */
  def internalFrame(spark: org.apache.spark.sql.SparkSession,
                    rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                    schema: org.apache.spark.sql.types.StructType,
                    hashCols: Seq[String],
                    numPartitions: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val part =
      if (hashCols.isEmpty) UnknownPartitioning(rdd.getNumPartitions)
      else HashPartitioning(
        hashCols.map(n => attrs(schema.fieldIndex(n))), numPartitions)
    org.apache.spark.sql.classic.Dataset.ofRows(cs,
      org.apache.spark.sql.execution.LogicalRDD(
        attrs.toSeq, rdd, part, Nil, false, None)(cs, None, None))
  }

  /** Surface what a SparkSessionExtensions instance would inject (the
    * builder methods are private[sql]) so the extension wiring is
    * testable without constructing a second SparkSession. */
  def injectedState(e: org.apache.spark.sql.SparkSessionExtensions,
                    spark: org.apache.spark.sql.SparkSession) = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    (e.buildOptimizerRules(s), e.buildPlannerStrategies(s))
  }
}
