package graft.functions

import graft.SparkTestBase
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** LevenshteinLengthGuard must rewrite threshold predicates to the banded
  * form without changing any result, and must be idempotent. */
class OptimizerRulesSpec extends SparkTestBase {

  private def fuzzyPairs() = {
    val d = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 60).as("head"))
    d.select(col("lang"), col("doc_id").as("id_a"), col("head").as("ha"))
      .join(d.select(col("lang"), col("doc_id").as("id_b"), col("head").as("hb")), Seq("lang"))
      .filter(col("id_a") < col("id_b"))
      .filter(levenshtein(col("ha"), col("hb")) <= 12)
      .select(col("id_a"), col("id_b"))
  }

  test("rule rewrites to the banded levenshtein with a length guard, results unchanged") {
    val baseline = fuzzyPairs().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ LevenshteinLengthGuard
      val df = fuzzyPairs()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("levenshtein(ha") && optimized.contains("Some(12)"),
        s"expected banded levenshtein in:\n$optimized")
      assert(optimized.contains("abs((length(ha"),
        s"expected length guard in:\n$optimized")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline && got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("rule is idempotent: a second application changes nothing") {
    val plan = fuzzyPairs().queryExecution.analyzed
    val once = LevenshteinLengthGuard(plan)
    val twice = LevenshteinLengthGuard(once)
    assert(once.toString == twice.toString)
    // and the rewrite actually fired on the analyzed plan
    assert(once.toString.contains("Some(12)"))
  }

  test("null inputs keep identical predicate semantics under the rewrite") {
    import spark.implicits._
    val df = Seq(("abc", "abd"), (null, "x"), ("y", null), ("abc", "zzzzzzzzzzzzzzzz"))
      .toDF("a", "b")
    val pred = levenshtein(col("a"), col("b")) <= 2
    val baseline = df.select(col("a"), col("b"), pred.as("p")).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ LevenshteinLengthGuard
      val got = df.select(col("a"), col("b"), pred.as("p")).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
          if (r.isNullAt(2)) None else Some(r.getBoolean(2))))
      assert(got.toSeq == baseline.toSeq)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }
}
