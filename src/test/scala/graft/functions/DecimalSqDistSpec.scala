package graft.functions

import graft.SparkTestBase
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** [[DecimalSqDist]] must be bit-identical to the interpreted HOF fold it
  * replaces in q250/q251 — same per-term round(12)/cast(decimal(28,14))
  * dance, same null contract — and must stay inside whole-stage codegen. */
class DecimalSqDistSpec extends SparkTestBase {

  private def hofSqDist(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) ->
          cast(round((x - y) * (x - y), 12) as decimal(28,14))),
        cast(0 as decimal(28,14)),
        (acc, t) -> cast(acc + t as decimal(28,14)))""")

  test("decimal_sqdist matches the HOF fold bit-for-bit on real embedding pairs") {
    val emb = Tables(spark, sfDir).embeddings.limit(80)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = emb.select(col("vec_id").as("ia"), col("v").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("v").as("b")))
      .filter(col("ia") < col("ib"))
    val both = pairs
      .withColumn("native", VectorFunctions.decimal_sqdist(col("a"), col("b")))
      .withColumn("hof", hofSqDist("a", "b"))
    assert(both.count() > 1000)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("decimal_sqdist null contract matches zip_with padding: unequal lengths and null elements null the sum") {
    val df = spark.sql(
      """SELECT * FROM VALUES
           (array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)),
           (array(1.0D, cast(null as double)), array(1.0D, 2.0D)),
           (array(), array())
         AS t(a, b)""")
      .withColumn("native", VectorFunctions.decimal_sqdist(col("a"), col("b")))
      .withColumn("hof", hofSqDist("a", "b"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(2) == r.isNullAt(3),
        s"null divergence on ${r.get(0)} vs ${r.get(1)}: native=${r.get(2)} hof=${r.get(3)}")
      if (!r.isNullAt(2)) assert(r.getDecimal(2) == r.getDecimal(3))
    }
  }

  test("decimal_sqdist survives whole-stage codegen (no fallback)") {
    val df = Tables(spark, sfDir).embeddings.limit(10)
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(VectorFunctions.decimal_sqdist(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.toLowerCase.contains("decimalsqdist"),
      s"expected codegen in:\n$plan")
    // self-distance is exactly zero at scale 14
    df.collect().foreach(r => assert(r.getDecimal(0).signum == 0))
  }

  test("decimal_sqdist rejects non-double-array inputs at analysis time") {
    val df = spark.range(3).selectExpr("array(id) as xs") // array<bigint>
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.decimal_sqdist(col("xs"), col("xs"))).collect()
    }
  }
}
