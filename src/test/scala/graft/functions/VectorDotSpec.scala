package graft.functions

import graft.SparkTestBase
import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.functions._

/** The codegen'd VectorDot must be bit-identical to the pure-builtin
  * higher-order-function fold it replaces. */
class VectorDotSpec extends SparkTestBase {

  test("vector_dot matches the HOF fold bit-for-bit on real embeddings") {
    val emb = Tables(spark, sfDir).embeddings.limit(200)
    val a = emb.select(col("vec_id"), col("embedding").as("a"))
    val b = emb.select(col("vec_id"), col("embedding").as("b"))
    val both = a.join(b, "vec_id")
      .withColumn("native", VectorFunctions.vector_dot(col("a"), col("b")))
      .withColumn("hof", Similarity.dotHof(col("a"), col("b")))
    val diff = both.filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
    // and norms are positive reals
    assert(both.filter(col("native") <= 0).count() == 0)
  }

  test("vector_dot survives whole-stage codegen (no fallback)") {
    val emb = Tables(spark, sfDir).embeddings.limit(10)
    val df = emb.select(VectorFunctions.vector_dot(col("embedding"), col("embedding")).as("d"))
    // "*(n)" marks operators inside a WholeStageCodegen stage; the Project
    // evaluating vectordot must carry it (no CodegenFallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("vectordot"), s"expected codegen in:\n$plan")
    assert(df.collect().forall(_.getDouble(0) > 0))
  }

  test("vector_dot is SQL-callable after registerSql") {
    VectorFunctions.registerSql(spark)
    Tables(spark, sfDir).embeddings.limit(5).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      "SELECT vec_id, vector_dot(embedding, embedding) AS d, vector_cosine(embedding, embedding) AS c FROM emb_sql")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9) // self-cosine = 1
    }
  }

  test("vector_dot rejects non-float-array inputs at analysis time") {
    val df = spark.range(3).selectExpr("array(id) as xs") // array<bigint>
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.vector_dot(col("xs"), col("xs"))).collect()
    }
  }

  test("weighted-mean aggregator computes sum(wx)/sum(w) with partial merge") {
    import spark.implicits._
    val ds = Seq((2.0, 1.0), (4.0, 3.0), (10.0, 0.0)).toDS()
    val got = ds.select(Aggregators.WeightedMean.toColumn).head()
    assert(math.abs(got - (2.0 * 1.0 + 4.0 * 3.0) / 4.0) < 1e-12)
  }

  test("log-histogram sketch brackets the true median") {
    import spark.implicits._
    val ds = (1 to 1000).map(_.toDouble).toDS()
    val h = ds.select(Aggregators.LogHistogramAgg.toColumn).head()
    assert(h.total == 1000)
    val q50 = Aggregators.LogHistogramAgg.quantile(h, 0.5)
    assert(q50 >= 256 && q50 <= 1024, s"median bin $q50")
  }
}
