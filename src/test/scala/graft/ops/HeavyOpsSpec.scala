package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Misra–Gries wave (q393): the published MG
  * contract holds against brute-forced exact counts — estimates never
  * exceed truth, deficits respect the certified bound, and every token
  * heavy enough that the bound cannot erase it survives the merge.
  */
class HeavyOpsSpec extends SparkTestBase {

  test("q393: MG merge obeys the mergeable-summaries contract") {
    val rows = HeavyOps.q393MisraGriesMerge.fn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 16, "at most k counters survive")
    val bound = rows.head.getAs[Long]("err_bound")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"))
      assert(r.getAs[Long]("est") > 0)
      assert(r.getAs[Long]("deficit") >= 0 &&
        r.getAs[Long]("deficit") <= bound)
      assert(r.getAs[Long]("est") + r.getAs[Long]("deficit") ==
        r.getAs[Long]("exact"))
    }

    // brute force exact counts; completeness: exact > bound ⇒ surviving
    val exact = Tables(spark, sfDir).documents
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.map(_.getAs[String]("token")).toSet
    exact.foreach { case (tok, c) =>
      if (c > bound) assert(kept.contains(tok),
        s"token $tok with exact count $c > bound $bound must survive")
    }
    rows.foreach(r => assert(
      exact(r.getAs[String]("token")) == r.getAs[Long]("exact")))
  }
}
