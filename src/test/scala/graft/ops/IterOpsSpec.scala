package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the iteration & context wave (q354–q355):
  * semi-naive levels vs brute-force BFS, context-gain identities.
  */
class IterOpsSpec extends SparkTestBase {

  test("q354: semi-naive levels equal brute-force BFS and the tree law holds") {
    val dir = sfDir
    val rows = IterOps.q354SeminaiveClosure.fn(spark, dir).collect()
      .sortBy(_.getAs[Long]("depth"))
    assert(rows.nonEmpty && rows.head.getAs[Long]("depth") == 0)
    val keys = Tables(spark, dir).part
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    // brute BFS on child -> child/2
    val children = keys.filter(_ >= 2).groupBy(_ / 2)
    var frontier = Set(1L); var seen = Set(1L)
    val levels = scala.collection.mutable.ListBuffer(1)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(children.getOrElse(_, Nil)).diff(seen)
      if (next.nonEmpty) levels += next.size
      seen ++= next; frontier = next
    }
    assert(rows.map(_.getAs[Long]("n_nodes")).toSeq == levels.map(_.toLong).toSeq,
      s"levels ${rows.map(_.getAs[Long]("n_nodes")).toSeq} vs brute ${levels.toSeq}")
    // cumulative reaches every key except 0 (keys start at 0; the div-2
    // tree is rooted at 1 and 0 is its own parent — unreachable by design)
    assert(rows.last.getAs[Long]("n_cum") == keys.count(_ >= 1))
    // binary-tree law: levels at most double
    val ls = rows.map(_.getAs[Long]("n_nodes"))
    ls.zip(ls.tail).foreach { case (a, b) => assert(b <= 2 * a) }
  }

  test("q355: context gain is token-mass-weighted, mostly positive, and zero-information bigrams score ~0") {
    val rows = IterOps.q355ContextGain.fn(spark, sfDir).collect()
    assert(rows.length > 400)
    // n_bigrams conservation: equals tokens-1 per doc
    val expected = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> ("\\w+".r.findAllIn(r.getString(1).toLowerCase).size - 1L))
      .filter(_._2 >= 1).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == expected(r.getAs[Long]("doc_id")))
    }
    // mutual information is non-negative in aggregate: the corpus-level
    // token-weighted mean gain is the bigram MI estimate, > 0 on real text
    val total = rows.map(r => r.getAs[Double]("mean_gain") * r.getAs[Long]("n_bigrams")).sum /
      rows.map(_.getAs[Long]("n_bigrams")).sum
    assert(total > 0.0, s"corpus mean context gain $total not positive")
    // and the signal discriminates across documents
    val gains = rows.map(_.getAs[Double]("mean_gain"))
    assert(gains.max - gains.min > 0.1, "context gain constant across docs")
  }
}
