package graft.ops

import graft.SparkTestBase

/** q500 semantics: the five-stage funnel replayed set-by-set; survivor
  * counts are monotone non-increasing and each drop_pct is the exact
  * relative attrition of its stage. */
class CurationFunnelOpsSpec extends SparkTestBase {

  test("q500: stage survivors == set replay; monotone attrition") {
    val docs = Tables(spark, sfDir).documents
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

    val s1 = docs.toSeq.filter(_._3 == "en")
    val s2 = s1.groupBy(_._2).values.map(_.minBy(_._1)).toSeq
    val s3 = s2.filter(_._5 >= 200)
    val s4 = s3.groupBy(_._4).values
      .flatMap(_.sortBy(_._1).take(15)).toSeq
    val expected = Seq(
      (0L, "raw", docs.toSeq), (1L, "lang_en", s1), (2L, "exact_dedup", s2),
      (3L, "quality_minlen", s3), (4L, "source_cap", s4))

    val rows = CurationFunnelOps.q500CurationFunnel.fn(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 5)
    var prev = -1L
    rows.zip(expected).foreach { case (r, (id, name, set)) =>
      assert(r.getAs[Long]("stage") == id)
      assert(r.getAs[String]("stage_name") == name)
      assert(r.getAs[Long]("docs_out") == set.size.toLong, s"docs @$name")
      assert(r.getAs[Long]("chars_out") == set.map(_._5).sum, s"chars @$name")
      if (prev >= 0) {
        assert(r.getAs[Long]("docs_out") <= prev, "monotone attrition")
        val drop = (prev - set.size).toDouble / prev
        assert(math.abs(r.getAs[Double]("drop_pct") - drop) < 1e-5)
      } else assert(r.getAs[Double]("drop_pct") == 0.0)
      prev = r.getAs[Long]("docs_out")
    }
  }
}
