package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q486 semantics: the join-shaped distance computation equals a literal
  * trace walk under the SAME declared gap-cap contract, and the curve is
  * internally consistent (monotone in C, classes partition the total). */
class CacheSimOpsSpec extends SparkTestBase {

  test("q486: join-shaped distances == literal trace walk; curve well-formed") {
    val G = 256L
    val trace = EventOps.events(spark, sfDir)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // literal replay of the capped contract: for each in-cap reuse count
    // distinct keys in the open gap (the key itself re-enters as +1)
    val lastPos = scala.collection.mutable.Map[Long, Long]()
    val posIdx = trace.zipWithIndex.map { case ((p, _), ix) => p -> ix }.toMap
    var cold = 0L; var far = 0L
    val dists = scala.collection.mutable.ArrayBuffer[Long]()
    trace.foreach { case (pos, k) =>
      lastPos.get(k) match {
        case None => cold += 1
        case Some(j) if pos - j > G => far += 1
        case Some(j) =>
          val between = trace.slice(posIdx(j) + 1, posIdx(pos))
            .map(_._2).distinct.size
          dists += between + 1L
      }
      lastPos(k) = pos
    }

    val rows = CacheSimOps.q486ReuseDistance.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("cache_size"))
    assert(rows.length == 4)
    rows.foreach { r =>
      val c = r.getAs[Long]("cache_size")
      assert(r.getAs[Long]("hits") == dists.count(_ <= c),
        s"C=$c: join-shaped hits != trace walk")
      assert(r.getAs[Long]("cold_misses") == cold)
      assert(r.getAs[Long]("far_misses") == far)
      assert(r.getAs[Long]("total") == trace.length)
      assert(r.getAs[Long]("hits") + r.getAs[Long]("capped_misses") +
        r.getAs[Long]("far_misses") + r.getAs[Long]("cold_misses") ==
        r.getAs[Long]("total"), s"C=$c: classes must partition the total")
    }
    val hits = rows.map(_.getAs[Long]("hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
      "hit count must be monotone in cache size")
    assert(hits.last > 0, "fixture exercises no reuse at all")
  }
}
