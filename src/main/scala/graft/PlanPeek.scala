package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of registered queries.
  * Usage: runMain graft.PlanPeek <queryName> [<queryName> ...] */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { q =>
      println(s"===== $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
