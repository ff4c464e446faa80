package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md). Parquet scans
  * go straight through Catalyst's DataSource V2 path, so filters/projections
  * composed downstream are pushed into the scan (check `PushedFilters` /
  * `ReadSchema` in explain output).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

  private val dimCache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Embedding dimensionality, read driver-side from the first record of the
    * first parquet file — parquet schemas cannot carry a list length, but a
    * single-record footer read costs no Spark job (the alternative, a
    * `select(size(...)).head()`, schedules a full scan stage per query).
    * Memoized per path: repeated bench/verify invocations pay once. */
  def embeddingDim(dir: String, column: String = "embedding"): Int =
    dimCache.computeIfAbsent(s"$dir#$column", _ => {
      val root = new java.io.File(s"$dir/embeddings.parquet")
      val file =
        if (root.isFile) root
        else root.listFiles()
          .filter(f => f.getName.endsWith(".parquet") && f.length() > 0)
          .minBy(_.getName)
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
                 new org.apache.hadoop.fs.Path(file.getAbsolutePath))
        .build()
      try {
        val rec = reader.read()
        require(rec != null, s"empty parquet file $file")
        // list physical layout: optional group <column> (LIST) {
        //   repeated group list { <element> } } — the repetition count of
        // the single repeated field IS the array length
        rec.getGroup(column, 0).getFieldRepetitionCount(0)
      } finally reader.close()
    })
}
