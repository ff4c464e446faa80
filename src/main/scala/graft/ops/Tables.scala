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
      withEmbeddingReader(dir) { reader =>
        val rec = reader.read()
        require(rec != null, s"empty embeddings table under $dir")
        // list physical layout: optional group <column> (LIST) {
        //   repeated group list { <element> } } — the repetition count of
        // the single repeated field IS the array length
        rec.getGroup(column, 0).getFieldRepetitionCount(0)
      }
    })

  /** The IVF seed set: embedding vectors with vec_id < n, read driver-side
    * the same way as [[embeddingDim]] — coarse centroids are model
    * parameters the driver must hold anyway (like the LSH plane matrix),
    * and a record-level read costs no Spark job. Scans records until all n
    * seeds are found. */
  def seedVectors(dir: String, n: Int): Seq[(Long, Seq[Float])] = {
    val found = scala.collection.mutable.SortedMap.empty[Long, Seq[Float]]
    val files = embeddingFiles(dir).iterator
    while (found.size < n && files.hasNext) {
      withReader(files.next()) { reader =>
        var rec = reader.read()
        while (rec != null && found.size < n) {
          val id = rec.getLong("vec_id", 0)
          if (id < n) {
            val list = rec.getGroup("embedding", 0)
            val dim = list.getFieldRepetitionCount(0)
            found(id) = (0 until dim).map(i => list.getGroup(0, i).getFloat(0, 0))
          }
          rec = reader.read()
        }
      }
    }
    require(found.size == n, s"found only ${found.size}/$n seed vectors under $dir")
    found.toSeq
  }

  private def embeddingFiles(dir: String): Seq[java.io.File] = {
    val root = new java.io.File(s"$dir/embeddings.parquet")
    if (root.isFile) Seq(root)
    else root.listFiles()
      .filter(x => x.getName.endsWith(".parquet") && x.length() > 0)
      .sortBy(_.getName).toSeq
  }

  private def withEmbeddingReader[A](dir: String)(
      f: org.apache.parquet.hadoop.ParquetReader[org.apache.parquet.example.data.Group] => A): A =
    withReader(embeddingFiles(dir).head)(f)

  private def withReader[A](file: java.io.File)(
      f: org.apache.parquet.hadoop.ParquetReader[org.apache.parquet.example.data.Group] => A): A = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
               new org.apache.hadoop.fs.Path(file.getAbsolutePath))
      .build()
    try f(reader) finally reader.close()
  }
}
