package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Curated-corpus parquet store: the training-side hand-off of the
  * pipeline — cleaned/curated documents written partitioned by the
  * columns training jobs filter on (language, split), so downstream
  * reads prune whole directories instead of scanning the corpus
  * (`PartitionFilters` in the scan, spec-asserted).
  *
  * The pre-write `repartition` on the partition columns routes each
  * partition value to ONE task, so a directory gets one file instead
  * of one-per-upstream-task — at 100 TB the small-files explosion
  * (tasks × partition values) is what kills object-store listings and
  * downstream scan planning. Caveat: one giant partition value then
  * writes through one task; for skewed corpora add a salt column to
  * `partitionCols` (e.g. `doc_id % k`) to fan a hot language out over
  * k files.
  */
object CorpusStore {

  def write(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("lang")): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
