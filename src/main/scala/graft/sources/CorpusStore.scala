package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

/** Curated-corpus parquet store: the training-side hand-off of the
  * pipeline — cleaned/curated documents written partitioned by the
  * columns training jobs filter on (language AND train/val/test
  * split), so downstream reads prune whole directories instead of
  * scanning the corpus (`PartitionFilters` in the scan,
  * spec-asserted). [[withSplit]] stamps the split column with the SAME
  * content-hash rule as `TextOps.trainSplit`, so the stored layout and
  * the reported split sizes cannot drift.
  *
  * The pre-write `repartition` on the partition columns routes each
  * partition value to ONE task, so a directory gets one file instead
  * of one-per-upstream-task — at 100 TB the small-files explosion
  * (tasks × partition values) is what kills object-store listings and
  * downstream scan planning. The flip side is that one giant partition
  * value then writes through one task: `salt > 1` adds a `doc_id % salt`
  * term to the SHUFFLE key only (never a directory), fanning a hot
  * partition value over up to `salt` writer tasks/files — parallelism
  * for skewed corpora without exploding the layout.
  */
object CorpusStore {

  /** Appends the deterministic train/val/test `split` column (the
    * shared `TextOps.splitOf` content-hash rule) ahead of a
    * split-partitioned [[write]].
    */
  def withSplit(df: DataFrame, valPct: Int = 10, testPct: Int = 10): DataFrame =
    df.withColumn("split", graft.operators.TextOps.splitOf(valPct, testPct))

  def write(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("lang", "split"),
      salt: Int = 1): Unit = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val keys = partitionCols.map(col)
    val parted =
      if (salt == 1) df.repartition(keys: _*)
      else {
        // salted: write PARALLELISM is the explicit goal, so pin the
        // partition count — an unpinned repartition lets AQE coalesce
        // the (tiny-looking) shuffle back to one task, exactly the
        // serialization salt exists to break. File count per value
        // stays <= salt (one file per distinct salt residue at most).
        val n = df.sparkSession.sessionState.conf.numShufflePartitions
        df.repartition(n, keys :+ pmod(col("doc_id"), lit(salt)): _*)
      }
    parted.write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** [[write]] plus a `_manifest` directory beside the data: one row
    * per partition value with doc and token counts — the hand-off
    * contract a training job reads to size epochs/mixtures WITHOUT
    * scanning the corpus it just received (the counts are an
    * aggregate-sized frame computed in the same job that wrote the
    * data, so they cannot drift from it). The manifest is parquet
    * (one coalesced file — it is tiny by construction) with columns
    * (partition cols..., n_docs, n_tokens); [[readManifest]] loads it
    * back. Token counts use the shared whitespace tokenizer on
    * `textCol` so they match `TextOps.tokenCount`'s semantics.
    */
  def writeWithManifest(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("lang", "split"),
      salt: Int = 1, textCol: String = "text"): Unit = {
    import org.apache.spark.sql.functions.{count, size, sum}
    write(df, path, partitionCols, salt)
    df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokenize(col(textCol))))
          .as("n_tokens"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** The manifest written by [[writeWithManifest]]. Parquet reads
    * skip underscore-prefixed directories, so the data [[read]] never
    * sees it and this accessor targets it directly.
    */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest")
}
