package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Production write patterns for 100 TB corpora — the sink-side half of
  * the scale story: partition pruning for downstream readers, bounded
  * file counts, and deterministic layout.
  */
object CorpusWriter {

  /** Hive-style partitioned parquet: downstream `WHERE lang = 'en'` scans
    * prune to one directory (PartitionFilters, not data filters).
    * `filesPerPartition` bounds small-file explosion: rows are
    * repartitioned by (partition cols, bucket) before the write so each
    * partition directory gets at most that many files.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       filesPerPartition: Int = 4): Unit = {
    val bucketed = df.repartition(
      (partitionCols.map(col) :+
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(filesPerPartition))): _*)
    bucketed.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Sorted-within-file layout: rows sorted inside each output file by
    * `sortCols` so parquet min/max row-group stats prune range predicates
    * (the poor-man's z-order for a single sort key). */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed + sorted table (`bucketBy`/`sortBy` via the session
    * catalog): every table written with the same bucket spec on the join
    * key co-locates — downstream equi-joins and aggregations on
    * `bucketCols` plan with ZERO Exchange (asserted in CorpusWriterSpec),
    * which at 100 TB is the difference between a metadata-only join and
    * re-shuffling both fact tables every query. Buckets also bound
    * per-task input size deterministically (numBuckets sized to the
    * cluster, not the data). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    // explicit location = external table; avoids depending on the session's
    // warehouse dir (a static conf that cannot be set on a live session)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
