package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side surface: layout decisions made at WRITE time (partition
  * columns, bucketing) are what make the 100 TB READ side cheap —
  * partition pruning turns predicates into directory skips, bucketing
  * makes repeated key joins shuffle-free (see BucketingSpec).
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per partition value;
    * readers' predicates on `partitionBy` become PartitionFilters
    * (pruned before any I/O).
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted managed table for shuffle-free repeated joins. */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil,
                    mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def csv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(path)

  def jsonLines(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** ORC with the same partition-directory contract as [[parquet]]. */
  def orc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
          mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
