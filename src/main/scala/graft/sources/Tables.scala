package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver-generated star schema.
  *
  * All reads go through `spark.read.parquet` so Catalyst owns column
  * pruning and predicate pushdown; callers select/filter declaratively and
  * the scan shrinks accordingly (verified via `.explain("formatted")`:
  * PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * nanos-epoch long (spark.sql.legacy.parquet.nanosAsLong — set by
    * [[graft.GraftSession]]). Truncate to micros like DuckDB does so both
    * engines see identical timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      // floor division (subtract the non-negative pmod remainder first):
      // plain `div` truncates toward zero, which would land pre-1970
      // sub-microsecond instants one microsecond LATE vs DuckDB's
      // truncation; integer `div` keeps full 64-bit precision
      df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000L")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Ensure enough partitions for a per-partition kernel to use the
    * cluster. The local testdata ships one row group per file, which
    * Spark cannot split — a scan arrives as ONE task no matter how many
    * cores exist. A real 100 TB table has thousands of row groups, so
    * this is a no-op there (`getNumPartitions >= target`); locally it
    * trades one narrow shuffle of the projected columns for full
    * parallelism in the kernel stage.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
