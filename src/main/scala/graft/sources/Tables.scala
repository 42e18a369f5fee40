package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  def orders(s: SparkSession, d: String): DataFrame    =
    guardNanosLong(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame  =
    guardNanosLong(table(s, d, "lineitem"), "l_shipdate")

  /** Date-ish fact columns (o_orderdate, l_shipdate) currently arrive as
    * timestamp[us] NTZ and are used ONLY in literal comparisons /
    * date_trunc — both resolve on NTZ, and leaving the scan column
    * untouched keeps predicate pushdown into the parquet source (the
    * audited `PushedFilters` posture; an unconditional cast here would
    * detach every date filter from the scan). The ONE encoding that is
    * silently catastrophic is TIMESTAMP(NANOS): under the session's
    * `nanosAsLong` it surfaces as a plain long and every date predicate
    * would compare strings to nanos. Normalize exactly that case
    * (correctness over pushdown when the generator flips encodings —
    * the round-8 lesson).
    */
  private def guardNanosLong(df: DataFrame, name: String): DataFrame =
    if (df.schema(name).dataType == LongType)
      df.withColumn(name,
        timestamp_micros(expr(s"($name - pmod($name, 1000L)) div 1000L")))
    else df
  /** events.ts arrives in whichever physical encoding the generator used
    * that round — the engine normalizes ALL of them to a canonical
    * TIMESTAMP (instant semantics) so downstream `unix_micros` et al.
    * always resolve:
    *   - parquet TIMESTAMP(NANOS): Spark reads it as a nanos-epoch long
    *     (spark.sql.legacy.parquet.nanosAsLong — set by
    *     [[graft.GraftSession]]); truncate to micros like DuckDB does so
    *     both engines see identical timestamps.
    *   - parquet timestamp[us] isAdjustedToUTC=false: Spark 4 reads it as
    *     TIMESTAMP_NTZ; cast to TIMESTAMP — instant-preserving because the
    *     session timezone is pinned UTC ([[graft.GraftSession]]).
    *   - parquet timestamp[us] isAdjustedToUTC=true: already TIMESTAMP.
    * TimestampEncodingSpec pins this three-way contract.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // floor division (subtract the non-negative pmod remainder first):
        // plain `div` truncates toward zero, which would land pre-1970
        // sub-microsecond instants one microsecond LATE vs DuckDB's
        // truncation; integer `div` keeps full 64-bit precision
        df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000L")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
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
