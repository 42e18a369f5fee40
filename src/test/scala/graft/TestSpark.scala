package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (small parallelism keeps tests fast). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.withGraftConfigs(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
