package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet; `events` needs special handling because it
  * carries INT64 TIMESTAMP(NANOS) which Spark's parquet reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read the nanos as a raw long (`ts_ns`) and
  * derive a micro-precision `ts` timestamp from it. Query logic that must
  * hash-match a nanosecond-aware oracle works on `ts_ns` directly.
  */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
