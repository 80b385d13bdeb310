package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet; `events` needs special handling because its
  * `ts` column has shipped in two physical forms across driver generations:
  * INT64 TIMESTAMP(NANOS) (rounds <= 11; Spark rejects it unless read as a
  * raw long) and plain TIMESTAMP(MICROS) (round 12+, surfacing as
  * TIMESTAMP_NTZ). Either way the engine-facing schema is normalized to the
  * same two columns: `ts_ns` (BIGINT epoch nanoseconds — exact, since the
  * micro form is micros*1000) and `ts` (micro-precision TimestampType).
  * Query logic that must hash-match a nanosecond-aware oracle works on
  * `ts_ns` directly; the DuckDB side reads the same parquet as a native
  * timestamp, so oracles use `epoch_ns(ts)` / interval arithmetic and are
  * representation-independent. All sessions run with
  * spark.sql.session.timeZone=UTC, so the NTZ->timestamp cast is the
  * identity on the underlying micros (matching DuckDB's naive-as-UTC
  * epoch_ns).
  */
object T {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        raw
          .withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
          .select("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")
    }
  }
}
