package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (optionally) an equivalent
  * ANSI/DuckDB SQL oracle the driver runs over the same parquet tables.
  *
  * Parity rules every Q must follow so the driver's hash compare passes:
  *   - every computed column is aliased to the SAME name on both sides;
  *   - float aggregates are ROUNDed identically on both sides;
  *   - integer-valued computed columns are BIGINT on both sides;
  *   - a total ORDER BY (incl. tie-breaks and NULLS FIRST) on both sides;
  *   - no raw timestamp outputs (the source data is nanosecond-precision,
  *     Spark is micro) — epoch seconds as BIGINT instead.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
