package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{DocQueries, EventQueries, RelationalQueries, VolumeQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered engine query (SURVEY.md §2 + training-data ops). */
  val allQs: Seq[Q] =
    RelationalQueries.all ++ VolumeQueries.all ++ EventQueries.all ++ DocQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the star join revenue rollup (broadcast dims, single fact shuffle).
    */
  def entry(spark: SparkSession): DataFrame = {
    val run = allQs.find(_.name == "q3_revenue_by_nation_year").get.run
    run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (LSH
    * bucket contents depend on xxhash64) → driver records rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQs.collect { case Q(name, _, Some(sql)) => name -> sql }.toMap
}
