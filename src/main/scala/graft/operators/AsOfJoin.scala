package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTs <= leftTs within the same partition keys (the time-series join
  * Spark lacks natively).
  *
  * Scale shape: union-tag + ONE window over (keys, ts) — a single shuffle
  * on the partition keys regardless of row counts, no per-key nested-loop
  * and no range-bucketed self-join. Right rows sort BEFORE left rows at
  * equal timestamps, so the match is at-or-before (`>=` semantics, like
  * DuckDB/kdb asof). The right payload travels as one struct so a single
  * consistent right row is matched even under duplicate timestamps.
  */
object AsOfJoin {

  /** @param keys        equi-partition columns present on both sides
    * @param leftTs      left timestamp column (any ordered numeric/ts type)
    * @param rightTs     right timestamp column
    * @param rightCols   right payload columns to attach (must not collide
    *                    with left column names); emitted as
    *                    `matched_<name>`, plus `matched_ts` = rightTs.
    */
  def lastAtOrBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
  ): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightCols, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * rightTs >= leftTs (`<=` semantics — DuckDB `ASOF JOIN ON l.ts <=
    * r.ts`). Identical single-shuffle shape, traversed in descending
    * timestamp order.
    */
  def firstAtOrAfter(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
  ): DataFrame =
    asof(left, right, keys, leftTs, rightTs, rightCols, forward = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      forward: Boolean,
  ): DataFrame = {
    val payload = struct((col(rightTs).as("__ts") +: rightCols.map(col)): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ats"), lit(0).as("__tag"), payload.as("__asof")): _*)
    val l = left.withColumn("__ats", col(leftTs)).withColumn("__tag", lit(1))
      .withColumn("__asof", lit(null).cast(r.schema("__asof").dataType))
    // right rows sort before left rows at equal timestamps in BOTH
    // directions, preserving the at-or-{before,after} equality match
    val ord = if (forward) col("__ats").desc else col("__ats").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // r lacks left's other columns — align it to l's schema with nulls
    val rAligned = {
      val lCols = l.columns.toSeq
      val rCols = r.columns.toSet
      r.select(lCols.map(c => if (rCols.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)): _*)
    }
    l.unionByName(rAligned)
      .withColumn("__m", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .withColumn("matched_ts", col("__m.__ts"))
      .withColumns(rightCols.map(c => s"matched_$c" -> col(s"__m.$c")).toMap)
      .drop("__ats", "__tag", "__asof", "__m")
  }
}
