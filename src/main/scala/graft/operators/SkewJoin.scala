package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities for the 100 TB regime.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when one side must STAY shuffled on a key whose distribution is
  * pathological (a handful of keys holding a large fraction of rows) and
  * the other side is small enough to replicate per salt but too large to
  * broadcast outright.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `saltFactor` sub-keys and replicating the small side once per salt.
    * Result is identical to `big.join(small, key)` (inner), but the hot
    * key's rows spread across `saltFactor` reducers instead of one.
    *
    * Shuffle cost: |big| (unchanged) + saltFactor·|small| (the price of
    * de-skewing). Choose saltFactor ≈ (hot-key rows) / (target rows per
    * task).
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 16,
  ): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = big.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Report the heaviest keys and their share — the driver-side diagnostic
    * that decides whether salting is warranted (cheap: one partial agg).
    */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(total.toDouble))
      .orderBy(col("n").desc)
      .limit(topK)
  }
}
