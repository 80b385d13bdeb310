package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-stable fixed-point aggregation helpers.
  *
  * `round(sum(double), d)` is doubly unstable in an oracle-compared engine:
  *
  *  1. Partial-aggregation merge order varies with partitioning and shuffle
  *     fetch order, so a float sum can differ by an ulp between runs and
  *     flip the last rounded digit (observed: q3/ev_sessions flipping
  *     between runs at different core counts).
  *  2. `ROUND(x, d)` with d > 0 itself diverges between engines on exact
  *     half boundaries: DuckDB multiplies by 10^d (one extra FP rounding)
  *     before rounding to integer, while Spark rounds the exact BigDecimal
  *     of the double. double(0.42525) = 0.42524999..; DuckDB's
  *     0.42524999.. * 10^4 re-rounds to exactly 4252.5 -> 4253, Spark's
  *     BigDecimal sees ..2499.. -> 4252 (observed on doc_quality row 481).
  *
  * The stable form used by every money/ratio aggregate in this package:
  *
  *   per row : units = round(x * 10^d)  -- scale-0 round; both engines
  *             round half away from zero on the IDENTICAL double, so the
  *             integer is bit-identical cross-engine (verified empirically:
  *             DuckDB ROUND(2.5)=3, ROUND(-2.5)=-3 — same as Spark HALF_UP)
  *   sum     : exact int64 arithmetic  -- order-independent by definition
  *   emit    : units / 10^d as ONE final double division -- deterministic,
  *             identical in both engines for identical integer inputs
  *
  * No `ROUND(x, d>0)` ever appears in hash-compared output. The DuckDB
  * oracle mirror of `sum2(x)` is `SUM(CAST(ROUND(x * 100) AS BIGINT)) /
  * 100.0` (the CAST also defuses DuckDB's SUM->HUGEINT, which pandas
  * renders as float and breaks the %.9g value hash above 9 digits).
  *
  * int64 headroom: cents of a 10^5-priced item are ~10^7; 2^63 leaves
  * ~9e11 rows per group before overflow — beyond a 100 TB fact table's
  * per-group row counts. A production engine would use DECIMAL(38,d) sums
  * for unbounded groups; the technique is identical.
  */
object Fx {

  /** Exact per-row fixed-point units: round(x * 10^d) as int64 (scale-0
    * round — cross-engine-identical on the same double).
    */
  def units(x: Column, d: Int): Column = {
    require(d >= 0 && d <= 9, s"units scale out of range: $d")
    round(x * math.pow(10, d).toLong).cast("bigint")
  }

  /** Order-independent replacement for round(sum(x), 2): exact cents sum,
    * one final division. Emits DOUBLE.
    */
  def sum2(x: Column): Column = sum(units(x, 2)) / 100.0

  /** Order-independent replacement for round(avg(x), d-ish): exact units
    * sum divided by 10^d * count — unrounded but fully deterministic.
    * Counts non-null x like AVG does.
    */
  def avg(x: Column, d: Int): Column =
    sum(units(x, d)) / (count(x) * math.pow(10, d))
}
