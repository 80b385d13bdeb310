package graft.queries

import graft.{Q, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface of the engine over the TPC-H-ish star schema.
  *
  * Scale notes (designed for 100 TB, tested on local[32]):
  *  - fact-side scans (lineitem/orders/events) stay fully distributed; every
  *    query below is a scan → (partial agg | shuffle-on-key) pipeline with
  *    filters and projections pushed into the parquet reader by Catalyst;
  *  - dimension tables (region 5, nation 25, supplier 1e3, customer 1.5e5 at
  *    sf1-equivalent) are explicitly `broadcast()` so star joins never
  *    shuffle the fact table by a dimension key;
  *  - top-k uses orderBy+limit (Spark's TakeOrderedAndProject — a per-
  *    partition partial top-k then a driver merge, no global sort);
  *  - the only intentionally-global windows (running totals) operate on
  *    *aggregated* rows (one per date), never on raw fact rows.
  */
object RelationalQueries {

  /** Shared lane-normalization prefix of the space-filling-curve
    * oracles: exact integer (min, max) bucketing of (l_partkey,
    * l_suppkey) to 16-bit lanes `a`, `b`.
    */
  private val curveLaneCtes: String = """mm AS (
          SELECT CAST(MIN(l_partkey) AS BIGINT) pmin, CAST(MAX(l_partkey) AS BIGINT) pmax,
                 CAST(MIN(l_suppkey) AS BIGINT) smin, CAST(MAX(l_suppkey) AS BIGINT) smax
          FROM lineitem
        ), lanes AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 CASE WHEN pmax = pmin THEN 0
                      ELSE (CAST(l_partkey AS BIGINT) - pmin) * 65535 // (pmax - pmin) END AS a,
                 CASE WHEN smax = smin THEN 0
                      ELSE (CAST(l_suppkey AS BIGINT) - smin) * 65535 // (smax - smin) END AS b
          FROM lineitem, mm
        )"""

  /** DuckDB replay of the canonical z-order key algebra over lineitem
    * (lane normalization + magic-mask spreading + interleave) — shared
    * by q24_zorder_keys and q25_zorder_lifecycle: the lifecycle gate's
    * REBUILD CONTRACT is that cluster-half + append-half + compact
    * reproduces exactly the keys a fresh single-shot clustering
    * (= this algebra) would assign.
    */
  private val zorderKeysOracle: String = s"""
        WITH $curveLaneCtes, s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """

  /** The q26 oracle: the SAME unrolled Hilbert xy2d rotation stages the
    * Spark side executes (ZOrder.hilbertKey2 is deliberately closed-form
    * Column algebra so this replay is stage-for-stage identical), as 16
    * generated chained CTEs over the shared lanes.
    */
  private def hilbertKeysOracle: String = {
    val stages = (15 to 0 by -1).zipWithIndex.map { case (i, idx) =>
      val sBit = 1L << i
      val prev = if (idx == 0) "lanes" else s"h${idx - 1}"
      val (xc, yc) = if (idx == 0) ("a", "b") else ("x", "y")
      val dc = if (idx == 0) "CAST(0 AS BIGINT)" else "d"
      s"""h$idx AS (
          SELECT l_orderkey, l_linenumber,
                 $dc + ${sBit * sBit} * xor(3 * (($xc >> $i) & 1), ($yc >> $i) & 1) AS d,
                 CASE WHEN (($yc >> $i) & 1) = 0
                      THEN CASE WHEN (($xc >> $i) & 1) = 1 THEN ${sBit - 1} - $yc ELSE $yc END
                      ELSE $xc END AS x,
                 CASE WHEN (($yc >> $i) & 1) = 0
                      THEN CASE WHEN (($xc >> $i) & 1) = 1 THEN ${sBit - 1} - $xc ELSE $xc END
                      ELSE $yc END AS y
          FROM $prev)"""
    }.mkString(", ")
    s"""
        WITH $curveLaneCtes, $stages
        SELECT l_orderkey, l_linenumber, d AS hkey
        FROM h15
        ORDER BY hkey, l_orderkey, l_linenumber
      """
  }

  /** The q27 oracle: equi-depth (quantile) lane bucketing over a
    * DELIBERATELY skewed column — bucket(v) = (rows-before·256) div n
    * over the per-value histogram, exactly the integer CDF algebra
    * [[graft.operators.ZOrder.withZKeyQuantile]] executes (histogram →
    * ordered cumulative sum → broadcast bucket map), then the same
    * magic-mask Morton spreading as q24. The skewed lane is
    * 2^(l_orderkey mod 20): under LINEAR (min,max) bucketing 12 of its
    * 20 values collapse into the bottom two of 256 buckets (60 % of all
    * rows); the CDF spreads them evenly — the skip-bound evidence rides
    * as the q27 shape pin's measured linear-vs-quantile probe.
    */
  private val zorderQuantileOracle: String = zorderQuantileOracleSql("", "", "qkey")

  /** The shared q27/q33/q35/q36 oracle builder — the equi-depth CDF
    * algebra over the skewed (xv, yv) lanes, parameterized for the
    * delete gates: `baseWhere` filters the TRAINING set (q36: the CDF
    * retrains on delete survivors at compaction), `outputWhere` filters
    * only the OUTPUT (q35: tombstones hide rows but the stored keys
    * were trained on everything), `outKey` names the key column.
    */
  private def zorderQuantileOracleSql(
      baseWhere: String, outputWhere: String, outKey: String): String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    s"""
        WITH base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem $baseWhere
        ), nn AS (SELECT COUNT(*) AS n FROM base),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cy AS (${cdf("hy")}),
        lanes AS (
          SELECT base.l_orderkey, base.l_linenumber, cx.b AS a, cy.b AS b
          FROM base JOIN cx ON base.xv = cx.v JOIN cy ON base.yv = cy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS $outKey
        FROM s4 $outputWhere
        ORDER BY $outKey, l_orderkey, l_linenumber
      """
  }

  /** Shared 3-lane normalization prefix of the 3-D curve oracles: exact
    * integer (min, max) bucketing of (l_partkey, l_suppkey, l_quantity)
    * to 8-bit lanes `a`, `b`, `c`. l_quantity is an integral double —
    * both engines cast it to the same BIGINT.
    */
  private val curve3LaneCtes: String = """mm3 AS (
          SELECT CAST(MIN(l_partkey) AS BIGINT) pmin, CAST(MAX(l_partkey) AS BIGINT) pmax,
                 CAST(MIN(l_suppkey) AS BIGINT) smin, CAST(MAX(l_suppkey) AS BIGINT) smax,
                 CAST(MIN(l_quantity) AS BIGINT) qmin, CAST(MAX(l_quantity) AS BIGINT) qmax
          FROM lineitem
        ), lanes3 AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 CASE WHEN pmax = pmin THEN 0
                      ELSE (CAST(l_partkey AS BIGINT) - pmin) * 255 // (pmax - pmin) END AS a,
                 CASE WHEN smax = smin THEN 0
                      ELSE (CAST(l_suppkey AS BIGINT) - smin) * 255 // (smax - smin) END AS b,
                 CASE WHEN qmax = qmin THEN 0
                      ELSE (CAST(l_quantity AS BIGINT) - qmin) * 255 // (qmax - qmin) END AS c
          FROM lineitem, mm3
        )"""

  /** The q28 oracle: generic 3-lane Morton interleave — bit i of lane j
    * lands at 3i+j, exactly [[graft.operators.ZOrder.interleaveN]]'s
    * shift/mask OR-algebra, unrolled to 24 terms.
    */
  private def morton3KeysOracle: String = {
    val terms = (0 until 8).flatMap(i => Seq(
      s"(((a >> $i) & 1) << ${3 * i})",
      s"(((b >> $i) & 1) << ${3 * i + 1})",
      s"(((c >> $i) & 1) << ${3 * i + 2})"))
    s"""
        WITH $curve3LaneCtes
        SELECT l_orderkey, l_linenumber, (${terms.mkString(" | ")}) AS zkey3
        FROM lanes3
        ORDER BY zkey3, l_orderkey, l_linenumber
      """
  }

  /** Skilling's 3-D Hilbert transform as generated chained CTEs over a
    * `lanes3` CTE with columns (l_orderkey, l_linenumber, a, b, c) —
    * stage-for-stage the SAME loop structure
    * [[graft.operators.ZOrder.withHilbert3Key]] executes: (bits-1)·3
    * inverse-undo CTEs (exchange/invert the low bits of (a, lane_i)),
    * one Gray-encode CTE, the trailing-correction fold, and the
    * transpose interleave (bit q of word i at 3q + 2 - i). Shared by the
    * q29 (linear lanes) and q30 (quantile lanes) oracles — only the lane
    * normalization prefix differs.
    */
  private def hilbert3StagesSql(laneCtes: String, keyAlias: String): String = {
    val bits = 8
    val stages = scala.collection.mutable.ArrayBuffer[String]()
    var prev = "lanes3"
    var k = 0
    for (q <- (bits - 1) to 1 by -1) {
      val bigQ = 1L << q
      val p = bigQ - 1
      for (i <- 0 until 3) {
        val body = i match {
          case 0 =>
            s"""SELECT l_orderkey, l_linenumber,
               CASE WHEN (a & $bigQ) != 0 THEN xor(a, $p) ELSE a END AS a, b, c
               FROM $prev"""
          case 1 =>
            s"""SELECT l_orderkey, l_linenumber,
               CASE WHEN (b & $bigQ) != 0 THEN xor(a, $p)
                    ELSE xor(a, xor(a, b) & $p) END AS a,
               CASE WHEN (b & $bigQ) != 0 THEN b
                    ELSE xor(b, xor(a, b) & $p) END AS b, c
               FROM $prev"""
          case _ =>
            s"""SELECT l_orderkey, l_linenumber,
               CASE WHEN (c & $bigQ) != 0 THEN xor(a, $p)
                    ELSE xor(a, xor(a, c) & $p) END AS a, b,
               CASE WHEN (c & $bigQ) != 0 THEN c
                    ELSE xor(c, xor(a, c) & $p) END AS c
               FROM $prev"""
        }
        stages += s"g$k AS ($body)"
        prev = s"g$k"
        k += 1
      }
    }
    stages += s"ggray AS (SELECT l_orderkey, l_linenumber, a, xor(b, a) AS b," +
      s" xor(c, xor(b, a)) AS c FROM $prev)"
    val tExpr = ((bits - 1) to 1 by -1).foldLeft("0") { (acc, q) =>
      val bigQ = 1L << q
      s"xor($acc, CASE WHEN (c & $bigQ) != 0 THEN ${bigQ - 1} ELSE 0 END)"
    }
    stages += s"gt AS (SELECT l_orderkey, l_linenumber, a, b, c, $tExpr AS t FROM ggray)"
    stages += "gf AS (SELECT l_orderkey, l_linenumber, xor(a, t) AS a," +
      " xor(b, t) AS b, xor(c, t) AS c FROM gt)"
    val terms = (0 until bits).flatMap(q => Seq(
      s"(((a >> $q) & 1) << ${3 * q + 2})",
      s"(((b >> $q) & 1) << ${3 * q + 1})",
      s"(((c >> $q) & 1) << ${3 * q})"))
    s"""
        WITH $laneCtes, ${stages.mkString(", ")}
        SELECT l_orderkey, l_linenumber, (${terms.mkString(" | ")}) AS $keyAlias
        FROM gf
        ORDER BY $keyAlias, l_orderkey, l_linenumber
      """
  }

  /** The q29 oracle: Skilling's staged transform over the shared LINEAR
    * (min, max) 8-bit lanes.
    */
  private def hilbert3KeysOracle: String = hilbert3StagesSql(curve3LaneCtes, "hkey3")

  /** The q30 oracle: the SAME staged Skilling transform over QUANTILE
    * (equi-depth) lanes — the q27 CDF bucketing algebra extended to three
    * columns (skewed xv = 2^(l_orderkey mod 20), yv = l_suppkey,
    * wv = l_quantity), feeding the shared `lanes3` contract. This is the
    * full composition the layout family ships at 100 TB: skew-robust
    * lane normalization under the locality-tightest curve.
    */
  private def hilbert3QuantileOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    val laneCtes = s"""base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv,
                 CAST(l_quantity AS BIGINT) AS wv
          FROM lineitem
        ), nn AS (SELECT COUNT(*) AS n FROM base),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cy AS (${cdf("hy")}),
        hw AS (SELECT wv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cw AS (${cdf("hw")}),
        lanes3 AS (
          SELECT base.l_orderkey, base.l_linenumber, cx.b AS a, cy.b AS b, cw.b AS c
          FROM base JOIN cx ON base.xv = cx.v JOIN cy ON base.yv = cy.v
                    JOIN cw ON base.wv = cw.v
        )"""
    hilbert3StagesSql(laneCtes, "qh3key")
  }

  /** The q32 oracle: the quantile layout's FROZEN-BOUNDARY semantics,
    * clamp included. The layout clusters the EVEN-orderkey half (CDF
    * trained there, `_zqbounds` frozen) and appends the ODD half through
    * the frozen boundaries. The skewed lane makes the append adversarial
    * by construction: odd orderkeys produce xv = 2^(odd residue) —
    * values NEVER seen at cluster time — so every appended xv exercises
    * the clamp rule (largest stored bucket whose boundary ≤ v, 0 below
    * all). The oracle replays that rule UNIFORMLY: for seen values the
    * frozen rule reproduces the CDF bucket exactly (boundaries are
    * per-bucket minima and the CDF is monotone in value), so one
    * value-level non-equi join (distinct values × ≤256 boundaries —
    * tiny) keys the whole table, then the q24 magic-mask spreading.
    */
  private val zquantileFrozenClampOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ), seed AS (SELECT * FROM base WHERE l_orderkey % 2 = 0),
        nn AS (SELECT COUNT(*) AS n FROM seed),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM base),
        valy AS (SELECT DISTINCT yv AS v FROM base),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT base.l_orderkey, base.l_linenumber, fx.b AS a, fy.b AS b
          FROM base JOIN fx ON base.xv = fx.v JOIN fy ON base.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** The q37 oracle: SNAPSHOT (time-travel) semantics over the
    * exactly-once batch markers. The layout clusters the EVEN-orderkey
    * half; the ODD half lands as four `appendQuantileOnce` batches in a
    * deterministic TOTAL order (sorted by every column, so the prefix
    * multiset is engine-independent even across duplicate rows), and
    * the gate reads `readAsOfBatch(..., 1)` — the base snapshot plus
    * batches 0 and 1, i.e. the first 2·ceil(n/4) odd rows. The oracle
    * is q32's frozen-clamp algebra restricted to exactly that arrival
    * prefix: CDF trained on the seed, the frozen boundary rule applied
    * uniformly over seed ∪ prefix. Batches 2 and 3 exist in the dir and
    * MUST NOT appear — the hash pins that snapshot selection is exact,
    * not merely a subset.
    */
  private val zquantileAsOfOracle: String =
    zquantileAsOfOracleSql("2 * (((SELECT c FROM oddn) + 3) // 4)", "")

  /** The shared q37/q39 oracle builder: the frozen-clamp algebra over
    * the seed plus a deterministic odd-arrival PREFIX (`prefixExpr`
    * rows of the total order — q37: two of four batches; q39: one of
    * two), with `outputWhere` filtering only the OUTPUT (q39: the
    * version-0 tombstones hide rows, keys stay as stored).
    */
  private def zquantileAsOfOracleSql(prefixExpr: String, outputWhere: String): String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH allr AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ),
        oddp AS (
          SELECT l_orderkey, l_linenumber, xv, yv,
                 ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, xv, yv) AS rn
          FROM allr WHERE l_orderkey % 2 = 1
        ), oddn AS (SELECT COUNT(*) AS c FROM oddp),
        base AS (
          SELECT l_orderkey, l_linenumber, xv, yv FROM allr WHERE l_orderkey % 2 = 0
          UNION ALL
          SELECT l_orderkey, l_linenumber, xv, yv FROM oddp
          WHERE rn <= $prefixExpr
        ),
        seed AS (SELECT * FROM allr WHERE l_orderkey % 2 = 0),
        nn AS (SELECT COUNT(*) AS n FROM seed),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM base),
        valy AS (SELECT DISTINCT yv AS v FROM base),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT base.l_orderkey, base.l_linenumber, fx.b AS a, fy.b AS b
          FROM base JOIN fx ON base.xv = fx.v JOIN fy ON base.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4 $outputWhere
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** The q41/q43 oracle: COMMITTED IN-PLACE COMPACTION semantics. The
    * fixture clusters the even half, commits the odd half's first
    * arrival batch (0), deletes l_orderkey % 9 == 4 (stamped version 0),
    * compacts COMMITTED as batch 1 — survivors re-cluster through a
    * RETRAINED equi-depth CDF, tombstones applied physically, published
    * in the same `_zbatches` lineage — then commits arrival batch 2
    * through the retrained frozen boundaries. The current committed
    * read is therefore: survivors ∪ batch 2, keyed by the frozen-clamp
    * rule over boundaries trained on the SURVIVORS (not the original
    * seed — the hash pins that compaction really retrained), with
    * survivor rows reproducing their retrained CDF buckets exactly
    * (per-bucket minima + monotone CDF, the q32 argument). q42 reads
    * the same table as-of version 0 and must see the PRE-compaction
    * lineage byte-for-byte (q39's oracle) — the hash pair pins that
    * compaction is a commit, not a rewrite of history.
    */
  private val zcompactCommittedOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH allr AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ),
        oddp AS (
          SELECT l_orderkey, l_linenumber, xv, yv,
                 ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, xv, yv) AS rn
          FROM allr WHERE l_orderkey % 2 = 1
        ), oddn AS (SELECT COUNT(*) AS c FROM oddp),
        s0 AS (
          SELECT l_orderkey, l_linenumber, xv, yv FROM allr WHERE l_orderkey % 2 = 0
          UNION ALL
          SELECT l_orderkey, l_linenumber, xv, yv FROM oddp
          WHERE rn <= (((SELECT c FROM oddn) + 1) // 2)
        ),
        seed AS (SELECT * FROM s0 WHERE l_orderkey % 9 <> 4),
        base AS (
          SELECT * FROM seed
          UNION ALL
          SELECT l_orderkey, l_linenumber, xv, yv FROM oddp
          WHERE rn > (((SELECT c FROM oddn) + 1) // 2)
        ),
        nn AS (SELECT COUNT(*) AS n FROM seed),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM seed GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM base),
        valy AS (SELECT DISTINCT yv AS v FROM base),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT base.l_orderkey, base.l_linenumber, fx.b AS a, fy.b AS b
          FROM base JOIN fx ON base.xv = fx.v JOIN fy ON base.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** The q38 oracle: MERGE (upsert) semantics over the quantile layout.
    * The layout clusters the WHOLE skewed corpus (CDF trained on every
    * row, `_zqbounds` frozen), then a source batch of UPDATED rows —
    * every l_orderkey % 7 == 1 row with yv shifted by +7 — merges in:
    * old versions tombstoned by (l_orderkey, l_linenumber) key match,
    * new versions appended through the frozen boundaries. The merged
    * multiset is therefore base-minus-matched ∪ updated, survivors
    * keep their stored CDF keys, and appended rows key by the frozen
    * rule (for a seen yv+7 it coincides with the CDF bucket; an unseen
    * one exercises the clamp) — so the oracle applies the frozen rule
    * UNIFORMLY over the merged set, boundaries trained on the original
    * full table, exactly the q32 skeleton with seed = everything.
    */
  private val zmergeUpsertOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ),
        merged AS (
          SELECT l_orderkey, l_linenumber, xv, yv FROM base WHERE l_orderkey % 7 <> 1
          UNION ALL
          SELECT l_orderkey, l_linenumber, xv, yv + 7 AS yv FROM base
          WHERE l_orderkey % 7 = 1
        ),
        nn AS (SELECT COUNT(*) AS n FROM base),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM merged),
        valy AS (SELECT DISTINCT yv AS v FROM merged),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT merged.l_orderkey, merged.l_linenumber, fx.b AS a, fy.b AS b
          FROM merged JOIN fx ON merged.xv = fx.v JOIN fy ON merged.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** The q47 oracle: STREAMING MERGE over a KEYED update set — the q38
    * skeleton with the update stream deduplicated to one row per
    * (l_orderkey, l_linenumber) (MAX(yv)+7 — the CDC contract; see the
    * gate comment: the base table has genuine duplicate keys, and the
    * gate pins that the upsert replaces ALL old copies of a matched
    * key with exactly one new version, batch-split-invariantly).
    */
  private val zmergeStreamOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ),
        merged AS (
          SELECT l_orderkey, l_linenumber, xv, yv FROM base WHERE l_orderkey % 7 <> 1
          UNION ALL
          SELECT l_orderkey, l_linenumber, MAX(xv) AS xv, MAX(yv) + 7 AS yv
          FROM base WHERE l_orderkey % 7 = 1
          GROUP BY l_orderkey, l_linenumber
        ),
        nn AS (SELECT COUNT(*) AS n FROM base),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM merged),
        valy AS (SELECT DISTINCT yv AS v FROM merged),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT merged.l_orderkey, merged.l_linenumber, fx.b AS a, fy.b AS b
          FROM merged JOIN fx ON merged.xv = fx.v JOIN fy ON merged.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** The q31 oracle: the pruned-point read is row-exact BY CONTRACT
    * (Bloom skipping is a superset guarantee — false positives only add
    * files, the residual IN re-filters), so the oracle is the plain
    * point lookup over the whole table. The Bloom EVIDENCE (files
    * skipped, min/max envelopes powerless on the unclustered key) rides
    * as the q31 shape pin, which measures both pruning paths head to
    * head.
    */
  private val bloomSkippingOracle: String = """
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               l_partkey, l_suppkey
        FROM lineitem
        WHERE l_orderkey IN (
          SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey LIMIT 5)
        ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey
      """

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------- q1
    // TPC-H Q1 pricing summary: single scan, partial+final hash agg.
    Q(
      "q1_pricing_summary",
      (s, d) => {
        import s.implicits._
        T(s, d, "lineitem")
          .filter($"l_shipdate" <= lit("2000-01-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          // Fixed-point (Fx) aggregation: exact int64 cents sums so the
          // result is independent of partial-agg merge order AND of
          // cross-engine ROUND(x, d) divergence — see Fx scaladoc.
          .agg(
            sum(Fx.units($"l_quantity", 2)).as("qty_c"),
            sum(Fx.units($"l_extendedprice", 2)).as("base_c"),
            sum(Fx.units($"l_extendedprice" * (lit(1) - $"l_discount"), 2)).as("disc_c"),
            sum(Fx.units($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 2)).as("charge_c"),
            sum(Fx.units($"l_discount", 4)).as("disc4_c"),
            count(lit(1)).as("count_order"),
          )
          .select(
            $"l_returnflag",
            $"l_linestatus",
            ($"qty_c" / 100.0).as("sum_qty"),
            ($"base_c" / 100.0).as("sum_base_price"),
            ($"disc_c" / 100.0).as("sum_disc_price"),
            ($"charge_c" / 100.0).as("sum_charge"),
            ($"qty_c" / ($"count_order" * 100.0)).as("avg_qty"),
            ($"base_c" / ($"count_order" * 100.0)).as("avg_price"),
            ($"disc4_c" / ($"count_order" * 10000.0)).as("avg_disc"),
            $"count_order",
          )
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc_price,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) / 100.0 AS sum_charge,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / (COUNT(*) * 100.0) AS avg_qty,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / (COUNT(*) * 100.0) AS avg_price,
               SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) / (COUNT(*) * 10000.0) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """),
    ),
    // ----------------------------------------------------------------- q2
    // Top-10 customers by revenue: fact-fact join on the natural key, then
    // TakeOrderedAndProject (partial top-k per partition, no global sort).
    Q(
      "q2_top_revenue_customers",
      (s, d) => {
        import s.implicits._
        val li = T(s, d, "lineitem")
        val o = T(s, d, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy($"o_custkey")
          .agg(Fx.sum2($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"o_custkey")
          .limit(10)
      },
      Some("""
        SELECT o_custkey,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey
        ORDER BY revenue DESC, o_custkey
        LIMIT 10
      """),
    ),
    // ----------------------------------------------------------------- q3
    // Star join: fact joined to broadcast dimension chain, agg by nation/yr.
    Q(
      "q3_revenue_by_nation_year",
      (s, d) => {
        import s.implicits._
        val li = T(s, d, "lineitem")
        val o = T(s, d, "orders")
        val c = T(s, d, "customer")
        val n = T(s, d, "nation")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy($"n_name", year($"o_orderdate").cast("bigint").as("o_year"))
          .agg(
            Fx.sum2($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
            countDistinct($"o_orderkey").as("n_orders"),
          )
          .orderBy($"n_name", $"o_year")
      },
      Some("""
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
        ORDER BY n_name, o_year
      """),
    ),
    // ----------------------------------------------------------------- q4
    // Left-semi join (EXISTS): customers that placed an open order.
    Q(
      "q4_semi_join_open_orders",
      (s, d) => {
        import s.implicits._
        val c = T(s, d, "customer")
        val o = T(s, d, "orders").filter($"o_orderstatus" === "O")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey
      """),
    ),
    // ----------------------------------------------------------------- q5
    // Left-anti join (NOT EXISTS): parts that never shipped.
    Q(
      "q5_anti_join_never_ordered",
      (s, d) => {
        import s.implicits._
        val p = T(s, d, "part")
        val li = T(s, d, "lineitem")
        p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
          .select($"p_partkey", $"p_name", $"p_brand")
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        ORDER BY p_partkey
      """),
    ),
    // ----------------------------------------------------------------- q6
    // Ranking window: top-3 orders per customer by price.
    Q(
      "q6_window_top3_per_customer",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        T(s, d, "orders")
          .withColumn("rk", row_number().over(w).cast("bigint"))
          .filter($"rk" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
          .orderBy($"o_custkey", $"rk")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
          FROM orders
        ) WHERE rk <= 3
        ORDER BY o_custkey, rk
      """),
    ),
    // ----------------------------------------------------------------- q7
    // Frame window: running total over pre-aggregated daily revenue.
    // The global window runs over ~2500 date rows, not the fact table.
    Q(
      "q7_running_daily_revenue",
      (s, d) => {
        import s.implicits._
        val daily = T(s, d, "orders")
          .groupBy(date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
          .agg(sum(Fx.units($"o_totalprice", 2)).as("daily_c"))
        val w = Window.orderBy($"order_date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .select(
            $"order_date",
            ($"daily_c" / 100.0).as("daily_total"),
            (sum($"daily_c").over(w) / 100.0).as("running_total"),
          )
          .orderBy($"order_date")
      },
      Some("""
        WITH daily AS (
          SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS daily_c
          FROM orders GROUP BY 1
        )
        SELECT order_date, daily_c / 100.0 AS daily_total,
               SUM(daily_c) OVER (ORDER BY order_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_total
        FROM daily ORDER BY order_date
      """),
    ),
    // ----------------------------------------------------------------- q8
    // Set ops: INTERSECT / EXCEPT / UNION with explicit dedup semantics.
    Q(
      "q8_set_ops",
      (s, d) => {
        import s.implicits._
        val c = T(s, d, "customer")
        val o = T(s, d, "orders")
        val rich = c.filter($"c_acctbal" > 5000).select($"c_custkey")
        val buyers = o.select($"o_custkey".as("c_custkey"))
        val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
        val fBuyers = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("c_custkey"))
        rich.intersect(buyers).union(building.except(fBuyers)).distinct()
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey FROM (
          (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
           INTERSECT
           SELECT o_custkey FROM orders)
          UNION
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ) ORDER BY c_custkey
      """),
    ),
    // ----------------------------------------------------------------- q9
    // Distinct aggregates per group.
    Q(
      "q9_segment_profile",
      (s, d) => {
        import s.implicits._
        T(s, d, "customer")
          .groupBy($"c_mktsegment")
          .agg(
            countDistinct($"c_nationkey").as("n_nations"),
            count(lit(1)).as("n_customers"),
            Fx.avg($"c_acctbal", 2).as("avg_acctbal"),
            // min/max of the raw doubles are already order-independent and
            // cross-engine identical — no rounding needed or wanted.
            min($"c_acctbal").as("min_acctbal"),
            max($"c_acctbal").as("max_acctbal"),
          )
          .orderBy($"c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / (COUNT(c_acctbal) * 100.0) AS avg_acctbal,
               MIN(c_acctbal) AS min_acctbal,
               MAX(c_acctbal) AS max_acctbal
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
      """),
    ),
    // ---------------------------------------------------------------- q10
    // ROLLUP grouping sets (subtotals + grand total).
    Q(
      "q10_rollup_status_priority",
      (s, d) => {
        import s.implicits._
        T(s, d, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), Fx.sum2($"o_totalprice").as("total_price"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """),
    ),
    // ---------------------------------------------------------------- q18
    // CUBE grouping sets: all 4 subtotal combinations in one pass.
    Q(
      "q18_cube_status_priority",
      (s, d) => {
        import s.implicits._
        T(s, d, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), Fx.avg($"o_totalprice", 2).as("avg_price"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / (COUNT(o_totalprice) * 100.0) AS avg_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """),
    ),
    // ---------------------------------------------------------------- q21
    // Explicit GROUPING SETS (the general form behind cube/rollup —
    // q10/q18 cover those): independent per-dimension subtotals in one
    // Expand+aggregate pass, via the SQL surface.
    Q(
      "q21_grouping_sets",
      (s, d) => {
        T(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS price_c
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """),
    ),
    // ---------------------------------------------------------------- q11
    // Conditional aggregation over a 3-table broadcast star.
    Q(
      "q11_urgent_share_by_nation",
      (s, d) => {
        import s.implicits._
        val o = T(s, d, "orders")
        val c = T(s, d, "customer")
        val n = T(s, d, "nation")
        val urgent = when($"o_orderpriority" === "1-URGENT", $"o_totalprice").otherwise(lit(0.0))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy($"n_name")
          .agg(
            Fx.sum2(urgent).as("urgent_total"),
            // ratio of two exact cents sums: deterministic double division
            (sum(Fx.units(urgent, 2)) / sum(Fx.units($"o_totalprice", 2))).as("urgent_share"),
            count(lit(1)).as("n_orders"),
          )
          .orderBy($"n_name")
      },
      Some("""
        SELECT n_name,
               SUM(CAST(ROUND(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END * 100) AS BIGINT)) / 100.0 AS urgent_total,
               SUM(CAST(ROUND(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END * 100) AS BIGINT))
                     / SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS urgent_share,
               COUNT(*) AS n_orders
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
      """),
    ),
    // ---------------------------------------------------------------- q12
    // String functions: split/upper/like + group on a derived key.
    Q(
      "q12_part_type_stats",
      (s, d) => {
        import s.implicits._
        T(s, d, "part")
          .filter($"p_name".like("%a%"))
          .groupBy(upper(element_at(split($"p_type", " "), 1)).as("type_head"))
          .agg(
            count(lit(1)).as("n_parts"),
            min($"p_retailprice").as("min_price"),
            max($"p_retailprice").as("max_price"),
          )
          .orderBy($"type_head")
      },
      Some("""
        SELECT UPPER(string_split(p_type, ' ')[1]) AS type_head,
               COUNT(*) AS n_parts,
               MIN(p_retailprice) AS min_price,
               MAX(p_retailprice) AS max_price
        FROM part WHERE p_name LIKE '%a%'
        GROUP BY 1 ORDER BY type_head
      """),
    ),
    // ---------------------------------------------------------------- q13
    // Date extraction aggregates.
    Q(
      "q13_orders_by_month",
      (s, d) => {
        import s.implicits._
        T(s, d, "orders")
          .groupBy(
            year($"o_orderdate").cast("bigint").as("o_year"),
            month($"o_orderdate").cast("bigint").as("o_month"),
          )
          .agg(count(lit(1)).as("n_orders"), Fx.sum2($"o_totalprice").as("total_price"))
          .orderBy($"o_year", $"o_month")
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
        FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month
      """),
    ),
    // ---------------------------------------------------------------- q14
    // HAVING-style post-aggregation filter + broadcast dim join.
    Q(
      "q14_big_suppliers",
      (s, d) => {
        import s.implicits._
        val li = T(s, d, "lineitem")
        val sup = T(s, d, "supplier")
        li.groupBy($"l_suppkey")
          .agg(Fx.sum2($"l_quantity").as("total_qty"), count(lit(1)).as("n_lines"))
          .filter($"total_qty" > 1000)
          .join(broadcast(sup), $"l_suppkey" === sup("s_suppkey"))
          .select($"s_suppkey", $"s_name", $"total_qty", $"n_lines")
          .orderBy($"s_suppkey")
      },
      Some("""
        SELECT s_suppkey, s_name, total_qty, n_lines FROM (
          SELECT l_suppkey,
                 SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS total_qty,
                 COUNT(*) AS n_lines
          FROM lineitem GROUP BY l_suppkey
          HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 > 1000
        ) JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY s_suppkey
      """),
    ),
    // ---------------------------------------------------------------- q17
    // Non-equi RANGE join: orders banded by price against a tiny inline
    // dimension — broadcast nested-loop on a 3-row side, the correct
    // physical shape (the fact side streams, never shuffles).
    Q(
      "q17_price_band_join",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("small", 0.0, 50000.0),
          ("mid", 50000.0, 150000.0),
          ("big", 150000.0, 1e18),
        ).toDF("band", "lo", "hi")
        T(s, d, "orders")
          .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n_orders"), Fx.sum2($"o_totalprice").as("total_price"))
          .orderBy($"band")
      },
      Some("""
        WITH bands(band, lo, hi) AS (VALUES
          ('small', 0.0, 50000.0), ('mid', 50000.0, 150000.0), ('big', 150000.0, 1e18))
        SELECT band, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band ORDER BY band
      """),
    ),
    // ---------------------------------------------------------------- q15
    // Analytic window as a decorrelated scalar subquery: parts priced above
    // their brand average. Computed in integer CENTS so the average
    // comparison and the reported avg derive from identical integers on
    // both engines — float summation order can otherwise flip the last ulp
    // and break hash parity.
    Q(
      "q15_above_brand_avg",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand")
        T(s, d, "part")
          .withColumn("cents", round($"p_retailprice" * 100).cast("bigint"))
          .withColumn("sum_c", sum($"cents").over(w))
          .withColumn("cnt", count(lit(1)).over(w))
          .filter($"cents" * $"cnt" > $"sum_c")
          .select(
            $"p_partkey",
            $"p_brand",
            $"p_retailprice",
            ($"sum_c" / ($"cnt" * lit(100.0))).as("brand_avg"),
          )
          .orderBy($"p_partkey")
      },
      Some("""
        WITH c AS (
          SELECT p_partkey, p_brand, p_retailprice,
                 CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents
          FROM part
        ), a AS (
          SELECT *, SUM(cents) OVER (PARTITION BY p_brand) AS sum_c,
                 COUNT(*) OVER (PARTITION BY p_brand) AS cnt
          FROM c
        )
        SELECT p_partkey, p_brand, p_retailprice,
               sum_c / (cnt * 100.0) AS brand_avg
        FROM a WHERE cents * cnt > sum_c
        ORDER BY p_partkey
      """),
    ),
    // ---------------------------------------------------------------- q16
    // Multi-way join across the full dimension chain (region->nation->
    // customer) exercising join reorder + broadcast on every dim.
    Q(
      "q16_region_order_volume",
      (s, d) => {
        import s.implicits._
        val o = T(s, d, "orders")
        val c = T(s, d, "customer")
        val n = T(s, d, "nation")
        val r = T(s, d, "region")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy($"r_name")
          .agg(
            count(lit(1)).as("n_orders"),
            Fx.sum2($"o_totalprice").as("total_price"),
            countDistinct($"o_custkey").as("n_customers"),
          )
          .orderBy($"r_name")
      },
      Some("""
        SELECT r_name, COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
      """),
    ),
    // ---------------------------------------------------------------- q19
    // PIVOT: order counts by status × priority as wide columns (Spark's
    // RelationalGroupedDataset.pivot with an explicit value list — one
    // pass, no per-column scans). Oracle = portable conditional
    // aggregation of the identical matrix.
    Q(
      "q19_pivot_status_priority",
      (s, d) => {
        import s.implicits._
        T(s, d, "orders")
          .groupBy($"o_orderstatus")
          .pivot("o_orderpriority",
            Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
          .agg(count(lit(1)))
          .select(
            $"o_orderstatus",
            coalesce($"1-URGENT", lit(0L)).as("n_urgent"),
            coalesce($"2-HIGH", lit(0L)).as("n_high"),
            coalesce($"3-MEDIUM", lit(0L)).as("n_medium"),
            coalesce($"4-NOT SPECIFIED", lit(0L)).as("n_notspec"),
            coalesce($"5-LOW", lit(0L)).as("n_low"),
          )
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
               COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
               COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
               COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """),
    ),
    // ---------------------------------------------------------------- q20
    // Quantile sketch accuracy gate: approx_percentile (deterministic
    // given the data) must land within ±2% relative error of the exact
    // in-engine percentile — same pattern as the HLL gate: the sketch a
    // 100 TB percentile query actually uses, accuracy-checked.
    Q(
      "q20_price_quantile_sketch",
      (s, d) => {
        import s.implicits._
        T(s, d, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            expr("approx_percentile(o_totalprice, array(0.5, 0.95), 10000)").as("ap"),
            expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
            expr("percentile(o_totalprice, 0.95)").as("p95_exact"),
          )
          .select(
            $"o_orderstatus",
            (abs(element_at($"ap", 1) - $"p50_exact") <= $"p50_exact" * 0.02).as("p50_within_2pct"),
            (abs(element_at($"ap", 2) - $"p95_exact") <= $"p95_exact" * 0.02).as("p95_within_2pct"),
          )
          .orderBy($"o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, true AS p50_within_2pct, true AS p95_within_2pct
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
      """),
    ),
    // ---------------------------------------------------------------- q22
    // Co-located fact-fact join via bucketed storage (operators/Bucketing):
    // lineitem and orders are mirrored ONCE into external tables bucketed
    // on the orderkey, and the join between the mirrors plans with zero
    // shuffle exchanges (BucketingSpec pins the plan). The oracle is the
    // PLAIN join over the raw parquet — the bucketed layout, like the
    // salted join's salt, must be semantically invisible.
    Q(
      "q22_bucketed_colocated_join",
      (s, d) => {
        import s.implicits._
        val li = graft.operators.Bucketing.bucketedMirror(
          s, d, "lineitem", "l_orderkey",
          Seq("l_orderkey", "l_extendedprice", "l_discount"), buckets = 8)
        val ord = graft.operators.Bucketing.bucketedMirror(
          s, d, "orders", "o_orderkey",
          Seq("o_orderkey", "o_orderpriority"), buckets = 8)
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).as("n_items"),
            countDistinct($"o_orderkey").as("n_orders"),
            Fx.sum2($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
          )
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY o_orderpriority
      """),
    ),
    // Customer revenue deciles: ntile(10) over the per-customer rollup
    // (exact integer cents, deterministic (revenue desc, custkey) order
    // so both engines tile identically), then per-decile census — the
    // whale-curve / segmentation cut. The ntile window runs over the
    // AGGREGATED customer table, never line items.
    Q(
      "q23_revenue_deciles",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val li = T(s, d, "lineitem")
        val o = T(s, d, "orders")
        val perCust = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy($"o_custkey")
          .agg(sum(Fx.units($"l_extendedprice" * (lit(1) - $"l_discount"), 2)).as("rev_c"))
        perCust
          .withColumn("decile",
            ntile(10).over(Window.orderBy($"rev_c".desc, $"o_custkey")).cast("bigint"))
          .groupBy($"decile")
          .agg(count(lit(1)).as("n_customers"),
            (sum($"rev_c") / 100.0).as("revenue"))
          .orderBy($"decile")
      },
      Some("""
        WITH pc AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS rev_c
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_custkey
        ), tiled AS (
          SELECT rev_c, CAST(NTILE(10) OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS decile
          FROM pc
        )
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(rev_c) / 100.0 AS revenue
        FROM tiled GROUP BY 1 ORDER BY decile
      """),
    ),
    // Z-ORDER layout keys (operators/ZOrder): the Morton interleave of
    // (l_partkey, l_suppkey), each lane min/max-normalized to 16 bits by
    // exact integer algebra — the clustering key behind the file-skipping
    // layout (ZOrder.cluster + prunedRead; file-level skip evidence is
    // the q24 shape pin's measured probe). The key is pure closed-form
    // bit algebra, so the oracle replays normalization + magic-mask
    // spreading + interleave bit-exactly in SQL. One min/max agg pass is
    // broadcast back as a 1-row dimension (no driver collect in the
    // lineage): 2 exchanges — the agg's single-partition merge + the
    // output sort.
    Q(
      "q24_zorder_keys",
      (s, d) => {
        val li = T(s, d, "lineitem")
        graft.operators.ZOrder.withZKey(li, Seq("l_partkey", "l_suppkey"), bits = 16)
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderKeysOracle),
    ),
    // Z-ORDER LAYOUT LIFECYCLE (operators/ZOrder append/compact): build
    // the layout on the even-orderkey half, APPEND the odd half through
    // FROZEN lane bounds (derived from the existing manifest — the same
    // frozen-quantizer discipline as the IVF index: re-deriving bounds
    // per batch would re-bucket the world), then COMPACT into a fresh
    // full re-cluster with retrained bounds. The gate reads the
    // compacted layout's STORED keys back and the oracle is the
    // canonical single-shot key algebra over the whole table — i.e.
    // the rebuild contract (cluster half + append half + compact ==
    // one fresh clustering) is what the hash verifies, row for row.
    // Lifecycle shape evidence (skip quality restored post-compact)
    // rides as the q25 shape pin's measured probe. 1 exchange: the
    // output sort over the already-laid-out files.
    Q(
      "q25_zorder_lifecycle",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val root = sys.props("java.io.tmpdir") + "/graft_zlife/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        val lanes = Seq("l_partkey", "l_suppkey")
        if (!new java.io.File(s"$root/_COMPACTED").exists()) {
          // a partial lifecycle without the marker rebuilds from scratch
          // — append is not idempotent
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.cluster(li.filter(col("l_orderkey") % 2 === 0), lanes, nFiles = 8,
            out = s"$root/base")
          ZOrder.append(li.filter(col("l_orderkey") % 2 === 1), lanes,
            out = s"$root/base", nFiles = 2)
          ZOrder.compact(s, s"$root/base", s"$root/compacted", lanes, nFiles = 8)
          new java.io.File(s"$root/_COMPACTED").createNewFile()
        }
        s.read.parquet(s"$root/compacted")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderKeysOracle),
    ),
    // HILBERT curve keys (ZOrder.hilbertKey2): the locality-tighter
    // space-filling curve over the same (l_partkey, l_suppkey) lanes —
    // consecutive Hilbert positions are always grid-adjacent where
    // Morton jumps at quadrant boundaries, so the same box probe
    // touches fewer files at the same file count (the q26 shape pin
    // measures hilbert <= morton on the identical synthetic probe).
    // The key runs the codegen'd graft_hilbert_key2 Catalyst kernel
    // (HilbertKey2Expr — the classic xy2d rotation loop as one tight
    // doGenCode loop; ZOrderSpec pins it equal to the staged CASE-
    // algebra form, which the oracle replays as 16 generated chained
    // CTEs). Same 2-exchange plan as q24.
    Q(
      "q26_hilbert_keys",
      (s, d) => {
        val li = T(s, d, "lineitem")
        graft.operators.ZOrder.withZKey(li, Seq("l_partkey", "l_suppkey"), bits = 16,
            keyCol = "hkey", curve = "hilbert")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("hkey"))
          .orderBy(col("hkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(hilbertKeysOracle),
    ),
    // QUANTILE (equi-depth) z-order lanes (ZOrder.withZKeyQuantile): the
    // skew-robust layout key. The x lane is deliberately skewed —
    // 2^(l_orderkey mod 20) puts 60 % of rows into the bottom two of 256
    // LINEAR buckets, collapsing per-file envelopes; the equi-depth CDF
    // bucketing spreads every value by its rank mass instead, so the
    // same box probe keeps its skip bound (the q27 shape pin measures
    // linear-vs-quantile head to head on the skewed synthetic corpus,
    // plus frozen-boundary append parity). The whole key is exact
    // integer algebra — per-value histogram, ordered cumulative sum
    // (over DISTINCT values only: lane-cardinality-bounded, broadcast
    // back as a bucket dimension), magic-mask Morton spreading — which
    // the oracle replays bit-for-bit.
    Q(
      "q27_zorder_quantile",
      (s, d) => {
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        graft.operators.ZOrder.withZKeyQuantile(skewed, Seq("xv", "yv"), bits = 8,
            keyCol = "qkey")
          .select(col("l_orderkey"), col("l_linenumber"), col("qkey"))
          .orderBy(col("qkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderQuantileOracle),
    ),
    // 3-COLUMN Morton layout keys (ZOrder.interleaveN at N=3): the curve
    // family past 2-D — (l_partkey, l_suppkey, l_quantity) normalized to
    // 8-bit lanes and bit-interleaved, so a conjunctive box on ANY
    // subset of the three columns skips files (the q28 shape pin
    // measures a 3-D box probe on a synthetic 32-file layout). Same
    // 2-exchange plan as q24: one broadcast-back min/max agg + the
    // output sort; the 24-term shift/mask OR-algebra stays one codegen'd
    // projection and the oracle unrolls it verbatim.
    Q(
      "q28_morton3_keys",
      (s, d) => {
        val li = T(s, d, "lineitem")
        graft.operators.ZOrder.withZKey(li, Seq("l_partkey", "l_suppkey", "l_quantity"),
            bits = 8, keyCol = "zkey3")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("zkey3"))
          .orderBy(col("zkey3"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(morton3KeysOracle),
    ),
    // 3-D HILBERT curve keys (ZOrder.withHilbert3Key): Skilling's
    // transpose algorithm over the same 8-bit lanes — the rotation-table
    // generalization of q26's 2-D xy2d loop, so consecutive curve
    // positions stay grid-adjacent in 3-D (ZOrderSpec proves bijectivity
    // + unit-step adjacency on the full 8^3 grid and pins the staged
    // algebra to an independent pure-Scala reference; the q29 shape pin
    // measures hilbert <= morton on the identical 3-D box probe). The
    // gate runs the codegen'd graft_hilbert_key3 kernel (pinned equal
    // to the staged (bits-1)*3 exchange/invert + Gray + trailing-
    // correction projections, which the oracle replays as generated
    // chained CTEs, stage for stage).
    Q(
      "q29_hilbert3_keys",
      (s, d) => {
        val li = T(s, d, "lineitem")
        graft.operators.ZOrder.withZKey(li, Seq("l_partkey", "l_suppkey", "l_quantity"),
            bits = 8, keyCol = "hkey3", curve = "hilbert")
          .select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("hkey3"))
          .orderBy(col("hkey3"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(hilbert3KeysOracle),
    ),
    // QUANTILE lanes × 3-D HILBERT (ZOrder.withZKeyQuantile at N=3,
    // curve=hilbert): the full composition of the layout family's two
    // r17 upgrades — equi-depth CDF bucketing makes every lane
    // skew-robust (the x lane is deliberately skewed: 2^(l_orderkey mod
    // 20) collapses 60 % of rows into the bottom sliver of a LINEAR
    // range), and Skilling's 3-D Hilbert keeps per-file boxes squarer
    // than Morton on the bucketed grid. The key runs the codegen'd
    // graft_hilbert_key3 kernel over three broadcast bucket-map joins;
    // the oracle replays the CDF algebra (per-value histogram → ordered
    // cumulative sum over DISTINCT values) and the staged Skilling
    // transform as generated chained CTEs, bit for bit. The q30 shape
    // pin measures the composition end to end: a skewed one-value probe
    // on a quantile-hilbert3 LAYOUT keeps its skip bound where the
    // linear-hilbert3 layout measurably loses it, plus frozen-boundary
    // append parity through `_zqbounds`.
    Q(
      "q30_hilbert3_quantile",
      (s, d) => {
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"),
          col("l_quantity").cast("bigint").as("wv"))
        graft.operators.ZOrder.withZKeyQuantile(skewed, Seq("xv", "yv", "wv"), bits = 8,
            keyCol = "qh3key", curve = "hilbert")
          .select(col("l_orderkey"), col("l_linenumber"), col("qh3key"))
          .orderBy(col("qh3key"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(hilbert3QuantileOracle),
    ),
    // BLOOM-SIDECAR file skipping (ZOrder.writeBloomSidecar /
    // prunedReadPoint): point predicates on a column the curve does NOT
    // cluster. The layout is z-ordered by (l_partkey, l_suppkey), so
    // every file spans ~the full l_orderkey range and `_zmanifest`
    // min/max envelopes prune NOTHING for an orderkey lookup; the
    // per-(file, column) Bloom sidecar prunes by membership instead
    // (false positives only add files — the residual IN keeps the
    // result row-exact, which is exactly what the oracle hashes).
    // Probe keys are the 5 smallest distinct orderkeys, derived from
    // the data so the gate is scale-factor-agnostic (a bounded
    // 5-value collect, replayed by the oracle's IN-subquery). The q31
    // shape pin measures bloom-vs-envelope head to head: envelopes
    // keep 32/32 files on the unclustered key, the Bloom keeps <=6.
    Q(
      "q31_bloom_skipping",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val root = sys.props("java.io.tmpdir") + "/graft_zbloom/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_BLOOMED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), nFiles = 32,
            out = s"$root/base")
          ZOrder.writeBloomSidecar(s, s"$root/base", Seq("l_orderkey"))
          new java.io.File(s"$root/_BLOOMED").createNewFile()
        }
        val probes = li.select(col("l_orderkey")).distinct()
          .orderBy(col("l_orderkey")).limit(5)
          .collect().map(_.getLong(0)).toSeq
        val (dfp, _) = ZOrder.prunedReadPoint(s, s"$root/base", "l_orderkey", probes)
        dfp.select(col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
            col("l_partkey"), col("l_suppkey"))
          // the synthetic lineitem has duplicate (orderkey, linenumber)
          // pairs — the sort must be total for the hash compare
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      },
      Some(bloomSkippingOracle),
    ),
    // FROZEN-BOUNDARY CLAMP semantics (ZOrder.clusterQuantile +
    // appendQuantile): the quantile layout's append-time contract,
    // hash-pinned END TO END including the clamp for values never seen
    // at cluster time. The CDF trains on the EVEN-orderkey half; the
    // ODD half appends through the frozen `_zqbounds` — and because the
    // skewed lane is 2^(l_orderkey mod 20), every appended xv is a
    // 2^(odd residue) the seed never saw, so each one lands by the
    // clamp rule (largest frozen boundary ≤ v). The gate reads the
    // STORED keys back; the oracle replays the frozen rule uniformly
    // (for seen values it coincides with the CDF bucket — boundaries
    // are per-bucket minima, the CDF is monotone), via a tiny
    // value-level non-equi join. Complements q25 (linear-lane rebuild
    // contract) and q27 (seen-value append parity): this is the
    // UNSEEN-value leg of the lifecycle.
    Q(
      "q32_zquantile_frozen_clamp",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zqclamp/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_APPENDED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
            Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
          ZOrder.appendQuantile(skewed.filter(col("l_orderkey") % 2 === 1),
            Seq("xv", "yv"), out = s"$root/base", nFiles = 2, bits = 8)
          new java.io.File(s"$root/_APPENDED").createNewFile()
        }
        s.read.parquet(s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zquantileFrozenClampOracle),
    ),
    // QUANTILE-LANE LAYOUT LIFECYCLE — q25's rebuild contract proven for
    // the skew-robust path users should actually pick: clusterQuantile
    // on the even-orderkey half (CDF trained there, `_zqbounds` frozen),
    // appendQuantile the odd half through the frozen boundaries (every
    // appended xv is a NEVER-SEEN value exercising the clamp, as in
    // q32), then compactQuantile into a fresh full re-cluster with
    // RETRAINED equi-depth boundaries. The gate reads the compacted
    // layout's STORED keys back and the oracle is the canonical
    // single-shot quantile algebra over the whole table (q27's oracle,
    // verbatim) — i.e. cluster half + frozen append + compact == one
    // fresh quantile clustering, row for row. 1 exchange: the output
    // sort over the already-laid-out files.
    Q(
      "q33_zquantile_lifecycle",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zqlife/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_COMPACTED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
            Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
          ZOrder.appendQuantile(skewed.filter(col("l_orderkey") % 2 === 1),
            Seq("xv", "yv"), out = s"$root/base", nFiles = 2, bits = 8)
          ZOrder.compactQuantile(s, s"$root/base", s"$root/compacted",
            Seq("xv", "yv"), nFiles = 8, bits = 8)
          new java.io.File(s"$root/_COMPACTED").createNewFile()
        }
        s.read.parquet(s"$root/compacted")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey").as("qkey"))
          .orderBy(col("qkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderQuantileOracle),
    ),
    // STREAMING layout ingest — the Delta/Iceberg "stream into an
    // OPTIMIZE'd table" shape as a driver gate: boundaries are trained
    // ONCE at bootstrap (clusterQuantile on the even-orderkey half,
    // `_zqbounds` frozen), then the odd half arrives as a MemoryStream
    // in four deterministic micro-batches, each landing through
    // foreachBatch → appendQuantile. Frozen boundaries make the result
    // BATCH-SIZE-INVARIANT — four micro-batches produce byte-identical
    // keys to q32's one-shot append — so the oracle is q32's frozen-
    // clamp algebra over the full arrival set, verbatim, and the hash
    // proves stream == batch row for row. (ZOrderSpec additionally pins
    // mid-stream skipping row-exactness between batches; the collect
    // feeding MemoryStream is gate fixture plumbing, not engine path.)
    Q(
      "q34_zquantile_stream",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zqstream/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_STREAMED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
            Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
          import s.implicits._
          implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
          val input = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Long, Long, Long)]
          val query = input.toDF()
            .select(col("_1").as("l_orderkey"), col("_2").as("l_linenumber"),
              col("_3").as("xv"), col("_4").as("yv"))
            .writeStream
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                batchId: Long) =>
              // the EXACTLY-ONCE sink — the production foreachBatch entry
              // point (replay-safe via the _zbatches marker + deterministic
              // file names; both crash windows spec-covered in ZOrderSpec)
              ZOrder.appendQuantileOnce(batch, Seq("xv", "yv"), out = s"$root/base",
                batchId = batchId, nFiles = 1, bits = 8)
              ()
            }
            .start()
          try {
            val odd = skewed.filter(col("l_orderkey") % 2 === 1)
              .orderBy(col("l_orderkey"), col("l_linenumber"))
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
            odd.grouped(math.max(1, (odd.length + 3) / 4)).foreach { chunk =>
              input.addData(chunk.toSeq: _*)
              query.processAllAvailable()
            }
          } finally query.stop()
          new java.io.File(s"$root/_STREAMED").createNewFile()
        }
        s.read.parquet(s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zquantileFrozenClampOracle),
    ),
    // ROW-LEVEL DELETE, read-side merge (ZOrder.deleteWhere +
    // readWithDeletes): the Iceberg-v2/Delta-DV shape on vanilla
    // parquet. The whole skewed corpus is quantile-clustered, then
    // every l_orderkey % 5 == 2 row is tombstoned — no data file is
    // rewritten; `_zdeletes` records (file, _metadata.row_index)
    // positions and the read subtracts them with one (file, pos)
    // anti-join. The stored keys were trained on EVERYTHING (deletes
    // happen after clustering), so the oracle replays the full-table
    // CDF algebra and filters only the OUTPUT — the hash pins that the
    // positional anti-join removes exactly the predicate's rows, no
    // more, no fewer, across every file. The q35 shape pin proves the
    // compositions: pruned reads on the tombstoned layout stay
    // row-exact, and the data files are untouched.
    Q(
      "q35_zdelete_read",
      (s, d) => {
        val root = zdeleteFixture(s, d)
        graft.operators.ZOrder.readWithDeletes(s, s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderQuantileOracleSql("", "WHERE l_orderkey % 5 <> 2", "zkey")),
    ),
    // ROW-LEVEL DELETE, applied physically (ZOrder.compactQuantile over
    // a tombstoned layout): compaction reads through the delete merge,
    // so only survivors land in the fresh layout — which carries no
    // sidecar — and the equi-depth CDF RETRAINS on survivors. The
    // oracle is therefore the same quantile algebra with the filter
    // applied BEFORE the histogram (q35's oracle filters after):
    // the q35/q36 hash PAIR pins both delete semantics — merge-at-read
    // preserves stored keys, compaction re-derives them.
    Q(
      "q36_zdelete_compact",
      (s, d) => {
        import graft.operators.ZOrder
        val root = zdeleteFixture(s, d)
        if (!new java.io.File(s"$root/_COMPACTED").exists()) {
          ZOrder.compactQuantile(s, s"$root/base", s"$root/compacted",
            Seq("xv", "yv"), nFiles = 8, bits = 8)
          new java.io.File(s"$root/_COMPACTED").createNewFile()
        }
        s.read.parquet(s"$root/compacted")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zorderQuantileOracleSql("WHERE l_orderkey % 5 <> 2", "", "zkey")),
    ),
    // SNAPSHOT / TIME-TRAVEL read (ZOrder.readAsOfBatch): the layout's
    // commit history IS its `_zbatches` marker dir, so "the table as of
    // batch N" is a pure file selection — no log replay. The fixture
    // clusters the even half and lands the odd half as FOUR
    // appendQuantileOnce batches in a deterministic total order; the
    // gate reads as-of batch 1 (seed + first two batches) while
    // batches 2 and 3 sit committed in the same dir. The oracle
    // replays the frozen-clamp algebra over exactly that arrival
    // prefix (ROW_NUMBER over the same total order), so the hash pins
    // snapshot selection both ways: everything ≤ the snapshot, nothing
    // after it. The q37 shape pin adds the crashed-publish story:
    // an unmarked batch is invisible to every snapshot and vacuum
    // reconciles the dir view without touching committed bytes.
    Q(
      "q37_zquantile_asof",
      (s, d) => {
        val root = zasofFixture(s, d)
        graft.operators.ZOrder.readAsOfBatch(s, s"$root/base", 1L)
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zquantileAsOfOracle),
    ),
    // MERGE / UPSERT, merge-on-read (ZOrder.mergeInto): the Delta
    // MERGE / Iceberg upsert shape on the layout's own primitives —
    // updated rows append through the frozen `_zqbounds` EXACTLY-ONCE
    // (appendQuantileOnce, marker-committed), then the old versions
    // tombstone by a distributed (l_orderkey, l_linenumber) semi-join
    // with the new batch's files excluded by name, so the whole merge
    // is replay-idempotent (append short-circuits, re-tombstoning a
    // dead row is a no-op at read). No data file is rewritten. The
    // oracle replays the merged multiset (base minus matched ∪
    // updated) through the frozen-boundary rule trained on the
    // original table — survivors must keep their stored keys, updates
    // must key exactly as a frozen append would. The q38 shape pin
    // measures replay idempotence end to end, crash window included.
    Q(
      "q38_zmerge_upsert",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zmerge/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_MERGED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
            nFiles = 8, out = s"$root/base", bits = 8)
          val source = skewed.filter(col("l_orderkey") % 7 === 1)
            .withColumn("yv", col("yv") + 7)
            .select(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
          ZOrder.mergeInto(s, s"$root/base", source,
            keys = Seq("l_orderkey", "l_linenumber"), cols = Seq("xv", "yv"),
            batchId = 0L, nFiles = 2, bits = 8)
          new java.io.File(s"$root/_MERGED").createNewFile()
        }
        ZOrder.readWithDeletes(s, s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zmergeUpsertOracle),
    ),
    // ANALYZE / table statistics (ZOrder.analyzeLayout): the CBO-food
    // face — one map-side-combined agg pass over the LIVE table
    // (tombstones subtracted: the fixture is q35's deleted layout, so
    // the stats MUST describe survivors, not raw files) computes
    // per-column rows / nulls / HLL++ NDV into a `_zstats` sidecar.
    // Exact NDV per column would add an Expand + full shuffle each at
    // 100 TB; the sketch rides at rsd 0.02 and the gate checks it the
    // ev_hll_users way: the Spark side emits the EXACT distinct count
    // plus a ±5% containment boolean for the sketch, the oracle emits
    // the exact count and `true` — so the hash pins live-row/null
    // exactness and the sketch's error bound at once.
    Q(
      "q40_zanalyze",
      (s, d) => {
        import graft.operators.ZOrder
        val root = zdeleteFixture(s, d)
        val statCols = Seq("l_orderkey", "l_linenumber", "xv", "yv")
        val stats = ZOrder.analyzeLayout(s, s"$root/base", statCols)
        val live = ZOrder.readWithDeletes(s, s"$root/base")
        val exact = live.agg(
          countDistinct(col(statCols.head)).as(s"__ex_${statCols.head}"),
          statCols.tail.map(c => countDistinct(col(c)).as(s"__ex_$c")): _*).head()
        val ex = statCols.map(c => (c, exact.getAs[Long](s"__ex_$c"))).toMap
        import s.implicits._
        val exactDf = ex.toSeq.toDF("col_name", "n_distinct")
        stats.join(exactDf, "col_name")
          .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
            (abs(col("ndv") - col("n_distinct")) <= col("n_distinct") * 0.05)
              .as("ndv_within_5pct"))
          .orderBy(col("col_name"))
      },
      Some("""
        WITH live AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem WHERE l_orderkey % 5 <> 2
        )
        SELECT 'l_linenumber' AS col_name, COUNT(*) AS n_rows,
               COUNT(*) - COUNT(l_linenumber) AS n_nulls,
               COUNT(DISTINCT l_linenumber) AS n_distinct, true AS ndv_within_5pct
        FROM live
        UNION ALL
        SELECT 'l_orderkey', COUNT(*), COUNT(*) - COUNT(l_orderkey),
               COUNT(DISTINCT l_orderkey), true FROM live
        UNION ALL
        SELECT 'xv', COUNT(*), COUNT(*) - COUNT(xv),
               COUNT(DISTINCT xv), true FROM live
        UNION ALL
        SELECT 'yv', COUNT(*), COUNT(*) - COUNT(yv),
               COUNT(DISTINCT yv), true FROM live
        ORDER BY col_name
      """),
    ),
    // DELETE-AWARE TIME TRAVEL (ZOrder.readAsOfBatch applyDeletes):
    // tombstones are version-stamped with the max committed batch at
    // delete time, so a snapshot read can include exactly the row
    // deletions that belong to that version's lineage. The fixture
    // interleaves commits and deletes — cluster the even half, commit
    // the odd half's first arrival batch, DELETE l_orderkey % 9 == 4
    // (stamped version 0), commit batch 1, DELETE % 9 == 7 (stamped
    // version 1) — and the gate reads as-of version 0 with deletes:
    // seed + batch 0, minus ONLY the version-0 tombstones. The later
    // batch, its files, and the version-1 tombstones must all be
    // invisible; the stored keys are untouched by deletion — so the
    // oracle is q37's arrival-prefix algebra (prefix = one of two
    // batches) with the version-0 predicate filtering only the output.
    Q(
      "q39_zasof_deletes",
      (s, d) => {
        import graft.operators.ZOrder
        import s.implicits._
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zasofdel/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_BUILT").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
            Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
          val odd = skewed.filter(col("l_orderkey") % 2 === 1)
            .orderBy(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          val chunk = math.max(1, (odd.length + 1) / 2)
          odd.grouped(chunk).zipWithIndex.foreach { case (rows, i) =>
            ZOrder.appendQuantileOnce(
              rows.toSeq.toDF("l_orderkey", "l_linenumber", "xv", "yv"),
              Seq("xv", "yv"), out = s"$root/base", batchId = i.toLong,
              nFiles = 1, bits = 8)
            // a delete lands on top of each committed version: stamped
            // with the version it was issued against (i)
            ZOrder.deleteWhere(s, s"$root/base",
              col("l_orderkey") % 9 === (if (i == 0) 4 else 7))
          }
          new java.io.File(s"$root/_BUILT").createNewFile()
        }
        ZOrder.readAsOfBatch(s, s"$root/base", 0L, applyDeletes = true)
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zquantileAsOfOracleSql("(((SELECT c FROM oddn) + 1) // 2)",
        "WHERE l_orderkey % 9 <> 4")),
    ),
    // COMMITTED IN-PLACE COMPACTION (ZOrder.compactQuantileCommitted):
    // compaction as just another commit in the `_zbatches` lineage —
    // survivors (tombstones applied physically) re-cluster through a
    // RETRAINED CDF and publish exactly-once under the compaction's own
    // batch id + `.compact` tag; nothing is deleted, so a live table
    // compacts under concurrent readers and every pre-compaction
    // snapshot keeps resolving. The gate reads the CURRENT committed
    // view (compacted survivors + a post-compaction batch keyed through
    // the retrained boundaries); the hash pins that (a) base and batch-0
    // files are folded — double-reads would double every row — and
    // (b) the boundaries really retrained on survivors (seed ∪ prefix
    // minus deletes), not on the original seed.
    Q(
      "q41_zcompact_commit",
      (s, d) => {
        val root = zcompactFixture(s, d, "graft_zcompact", expire = false)
        graft.operators.ZOrder.readCommitted(s, s"$root/base", applyDeletes = true)
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zcompactCommittedOracle),
    ),
    // TIME TRAVEL ACROSS COMPACTION: the same compacted table read
    // as-of version 0 (pre-compaction, deletes applied) must reproduce
    // the OLD lineage byte-for-byte — original seed-trained keys, batch
    // 0 only, version-0 tombstones — exactly q39's oracle. The q41/q42
    // hash pair is the round's headline claim: compaction is a commit,
    // history survives it.
    Q(
      "q42_zcompact_asof",
      (s, d) => {
        val root = zcompactFixture(s, d, "graft_zcompact", expire = false)
        graft.operators.ZOrder.readAsOfBatch(s, s"$root/base", 0L, applyDeletes = true)
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zquantileAsOfOracleSql("(((SELECT c FROM oddn) + 1) // 2)",
        "WHERE l_orderkey % 9 <> 4")),
    ),
    // SNAPSHOT RETENTION (ZOrder.expireSnapshots): the lineage a
    // committed compaction folded — base files, pre-compaction batches,
    // their markers and dead tombstones — is physically dropped and the
    // expiry floor recorded; committed CURRENT reads must be
    // byte-identical across the expiry (same oracle as q41, now served
    // from a dir that no longer contains the folded files; expired
    // as-of reads fail loud by version — spec-pinned).
    Q(
      "q43_zexpire_read",
      (s, d) => {
        val root = zcompactFixture(s, d, "graft_zexpire", expire = true)
        graft.operators.ZOrder.readCommitted(s, s"$root/base", applyDeletes = true)
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zcompactCommittedOracle),
    ),
    // SQL SURFACE, DELETE twin (ZLayoutSqlRule + GraftDeleteCommand):
    // q35's delete semantics driven ENTIRELY through SQL — `DELETE FROM
    // zlayout.`path` WHERE …` lowers through Spark's own DeleteFromTable
    // parse to positional tombstones, and the readback is a plain
    // `SELECT … FROM zlayout.`path`` (the committed live view, deletes
    // subtracted). Same oracle as q35 — the twin-gate pattern pins that
    // the SQL entry points and the Scala API are the same operation.
    Q(
      "q44_zdelete_sql",
      (s, d) => {
        val root = zdeleteSqlFixture(s, d)
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey FROM zlayout.`$root/base`
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zorderQuantileOracleSql("", "WHERE l_orderkey % 5 <> 2", "zkey")),
    ),
    // SQL SURFACE, MERGE twin (GraftMergeCommand): q38's upsert driven
    // through Spark's own MERGE INTO grammar — `USING <view> ON t.k =
    // s.k … UPDATE SET * / INSERT *` lowers to the replay-idempotent
    // tombstone+append merge, with clustering parameters recovered from
    // the layout's `_zmeta` and the next batch id derived from the
    // commit history. Same oracle as q38.
    Q(
      "q45_zmerge_sql",
      (s, d) => {
        val root = zmergeSqlFixture(s, d)
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey FROM zlayout.`$root/base`
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zmergeUpsertOracle),
    ),
    // SQL SURFACE, TIME-TRAVEL twin: q37's snapshot read as `SELECT …
    // FROM zlayout.`path` VERSION AS OF 1` — the commit ids ARE the
    // version space, resolved by the same snapshot rule (committed
    // batches ≤ 1, crashed publishes invisible). Same oracle and the
    // SAME fixture as q37, so the hash pins SQL == Scala read for read.
    Q(
      "q46_zasof_sql",
      (s, d) => {
        val root = zasofFixture(s, d)
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey
              FROM zlayout.`$root/base` VERSION AS OF 1
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zquantileAsOfOracle),
    ),
    // STREAMING MERGE — the CDC-ingest shape (a stream of upserts into
    // a clustered table) as a driver gate: the update set arrives as a
    // MemoryStream in two micro-batches through foreachBatch →
    // mergeInto, with the query STOPPED and RESTARTED from its
    // checkpoint between them (the production handover; batch ids
    // continue, any uncommitted batch replays, and mergeInto is
    // replay-idempotent by construction — append short-circuits on its
    // marker, re-tombstoning a dead row is a read-side no-op). The
    // update stream is KEYED — one row per (l_orderkey, l_linenumber),
    // the CDC contract (the base table carries genuine duplicate keys,
    // so the gate pins that an upsert replaces ALL old copies of a
    // matched key with exactly one new version; an UNkeyed stream
    // would make the result depend on where the batch split fell —
    // a later batch legitimately supersedes an earlier batch's same-key
    // row, which is upsert semantics, not a bug, but it isn't
    // batch-split-invariant and so can't be one-shot-oracled). With
    // unique keys the final state IS batch-split-invariant: base minus
    // all matched copies ∪ one update per key through the frozen
    // boundaries — the q38 skeleton with a keyed update set.
    Q(
      "q47_zmerge_stream",
      (s, d) => {
        import graft.operators.ZOrder
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zmergestream/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_STREAMED").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
            nFiles = 8, out = s"$root/base", bits = 8)
          import s.implicits._
          implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
          val input = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Long, Long, Long)]
          val ckpt = s"$root/_ckpt"
          def start() = input.toDF()
            .select(col("_1").as("l_orderkey"), col("_2").as("l_linenumber"),
              col("_3").as("xv"), col("_4").as("yv"))
            .writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                batchId: Long) =>
              ZOrder.mergeInto(s, s"$root/base", batch,
                keys = Seq("l_orderkey", "l_linenumber"), cols = Seq("xv", "yv"),
                batchId = batchId, nFiles = 1, bits = 8)
              ()
            }
            .start()
          val updates = skewed.filter(col("l_orderkey") % 7 === 1)
            .groupBy(col("l_orderkey"), col("l_linenumber"))
            .agg(max(col("xv")).as("xv"), (max(col("yv")) + 7).as("yv"))
            .orderBy(col("l_orderkey"), col("l_linenumber"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          val halves = updates.grouped(math.max(1, (updates.length + 1) / 2)).toSeq
          val q1 = start()
          try {
            input.addData(halves.head.toSeq: _*)
            q1.processAllAvailable()
          } finally q1.stop()
          // checkpoint RESTART: a fresh query resumes the batch sequence
          val q2 = start()
          try {
            halves.drop(1).foreach { chunk =>
              input.addData(chunk.toSeq: _*)
              q2.processAllAvailable()
            }
          } finally q2.stop()
          new java.io.File(s"$root/_STREAMED").createNewFile()
        }
        ZOrder.readWithDeletes(s, s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
          .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some(zmergeStreamOracle),
    ),
    // SQL SURFACE, INSERT twin: q37's four-batch arrival history driven
    // through `INSERT INTO zlayout.`path` <query>` — each INSERT is one
    // exactly-once committed batch at the next id (frozen-boundary
    // keying, marker-atomic), so the SQL-built table's VERSION AS OF 1
    // must reproduce q37's exact hash: same arrival prefix, same
    // snapshot selection, built entirely from SQL statements.
    Q(
      "q48_zinsert_sql",
      (s, d) => {
        import graft.operators.ZOrder
        import s.implicits._
        val li = T(s, d, "lineitem")
        val skewed = li.select(
          col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
          col("l_suppkey").cast("bigint").as("yv"))
        val root = sys.props("java.io.tmpdir") + "/graft_zinssql/" +
          d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          graft.similarity.Ann.inputFingerprint(li)
        if (!new java.io.File(s"$root/_BUILT").exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(root))
          ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
            Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
          val odd = skewed.filter(col("l_orderkey") % 2 === 1)
            .orderBy(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          val chunk = math.max(1, (odd.length + 3) / 4)
          odd.grouped(chunk).foreach { rows =>
            rows.toSeq.toDF("l_orderkey", "l_linenumber", "xv", "yv")
              .createOrReplaceTempView("graft_zins_batch")
            s.sql(s"INSERT INTO zlayout.`$root/base` SELECT * FROM graft_zins_batch")
          }
          new java.io.File(s"$root/_BUILT").createNewFile()
        }
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey
              FROM zlayout.`$root/base` VERSION AS OF 1
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zquantileAsOfOracle),
    ),
    // SQL SURFACE, UPDATE (GraftUpdateCommand → ZOrder.updateWhere, new
    // in r20 — the one SQL verb the r19 surface left falling through to
    // Spark's default v1 failure): `UPDATE zlayout.`path` SET yv = yv +
    // 100 WHERE l_orderkey % 5 = 2` lowers to the version-atomic
    // tombstone+append update — new versions of the matched rows re-key
    // through the FROZEN quantile boundaries as one exactly-once batch,
    // old versions tombstone with the batch's own id. The oracle is the
    // q38/q45 frozen-rule skeleton with the update set derived from the
    // table itself: unmatched rows keep their trained-CDF keys (the
    // frozen rule coincides on seen values), updated rows key by the
    // frozen clamp rule over yv+100.
    Q(
      "q49_zupdate_sql",
      (s, d) => {
        val root = zupdateSqlFixture(s, d)
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey FROM zlayout.`$root/base`
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zupdateOracle),
    ),
    // NAMED-CATALOG SQL (r20, verdict gap #2): the whole lifecycle by
    // TABLE NAME, no physical path anywhere — `CREATE TABLE
    // zlayout.<name> TBLPROPERTIES('cols'='xv,yv') AS SELECT` bootstraps
    // a quantile layout under the zlayout warehouse (clustering
    // parameters as table properties, persisted in `_zmeta`), `INSERT
    // INTO zlayout.<name>` commits the odd half as an exactly-once batch
    // through the frozen boundaries, and the readback is a plain
    // name-addressed SELECT. Oracle: the q37 frozen-clamp skeleton with
    // the FULL odd set appended (seed-trained CDF, frozen keying over
    // everything).
    Q(
      "q50_zcatalog_sql",
      (s, d) => {
        val name = zcatalogSqlFixture(s, d)
        s.sql(
          s"""SELECT l_orderkey, l_linenumber, zkey FROM zlayout.$name
              ORDER BY zkey, l_orderkey, l_linenumber""")
      },
      Some(zquantileAsOfOracleSql("(SELECT c FROM oddn)", "")),
    ),
    // ANALYZE→PLANNER BRIDGE (r20, verdict #8): the layout keeps 100%
    // of its file bytes after tombstoning 90% of its rows, so Spark's
    // blind scan estimate overstates the join side 10× until
    // compaction. The fixture deletes all but l_orderkey % 10 = 3,
    // runs ANALYZE (which now persists the live row/byte snapshot
    // beside the column stats), and the injected ZStatsRule stamps
    // those LIVE numbers onto the committed scan. The 2-exchange pin
    // guards the stats-injected plan's broadcast shape; the FLIP
    // itself (broadcast with stats, sort-merge without, identical
    // rows) is pinned by the zstats_flip_* bench probes at an explicit
    // between-live-and-raw threshold and by ZStatsSpec, staleness
    // guard included. The hash gates output identity THROUGH the
    // stats-injected plan: join the live rows back to lineitem and
    // aggregate — DuckDB reproduces it from the delete predicate alone.
    Q(
      "q51_zstats_join",
      (s, d) => {
        val root = zstatsFixture(s, d)
        // join ORDERS (o_orderkey is unique in the testdata; lineitem's
        // (l_orderkey, l_linenumber) is NOT — the q47 duplicate-key
        // lesson), so each live layout row matches exactly one order
        // and the aggregate is fan-out-free. Measures are exact-integer
        // (count + bigint sum) — no float-summation knife edge.
        val live = graft.operators.ZOrder
          .readCommitted(s, s"$root/base", applyDeletes = true)
          .select(col("l_orderkey"), col("l_linenumber"))
        live.join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("sum_ln"))
          .orderBy(col("o_orderstatus"))
      },
      Some(
        """SELECT o_orderstatus, COUNT(*) AS n,
                  CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sum_ln
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_orderkey % 10 = 3
           GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    ),
    // SCHEMA WIDEN (r20, the widen half of verdict gap #4 — r20's base
    // contract refused every mismatch; this adds the ONE sanctioned
    // evolution): the even half bootstraps the table WITHOUT qv, the
    // odd half appends WITH qv under `allowWiden = true` — a committed
    // widen whose `_zschema` record lands atomically with the batch
    // marker. The committed read serves the UNION schema: pre-widen
    // files null-fill qv at read time (no file rewrites), the widened
    // batch carries its values. The oracle derives the same union from
    // lineitem alone (CASE on the batch parity), so the hash pins
    // null-fill exactness row by row across both file generations.
    Q(
      "q52_zschema_widen",
      (s, d) => {
        val root = zwidenFixture(s, d)
        graft.operators.ZOrder.readCommitted(s, s"$root/base")
          .select(col("l_orderkey"), col("l_linenumber"), col("qv"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("qv").asc_nulls_first)
      },
      Some(
        """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                  CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END AS qv
           FROM lineitem
           ORDER BY l_orderkey, l_linenumber, qv NULLS FIRST"""),
    ),
  )

  /** Fixture of the q50 named-catalog gate: warehouse-addressed CTAS of
    * the even half + one INSERT of the whole odd half, all by name.
    */
  private def zcatalogSqlFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val name = "t_" + d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    val wh = sys.props("java.io.tmpdir") + "/graft_zwh"
    s.conf.set("spark.graft.zlayout.warehouse", wh)
    if (!new java.io.File(s"$wh/$name/_BUILT").exists()) {
      s.sql(s"DROP TABLE IF EXISTS zlayout.$name")
      li.select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
        col("l_suppkey").cast("bigint").as("yv"))
        .createOrReplaceTempView("graft_zcat_src")
      s.sql(
        s"""CREATE TABLE zlayout.$name
            TBLPROPERTIES('cols'='xv,yv', 'nfiles'='8', 'bits'='8')
            AS SELECT * FROM graft_zcat_src WHERE l_orderkey % 2 = 0""")
      s.sql(
        s"INSERT INTO zlayout.$name SELECT * FROM graft_zcat_src WHERE l_orderkey % 2 = 1")
      new java.io.File(s"$wh/$name/_BUILT").createNewFile()
    }
    name
  }

  /** Shared fixture of the q37/q46 time-travel gates: cluster the even
    * half, land the odd half as FOUR appendQuantileOnce batches over a
    * deterministic total order (every column a sort key, so the prefix
    * multiset is engine-independent across duplicate rows). Built once
    * per (dir, input fingerprint).
    */
  private def zasofFixture(s: SparkSession, d: String): String = {
    import graft.operators.ZOrder
    import s.implicits._
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zqasof/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_ASOF").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
        Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
      val odd = skewed.filter(col("l_orderkey") % 2 === 1)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val chunk = math.max(1, (odd.length + 3) / 4)
      odd.grouped(chunk).zipWithIndex.foreach { case (rows, i) =>
        ZOrder.appendQuantileOnce(
          rows.toSeq.toDF("l_orderkey", "l_linenumber", "xv", "yv"),
          Seq("xv", "yv"), out = s"$root/base", batchId = i.toLong,
          nFiles = 1, bits = 8)
      }
      new java.io.File(s"$root/_ASOF").createNewFile()
    }
    root
  }

  /** Shared fixture of the q41/q42/q43 compaction gates: cluster the
    * even half, commit the odd half's first arrival batch (total-order
    * prefix, the q37 discipline), DELETE l_orderkey % 9 == 4 (stamped
    * version 0), compact COMMITTED in place as batch 1 (retrained CDF,
    * tombstones applied physically, old lineage untouched), then commit
    * the odd suffix as batch 2 through the retrained boundaries. With
    * `expire = true` the folded lineage is then physically dropped
    * (q43). Built once per (dir, input fingerprint).
    */
  private def zcompactFixture(
      s: SparkSession, d: String, dirName: String, expire: Boolean): String = {
    import graft.operators.ZOrder
    import s.implicits._
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + s"/$dirName/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_BUILT").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      ZOrder.clusterQuantile(skewed.filter(col("l_orderkey") % 2 === 0),
        Seq("xv", "yv"), nFiles = 8, out = s"$root/base", bits = 8)
      val odd = skewed.filter(col("l_orderkey") % 2 === 1)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val chunk = math.max(1, (odd.length + 1) / 2)
      val halves = odd.grouped(chunk).toSeq
      ZOrder.appendQuantileOnce(
        halves.head.toSeq.toDF("l_orderkey", "l_linenumber", "xv", "yv"),
        Seq("xv", "yv"), out = s"$root/base", batchId = 0L, nFiles = 1, bits = 8)
      ZOrder.deleteWhere(s, s"$root/base", col("l_orderkey") % 9 === 4)
      ZOrder.compactQuantileCommitted(s, s"$root/base", Seq("xv", "yv"),
        nFiles = 4, batchId = 1L, bits = 8)
      ZOrder.appendQuantileOnce(
        halves(1).toSeq.toDF("l_orderkey", "l_linenumber", "xv", "yv"),
        Seq("xv", "yv"), out = s"$root/base", batchId = 2L, nFiles = 1, bits = 8)
      if (expire) ZOrder.expireSnapshots(s, s"$root/base")
      new java.io.File(s"$root/_BUILT").createNewFile()
    }
    root
  }

  /** Fixture of the q44 SQL-delete twin: the q35 shape (whole skewed
    * corpus quantile-clustered, every l_orderkey % 5 == 2 row deleted)
    * with the delete issued through the SQL surface.
    */
  private def zdeleteSqlFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zdelsql/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_DELETED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      s.sql(s"DELETE FROM zlayout.`$root/base` WHERE l_orderkey % 5 = 2")
      new java.io.File(s"$root/_DELETED").createNewFile()
    }
    root
  }

  /** Fixture of the q49 SQL-update gate: the whole skewed corpus
    * quantile-clustered, then every l_orderkey % 5 == 2 row's yv shifted
    * by +100 through the SQL UPDATE surface (tombstone+append at batch
    * 0, new versions re-keyed through the frozen boundaries).
    */
  private def zupdateSqlFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zupdsql/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_UPDATED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      s.sql(s"UPDATE zlayout.`$root/base` SET yv = yv + 100 WHERE l_orderkey % 5 = 2")
      new java.io.File(s"$root/_UPDATED").createNewFile()
    }
    root
  }

  /** The q49 oracle: the [[zmergeUpsertOracle]] frozen-rule skeleton
    * with the "merged" set derived from the table itself — rows
    * l_orderkey % 5 <> 2 unchanged, matched rows with yv+100 — all keyed
    * by the frozen clamp rule over boundaries trained on the ORIGINAL
    * full corpus (for seen values the rule coincides with the stored
    * trained keys, so one uniform rule covers both halves).
    */
  // lazy: defined below the `all` Seq that captures it — a plain val
  // would still be null when `all` initializes (r20's verify NPE)
  private lazy val zupdateOracle: String = {
    def cdf(h: String) =
      s"SELECT v, CAST(((SUM(cnt) OVER (ORDER BY v) - cnt) * 256) // (SELECT n FROM nn) AS BIGINT) AS b FROM $h"
    def frozen(vals: String, bnd: String) =
      s"SELECT $vals.v, COALESCE(MAX($bnd.b), 0) AS b FROM $vals " +
        s"LEFT JOIN $bnd ON $bnd.mn <= $vals.v GROUP BY $vals.v"
    s"""
        WITH base AS (
          SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 (CAST(1 AS BIGINT) << CAST(l_orderkey % 20 AS INT)) AS xv,
                 CAST(l_suppkey AS BIGINT) AS yv
          FROM lineitem
        ),
        merged AS (
          SELECT l_orderkey, l_linenumber, xv, yv FROM base WHERE l_orderkey % 5 <> 2
          UNION ALL
          SELECT l_orderkey, l_linenumber, xv, yv + 100 AS yv FROM base
          WHERE l_orderkey % 5 = 2
        ),
        nn AS (SELECT COUNT(*) AS n FROM base),
        hx AS (SELECT xv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cx AS (${cdf("hx")}),
        hy AS (SELECT yv AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        cy AS (${cdf("hy")}),
        bndx AS (SELECT b, MIN(v) AS mn FROM cx GROUP BY b),
        bndy AS (SELECT b, MIN(v) AS mn FROM cy GROUP BY b),
        valx AS (SELECT DISTINCT xv AS v FROM merged),
        valy AS (SELECT DISTINCT yv AS v FROM merged),
        fx AS (${frozen("valx", "bndx")}),
        fy AS (${frozen("valy", "bndy")}),
        lanes AS (
          SELECT merged.l_orderkey, merged.l_linenumber, fx.b AS a, fy.b AS b
          FROM merged JOIN fx ON merged.xv = fx.v JOIN fy ON merged.yv = fy.v
        ), s1 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
          FROM lanes
        ), s2 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
          FROM s1
        ), s3 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
          FROM s2
        ), s4 AS (
          SELECT l_orderkey, l_linenumber,
                 ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
          FROM s3
        )
        SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS zkey
        FROM s4
        ORDER BY zkey, l_orderkey, l_linenumber
      """
  }

  /** Fixture of the q45 SQL-merge twin: the q38 shape (whole skewed
    * corpus clustered, every l_orderkey % 7 == 1 row upserted with yv
    * shifted by +7) with the merge issued through Spark's own MERGE
    * INTO grammar against a temp view of the update set.
    */
  private def zmergeSqlFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zmergesql/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_MERGED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      skewed.filter(col("l_orderkey") % 7 === 1)
        .withColumn("yv", col("yv") + 7)
        .select(col("l_orderkey"), col("l_linenumber"), col("xv"), col("yv"))
        .createOrReplaceTempView("graft_zmerge_sql_src")
      s.sql(
        s"""MERGE INTO zlayout.`$root/base` AS t
            USING graft_zmerge_sql_src AS s
            ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""")
      new java.io.File(s"$root/_MERGED").createNewFile()
    }
    root
  }

  /** Shared fixture of the q35/q36 delete gates: the q27 skewed corpus
    * quantile-clustered WHOLE (CDF trained on every row), then every
    * l_orderkey % 5 == 2 row tombstoned through [[graft.operators
    * .ZOrder.deleteWhere]] — built once per (dir, input fingerprint),
    * like the other layout fixtures.
    */
  /** Fixture of the q51 stats-bridge gate: the zdelete skeleton with a
    * 90% delete and an ANALYZE on top, so the committed read carries a
    * FRESH `_zstats` snapshot (nothing mutates the layout after the
    * marker lands — the fingerprint stays valid across bench reps).
    */
  private def zstatsFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zstatsjoin/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_ANALYZED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      graft.operators.ZOrder.deleteWhere(s, s"$root/base",
        col("l_orderkey") % 10 =!= 3)
      graft.operators.ZOrder.analyzeLayout(s, s"$root/base", Seq("xv", "yv"))
      graft.plans.ZStatsRule.invalidateCache()
      new java.io.File(s"$root/_ANALYZED").createNewFile()
    }
    root
  }

  /** Fixture of the q52 widen gate: evens bootstrap the narrow table,
    * odds land as ONE committed widen batch carrying `qv = l_quantity`.
    */
  private def zwidenFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    def shaped(extra: Boolean) = {
      val base = li.select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
        col("l_suppkey").cast("bigint").as("yv"))
      if (!extra) base.filter(col("l_orderkey") % 2 === 0)
      else li.select(
        col("l_orderkey"),
        col("l_linenumber").cast("bigint").as("l_linenumber"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
        col("l_suppkey").cast("bigint").as("yv"),
        col("l_quantity").as("qv")).filter(col("l_orderkey") % 2 === 1)
    }
    val root = sys.props("java.io.tmpdir") + "/graft_zwiden/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_WIDENED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(shaped(extra = false), Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      graft.operators.ZOrder.appendQuantileOnce(shaped(extra = true), Seq("xv", "yv"),
        out = s"$root/base", batchId = 0, nFiles = 4, bits = 8, allowWiden = true)
      new java.io.File(s"$root/_WIDENED").createNewFile()
    }
    root
  }

  private def zdeleteFixture(s: SparkSession, d: String): String = {
    val li = T(s, d, "lineitem")
    val skewed = li.select(
      col("l_orderkey"),
      col("l_linenumber").cast("bigint").as("l_linenumber"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(l_orderkey % 20 AS INT))").as("xv"),
      col("l_suppkey").cast("bigint").as("yv"))
    val root = sys.props("java.io.tmpdir") + "/graft_zdelete/" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      graft.similarity.Ann.inputFingerprint(li)
    if (!new java.io.File(s"$root/_DELETED").exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(root))
      graft.operators.ZOrder.clusterQuantile(skewed, Seq("xv", "yv"),
        nFiles = 8, out = s"$root/base", bits = 8)
      graft.operators.ZOrder.deleteWhere(s, s"$root/base",
        col("l_orderkey") % 5 === 2)
      new java.io.File(s"$root/_DELETED").createNewFile()
    }
    root
  }
}
