package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup sketches. The SQL
  * higher-order-function formulations (aggregate/transform lambdas) are
  * interpreted per (seed, token) — ~16M string hashes per corpus pass.
  * These kernels hash each token's bytes ONCE, then derive the per-seed
  * hash family with a cheap 64-bit finalizer (splitmix64 over
  * tokenHash ⊕ seed·φ), which is the standard one-permutation-style
  * construction: deterministic, uniform, and independent enough across
  * seeds for MinHash/SimHash purposes.
  */
object Sketches {

  private final val Golden = -7046029254386353131L // 2^64 / φ

  /** 64-bit polynomial base hash of a token's UTF-8 bytes. */
  def tokenHash(bytes: Array[Byte]): Long = {
    var h = 1469598103934665603L // FNV offset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L // FNV prime
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — the per-seed hash family member. */
  def mix(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  def minhash(tokens: ArrayData, numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val th = tokenHash(tokens.getUTF8String(i).getBytes)
        var s = 0
        while (s < numHashes) {
          val v = mix(th ^ (s * Golden))
          if (v < sig(s)) sig(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = mix(tokenHash(tokens.getUTF8String(i).getBytes))
        var j = 0
        while (j < 64) {
          counts(j) += (((h >>> j) & 1L).toInt << 1) - 1 // +1 or -1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Multiplicity of the most frequent term in a token array (see
    * [[MaxTermCount]]): 0 for empty input, null slots skipped. One pass,
    * one open-addressing-free HashMap keyed on the array's UTF8String
    * slices (no copies — UTF8String hashes/compares its bytes in place).
    */
  def maxTermCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = counts.merge(arr.getUTF8String(i), Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
        if (c > best) best = c.intValue()
      }
      i += 1
    }
    best
  }

  /** Multiplicity of the most frequent ADJACENT PAIR (word bigram) in a
    * token array (see [[MaxPairCount]]): 0 when fewer than two non-null
    * tokens ever sit adjacent. Tokens are interned to dense ids first,
    * then pairs count as packed longs — no per-pair string
    * concatenation, no interpreted lambda (the `transform(sequence…)`
    * HOF this replaces is CodegenFallback and dominated the repetition
    * query's runtime). Pairs with a null side are skipped.
    */
  def maxPairCount(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n < 2) return 0
    val ids = new java.util.HashMap[UTF8String, Integer](n * 2)
    val idOf = new Array[Int](n)
    var next = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) idOf(i) = -1
      else {
        val t = arr.getUTF8String(i)
        var id = ids.get(t)
        if (id == null) { id = Integer.valueOf(next); ids.put(t, id); next += 1 }
        idOf(i) = id.intValue()
      }
      i += 1
    }
    val pairs = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var best = 0
    i = 0
    while (i < n - 1) {
      if (idOf(i) >= 0 && idOf(i + 1) >= 0) {
        val key = java.lang.Long.valueOf((idOf(i).toLong << 32) | (idOf(i + 1).toLong & 0xffffffffL))
        val c = pairs.merge(key, Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
        if (c > best) best = c.intValue()
      }
      i += 1
    }
    best
  }

  /** All `w`-token window fingerprints of a token array in ONE O(n) pass —
    * the Rabin-Karp rolling form of repeated-passage fingerprinting
    * (vs the md5-of-joined-window formulation, which re-hashes W tokens
    * per position: O(W·n) hashing). Each token's bytes hash once
    * (FNV + splitmix64 finalizer, the same family as [[minhash]]); window
    * j's fingerprint is the degree-(w-1) polynomial
    * Σ th(j+k)·B^(w-1-k) mod 2^64, updated per position with one
    * multiply-subtract-add: F(j+1) = (F(j) − th(j)·B^(w-1))·B + th(j+w).
    * B is odd, hence invertible mod 2^64 — shifting a window never
    * collapses information. Empty output when the doc is shorter than w.
    */
  def windowFps(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null tokens get a fixed sentinel hash distinct from any real
      // token's (mix of a constant no byte stream maps to via tokenHash)
      th(i) =
        if (tokens.isNullAt(i)) mix(Golden)
        else mix(tokenHash(tokens.getUTF8String(i).getBytes))
      i += 1
    }
    val B = 1000003L // odd => invertible mod 2^64
    var bPow = 1L // B^(w-1)
    i = 1
    while (i < w) { bPow *= B; i += 1 }
    val out = new Array[Long](n - w + 1)
    var f = 0L
    i = 0
    while (i < w) { f = f * B + th(i); i += 1 }
    out(0) = f
    var j = 1
    while (j <= n - w) {
      f = (f - th(j - 1) * bPow) * B + th(j + w - 1)
      out(j) = f
      j += 1
    }
    new GenericArrayData(out)
  }

  private final val FnvOffset2 = 1469598103934665603L ^ -7046029254386353131L // distinct basis for the 2nd stream

  /** Second independent 64-bit base hash of a token's bytes: FNV with a
    * DIFFERENT offset basis. The 128-bit window fingerprint needs the two
    * streams to fail independently at the TOKEN level too — deriving both
    * from one [[tokenHash]] would make any 64-bit token-hash collision a
    * full 128-bit window collision.
    */
  def tokenHash2(bytes: Array[Byte]): Long = {
    var h = FnvOffset2
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer with a shifted seed — the 2nd stream's mixer. */
  def mix2(z: Long): Long = mix(z ^ -4658895280553007687L)

  /** All `w`-token window fingerprints as 128-bit (hi, lo) structs — TWO
    * independent Rabin-Karp streams rolled in one O(n) pass. Same shape
    * and counting semantics as [[windowFps]]; this is the fingerprint
    * width a 100 TB corpus needs: the 64-bit form's collision probability
    * at 10¹³⁺ distinct windows is ~1 (n²/2⁶⁵), and a collision silently
    * inflates dup-span counts, where at 2¹²⁸ the same budget stays below
    * 10⁻¹¹. Independence is end-to-end per stream: different FNV offset
    * basis ([[tokenHash2]]), different finalizer ([[mix2]]), different
    * odd (hence invertible mod 2⁶⁴) polynomial base — a collision must
    * happen in BOTH 64-bit streams simultaneously.
    */
  def windowFps128(tokens: ArrayData, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) { th1(i) = mix(Golden); th2(i) = mix2(Golden) }
      else {
        val bytes = tokens.getUTF8String(i).getBytes
        th1(i) = mix(tokenHash(bytes))
        th2(i) = mix2(tokenHash2(bytes))
      }
      i += 1
    }
    val B1 = 1000003L // odd => invertible mod 2^64
    val B2 = 1099511628211L // FNV prime, odd, independent of B1
    var p1 = 1L // B1^(w-1)
    var p2 = 1L // B2^(w-1)
    i = 1
    while (i < w) { p1 *= B1; p2 *= B2; i += 1 }
    val out = new Array[Any](n - w + 1)
    var f1 = 0L
    var f2 = 0L
    i = 0
    while (i < w) { f1 = f1 * B1 + th1(i); f2 = f2 * B2 + th2(i); i += 1 }
    out(0) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](f1, f2))
    var j = 1
    while (j <= n - w) {
      f1 = (f1 - th1(j - 1) * p1) * B1 + th1(j + w - 1)
      f2 = (f2 - th2(j - 1) * p2) * B2 + th2(j + w - 1)
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](f1, f2))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Count of positions where two long signatures agree (see [[SigAgree]]).
    * A null slot on either side counts as DISAGREEMENT — matching the
    * `zip_with` + `aggregate` HOF this kernel replaced, whose null
    * comparison contributed 0. (Signatures from [[minhash]] are never
    * null, but the expression accepts any ARRAY<BIGINT>, so the kernel
    * must not read a null slot as an undefined 0 and call it agreement.)
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree
  }
}

object VectorKernels {

  /** Sequential left-to-right dot product — bit-identical to the
    * interpreted `aggregate(zip_with(a,b,_*_), 0.0, _+_)` HOF it replaces
    * (same accumulation order), so oracle hash parity is preserved.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Index of the L2-nearest centroid; strict `<` so the lowest index wins
    * ties — same tie-break as the IVF quantizer trainer.
    */
  def nearestCentroid(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val dim = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var j = 0
      while (j < dim) { val t = vec.getDouble(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** TWO-LEVEL IVF assignment (IVF-in-IVF): nearest coarse cell first
    * (kCoarse distances), then nearest fine centroid within that cell's
    * slice of the flattened fine matrix — global fine list id =
    * start(cell) + local index. Per-vector cost is kCoarse + len(cell)
    * distances instead of the flat quantizer's kTotal — the production
    * shape once proportional nLists makes flat assignment quadratic
    * (see Dedup.semanticNLists). Same strict-< lowest-index tie-breaks
    * at both levels, so assignment stays a pure function of the vector.
    */
  def nearestCentroid2(
      vec: ArrayData,
      coarse: Array[Array[Double]],
      fine: Array[Array[Double]],
      start: Array[Int],
      len: Array[Int],
  ): Int = {
    val c = nearestCentroid(vec, coarse)
    val s = start(c)
    val l = len(c)
    val dim = vec.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < l) {
      val cent = fine(s + i)
      var d = 0.0
      var j = 0
      while (j < dim) { val t = vec.getDouble(j) - cent(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    s + best
  }

  /** The `nProbe` nearest centroid indices, ordered by (distance, index)
    * ascending — repeated strict-< argmin, equivalent to sortBy((d, c)).
    */
  def probeLists(vec: ArrayData, centroids: Array[Array[Double]], nProbe: Int): ArrayData = {
    val n = centroids.length
    val dim = vec.numElements()
    val dists = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      var d = 0.0
      var j = 0
      while (j < dim) { val t = vec.getDouble(j) - cent(j); d += t * t; j += 1 }
      dists(c) = d
      c += 1
    }
    val k = math.min(nProbe, n)
    val out = new Array[Int](k)
    val used = new Array[Boolean](n)
    var s = 0
    while (s < k) {
      var best = -1
      var bestD = Double.MaxValue
      var i = 0
      while (i < n) {
        if (!used(i) && dists(i) < bestD) { bestD = dists(i); best = i }
        i += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** TWO-LEVEL probe (the query twin of [[nearestCentroid2]]): the
    * `nCells` nearest coarse cells in (distance, index) order, and
    * within each, the `nPerCell` nearest fine lists of that cell's
    * slice as GLOBAL list ids. Per-query routing cost is kCoarse +
    * Σ len(probed cells) distances instead of the flat kTotal — the
    * same ~2·√k economics the assignment side gets.
    */
  def probeLists2(
      vec: ArrayData,
      coarse: Array[Array[Double]],
      fine: Array[Array[Double]],
      start: Array[Int],
      len: Array[Int],
      nCells: Int,
      nPerCell: Int,
  ): ArrayData = {
    val cells = probeLists(vec, coarse, nCells).toIntArray()
    val out = new scala.collection.mutable.ArrayBuffer[Int](cells.length * nPerCell)
    var i = 0
    while (i < cells.length) {
      val c = cells(i)
      val s = start(c)
      val slice = java.util.Arrays.copyOfRange(fine, s, s + len(c))
      val local = probeLists(vec, slice, nPerCell).toIntArray()
      var j = 0
      while (j < local.length) { out += s + local(j); j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object SketchesLsh {

  /** Random-hyperplane LSH bucket id over a float/double vector: bit p of
    * the result is the sign of the vector's dot product with plane p,
    * whose components are ±1 derived from splitmix64(seed·φ ⊕ index) —
    * deterministic, shippable in the plan, identical on every executor.
    */
  def bucket(vec: ArrayData, nPlanes: Int, seed: Int): Long = {
    val dim = vec.numElements()
    val base = Sketches.mix(seed.toLong * 0x9e3779b97f4a7c15L)
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        val sign = if ((Sketches.mix(base ^ (p.toLong * dim + j)) & 1L) == 1L) 1.0 else -1.0
        dot += vec.getDouble(j) * sign
        j += 1
      }
      if (dot > 0) out |= 1L << p
      p += 1
    }
    out
  }
}

/** LSH bucket id of an ARRAY<DOUBLE> vector — codegen'd tight loop (vs the
  * interpreted nested-aggregate HOF that re-evaluated a lambda per
  * (plane, component)).
  */
case class LshBucket(child: Expression, nPlanes: Int, seed: Int) extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63], got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    SketchesLsh.bucket(input.asInstanceOf[ArrayData], nPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchesLsh.bucket($c, $nPlanes, $seed);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Dot product of two ARRAY<DOUBLE> vectors — the O(dim) inner loop of
  * every similarity join, codegen'd (the HOF form re-enters the
  * interpreter per element).
  */
case class DotProd(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

/** IVF coarse-quantizer assignment: index of the L2-nearest centroid of
  * an ARRAY<DOUBLE> vector. The centroid matrix is a plan constant
  * (extracted from a foldable literal at build time, shipped with the
  * expression, referenced once per codegen compilation — not evaluated
  * per row), so assignment is a pure codegen'd loop with no
  * Dataset-encoder serialization boundary.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.nearestCentroid($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Two-level IVF assignment (see [[VectorKernels.nearestCentroid2]]):
  * coarse + flattened-fine centroid matrices and the per-cell
  * start/length tables ride as plan constants, so the whole hierarchical
  * assignment is one codegen'd per-row loop.
  */
case class NearestCentroid2(
    child: Expression,
    coarse: Array[Array[Double]],
    fine: Array[Array[Double]],
    start: Array[Int],
    len: Array[Int],
) extends UnaryExpression {
  require(coarse.nonEmpty && fine.nonEmpty, "centroid matrices must be non-empty")
  require(start.length == coarse.length && len.length == coarse.length,
    "per-cell tables must match the coarse matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid2 requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid2"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid2(input.asInstanceOf[ArrayData], coarse, fine, start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fRef = ctx.addReferenceObj("fine", fine, "double[][]")
    val sRef = ctx.addReferenceObj("start", start, "int[]")
    val lRef = ctx.addReferenceObj("len", len, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.nearestCentroid2($c, $cRef, $fRef, $sRef, $lRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid2 =
    copy(child = newChild)
}

/** IVF probe list: the `nProbe` nearest centroid indices of a query
  * vector, ordered by (distance, index) — `explode` it to fan a query
  * out to its probed inverted lists. Same plan-constant centroid
  * treatment as [[NearestCentroid]].
  */
case class ProbeLists(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "centroid matrix must be non-empty")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_probe_lists requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_probe_lists"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.probeLists(input.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.VectorKernels.probeLists($c, $ref, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeLists =
    copy(child = newChild)
}

/** TWO-LEVEL IVF probe (see [[VectorKernels.probeLists2]]): global fine
  * list ids of the `nPerCell` nearest lists inside each of the `nCells`
  * nearest coarse cells. Quantizer rides as plan constants, same as
  * [[NearestCentroid2]].
  */
case class ProbeLists2(
    child: Expression,
    coarse: Array[Array[Double]],
    fine: Array[Array[Double]],
    start: Array[Int],
    len: Array[Int],
    nCells: Int,
    nPerCell: Int,
) extends UnaryExpression {
  require(coarse.nonEmpty && fine.nonEmpty, "centroid matrices must be non-empty")
  require(start.length == coarse.length && len.length == coarse.length,
    "per-cell tables must match the coarse matrix")
  require(nCells >= 1 && nPerCell >= 1, s"nCells/nPerCell must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_probe_lists2 requires ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_probe_lists2"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.probeLists2(input.asInstanceOf[ArrayData], coarse, fine, start, len, nCells, nPerCell)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fRef = ctx.addReferenceObj("fine", fine, "double[][]")
    val sRef = ctx.addReferenceObj("start", start, "int[]")
    val lRef = ctx.addReferenceObj("len", len, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"graft.functions.VectorKernels.probeLists2($c, $cRef, $fRef, $sRef, $lRef, $nCells, $nPerCell);")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeLists2 =
    copy(child = newChild)
}

/** MinHash signature of a token array: `numHashes` minima over the
  * splitmix64-derived hash family. Codegen'd; the kernel hashes each token
  * once regardless of signature width.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.minhash($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Positions where two minhash signatures agree — the per-candidate-pair
  * Jaccard estimator's inner loop, codegen'd (the `zip_with` + `aggregate`
  * HOF form it replaces interprets two lambdas per signature position per
  * pair). Counts over the shorter length if they differ (signatures from
  * the same family never do).
  */
case class SigAgree(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_sig_agree requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sketches.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sketches.sigAgree($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

/** All w-token window fingerprints of an ARRAY<STRING> as ARRAY<BIGINT> —
  * the O(n) Rabin-Karp twin of the md5-per-window span fingerprint (see
  * [[Sketches.windowFps]]). Codegen'd; `explode` the result to get the
  * per-window fingerprint stream.
  *
  * DEMOTED: 64-bit width is fine for single-shard jobs but certain to
  * collide at 100 TB window counts — the registered span-dedup operator
  * uses [[WindowFps128]]; this form remains for width-vs-cost
  * experiments and the DedupSpec invertibility property.
  */
case class WindowFps(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 2, s"window must be >= 2 tokens, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_window_fps requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_fps"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.windowFps(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.windowFps($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowFps =
    copy(child = newChild)
}

/** All w-token window fingerprints of an ARRAY<STRING> as
  * ARRAY<STRUCT<hi BIGINT, lo BIGINT>> — the 128-bit production form of
  * [[WindowFps]] (see [[Sketches.windowFps128]] for the collision
  * budget). Codegen'd; the span-dup counting stage groups on the whole
  * struct, so the fingerprint width is transparent to the plan shape.
  */
case class WindowFps128(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 2, s"window must be >= 2 tokens, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_window_fps128 requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hi", LongType, nullable = false),
      StructField("lo", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_window_fps128"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.windowFps128(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.windowFps128($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowFps128 =
    copy(child = newChild)
}

/** Multiplicity of the most frequent term in an ARRAY<STRING> — the
  * kernel behind within-document repetition quality signals (the Gopher
  * filters' top-n-gram coverage, Rae et al. 2021 §A1.1): a narrow
  * codegen'd pass, no explode, no shuffle.
  */
case class MaxTermCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_max_term_count requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_term_count"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.maxTermCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.maxTermCount($c);")

  override protected def withNewChildInternal(newChild: Expression): MaxTermCount =
    copy(child = newChild)
}

/** Multiplicity of the most frequent adjacent token pair — the bigram
  * face of the repetition signals, one codegen'd pass with interned
  * token ids instead of a CodegenFallback `transform` building a bigram
  * string per position.
  */
case class MaxPairCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_max_pair_count requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_pair_count"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.maxPairCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Sketches.maxPairCount($c);")

  override protected def withNewChildInternal(newChild: Expression): MaxPairCount =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (term-frequency weighted ±1 votes per
  * bit). Codegen'd; one token hash + 64 integer ops per token.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Sketches.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Sketches.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
