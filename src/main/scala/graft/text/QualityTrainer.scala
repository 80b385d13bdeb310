package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed TRAINING for the hashing-trick quality classifier — the
  * half of the CCNet/RefinedWeb model-based filter that actually touches
  * the corpus at scale. [[TextAnalysis.modelScore]] applies a frozen
  * weight table; this object produces one: full-batch gradient descent
  * for a logistic-regression-shaped linear model over the SAME hashed
  * feature space (md5 bucket per token, binary presence + bias), with
  * every arithmetic step in exact int64 fixed-point so the whole
  * training run replays bit-identically in the DuckDB oracle (the
  * emb_kmeans training-replay discipline).
  *
  * Cross-engine-exact contract (all e6 = 1e-6 fixed-point units):
  *   - features: per doc, the DISTINCT md5 buckets of its space-split
  *     tokens (`conv(substr(md5(t),1,8),16,10) % buckets`) plus an
  *     implicit bias slot — binary presence, so feature values never
  *     need scaling;
  *   - labels: the deterministic curation heuristic
  *     `y = 1 iff n_tokens >= 10 AND top_token_count * 5 <= n_tokens`
  *     (length + Gopher-style repetition — the bootstrap labels a real
  *     pipeline would refine with human/LLM judgments);
  *   - forward: margin_e6(doc) = w_bias + Σ_{b ∈ doc} w[b]; the sigmoid
  *     is the HARD sigmoid `p = clamp(z/4 + 1/2, 0, 1)` (the standard
  *     piecewise-linear approximation, e.g. Courbariaux et al.'s
  *     BinaryConnect) — in units:
  *     `p_e6 = clamp(margin_e6 div 4 + 500000, 0, 1e6)`. Integer `div`
  *     truncates toward zero in BOTH Spark (IntegralDivide) and DuckDB
  *     (`//`) — verified, and already load-bearing in doc_quality_model;
  *   - backward: err_e6 = p_e6 − y·1e6; grad[b] = Σ_{docs ∋ b} err_e6;
  *     grad_bias = Σ_docs err_e6; update
  *     `w[b] −= grad[b] div (nDocs · LrDen)` — plain GD with η = 1/LrDen.
  *
  * Scale shape: one pass per iteration = narrow feature projection +
  * explode to (doc, bucket) pairs + ONE hash aggregate down to ≤
  * buckets+1 rows (map-side partial combine makes the shuffle O(buckets ·
  * partitions), independent of corpus size); only the (buckets+1)-row
  * weight vector ever reaches the driver (the bounded-collect rule), and
  * it re-enters the next iteration as a plan-side array literal — the
  * same frozen-constant discipline as the BPE merge table. At 100 TB:
  * K scans of the corpus, no corpus-sized shuffle anywhere.
  */
object QualityTrainer {

  /** η = 1/LrDen. 16 keeps the first update inside the hard-sigmoid's
    * active region (|Δw| ≤ 1e6/16; a ~30-feature doc moves ≤ ~1.9e6 in
    * margin — near the ±2e6 saturation knees, not far beyond them).
    */
  val LrDen = 16L

  final case class TrainedModel(
      buckets: Int,
      biasE6: Long,
      weightsE6: Array[Long], // indexed by bucket
      nDocs: Long,
      iters: Int)

  /** Distinct md5 feature buckets of the space-split tokens. */
  private def bucketsCol(textCol: String, buckets: Int): Column =
    array_distinct(transform(split(col(textCol), " "),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % buckets))

  /** (doc_id, y) with the deterministic bootstrap label. */
  def labels(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = TextAnalysis.tokens(col(textCol))
    docs.select(
      col(idCol),
      ((size(w) >= 10) &&
        (graft.functions.GraftFunctions.maxTermCount(w) * 5 <= size(w)))
        .cast("bigint").as("y"))
  }

  /** Above this many buckets the weight table becomes ONE array-typed
    * literal (`typedlit`) instead of an `array(lit, lit, …)` of
    * per-bucket expression nodes: a 65536-ary CreateArray is a codegen
    * hazard (method-size blowup / compile fallback), while a single
    * `Literal(ArrayData)` is a constant reference regardless of width.
    */
  private[text] val LiteralWeightMax = 4096

  /** The frozen weight table as an indexable array column. Both forms are
    * value-identical (property-pinned by QualityTrainerSpec); only the
    * plan representation differs.
    */
  private[text] def weightArray(wE6: Array[Long], forceLiteralForm: Boolean = false): Column =
    if (forceLiteralForm || wE6.length <= LiteralWeightMax)
      array(wE6.map(lit(_)).toIndexedSeq: _*)
    else typedlit(wE6.toIndexedSeq)

  /** Margin in e6 units over a buckets-array column, for a frozen weight
    * vector (bias + array literal indexed by bucket) — a NARROW
    * codegen'd projection, the exact apply-side shape modelScore uses.
    */
  private[text] def marginE6(bkts: Column, biasE6: Long, wE6: Array[Long]): Column =
    aggregate(bkts, lit(biasE6),
      (acc, b) => acc + element_at(weightArray(wE6), (b + 1).cast("int")))

  /** Hard-sigmoid in e6 units over a NAMED margin column (the `div`
    * keeps the truncating integer semantics the oracle replays).
    */
  private val pE6FromMargin: Column =
    greatest(lit(0L), least(lit(1000000L), expr("margin_e6 div 4") + lit(500000L)))

  /** Run `iters` full-batch GD steps and return the trained model.
    * Deterministic: no RNG, no wall clock — same corpus, same model.
    */
  def train(
      docs: DataFrame,
      buckets: Int = 256,
      iters: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): TrainedModel = {
    require(buckets > 0 && buckets <= 65536, s"buckets out of range: $buckets")
    // (doc_id, y, bkts) — one cached frame feeds every iteration
    val feats = docs
      .select(col(idCol), bucketsCol(textCol, buckets).as("bkts"))
      .join(labels(docs, idCol, textCol), idCol)
      .persist()
    try {
      val nDocs = feats.count()
      require(nDocs > 0, "quality trainer: empty corpus")
      var bias = 0L
      val w = Array.fill(buckets)(0L)
      var it = 0
      while (it < iters) {
        val err = feats
          .withColumn("margin_e6", marginE6(col("bkts"), bias, w))
          .withColumn("err", pE6FromMargin - col("y") * 1000000L)
        // ONE hash aggregate: bias rides along as bucket -1, so the whole
        // backward pass is a single ≤(buckets+1)-group shuffle
        val grads = err
          .select(explode(concat(array(lit(-1L)), col("bkts"))).as("b"), col("err"))
          .groupBy(col("b")).agg(sum(col("err")).as("g"))
          .collect()
        val den = nDocs * LrDen
        grads.foreach { r =>
          val b = r.getLong(0)
          val g = r.getLong(1)
          if (b < 0) bias -= g / den // JVM / truncates toward zero == div
          else w(b.toInt) -= g / den
        }
        it += 1
      }
      TrainedModel(buckets, bias, w, nDocs, iters)
    } finally { feats.unpersist(); () }
  }

  /** The trained model's margin as a COLUMN over a text column — the
    * frozen weights enter the plan as constants, so the same expression
    * scores a batch frame or an unbounded stream (stateless, no join, no
    * lookup I/O): the train-once / apply-forever face streaming curation
    * composes.
    */
  def marginCol(model: TrainedModel, textCol: String = "text"): Column =
    marginE6(bucketsCol(textCol, model.buckets), model.biasE6, model.weightsE6)

  /** Score `docs` with a trained model: margin, hard-sigmoid probability,
    * and the pass flag (p >= 1/2 ⇔ margin >= 0) — the apply side a
    * curation pipeline composes after training.
    */
  def score(
      docs: DataFrame,
      model: TrainedModel,
      idCol: String = "doc_id",
      textCol: String = "text",
  ): DataFrame =
    docs
      .select(col(idCol),
        marginE6(bucketsCol(textCol, model.buckets), model.biasE6, model.weightsE6)
          .as("margin_e6"))
      .withColumn("p_e6", pE6FromMargin)
      .withColumn("pred_pass", (col("margin_e6") >= 0).cast("bigint"))
}
