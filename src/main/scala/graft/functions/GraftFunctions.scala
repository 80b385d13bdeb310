package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Column-level entry points for graft's custom Catalyst expressions.
  *
  * Spark 4 removed the public Column(Expression) bridge, so custom
  * expressions are exposed the supported way: registered in the session's
  * FunctionRegistry (also injectable via [[GraftSessionExtensions]]) and
  * invoked with `call_function` — the plan still contains the native
  * codegen'd expression, no UDF boxing.
  */
object GraftFunctions {

  val Fp64Name = "graft_fp64"
  val MinHashName = "graft_minhash_sig"
  val SimHashName = "graft_simhash64"
  val LshBucketName = "graft_lsh_bucket"
  val DotName = "graft_dot"
  val NearestCentroidName = "graft_nearest_centroid"
  val ProbeListsName = "graft_probe_lists"
  val ProbeLists2Name = "graft_probe_lists2"
  val HilbertKey2Name = "graft_hilbert_key2"
  val HilbertKey3Name = "graft_hilbert_key3"
  val NfcName = "graft_nfc"
  val SigAgreeName = "graft_sig_agree"
  val MaxTermCountName = "graft_max_term_count"
  val MaxPairCountName = "graft_max_pair_count"
  val FreqItemsName = "graft_freq_items"
  val WindowFpsName = "graft_window_fps"
  val WindowFps128Name = "graft_window_fps128"
  val FfdPackName = "graft_ffd_pack"
  val MmrSelectName = "graft_mmr_select"
  val DHashName = "graft_dhash64"
  val AudioFpName = "graft_audio_fp64"
  val VideoFpName = "graft_video_fp64"
  val ByteBpeCountName = "graft_bytebpe_count"
  val ByteBpeCountV3Name = "graft_bytebpe_count_v3"
  val ByteBpeSegmentV3Name = "graft_bytebpe_segment_v3"
  val ByteBpeDetokName = "graft_bytebpe_detok"
  val ByteBpeIdsName = "graft_bytebpe_ids"
  val NearestCentroid2Name = "graft_nearest_centroid2"
  val ByteBpeSegmentName = "graft_bytebpe_segment"
  val HtmlExtractName = "graft_html_extract"
  val UrlCanonName = "graft_url_canon"
  val RegDomainName = "graft_reg_domain"
  val BpeCountName = "graft_bpe_count"
  val BpeSegmentName = "graft_bpe_segment"
  val Sq8EncodeName = "graft_sq8_encode"
  val Sq8DotName = "graft_sq8_dot"
  val Sq8NrmName = "graft_sq8_nrm"
  val PqEncodeName = "graft_pq_encode"
  val PqLutName = "graft_pq_lut"
  val PqAdcDotName = "graft_pq_adc_dot"
  val PqNrmName = "graft_pq_nrm"
  val BloomMightContainName = "graft_bloom_might_contain"
  val BloomAggName = "graft_bloom_agg"
  val CdcChunksName = "graft_cdc_chunks"

  // the centroid matrix arrives as a foldable ARRAY<ARRAY<DOUBLE>> literal
  // and is frozen into the expression at build time (a plan constant)
  private def matrixLit(e: Expression, fn: String): Array[Array[Double]] = {
    require(e.foldable, s"$fn centroids must be a foldable array-of-arrays literal, got $e")
    val ad = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  private[functions] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    (Fp64Name, classOf[RollingHash64].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$Fp64Name takes exactly 1 argument")
      RollingHash64(children.head)
    }),
    (MinHashName, classOf[MinHashSig].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$MinHashName takes (tokens, numHashes)")
      val n = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$MinHashName numHashes must be an integer literal, got $other")
      }
      MinHashSig(children.head, n)
    }),
    (SimHashName, classOf[SimHash64].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$SimHashName takes exactly 1 argument")
      SimHash64(children.head)
    }),
    (LshBucketName, classOf[LshBucket].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$LshBucketName takes (vec, nPlanes, seed)")
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$LshBucketName $what must be an integer literal, got $other")
      }
      LshBucket(children.head, intLit(children(1), "nPlanes"), intLit(children(2), "seed"))
    }),
    (DotName, classOf[DotProd].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$DotName takes exactly 2 arguments")
      DotProd(children(0), children(1))
    }),
    (NearestCentroidName, classOf[NearestCentroid].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$NearestCentroidName takes (vec, centroids)")
      NearestCentroid(children.head, matrixLit(children(1), NearestCentroidName))
    }),
    (ProbeListsName, classOf[ProbeLists].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$ProbeListsName takes (vec, centroids, nProbe)")
      val n = children(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$ProbeListsName nProbe must be an integer literal, got $other")
      }
      ProbeLists(children.head, matrixLit(children(1), ProbeListsName), n)
    }),
    (ProbeLists2Name, classOf[ProbeLists2].getName, { children: Seq[Expression] =>
      require(children.size == 7,
        s"$ProbeLists2Name takes (vec, coarse, fine, start, len, nCells, nPerCell)")
      def intArrayLit(e: Expression, what: String): Array[Int] = {
        require(e.foldable, s"$ProbeLists2Name $what must be a foldable literal, got $e")
        e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      }
      ProbeLists2(children.head,
        matrixLit(children(1), ProbeLists2Name),
        matrixLit(children(2), ProbeLists2Name),
        intArrayLit(children(3), "start"),
        intArrayLit(children(4), "len"),
        intLitOf(children(5), ProbeLists2Name, "nCells"),
        intLitOf(children(6), ProbeLists2Name, "nPerCell"))
    }),
    (HilbertKey2Name, classOf[HilbertKey2Expr].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$HilbertKey2Name takes (x, y, bits)")
      HilbertKey2Expr(children.head, children(1),
        intLitOf(children(2), HilbertKey2Name, "bits"))
    }),
    (HilbertKey3Name, classOf[HilbertKey3Expr].getName, { children: Seq[Expression] =>
      require(children.size == 4, s"$HilbertKey3Name takes (x, y, z, bits)")
      HilbertKey3Expr(children.head, children(1), children(2),
        intLitOf(children(3), HilbertKey3Name, "bits"))
    }),
    (NfcName, classOf[NfcNormalize].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$NfcName takes exactly 1 argument")
      NfcNormalize(children.head)
    }),
    (SigAgreeName, classOf[SigAgree].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$SigAgreeName takes exactly 2 arguments")
      SigAgree(children(0), children(1))
    }),
    (MaxTermCountName, classOf[MaxTermCount].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$MaxTermCountName takes exactly 1 argument")
      MaxTermCount(children.head)
    }),
    (MaxPairCountName, classOf[MaxPairCount].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$MaxPairCountName takes exactly 1 argument")
      MaxPairCount(children.head)
    }),
    (FreqItemsName, classOf[MisraGries].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$FreqItemsName takes (item, k)")
      val k = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$FreqItemsName capacity k must be an integer literal, got $other")
      }
      MisraGries(children.head, k).toAggregateExpression()
    }),
    (WindowFpsName, classOf[WindowFps].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$WindowFpsName takes (tokens, w)")
      val w = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$WindowFpsName window must be an integer literal, got $other")
      }
      WindowFps(children.head, w)
    }),
    (WindowFps128Name, classOf[WindowFps128].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$WindowFps128Name takes (tokens, w)")
      val w = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$WindowFps128Name window must be an integer literal, got $other")
      }
      WindowFps128(children.head, w)
    }),
    (FfdPackName, classOf[FfdPack].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$FfdPackName takes (items, seqLen)")
      val cap = children(1) match {
        case Literal(v: Int, IntegerType) => v.toLong
        case Literal(v: Long, _) => v
        case other => throw new IllegalArgumentException(
          s"$FfdPackName seqLen must be an integer literal, got $other")
      }
      FfdPack(children.head, cap)
    }),
    (MmrSelectName, classOf[MmrSelect].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$MmrSelectName takes (items, k, lam)")
      val k = children(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$MmrSelectName k must be an integer literal, got $other")
      }
      val lam = children(2) match {
        case Literal(v: Double, DoubleType) => v
        case other => throw new IllegalArgumentException(
          s"$MmrSelectName lam must be a double literal, got $other")
      }
      MmrSelect(children.head, k, lam)
    }),
    (DHashName, classOf[DHash64].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$DHashName takes exactly 1 argument")
      DHash64(children.head)
    }),
    (AudioFpName, classOf[AudioFp64].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$AudioFpName takes exactly 1 argument")
      AudioFp64(children.head)
    }),
    (VideoFpName, classOf[VideoFp64].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$VideoFpName takes exactly 1 argument")
      VideoFp64(children.head)
    }),
    // the byte-level tokenizer's merge table is the COMMITTED resource
    // fixture, not a per-call literal: the builder loads it once
    // (ByteBpe.frozenModel is a lazy val) and freezes the shared model
    // into the expression — plans stay small and every caller provably
    // tokenizes with the same frozen table
    (NearestCentroid2Name, classOf[NearestCentroid2].getName, { children: Seq[Expression] =>
      require(children.size == 5,
        s"$NearestCentroid2Name takes (vec, coarse, fine, start, len)")
      def intArrayLit(e: Expression, what: String): Array[Int] = {
        require(e.foldable, s"$NearestCentroid2Name $what must be a foldable literal, got $e")
        e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      }
      NearestCentroid2(children.head,
        matrixLit(children(1), NearestCentroid2Name),
        matrixLit(children(2), NearestCentroid2Name),
        intArrayLit(children(3), "start"),
        intArrayLit(children(4), "len"))
    }),
    (ByteBpeCountName, classOf[ByteBpeCount].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeCountName takes exactly 1 argument (text)")
      ByteBpeCount(children.head, graft.text.ByteBpe.frozenModel)
    }),
    (ByteBpeSegmentName, classOf[ByteBpeSegment].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeSegmentName takes exactly 1 argument (text)")
      ByteBpeSegment(children.head, graft.text.ByteBpe.frozenModel)
    }),
    (ByteBpeCountV3Name, classOf[ByteBpeCount].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeCountV3Name takes exactly 1 argument (text)")
      ByteBpeCount(children.head, graft.text.ByteBpe.frozenModelV3)
    }),
    (ByteBpeSegmentV3Name, classOf[ByteBpeSegment].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeSegmentV3Name takes exactly 1 argument (text)")
      ByteBpeSegment(children.head, graft.text.ByteBpe.frozenModelV3)
    }),
    (ByteBpeDetokName, classOf[ByteBpeDetok].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeDetokName takes (tokens)")
      ByteBpeDetok(children.head)
    }),
    (ByteBpeIdsName, classOf[ByteBpeIds].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$ByteBpeIdsName takes (text)")
      ByteBpeIds(children.head, graft.text.ByteBpe.frozenModelV3)
    }),
    (HtmlExtractName, classOf[HtmlExtract].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$HtmlExtractName takes (html)")
      HtmlExtract(children.head)
    }),
    (UrlCanonName, classOf[UrlCanonicalize].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$UrlCanonName takes (url)")
      UrlCanonicalize(children.head)
    }),
    (RegDomainName, classOf[RegistrableDomain].getName, { children: Seq[Expression] =>
      require(children.size == 1, s"$RegDomainName takes (url)")
      RegistrableDomain(children.head)
    }),
    (BpeCountName, classOf[BpeTokenCount].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$BpeCountName takes (text, merges)")
      // merge table arrives as a foldable ARRAY<ARRAY<STRING>> literal of
      // [a, b] pairs and is frozen into the expression (a plan constant)
      val m = children(1)
      require(m.foldable, s"$BpeCountName merges must be a foldable literal, got $m")
      val ad = m.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val merges = IndexedSeq.tabulate(ad.numElements()) { i =>
        val pair = ad.getArray(i)
        require(pair.numElements() == 2, s"$BpeCountName merge $i is not a pair")
        (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      }
      BpeTokenCount(children.head, graft.text.Bpe.BpeModel(merges))
    }),
    (BpeSegmentName, classOf[BpeSegment].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$BpeSegmentName takes (text, merges)")
      val m = children(1)
      require(m.foldable, s"$BpeSegmentName merges must be a foldable literal, got $m")
      val ad = m.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val merges = IndexedSeq.tabulate(ad.numElements()) { i =>
        val pair = ad.getArray(i)
        require(pair.numElements() == 2, s"$BpeSegmentName merge $i is not a pair")
        (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      }
      BpeSegment(children.head, graft.text.Bpe.BpeModel(merges))
    }),
    (Sq8EncodeName, classOf[Sq8Encode].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$Sq8EncodeName takes (vec, lo, hi)")
      Sq8Encode(children(0), children(1), children(2))
    }),
    (Sq8DotName, classOf[Sq8Dot].getName, { children: Seq[Expression] =>
      require(children.size == 4, s"$Sq8DotName takes (qe, code, lo, hi)")
      Sq8Dot(children(0), children(1), children(2), children(3))
    }),
    (Sq8NrmName, classOf[Sq8Nrm].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$Sq8NrmName takes (code, lo, hi)")
      Sq8Nrm(children(0), children(1), children(2))
    }),
    (PqEncodeName, classOf[PqEncode].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$PqEncodeName takes (vec, codebook, ksub)")
      PqEncode(children.head, matrixLit(children(1), PqEncodeName),
        intLitOf(children(2), PqEncodeName, "ksub"))
    }),
    (PqLutName, classOf[PqLut].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$PqLutName takes (vec, codebook, ksub)")
      PqLut(children.head, matrixLit(children(1), PqLutName),
        intLitOf(children(2), PqLutName, "ksub"))
    }),
    (PqAdcDotName, classOf[PqAdcDot].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$PqAdcDotName takes (lut, code)")
      PqAdcDot(children(0), children(1))
    }),
    (PqNrmName, classOf[PqNrm].getName, { children: Seq[Expression] =>
      require(children.size == 3, s"$PqNrmName takes (code, codebook, ksub)")
      PqNrm(children.head, matrixLit(children(1), PqNrmName),
        intLitOf(children(2), PqNrmName, "ksub"))
    }),
    // Spark ships the codegen'd BloomFilterMightContain predicate (the
    // probe side of bloom_filter_agg, used internally by runtime-filter
    // injection) but does not SQL-register it — graft does, so the
    // Bloom-prefilter shapes can consume bloom_filter_agg's binary
    // through the supported call_function path.
    (BloomMightContainName,
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      { children: Seq[Expression] =>
        require(children.size == 2, s"$BloomMightContainName takes (bloomBytes, xxhash64Value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(children(0), children(1))
      }),
    // the build side: Spark's BloomFilterAggregate (map-side partial
    // filters OR-merged up the tree) — also internal-only in this build
    (BloomAggName,
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      { children: Seq[Expression] =>
        require(children.size == 3, s"$BloomAggName takes (xxhash64Value, estimatedNumItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2)).toAggregateExpression()
      }),
    (CdcChunksName, classOf[CdcChunks].getName, { children: Seq[Expression] =>
      require(children.size == 2, s"$CdcChunksName takes (text, w)")
      CdcChunks(children.head, intLitOf(children(1), CdcChunksName, "w"))
    }),
  )

  private def intLitOf(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got $other")
  }

  /** Idempotently register graft functions in this session's registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, className, builder) =>
      val ident = FunctionIdentifier(name)
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, new ExpressionInfo(className, name), builder)
      }
    }
  }

  /** 64-bit polynomial rolling-hash fingerprint of a string column.
    * Requires [[register]] (or the session extension) on the session first.
    */
  def fp64(c: Column): Column = call_function(Fp64Name, c)

  /** MinHash signature (ARRAY<BIGINT> of `numHashes` minima) of a token
    * array — native codegen'd kernel, one token hash per token.
    */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    call_function(MinHashName, tokens, lit(numHashes))

  /** 64-bit SimHash of a token array (tf-weighted ±1 votes per bit). */
  def simhash64(tokens: Column): Column = call_function(SimHashName, tokens)

  /** Random-hyperplane LSH bucket id of an ARRAY<DOUBLE> vector. */
  def lshBucket(vec: Column, nPlanes: Int, seed: Int): Column =
    call_function(LshBucketName, vec, lit(nPlanes), lit(seed))

  /** Dot product of two ARRAY<DOUBLE> vectors (codegen'd tight loop,
    * bit-identical accumulation order to the HOF form).
    */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Index of the L2-nearest centroid (IVF assignment) — codegen'd, with
    * the centroid matrix as a plan constant.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    call_function(NearestCentroidName, vec, typedLit(centroids.map(_.toSeq).toSeq))

  /** Two-level IVF assignment to a global fine list id (see
    * [[NearestCentroid2]]); the quantizer rides as plan constants.
    */
  def nearestCentroid2(
      vec: Column,
      coarse: Array[Array[Double]],
      fine: Array[Array[Double]],
      start: Array[Int],
      len: Array[Int],
  ): Column =
    call_function(NearestCentroid2Name, vec,
      typedLit(coarse.map(_.toSeq).toSeq), typedLit(fine.map(_.toSeq).toSeq),
      typedLit(start.toSeq), typedLit(len.toSeq))

  /** The nProbe nearest centroid indices, (distance, index)-ordered. */
  def probeLists(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    call_function(ProbeListsName, vec, typedLit(centroids.map(_.toSeq).toSeq), lit(nProbe))

  /** Two-level IVF probe: global fine list ids of the `nPerCell` nearest
    * lists inside each of the `nCells` nearest coarse cells (see
    * [[ProbeLists2]]); the quantizer rides as plan constants.
    */
  def probeLists2(
      vec: Column,
      coarse: Array[Array[Double]],
      fine: Array[Array[Double]],
      start: Array[Int],
      len: Array[Int],
      nCells: Int,
      nPerCell: Int,
  ): Column =
    call_function(ProbeLists2Name, vec,
      typedLit(coarse.map(_.toSeq).toSeq), typedLit(fine.map(_.toSeq).toSeq),
      typedLit(start.toSeq), typedLit(len.toSeq), lit(nCells), lit(nPerCell))

  /** 2-D Hilbert curve distance of two BIGINT lanes (codegen'd kernel;
    * see [[HilbertKey2Expr]]).
    */
  def hilbertKey2(x: Column, y: Column, bits: Int): Column =
    call_function(HilbertKey2Name, x, y, lit(bits))

  /** 3-D Hilbert curve distance of three BIGINT lanes (codegen'd
    * Skilling kernel; see [[HilbertKey3Expr]]).
    */
  def hilbertKey3(x: Column, y: Column, z: Column, bits: Int): Column =
    call_function(HilbertKey3Name, x, y, z, lit(bits))

  /** Unicode NFC canonical normalization (DuckDB `nfc_normalize` twin). */
  def nfc(c: Column): Column = call_function(NfcName, c)

  /** Count of agreeing positions between two ARRAY<BIGINT> signatures. */
  def sigAgree(a: Column, b: Column): Column = call_function(SigAgreeName, a, b)

  /** Multiplicity of the most frequent term in an ARRAY<STRING> (0 for
    * empty) — the within-doc repetition kernel.
    */
  def maxTermCount(tokens: Column): Column = call_function(MaxTermCountName, tokens)

  /** Multiplicity of the most frequent adjacent token pair (word bigram)
    * in an ARRAY<STRING> — interned-id pair counting, no string concat.
    */
  def maxPairCount(tokens: Column): Column = call_function(MaxPairCountName, tokens)

  /** Misra-Gries frequent-items sketch of a STRING column: a
    * MAP<STRING,BIGINT> of at most k counters with the n/(k+1)
    * heavy-hitter / error guarantees (see [[MisraGries]]).
    */
  def freqItems(item: Column, k: Int): Column =
    call_function(FreqItemsName, item, lit(k))

  /** All w-token window fingerprints (ARRAY<BIGINT>) of a token array in
    * one O(n) Rabin-Karp pass — the rolling twin of md5-per-window.
    */
  def windowFps(tokens: Column, w: Int): Column =
    call_function(WindowFpsName, tokens, lit(w))

  /** 128-bit window fingerprints (ARRAY<STRUCT<hi,lo>>) — the production
    * width for corpus-scale span dedup (see [[WindowFps128]]).
    */
  def windowFps128(tokens: Column, w: Int): Column =
    call_function(WindowFps128Name, tokens, lit(w))

  /** Per-shard first-fit-decreasing bin assignment (see [[FfdPack]]). */
  def ffdPack(items: Column, seqLen: Int): Column =
    call_function(FfdPackName, items, lit(seqLen))

  /** Greedy MMR diversified top-k over one query's candidates (see
    * [[MmrSelect]]).
    */
  def mmrSelect(items: Column, k: Int, lam: Double): Column =
    call_function(MmrSelectName, items, lit(k), lit(lam))

  /** PQ code bytes (m per vector) of an ARRAY<DOUBLE> vector; the
    * codebook (row s*ksub+c = subspace s's centroid c) is a plan constant.
    */
  def pqEncode(vec: Column, codebook: Array[Array[Double]], ksub: Int): Column =
    call_function(PqEncodeName, vec, typedLit(codebook.map(_.toSeq).toSeq), lit(ksub))

  /** Per-query ADC lookup table (ARRAY<DOUBLE> of m*ksub sub-dots) — the
    * one-per-query precompute that makes candidate scoring O(m).
    */
  def pqLut(vec: Column, codebook: Array[Array[Double]], ksub: Int): Column =
    call_function(PqLutName, vec, typedLit(codebook.map(_.toSeq).toSeq), lit(ksub))

  /** ADC dot product: exact dot(query, reconstruct(code)) in m table adds. */
  def pqAdcDot(lut: Column, code: Column): Column =
    call_function(PqAdcDotName, lut, code)

  /** L2 norm of the PQ-reconstructed vector (stored at index-build time). */
  def pqNrm(code: Column, codebook: Array[Array[Double]], ksub: Int): Column =
    call_function(PqNrmName, code, typedLit(codebook.map(_.toSeq).toSeq), lit(ksub))

  /** Probe a `bloom_filter_agg`-built filter: true if the filter might
    * contain the value, which MUST be the same xxhash64 the filter was
    * built over. The serialized filter rides as a binary plan constant.
    */
  def bloomMightContain(bloomBytes: Column, hashed: Column): Column =
    call_function(BloomMightContainName, bloomBytes, hashed)

  /** Distributed Bloom-filter build over xxhash64 values (aggregate →
    * one BINARY row). Probe the result with [[bloomMightContain]].
    */
  def bloomAgg(hashed: Column, estimatedNumItems: Long, numBits: Long): Column =
    call_function(BloomAggName, hashed, lit(estimatedNumItems), lit(numBits))

  /** Content-defined chunks of a text column (see [[CdcChunks]]). */
  def cdcChunks(text: Column, w: Int): Column =
    call_function(CdcChunksName, text, lit(w))

  /** 64-bit perceptual dHash of an image payload (see [[DHash64]]). */
  def dhash64(payload: Column): Column = call_function(DHashName, payload)

  /** 64-bit audio perceptual fingerprint of a WAV payload (see [[AudioFp64]]). */
  def audioFp64(payload: Column): Column = call_function(AudioFpName, payload)

  /** 64-bit video perceptual fingerprint of an AVI payload (see [[VideoFp64]]). */
  def videoFp64(payload: Column): Column = call_function(VideoFpName, payload)

  /** Frozen byte-level BPE token count (see [[graft.text.ByteBpe]]). */
  def byteBpeCount(text: Column): Column = call_function(ByteBpeCountName, text)

  /** 32k-merge (v3) frozen tokenizer count/stream/detok. */
  def byteBpeCountV3(text: Column): Column = call_function(ByteBpeCountV3Name, text)
  def byteBpeSegmentV3(text: Column): Column = call_function(ByteBpeSegmentV3Name, text)
  def byteBpeDetok(tokens: Column): Column = call_function(ByteBpeDetokName, tokens)
  def byteBpeIds(text: Column): Column = call_function(ByteBpeIdsName, text)

  /** Frozen byte-level BPE token stream (mapped-space ARRAY<STRING>). */
  def byteBpeSegment(text: Column): Column = call_function(ByteBpeSegmentName, text)

  /** Main-text extraction from HTML markup (see [[HtmlText.extract]]). */
  def htmlExtract(html: Column): Column =
    call_function(HtmlExtractName, html)

  /** Canonical URL form (see [[UrlOps.canonicalize]]). */
  def urlCanon(url: Column): Column = call_function(UrlCanonName, url)

  /** Registrable domain / eTLD+1 (see [[UrlOps.registrableDomain]]). */
  def regDomain(url: Column): Column = call_function(RegDomainName, url)

  /** Total trained-BPE token count of a text column; the merge table is
    * shipped as a plan constant (see [[graft.text.Bpe]]).
    */
  def bpeCount(text: Column, model: graft.text.Bpe.BpeModel): Column =
    call_function(BpeCountName, text,
      typedLit(model.merges.map(p => Seq(p._1, p._2)).toSeq))

  /** The text's trained-BPE token stream (ARRAY<STRING>, word order). */
  def bpeSegment(text: Column, model: graft.text.Bpe.BpeModel): Column =
    call_function(BpeSegmentName, text,
      typedLit(model.merges.map(p => Seq(p._1, p._2)).toSeq))

  /** SQ8 code bytes of an ARRAY<DOUBLE> on the [lo, hi] range. */
  def sq8Encode(vec: Column, lo: Column, hi: Column): Column =
    call_function(Sq8EncodeName, vec, lo, hi)

  /** dot(qe, dequantize(code, lo, hi)) — fused, no array materializes. */
  def sq8Dot(qe: Column, code: Column, lo: Column, hi: Column): Column =
    call_function(Sq8DotName, qe, code, lo, hi)

  /** L2 norm of the dequantized SQ8 vector. */
  def sq8Nrm(code: Column, lo: Column, hi: Column): Column =
    call_function(Sq8NrmName, code, lo, hi)
}
