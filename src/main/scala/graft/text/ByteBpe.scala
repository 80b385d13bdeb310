package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE at a realistic scale: regex pre-tokenization, a 256-way
  * byte base vocabulary, and a FROZEN merge table in the thousands —
  * trained once (on a deterministic synthetic corpus, [[trainingText]])
  * by [[ByteBpeTrainMain]] and shipped as a resource fixture, exactly the
  * production workflow (train on a sample, freeze, apply everywhere as a
  * plan constant). The 48-merge [[Bpe]] gates keep proving TRAINING
  * replay end-to-end; this module is the APPLICATION-scale tokenizer the
  * token-denominated operators (budget/chunk/pack) actually meter with.
  *
  * Pipeline (both the Scala kernels and the DuckDB oracle replay exactly
  * this, so the gate compares two independent implementations):
  *   1. pre-tokenize with [[PreTokPattern]] — leftmost-first alternation
  *      of ` ?letters | ?digits | ?punct-run | whitespace-run`, the
  *      lookahead-free core of the GPT-2 pattern, restricted to the
  *      Java-regex ∩ RE2 common subset (explicit whitespace classes:
  *      Java's \s admits \x0B, RE2's does not);
  *   2. map each pre-token's UTF-8 BYTES to printable unicode symbols
  *      ([[byteChar]]: printable ASCII 33..126 is itself, every other
  *      byte b becomes U+0100+b) — every byte sequence tokenizes, no OOV,
  *      and the mapped alphabet contains no control characters, so the
  *      oracle's chr(30)/chr(31) framing can never collide with a symbol;
  *   3. apply the frozen merges in training order, each pass
  *      left-to-right non-overlapping ([[Bpe.applyMerges]] — the same
  *      contract, and the same open/close-framed replace() oracle form,
  *      as the trained-on-corpus gates).
  *
  * Tokens are mapped-space strings (the GPT-2 "Ġword" convention: 0x120
  * is the leading-space byte).
  */
object ByteBpe {

  /** Lookahead-free pre-tokenizer, identical under Java regex and RE2:
    * a letter run / digit run / other-run, each with one optional leading
    * space, or a whitespace run. ASCII-anchored classes — non-ASCII
    * letters land in the punctuation-run branch, which byte-level
    * tokenization handles without OOV (documented trade for engine
    * bit-parity; \x0B is outside the explicit whitespace classes because
    * RE2 and Java disagree on \s).
    */
  val PreTokPattern: String =
    " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+"

  private val Pat = java.util.regex.Pattern.compile(PreTokPattern)

  /** Pre-tokens of `text`, in order (empty for empty/unmatchable text). */
  def preTokenize(text: String): IndexedSeq[String] = {
    val m = Pat.matcher(text)
    val out = IndexedSeq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Byte → mapped symbol char: printable ASCII is itself, everything
    * else (controls, space, DEL, high bytes) shifts to U+0100+b. Bijective
    * over 0..255, control-character-free, single-BMP-char per byte.
    */
  def byteChar(b: Int): Char =
    if (b >= 33 && b <= 126) b.toChar else (0x100 + (b & 0xff)).toChar

  /** Inverse of [[byteChar]] (tests + debugging). */
  def charByte(c: Char): Int =
    if (c >= 33 && c <= 126) c.toInt else {
      require(c >= 0x100 && c <= 0x1ff, s"not a mapped byte char: ${c.toInt}")
      c.toInt - 0x100
    }

  /** A pre-token's UTF-8 bytes as a mapped-symbol string. */
  def mapBytes(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { chars(i) = byteChar(bytes(i) & 0xff); i += 1 }
    new String(chars)
  }

  /** Mapped-symbol string back to the original text (tests). */
  def unmap(mapped: String): String = {
    val bytes = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) { bytes(i) = charByte(mapped.charAt(i)).toByte; i += 1 }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  // ------------------------------------------------------------- kernels

  /** Total frozen-BPE token count of `text` — the narrow per-row kernel
    * behind [[graft.functions.ByteBpeCount]]: regex pre-tokenize, map
    * bytes, apply the plan-constant merges (memoized per word by
    * [[Bpe.BpeModel.segment]]).
    */
  def countText(text: UTF8String, model: Bpe.BpeModel): Long = {
    val m = Pat.matcher(text.toString)
    var total = 0L
    while (m.find()) total += model.tokenCount(mapBytes(m.group()))
    total
  }

  /** The text's full frozen-BPE token stream (mapped-space strings,
    * pre-token order preserved) — behind [[graft.functions.ByteBpeSegment]].
    */
  def segmentText(
      text: UTF8String,
      model: Bpe.BpeModel,
  ): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = Pat.matcher(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    while (m.find()) {
      val segs = model.segment(mapBytes(m.group()))
      var j = 0
      while (j < segs.length) { out += UTF8String.fromString(segs(j)); j += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Detokenize a mapped-space token stream back to text — the narrow
    * kernel behind [[graft.functions.ByteBpeDetok]]. Concatenation then
    * byte-unmap is exact: pre-tokens partition the byte stream (the
    * pattern's branches cover every character class), so
    * detok(segment(text)) == text — the round-trip identity the
    * doc_bpe_roundtrip_v3 gate pins.
    */
  def detok(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = tokens.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) { sb.append(tokens.getUTF8String(i).toString); i += 1 }
    UTF8String.fromString(unmap(sb.toString))
  }

  /** The model's token-id table — the LM-ready vocabulary: ids 0..255
    * are the byte base symbols ([[byteChar]] order), id 256+k is merge
    * k's output string. Well-defined only because trained tables here
    * never emit a duplicate output string (checked fail-loud: a pair
    * (a, bc) merging to an already-existing symbol string would make
    * the id map ambiguous).
    */
  def vocabOf(model: Bpe.BpeModel): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](512 + model.merges.length * 2)
    var b = 0
    while (b < 256) { m.put(String.valueOf(byteChar(b)), Integer.valueOf(b)); b += 1 }
    var k = 0
    while (k < model.merges.length) {
      val tok = model.merges(k)._1 + model.merges(k)._2
      val prev = m.put(tok, Integer.valueOf(256 + k))
      require(prev == null,
        s"ambiguous BPE vocabulary: token '$tok' produced by merge $k already has id $prev")
      k += 1
    }
    m
  }

  /** The text's frozen-BPE TOKEN-ID stream (ints, pre-token order
    * preserved) — behind [[graft.functions.ByteBpeIds]]. Every segment
    * symbol is in the vocabulary by construction (segments are base
    * symbols or merge outputs); a miss fails loud.
    */
  def idsOf(
      text: UTF8String,
      model: Bpe.BpeModel,
      vocab: java.util.HashMap[String, Integer],
  ): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = Pat.matcher(text.toString)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    while (m.find()) {
      val segs = model.segment(mapBytes(m.group()))
      var j = 0
      while (j < segs.length) {
        val id = vocab.get(segs(j))
        require(id != null, s"segment '${segs(j)}' missing from the BPE vocabulary")
        out += id.intValue()
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  // ------------------------------------------------------- frozen fixture

  /** The frozen merge table, loaded from the committed resource fixture
    * (written once by [[ByteBpeTrainMain]]). Tab-separated `a\tb` per
    * line in training order; mapped-space symbols never contain real
    * tabs or newlines (byte 0x09/0x0A map to U+0109/U+010A), so the
    * format needs no escaping.
    */
  lazy val frozenModel: Bpe.BpeModel = {
    val in = getClass.getResourceAsStream("/graft/bpe/merges_v2.tsv")
    require(in != null, "missing resource fixture /graft/bpe/merges_v2.tsv — run graft.text.ByteBpeTrainMain")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val merges = src.getLines().filter(_.nonEmpty).map { line =>
        val t = line.indexOf('\t')
        require(t > 0, s"malformed merge line: $line")
        (line.substring(0, t), line.substring(t + 1))
      }.toIndexedSeq
      Bpe.BpeModel(merges)
    } finally src.close()
  }

  /** The APPLICATION-scale 32k-merge frozen table (merges_v3.tsv,
    * trained once by [[ByteBpeTrainMain]] on the larger synthetic
    * corpus). Same format and loading contract as [[frozenModel]]; the
    * v2 4096-merge table stays committed as the oracle-budget tier.
    */
  lazy val frozenModelV3: Bpe.BpeModel = loadFrozen("/graft/bpe/merges_v3.tsv")

  private def loadFrozen(resource: String): Bpe.BpeModel = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource fixture $resource — run graft.text.ByteBpeTrainMain")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val merges = src.getLines().filter(_.nonEmpty).map { line =>
        val t = line.indexOf('\t')
        require(t > 0, s"malformed merge line: $line")
        (line.substring(0, t), line.substring(t + 1))
      }.toIndexedSeq
      Bpe.BpeModel(merges)
    } finally src.close()
  }

  // ------------------------------------------------ deterministic trainer

  private def mix(z0: Long): Long = graft.functions.Sketches.mix(z0)

  /** Deterministic synthetic training corpus: syllable-built words under
    * a Zipf-ish rank distribution, with sentence punctuation, possessive
    * suffixes, number literals, and accented words — enough byte-pair
    * structure for thousands of count≥2 merges, no randomness (every
    * choice is a splitmix64 of the position). ~`nDocs` documents of ~60
    * word slots each.
    */
  def trainingText(nDocs: Int = 800, vocabRanks: Int = 6000): Seq[String] = {
    val onsets = Array("b", "br", "c", "ch", "cl", "d", "dr", "f", "fl", "g",
      "gr", "h", "j", "k", "l", "m", "n", "p", "pl", "pr", "qu", "r", "s",
      "sh", "sl", "sp", "st", "str", "t", "th", "tr", "v", "w")
    val vowels = Array("a", "e", "i", "o", "u", "ai", "ea", "ee", "oo", "ou")
    val codas = Array("", "b", "ck", "d", "g", "l", "ll", "m", "n", "nd",
      "ng", "nt", "p", "r", "rd", "s", "sh", "st", "t", "th")
    val accented = Array("café", "naïve", "señor", "über", "crème", "déjà")
    def syllable(seed: Long): String = {
      val h = mix(seed)
      onsets(((h >>> 2) % onsets.length).toInt.abs) +
        vowels(((h >>> 17) % vowels.length).toInt.abs) +
        codas(((h >>> 31) % codas.length).toInt.abs)
    }
    def wordOfRank(rank: Int): String = {
      val h = mix(rank.toLong * 0x9e3779b97f4a7c15L + 11L)
      val nSyl = 1 + ((h >>> 5) % 3).toInt.abs
      (0 until nSyl).map(k => syllable(rank.toLong * 31 + k)).mkString
    }
    (0 until nDocs).map { d =>
      val sb = new StringBuilder
      val slots = 40 + (mix(d.toLong) % 40).toInt.abs
      var sentencePos = 0
      for (j <- 0 until slots) {
        val h = mix(d.toLong * 1315423911L + j)
        // Zipf-ish rank: log-uniform over [1, vocabRanks]
        val u = ((h >>> 11) & 0xfffffL).toDouble / 0x100000L.toDouble
        val rank = math.min(vocabRanks - 1, math.exp(u * math.log(vocabRanks.toDouble)).toInt)
        val hv = mix(h)
        val token =
          if ((hv & 31) == 0) ((hv >>> 8) % 10000).abs.toString // number literal
          else if ((hv & 127) == 1) accented(((hv >>> 9) % accented.length).toInt.abs)
          else {
            val w = wordOfRank(rank)
            val w2 = if ((hv & 63) == 2) w + "'s" else w
            if (sentencePos == 0) w2.capitalize else w2
          }
        if (j > 0) sb.append(' ')
        sb.append(token)
        sentencePos += 1
        if ((hv & 15) == 3) { sb.append(','); }
        if (sentencePos >= 8 + (hv % 8).toInt.abs) {
          sb.append(if ((hv & 7) == 0) "!" else if ((hv & 7) == 1) "?" else ".")
          sentencePos = 0
        }
      }
      sb.toString
    }
  }

  /** Train the fixture model from scratch (the one-off
    * [[ByteBpeTrainMain]] path; gates load [[frozenModel]] instead).
    * The 32k table trains through [[Bpe.trainFast]] (identical output,
    * BpeSpec-pinned; the naive recount trainer would take hours there).
    */
  def trainFixture(
      numMerges: Int = 4096,
      nDocs: Int = 800,
      vocabRanks: Int = 6000): Bpe.BpeModel = {
    val wf = trainingText(nDocs, vocabRanks)
      .flatMap(preTokenize)
      .groupBy(identity)
      .view.map { case (w, occ) => (mapBytes(w), occ.size.toLong) }
      .toSeq.sortBy(_._1)
    Bpe.trainFast(wf, numMerges, minPairCount = 2L)
  }

  // ------------------------------------------------------------- oracle

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB replay of frozen-table APPLICATION as WITH-clause stages —
    * the v2 gate's oracle. Unlike the training-replay oracle
    * ([[Bpe.oracleStages]], which caps at ~dozens of merges because each
    * merge is a materialized argmax stage pair), application of a FROZEN
    * table is a pure replace chain: the thousands of merges become
    * `chainSize`-deep nested replace() calls over the same
    * open/close-framed symbol string, grouped into materialized stages
    * so each distinct pre-token is rewritten once per stage. The merge
    * literals are generated FROM THE SAME resource fixture the Spark
    * kernel froze into the plan — the data is shared (that is the
    * fixture contract), the application machinery is not.
    *
    * Exposes: `pretok(doc_id, word)`, `bpe_counts(word, n_tok)`,
    * `bpe_per_doc(doc_id, n_pretokens, bpe_tokens)` (docs with no
    * pre-tokens have no row — COALESCE at the use site), and
    * `syms(word, sym_list)` (the per-pre-token mapped-space
    * segmentation, for stream rebuilds).
    */
  def oracleApplyStages(
      docsRel: String,
      model: Bpe.BpeModel = frozenModel,
      chainSize: Int = 64,
  ): String = {
    val sb = new StringBuilder
    sb.append(
      s"""pretok AS MATERIALIZED (
         |  SELECT doc_id, unnest(regexp_extract_all(text, ${sqlStr(PreTokPattern)})) AS word
         |  FROM $docsRel
         |),
         |vocabv2 AS MATERIALIZED (SELECT DISTINCT word FROM pretok),
         |framed0 AS MATERIALIZED (
         |  SELECT word, string_agg(
         |           chr(30) || chr(CASE WHEN v >= 33 AND v <= 126 THEN v ELSE 256 + v END) || chr(31),
         |           '' ORDER BY i) AS sym
         |  FROM (
         |    SELECT word, i,
         |           CAST(('0x' || substr(hx, CAST(i * 2 + 1 AS INT), 2)) AS INT) AS v
         |    FROM (SELECT word, hex(encode(word)) AS hx,
         |                 unnest(range(octet_length(encode(word)))) AS i
         |          FROM vocabv2)
         |  ) GROUP BY word
         |)""".stripMargin)
    val groups = model.merges.grouped(chainSize).toIndexedSeq
    for ((group, gi) <- groups.zipWithIndex) {
      val prev = if (gi == 0) "framed0" else s"a$gi"
      var expr = "sym"
      for ((a, b) <- group) {
        // open/close framing (see Bpe.oracleStages for why the framing
        // must be per-symbol open+close): u001e = chr(30), u001f = chr(31)
        val pat = sqlStr("\u001e" + a + "\u001f" + "\u001e" + b + "\u001f")
        val rep = sqlStr("\u001e" + a + b + "\u001f")
        expr = s"replace($expr, $pat, $rep)"
      }
      sb.append(s""",
         |a${gi + 1} AS MATERIALIZED (SELECT word, $expr AS sym FROM $prev)""".stripMargin)
    }
    val last = s"a${groups.length}"
    sb.append(s""",
       |bpe_counts AS (
       |  SELECT word,
       |         CAST(length(sym) - length(replace(sym, chr(30), '')) AS BIGINT) AS n_tok
       |  FROM $last
       |),
       |syms AS (
       |  SELECT word, list_transform(
       |           list_filter(string_split(sym, chr(30)), x -> x <> ''),
       |           x -> rtrim(x, chr(31))) AS sym_list
       |  FROM $last
       |),
       |bpe_per_doc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       |         CAST(SUM(c.n_tok) AS BIGINT) AS bpe_tokens
       |  FROM pretok p JOIN bpe_counts c USING (word)
       |  GROUP BY 1
       |)""".stripMargin)
    sb.toString
  }

  /** DuckDB replay of frozen-table application for LARGE tables (the
    * 32k-merge v3 tier) — same exposed interface as
    * [[oracleApplyStages]] (`pretok`, `bpe_counts(word, n_tok)`,
    * `bpe_per_doc`, `syms(word, sym_list)`), different machinery: a
    * recursive CTE that repeatedly merges each word's LOWEST-RANK
    * adjacent pair (leftmost occurrence) until none matches. That
    * min-rank iteration is provably the same function as sequential
    * replay (a merge's output symbol exists only after its rank, so new
    * adjacencies only enable later merges — the equivalence every BPE
    * implementation relies on, and the one [[Bpe.BpeModel.segment]]
    * itself now uses; BpeSpec pins kernel-level equality and the v2
    * gate keeps pinning the staged-replace formulation). Iteration
    * count = max merges applied to any single word (≈ word length), so
    * cost is independent of table size — the staged replace() chain at
    * 32k merges spends ~0.2 s of DuckDB planning per stage × 512
    * stages. The merge literals come from the SAME committed fixture
    * the Spark kernel froze in (shared data, not shared machinery).
    *
    * Callers must open with `WITH RECURSIVE` (DuckDB requires the
    * keyword once for the whole clause; non-recursive CTEs mix freely).
    */
  def oracleApplyRanked(
      docsRel: String,
      model: Bpe.BpeModel = frozenModelV3,
  ): String = {
    val vals = model.merges.zipWithIndex
      .map { case ((a, b), r) => s"($r,${sqlStr(a)},${sqlStr(b)})" }
      .mkString(",")
    s"""mergesv(rank, a, b) AS MATERIALIZED (
       |  FROM (VALUES $vals) t(rank, a, b)
       |),
       |pretok AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_extract_all(text, ${sqlStr(PreTokPattern)})) AS word
       |  FROM $docsRel
       |),
       |vocabv AS MATERIALIZED (SELECT DISTINCT word FROM pretok),
       |framedv AS MATERIALIZED (
       |  SELECT word, list(chr(CASE WHEN v >= 33 AND v <= 126 THEN v ELSE 256 + v END) ORDER BY i) AS syms
       |  FROM (
       |    SELECT word, i,
       |           CAST(('0x' || substr(hx, CAST(i * 2 + 1 AS INT), 2)) AS INT) AS v
       |    FROM (SELECT word, hex(encode(word)) AS hx,
       |                 unnest(range(octet_length(encode(word)))) AS i
       |          FROM vocabv)
       |  ) GROUP BY word
       |),
       |rmerge AS (
       |  SELECT word, syms FROM framedv
       |  UNION ALL
       |  SELECT word, list_concat(list_concat(syms[1:i-1], [a || b]), syms[i+2:]) AS syms
       |  FROM (
       |    SELECT word, syms, i, a, b,
       |           ROW_NUMBER() OVER (PARTITION BY word ORDER BY rank, i) AS rn
       |    FROM (
       |      SELECT rmerge.word, rmerge.syms, t.i, m.a, m.b, m.rank
       |      FROM rmerge, LATERAL (SELECT unnest(range(1, len(rmerge.syms))) AS i) t
       |      JOIN mergesv m ON rmerge.syms[i] = m.a AND rmerge.syms[i+1] = m.b
       |    )
       |  ) WHERE rn = 1
       |),
       |syms AS (
       |  SELECT word, syms AS sym_list FROM (
       |    SELECT word, syms, ROW_NUMBER() OVER (PARTITION BY word ORDER BY len(syms)) AS rn
       |    FROM rmerge
       |  ) WHERE rn = 1
       |),
       |bpe_counts AS (
       |  SELECT word, CAST(len(sym_list) AS BIGINT) AS n_tok FROM syms
       |),
       |bpe_per_doc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       |         CAST(SUM(c.n_tok) AS BIGINT) AS bpe_tokens
       |  FROM pretok p JOIN bpe_counts c USING (word)
       |  GROUP BY 1
       |)""".stripMargin
  }


}
/** One-off fixture trainer: writes the frozen merge table resource. Run
  * `sbt "runMain graft.text.ByteBpeTrainMain"` and commit the output —
  * the gates then load the committed fixture, never retraining.
  */
object ByteBpeTrainMain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/bpe/merges_v2.tsv")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(4096)
    val nDocs = args.lift(2).map(_.toInt).getOrElse(800)
    val vocabRanks = args.lift(3).map(_.toInt).getOrElse(6000)
    val t0 = System.nanoTime()
    val model = ByteBpe.trainFixture(numMerges, nDocs, vocabRanks)
    val secs = (System.nanoTime() - t0) / 1e9
    val p = java.nio.file.Paths.get(out)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val sb = new StringBuilder
    model.merges.foreach { case (a, b) => sb.append(a).append('\t').append(b).append('\n') }
    java.nio.file.Files.writeString(p, sb.toString, java.nio.charset.StandardCharsets.UTF_8)
    println(f"trained ${model.merges.size} merges in $secs%.1f s -> $out")
  }
}
