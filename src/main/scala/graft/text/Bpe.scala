package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer: a real trained merge table, replacing the
  * "BPE-ish" pre-tokenizer segmentation ([[TextAnalysis.bpeTokenCount]]) for
  * every operator denominated in tokens (budgets, chunking, packing).
  *
  * Semantics (both the Scala trainer and the DuckDB oracle replay exactly
  * this, so the gate compares two independent implementations of the same
  * contract):
  *   - words = text split on single spaces, empties dropped; a word is a
  *     sequence of Unicode code points (no end-of-word marker — merges
  *     never cross word boundaries because application is per-word);
  *   - training: `numMerges` rounds; each round counts adjacent symbol
  *     pairs over the whole vocabulary weighted by word frequency
  *     (overlapping occurrences each count: "aaa" has (a,a) twice), then
  *     merges the pair with the highest count, ties broken by code-point
  *     order of `a` then `b` (== DuckDB's binary UTF-8 string order);
  *     training stops early when the best pair's count drops below
  *     `minPairCount` (default 2 — a pair seen once compresses nothing);
  *   - application: merges replayed IN TRAINING ORDER per word, each pass
  *     replacing adjacent (a,b) left-to-right non-overlapping — identical
  *     to DuckDB `replace()` on a symbol string framed with per-symbol
  *     open/close delimiters (see [[oracleStages]] for why the framing
  *     must be open/close, not a shared separator), which is how the
  *     oracle replays it.
  *
  * Scale contract: training collect()s the WORD-FREQUENCY table, never the
  * corpus — vocabulary is sublinear in corpus size (Heaps' law) and the
  * collect is guarded fail-loud at 1M distinct words. At 100 TB you train
  * the merge table once on a sample or a capped vocabulary and ship it as
  * a plan constant (exactly what the expression does: the merge table is
  * frozen into the codegen'd [[graft.functions.BpeTokenCount]] at plan
  * build, so application is a narrow per-row kernel — no shuffle, no UDF,
  * no per-row driver involvement).
  */
object Bpe {

  /** A trained merge table, applied in order. Serializable plan constant. */
  final case class BpeModel(merges: IndexedSeq[(String, String)]) extends Serializable {
    /** Per-JVM word→count memo: corpora repeat words endlessly and the
      * model is immutable, so memoizing is safe; ConcurrentHashMap because
      * one deserialized instance may be shared by concurrent local tasks.
      * Bounded so an adversarial all-unique-words corpus cannot OOM it.
      */
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

    /** Merge → training rank, for the rank-based apply. */
    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        // ' ' can never appear inside a symbol: corpus words are
        // space-split and byte-level symbols map 0x20 to U+0120
        m.putIfAbsent(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
        i += 1
      }
      m
    }

    def segment(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val segs = applyRanked(word)
      if (cache.size() < (1 << 16)) cache.put(word, segs)
      segs
    }

    /** Rank-based application: repeatedly take the LOWEST-rank adjacent
      * pair present and merge all its left-to-right non-overlapping
      * occurrences. Produces exactly [[applyMerges]]'s sequential replay
      * (BpeSpec pins equality on trained tables): a merge's output
      * symbol exists only after its rank, so new adjacencies can only
      * enable LATER merges — the two orders converge. Cost is
      * O(len²·log) per word, INDEPENDENT of table size, which is what
      * makes a 32k-merge frozen tokenizer applicable in a narrow
      * expression (sequential replay scans all 32k merges per word).
      */
    private def applyRanked(word: String): Array[String] = {
      var syms = toSymbols(word)
      var continue = syms.length > 1 && !rank.isEmpty
      while (continue) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + " " + syms(i + 1))
          if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
          i += 1
        }
        if (bestRank == Int.MaxValue) continue = false
        else {
          val (a, b) = merges(bestRank)
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toArray
          continue = syms.length > 1
        }
      }
      syms
    }

    def tokenCount(word: String): Int = segment(word).length
  }

  /** Word → code-point symbols (NOT UTF-16 chars: a surrogate pair is one
    * symbol, matching DuckDB's per-character string_split).
    */
  def toSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Code-point (== UTF-8 byte) order — the tie-break order. Java's
    * String.compareTo is UTF-16 code-unit order, which disagrees above
    * the BMP; DuckDB compares UTF-8 bytes, so we must compare code points.
    */
  def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Replay `merges` in order over one word; each merge pass is
    * left-to-right non-overlapping (the DuckDB `replace()` semantics the
    * oracle uses).
    */
  def applyMerges(word: String, merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = toSymbols(word)
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (a, b) = merges(m)
      // presence scan first: most merges don't apply to most words, and
      // the rebuild allocates
      var i = 0
      var found = false
      while (i < syms.length - 1 && !found) {
        if (syms(i) == a && syms(i + 1) == b) found = true
        i += 1
      }
      if (found) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b)
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.toArray
      }
      m += 1
    }
    syms
  }

  /** Narrow kernel behind [[graft.functions.BpeTokenCount]]: total BPE
    * tokens over the text's space-separated words (empties skipped).
    */
  def countText(text: UTF8String, model: BpeModel): Long = {
    val s = text.toString
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) total += model.tokenCount(s.substring(start, i))
    }
    total
  }

  /** Narrow kernel behind [[graft.functions.BpeSegment]]: the text's full
    * BPE token stream — per space-separated word (empties skipped), the
    * trained segmentation, concatenated in word order.
    */
  def segmentText(
      text: UTF8String,
      model: BpeModel,
  ): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = text.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val segs = model.segment(s.substring(start, i))
        var j = 0
        while (j < segs.length) {
          out += UTF8String.fromString(segs(j))
          j += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** [[train]] with incremental pair-count maintenance — identical
    * output (BpeSpec pins equality), built for LARGE tables: the naive
    * trainer recounts every pair each round (O(merges × corpus symbols),
    * hours at 32k merges), this one counts once and then touches only
    * the words containing the merged pair, with a lazily-invalidated
    * max-heap for the argmax (stale entries are skipped when their
    * count no longer matches). Same total order: count desc, then `a`,
    * then `b` in code-point order.
    */
  def trainFast(
      wordFreq: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L,
  ): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val words = wordFreq.toArray
    val syms: Array[Array[String]] = words.map { case (w, _) => toSymbols(w) }
    val counts = new java.util.HashMap[(String, String), Long]()
    val where = new java.util.HashMap[(String, String), java.util.BitSet]()
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      1024,
      new java.util.Comparator[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(y._1, x._1) // count desc
          if (c != 0) c
          else {
            val a = cpCompare(x._2, y._2)
            if (a != 0) a else cpCompare(x._3, y._3)
          }
        }
      })
    def contribute(k: Int, sign: Long): Unit = {
      val s = syms(k)
      val f = words(k)._2 * sign
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val nc = counts.merge(p, f, (x, y) => x + y)
        if (nc == 0L) counts.remove(p)
        else if (sign > 0) {
          where.computeIfAbsent(p, _ => new java.util.BitSet()).set(k)
          heap.add((nc, p._1, p._2))
        } else heap.add((nc, p._1, p._2))
        i += 1
      }
    }
    var k = 0
    while (k < words.length) { contribute(k, 1L); k += 1 }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      // pop until a LIVE entry (its count still matches) above the floor
      var best: (String, String) = null
      while (best == null && !heap.isEmpty) {
        val e = heap.poll()
        val p = (e._2, e._3)
        // containsKey before get: the map's value type is primitive
        // scala.Long, so a bare get on an absent key null-unboxes to 0L and
        // a `!= null` guard is vacuous — dead pairs with a stale heap count
        // of 0 would resurrect under minPairCount=0
        if (counts.containsKey(p)) {
          val live = counts.get(p)
          if (live == e._1 && live >= minPairCount) best = p
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        made += 1
        val hits = where.remove(best)
        val (a, b) = best
        if (hits != null) {
          var w = hits.nextSetBit(0)
          while (w >= 0) {
            val s = syms(w)
            var i = 0
            var found = false
            while (i < s.length - 1 && !found) {
              if (s(i) == a && s(i + 1) == b) found = true
              i += 1
            }
            if (found) {
              contribute(w, -1L) // retract the old word's pair multiset
              val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
              var j = 0
              while (j < s.length) {
                if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                  out += (a + b); j += 2
                } else { out += s(j); j += 1 }
              }
              syms(w) = out.toArray
              contribute(w, 1L)
            }
            w = hits.nextSetBit(w + 1)
          }
        }
        // best's count may be nonzero again only via words NOT in hits —
        // impossible (hits held every occurrence), so nothing re-adds it
        // except future merges creating (a, b) anew, which contribute()
        // re-indexes.
      }
    }
    BpeModel(merges.result())
  }

  /** Deterministic trainer over an exact word-frequency table. */
  def train(
      wordFreq: Seq[(String, Long)],
      numMerges: Int,
      minPairCount: Long = 2L,
  ): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val words = wordFreq.toArray
    val syms: Array[Array[String]] = words.map { case (w, _) => toSymbols(w) }
    val merges = IndexedSeq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      // exact pair counts, overlaps included
      val counts = new java.util.HashMap[(String, String), Long]()
      var k = 0
      while (k < words.length) {
        val f = words(k)._2
        val s = syms(k)
        var i = 0
        while (i < s.length - 1) {
          counts.merge((s(i), s(i + 1)), f, (x, y) => x + y)
          i += 1
        }
        k += 1
      }
      // argmax with total order: count desc, then a, then b in code-point
      // order — iteration order of the HashMap cannot affect the winner
      var best: (String, String) = null
      var bestCnt = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        val c = e.getValue
        if (best == null || c > bestCnt ||
            (c == bestCnt && {
              val ca = cpCompare(p._1, best._1)
              ca < 0 || (ca == 0 && cpCompare(p._2, best._2) < 0)
            })) {
          best = p
          bestCnt = c
        }
      }
      if (best == null || bestCnt < minPairCount) exhausted = true
      else {
        merges += best
        val (a, b) = best
        var w = 0
        while (w < words.length) {
          val s = syms(w)
          if (s.length > 1) {
            var i = 0
            var found = false
            while (i < s.length - 1 && !found) {
              if (s(i) == a && s(i + 1) == b) found = true
              i += 1
            }
            if (found) {
              val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
              var j = 0
              while (j < s.length) {
                if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                  out += (a + b)
                  j += 2
                } else {
                  out += s(j)
                  j += 1
                }
              }
              syms(w) = out.toArray
            }
          }
          w += 1
        }
        made += 1
      }
    }
    BpeModel(merges.result())
  }

  /** Train on a document corpus: ONE distributed word-count aggregation
    * (map-side combined), then the vocabulary-scale collect documented in
    * the object scaladoc. Fail-loud if the vocabulary isn't training-scale:
    * the guard runs BEFORE anything driver-sized materializes — collect is
    * capped at maxVocab+1 rows, so an over-scale vocabulary fails the
    * require instead of OOMing the driver mid-collect.
    */
  def trainOnDocs(
      docs: DataFrame,
      numMerges: Int,
      textCol: String = "text",
      minPairCount: Long = 2L,
      maxVocab: Int = 1 << 20,
  ): BpeModel = {
    val wf = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .count()
      .limit(maxVocab + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    require(wf.size <= maxVocab,
      s"BPE training vocabulary exceeds $maxVocab — train on a sample or cap the vocabulary")
    train(wf, numMerges, minPairCount)
  }

  // ------------------------------------------------------------------ oracle

  /** DuckDB replay of training + application, as WITH-clause stages. The
    * training loop is UNROLLED (one materialized stage pair per merge):
    * DuckDB inlines non-materialized CTEs, so a recursive formulation —
    * or unmaterialized stages — would expand the reference chain
    * exponentially; AS MATERIALIZED evaluates each stage exactly once.
    *
    * Stage state s{i} frames each symbol with DISTINCT open/close
    * delimiters — chr(30)·sym·chr(31) — so `replace(sym,
    * open a close open b close, open a·b close)` is exactly the
    * left-to-right non-overlapping merge pass. The earlier
    * single-separator framing ("sep a sep b sep") was NOT: back-to-back
    * occurrences of a pair (word 'ererer' under merge (e,r), or 'aaaa'
    * under (a,a)) share the middle separator, so replace() consumed it
    * and merged only the first occurrence while the Scala kernel merges
    * every one. With per-symbol open+close delimiters no two occurrences
    * share a character, a pattern cannot match inside a symbol, and it
    * cannot match a symbol whose text merely STARTS with `b` (the close
    * delimiter after `b` must be present). Verified case-by-case against
    * [[applyMerges]]: 'aaaa'/(a,a), 'banana'/(a,n), ['a','bc']/(a,b),
    * ['an','an','a']/(an,an). chr(30)/chr(31) never occur in the corpus
    * (words are space-delimited text).
    *
    * `docsRel` is the corpus relation the stages read (a table name or a
    * parenthesized subquery with columns doc_id, text) — gates inject
    * adjacency-forcing fixture words through it.
    */
  def oracleStages(numMerges: Int, docsRel: String = "documents"): String = {
    val sb = new StringBuilder
    sb.append(
      s"""vocab0 AS MATERIALIZED (
        |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM $docsRel)
        |  WHERE w <> '' GROUP BY 1
        |),
        |s0 AS MATERIALIZED (
        |  SELECT word, freq,
        |         array_to_string(list_transform(string_split(word, ''),
        |           c -> chr(30) || c || chr(31)), '') AS sym
        |  FROM vocab0
        |)""".stripMargin)
    for (i <- 1 to numMerges) {
      sb.append(s""",
        |p$i AS MATERIALIZED (
        |  SELECT syms[k] AS a, syms[k+1] AS b FROM (
        |    SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS k FROM (
        |      SELECT freq, list_transform(
        |               list_filter(string_split(sym, chr(30)), x -> x <> ''),
        |               x -> rtrim(x, chr(31))) AS syms FROM s${i - 1})
        |  ) GROUP BY 1, 2 HAVING SUM(freq) >= 2
        |  ORDER BY SUM(freq) DESC, a, b LIMIT 1
        |),
        |s$i AS MATERIALIZED (
        |  SELECT word, freq,
        |         CASE WHEN p.a IS NULL THEN sym
        |              ELSE replace(sym, chr(30) || p.a || chr(31) || chr(30) || p.b || chr(31),
        |                                chr(30) || p.a || p.b || chr(31))
        |         END AS sym
        |  FROM s${i - 1} LEFT JOIN p$i p ON TRUE
        |)""".stripMargin)
    }
    // per-word final token count = open delimiters; then per-doc totals
    sb.append(s""",
      |bpe_counts AS (
      |  SELECT word,
      |         CAST(length(sym) - length(replace(sym, chr(30), '')) AS BIGINT) AS n_tok
      |  FROM s$numMerges
      |),
      |bpe_per_doc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |         CAST(SUM(c.n_tok) AS BIGINT) AS bpe_tokens
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM $docsRel) w
      |  JOIN bpe_counts c USING (word)
      |  WHERE w.word <> ''
      |  GROUP BY 1
      |)""".stripMargin)
    sb.toString
  }
}
