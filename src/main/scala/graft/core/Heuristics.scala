package graft.core

import java.util.Locale
import scala.collection.mutable

/** Per-rule lineage record (SURVEY §1.4 output schema): which rule, whether
  * it fired (fired == drop signal), the measured value, the threshold. */
final case class RuleResult(rule: String, fired: Boolean,
                            value: Double, threshold: Double)

/** Gopher/C4-style document quality rules (Rae et al. 2021 App. A1.1;
  * Raffel et al. 2020 §2.2). Pure per-document functions — no cross-row
  * state, so the stage is embarrassingly parallel (SURVEY §2.11).
  *
  * Every rule emits a [[RuleResult]] into the output row's `rule_lineage`
  * array — lineage is first-class data, the graft analog of the reference's
  * `detected_as` token lineage (backend/pdf/PIIDetector.py:184-185,
  * SURVEY §2.7 O5). `keep` = no rule fired.
  */
object Heuristics {

  // Gopher word-count / word-shape thresholds
  final val MinWords = 50
  final val MaxWords = 100000
  final val MinMeanWordLen = 3.0
  final val MaxMeanWordLen = 10.0
  final val MaxSymbolWordRatio = 0.1
  final val MinAlphaWordRatio = 0.8
  final val MinStopwords = 2.0
  // Gopher line-shape thresholds
  final val MaxBulletLineRatio = 0.9
  final val MaxEllipsisLineRatio = 0.3
  // Gopher repetition thresholds
  final val MaxDupLineFraction = 0.30
  final val MaxDupParaFraction = 0.30
  final val MaxDupLineCharFraction = 0.20
  final val MaxDupParaCharFraction = 0.20
  final val MaxTopNGramCharFraction = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  final val MaxDupNGramCharFraction =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
  // C4 thresholds
  final val MinSentences = 3
  // pipeline-level rule thresholds (perplexity + langid confidence)
  final val PerplexityMax = 1500.0
  final val LangConfMin = 0.2

  /** Rules expressible with plain string/arithmetic ops — the
    * lang-independent subset is mirrored in the DuckDB oracle SQL
    * (SURVEY §5.4.4). The stopword rule is lang-aware: the Gopher list for
    * en, vocab-head function words otherwise (English stopwords would drop
    * every non-English page). */
  def basicRules(text: String, lang: String = "en"): Vector[RuleResult] =
    basicRulesWith(text, Tokenizer.words(text), lang)

  def basicRulesWith(text: String, ws: IndexedSeq[String],
                     lang: String): Vector[RuleResult] = {
    val n = ws.length
    val lower = text.toLowerCase(Locale.ROOT)

    val meanWordLen =
      if (n == 0) 0.0 else ws.iterator.map(_.length).sum.toDouble / n

    var symbolCount = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '#' || c == '…') symbolCount += 1
      // "..." counts as one ellipsis symbol
      if (c == '.' && i + 2 < text.length && text.charAt(i + 1) == '.' &&
          text.charAt(i + 2) == '.') { symbolCount += 1; i += 2 }
      i += 1
    }
    val symbolRatio = if (n == 0) 0.0 else symbolCount.toDouble / n

    val alphaWords = ws.count(w => w.exists(Character.isLetter))
    val alphaRatio = if (n == 0) 0.0 else alphaWords.toDouble / n

    val lowerWords = ws.iterator.map(_.toLowerCase(Locale.ROOT)).toSet
    val stopCount = SeedCorpus.stopwordsFor(lang).count(lowerWords.contains)

    val hasLorem = if (lower.contains("lorem ipsum")) 1.0 else 0.0
    val hasCurly = if (text.indexOf('{') >= 0) 1.0 else 0.0

    var sentences = 0
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?' || c == '。') sentences += 1
      i += 1
    }

    Vector(
      RuleResult("word_count_min", n < MinWords, n.toDouble, MinWords.toDouble),
      RuleResult("word_count_max", n > MaxWords, n.toDouble, MaxWords.toDouble),
      RuleResult("mean_word_length_min", n > 0 && meanWordLen < MinMeanWordLen,
        meanWordLen, MinMeanWordLen),
      RuleResult("mean_word_length_max", meanWordLen > MaxMeanWordLen,
        meanWordLen, MaxMeanWordLen),
      RuleResult("symbol_to_word_ratio", symbolRatio > MaxSymbolWordRatio,
        symbolRatio, MaxSymbolWordRatio),
      RuleResult("alpha_word_ratio", n > 0 && alphaRatio < MinAlphaWordRatio,
        alphaRatio, MinAlphaWordRatio),
      RuleResult("stopword_count", stopCount < MinStopwords, stopCount.toDouble,
        MinStopwords),
      RuleResult("lorem_ipsum", hasLorem > 0, hasLorem, 0.0),
      RuleResult("curly_brace", hasCurly > 0, hasCurly, 0.0),
      RuleResult("min_sentence_count", sentences < MinSentences,
        sentences.toDouble, MinSentences.toDouble))
  }

  /** Line-shape rules (lines split on '\n'; blank lines excluded). */
  def lineRules(text: String): Vector[RuleResult] = {
    val lines = text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toVector
    val n = lines.length
    def ratio(p: String => Boolean): Double =
      if (n == 0) 0.0 else lines.count(p).toDouble / n
    val bullet = ratio(l => l.startsWith("•") || l.startsWith("- ") ||
      l.startsWith("* "))
    val ellipsis = ratio(l => l.endsWith("...") || l.endsWith("…"))
    Vector(
      RuleResult("bullet_line_ratio", bullet > MaxBulletLineRatio, bullet,
        MaxBulletLineRatio),
      RuleResult("ellipsis_line_ratio", ellipsis > MaxEllipsisLineRatio,
        ellipsis, MaxEllipsisLineRatio))
  }

  /** Gopher repetition rules: duplicate lines/paragraphs (count and char
    * mass) + top/duplicated word n-gram char fractions. Definitions:
    *
    *   - dup_line_fraction: lines identical to an earlier line / lines
    *   - dup_line_char_fraction: chars of those lines / total line chars
    *   - top_k_gram_char_fraction: occurrences(most frequent k-gram) x
    *     chars(k-gram incl. separators) / chars(full_text)
    *   - dup_k_gram_char_fraction: sum over k-grams with count >= 2 of
    *     count x chars / chars(full_text), capped at 1.0
    */
  def repetitionRules(text: String): Vector[RuleResult] =
    repetitionRulesWith(text,
      Tokenizer.words(text).map(_.toLowerCase(Locale.ROOT)))

  def repetitionRulesWith(text: String,
                          wordsLower: IndexedSeq[String]): Vector[RuleResult] = {
    val out = Vector.newBuilder[RuleResult]

    def dupStats(units: IndexedSeq[String]): (Double, Double) = {
      if (units.isEmpty) return (0.0, 0.0)
      val seen = mutable.HashSet[String]()
      var dupCount = 0
      var dupChars = 0L
      var totalChars = 0L
      units.foreach { u =>
        totalChars += u.length
        if (!seen.add(u)) { dupCount += 1; dupChars += u.length }
      }
      (dupCount.toDouble / units.length,
        if (totalChars == 0) 0.0 else dupChars.toDouble / totalChars)
    }

    val lines = text.split('\n').iterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
    val paras = text.split("\n\n").iterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
    val (dupLineFrac, dupLineCharFrac) = dupStats(lines)
    val (dupParaFrac, dupParaCharFrac) = dupStats(paras)
    out += RuleResult("dup_line_fraction", dupLineFrac > MaxDupLineFraction,
      dupLineFrac, MaxDupLineFraction)
    out += RuleResult("dup_para_fraction", dupParaFrac > MaxDupParaFraction,
      dupParaFrac, MaxDupParaFraction)
    out += RuleResult("dup_line_char_fraction",
      dupLineCharFrac > MaxDupLineCharFraction, dupLineCharFrac,
      MaxDupLineCharFraction)
    out += RuleResult("dup_para_char_fraction",
      dupParaCharFrac > MaxDupParaCharFraction, dupParaCharFrac,
      MaxDupParaCharFraction)

    val ws = wordsLower
    val totalChars = math.max(1, text.length).toDouble

    // hash + length of every word, computed once (hot path: 9 n-gram
    // passes reuse these primitive arrays — no per-pass re-hashing)
    val nW = ws.length
    val wHash = new Array[Long](nW)
    val wLen = new Array[Int](nW)
    var wi = 0
    while (wi < nW) { wHash(wi) = NGramLM.hashWord(ws(wi)); wLen(wi) = ws(wi).length; wi += 1 }

    // packed open-addressed Long -> (count:44 | charLen:20) counter
    // prefix sums let the sliding window read each word once per k
    val lenPrefix = new Array[Int](nW + 1)
    wi = 0
    while (wi < nW) { lenPrefix(wi + 1) = lenPrefix(wi) + wLen(wi); wi += 1 }

    def ngramStats(k: Int): (Long, Long, Double) = {
      // returns (maxCount, maxCountLen, dupCharMass)
      if (nW < k) return (0L, 0L, 0.0)
      val m = new PackedCounter(math.max(16, nW))
      // slideable polynomial rolling hash over the word-hash sequence:
      // h_i = sum wHash(i+j) * P^(k-1-j); O(1) per slide instead of O(k)
      val P = 0x100000001b3L
      var pK = 1L // P^(k-1)
      var j = 1
      while (j < k) { pK *= P; j += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = h * P + wHash(i); i += 1 }
      m.add(NGramLM.combine(h, k.toLong),
        lenPrefix(k) - lenPrefix(0) + (k - 1))
      i = k
      while (i < nW) {
        h = (h - wHash(i - k) * pK) * P + wHash(i)
        m.add(NGramLM.combine(h, k.toLong),
          lenPrefix(i + 1) - lenPrefix(i + 1 - k) + (k - 1))
        i += 1
      }
      m.stats()
    }

    (2 to 4).foreach { k =>
      val (maxC, maxLen, _) = ngramStats(k)
      val top =
        if (maxC < 2) 0.0
        else math.min(1.0, maxC.toDouble * maxLen / totalChars)
      val t = MaxTopNGramCharFraction(k)
      out += RuleResult(s"top_${k}gram_char_fraction", top > t, top, t)
    }
    (5 to 10).foreach { k =>
      val (_, _, dupChars) = ngramStats(k)
      val v = math.min(1.0, dupChars / totalChars)
      val t = MaxDupNGramCharFraction(k)
      out += RuleResult(s"dup_${k}gram_char_fraction", v > t, v, t)
    }
    out.result()
  }

  /** Open-addressed Long->packed(count,len) counter for n-gram stats.
    * Value layout: count << 20 | charLen (charLen < 2^20 by construction:
    * <= 10 words per gram). Deterministic tie-break for the top gram:
    * (count, len, -key) — matches the previous HashMap maxBy ordering. */
  private final class PackedCounter(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(16, expected) * 2)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var size = 0

    def add(k: Long, len: Int): Unit = {
      if (size * 4 >= cap * 3) grow()
      // clamp: a gram of pathologically long words must not overflow the
      // 20-bit char-length field into the count bits
      val lenClamped = math.min(len, 0xFFFFF).toLong
      var i = (NGramLM.combine(k, 0x27d4eb2f165667c5L) & (cap - 1)).toInt
      while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      if (!used(i)) {
        used(i) = true; keys(i) = k; vals(i) = (1L << 20) | lenClamped
        size += 1
      } else vals(i) += (1L << 20)
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used; val oc = cap
      cap <<= 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      used = new Array[Boolean](cap); size = 0
      var i = 0
      while (i < oc) {
        if (ou(i)) {
          val c = (ov(i) >>> 20).toInt
          val l = (ov(i) & 0xFFFFF).toInt
          var j = (NGramLM.combine(ok(i), 0x27d4eb2f165667c5L) & (cap - 1)).toInt
          while (used(j)) j = (j + 1) & (cap - 1)
          used(j) = true; keys(j) = ok(i); vals(j) = (c.toLong << 20) | l.toLong
          size += 1
        }
        i += 1
      }
    }

    /** (maxCount, lenOfMax, dupCharMass) with deterministic max tie-break. */
    def stats(): (Long, Long, Double) = {
      var maxC = 0L
      var maxLen = 0L
      var maxKey = 0L
      var dup = 0.0
      var i = 0
      while (i < cap) {
        if (used(i)) {
          val c = vals(i) >>> 20
          val l = vals(i) & 0xFFFFF
          if (c > maxC || (c == maxC && (l > maxLen ||
              (l == maxLen && keys(i) < maxKey)))) {
            maxC = c; maxLen = l; maxKey = keys(i)
          }
          if (c >= 2) dup += c.toDouble * l
        }
        i += 1
      }
      (maxC, maxLen, dup)
    }
  }

  /** All heuristic rules, fixed order (stable lineage schema).
    * Tokenizes once; pass precomputed words via [[evaluateWith]] to share
    * the tokenization with other stages (fused pipeline). */
  def evaluate(text: String, lang: String = "en"): Vector[RuleResult] =
    evaluateWith(text, Tokenizer.words(text), lang)

  def evaluateWith(text: String, words: IndexedSeq[String],
                   lang: String): Vector[RuleResult] = {
    val lower = words.map(_.toLowerCase(Locale.ROOT))
    basicRulesWith(text, words, lang) ++ lineRules(text) ++
      repetitionRulesWith(text, lower)
  }

  def keep(rules: Seq[RuleResult]): Boolean = !rules.exists(_.fired)
}
