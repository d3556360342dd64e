package graft.core

import java.util.Locale
import scala.collection.mutable

/** Byte-pair encoding with a small deterministic merge table trained from
  * [[SeedCorpus]] (Sennrich et al. 2016 — the standard subword algorithm;
  * this replaces round 2's regex stand-in with actual merges).
  *
  * Determinism contract (the merge table is embedded in the DuckDB oracle
  * SQL, so training must be bit-stable): word frequencies from fixed
  * seeded corpora, best pair by (count desc, pair lexicographic asc),
  * merges applied left-to-right non-overlapping — exactly the semantics
  * of a chained SQL `replace(' a b ', ' ab ')` over the space-delimited
  * symbol form, which is how the oracle independently recomputes token
  * counts.
  *
  * Scale: the trained table is a JVM-singleton (compiled once per
  * executor, the re-used broadcast pattern of SURVEY §2.8); encoding is
  * memoized per distinct lowercased word, which on webtext (Zipfian
  * vocabulary) makes the steady-state cost one hash lookup per word.
  */
object Bpe {

  final val DefaultNumMerges = 60

  /** Code-point symbols (NOT UTF-16 chars: a non-BMP character must be
    * ONE symbol, matching DuckDB's per-codepoint string_split(w, '') —
    * surrogate halves would silently double-count astral text). */
  private def symbols(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Left-to-right non-overlapping application of one merge. */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    var hit = false
    var i = 0
    while (!hit && i < syms.length - 1) {
      if (syms(i) == a && syms(i + 1) == b) hit = true
      i += 1
    }
    if (!hit) return syms // common case: merge not present, no allocation
    val out = new mutable.ArrayBuffer[String](syms.length)
    i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Classic BPE training over a word-frequency table. */
  def train(freqs: Map[String, Int],
            numMerges: Int = DefaultNumMerges): IndexedSeq[(String, String)] = {
    // deterministic iteration order: sort words
    var words: Array[(Array[String], Int)] = freqs.toArray.sortBy(_._1)
      .map { case (w, c) => (symbols(w), c) }
    val merges = mutable.ArrayBuffer[(String, String)]()
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = mutable.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val (syms, c) = words(wi)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
        m += 1
      }
    }
    merges.toIndexedSeq
  }

  /** Encode one (already lowercased) word: char symbols, then every merge
    * in training order. */
  def encode(word: String,
             merges: IndexedSeq[(String, String)]): Array[String] = {
    var syms = symbols(word)
    var i = 0
    while (i < merges.length) {
      syms = applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  /** The engine's merge table: trained once per JVM from the seeded
    * en/fr/es/de corpora (zh is character-segmented upstream and gains
    * nothing from latin-letter merges). */
  lazy val defaultMerges: IndexedSeq[(String, String)] = {
    val freq = mutable.HashMap[String, Int]()
    Seq("en", "fr", "es", "de").zipWithIndex.foreach { case (lang, li) =>
      SeedCorpus.corpus(lang, 5000, seed = 7000L + li).foreach { w =>
        val lw = w.toLowerCase(Locale.ROOT)
        freq(lw) = freq.getOrElse(lw, 0) + 1
      }
    }
    train(freq.toMap)
  }

  // memoized per-word token counts (bounded; webtext vocab is Zipfian so
  // the hot head stays resident — a flood of unique words just bypasses)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private final val CacheCap = 1 << 16

  def tokenCount(wordLower: String): Int = {
    val hit = cache.get(wordLower)
    if (hit != null) return hit.intValue()
    val n = encode(wordLower, defaultMerges).length
    if (cache.size < CacheCap) cache.put(wordLower, Integer.valueOf(n))
    n
  }

  /** BPE token count of a text: whitespace words, lowercased, encoded. */
  def countText(text: String): Long = {
    val ws = Tokenizer.words(text)
    var sum = 0L
    var i = 0
    while (i < ws.length) {
      sum += tokenCount(ws(i).toLowerCase(Locale.ROOT))
      i += 1
    }
    sum
  }

  /** The DuckDB mirror of [[encode]] as a per-word SQL expression over
    * `wExpr`. Each symbol is individually bracketed (`|a||b|`) — a merge
    * pattern `'|a||b|' → '|ab|'` then owns its delimiters outright, which
    * makes SQL `replace`'s left-to-right non-overlapping scan EXACTLY
    * equivalent to [[applyMerge]] (a shared single-space delimiter is
    * not: after `' a a ' → ' aa '` the follow-up pair has lost its
    * leading space, silently skipping one merge in runs like `a a a a`).
    * Literal `|` in input text is pre-substituted with `¦` — both are
    * opaque 1-char symbols that no letter merge ever touches, so counts
    * are unaffected. Single quotes in symbols are SQL-escaped. */
  def tokenCountSql(wExpr: String): String = {
    def esc(s: String) = s.replace("'", "''")
    val inner = s"'|' || array_to_string(string_split(" +
      s"replace(lower($wExpr), '|', '¦'), ''), '||') || '|'"
    val merged = defaultMerges.foldLeft(inner) { case (acc, (a, b)) =>
      s"replace($acc, '|${esc(a)}||${esc(b)}|', '|${esc(a + b)}|')"
    }
    s"len(list_filter(string_split($merged, '|'), x -> x <> ''))"
  }
}
