package graft.core

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Fused multi-pattern PII scanner.
  *
  * Re-expresses the reference's single-pass combined-alternation design
  * (backend/pdf/PIIDetector.py:49-95: "This is the core of the efficiency")
  * on `java.util.regex`. Semantics replicated exactly:
  *
  *   - one precompiled pattern, named group per PII type, alternation in
  *     precedence order — first-match-wins at each position (both Python
  *     `re` and Java `Pattern` are leftmost-first, not longest-match);
  *   - `finditer` = leftmost non-overlapping; scan resumes at match end;
  *   - `re.IGNORECASE` on a Python 3 `str` is Unicode-aware for `\d \b \s`
  *     and casefolding → Java needs CASE_INSENSITIVE | UNICODE_CASE |
  *     UNICODE_CHARACTER_CLASS for webtext parity (SURVEY §7.5.1).
  *
  * Java named groups cannot contain '_', so groups are named g0..gN in
  * [[PiiType.ordered]] order; attribution checks which named group is
  * non-null (the analog of Python's `match.lastgroup`,
  * backend/pdf/PIIDetector.py:84-86).
  */
object PiiDetector {

  /** Ordered pattern table (reference: backend/pdf/PIIDetector.py:25-47;
    * phone/email regexes pinned by backend/tests/test_PIIDetector.py:196-261). */
  val patterns: IndexedSeq[(PiiType, String)] = IndexedSeq(
    PiiType.Ssn               -> """\d{3}-\d{2}-\d{4}""",
    PiiType.RoutingNumber     -> """\b\d{9}\b""",
    PiiType.AccountNumber     -> """\b\d{10,17}\b""",
    PiiType.CreditScore       -> """credit score:\s*\d{3}""",
    PiiType.CreditScoreRating -> """credit report:\s*(very good|good|excellent|fair|poor|bad)""",
    PiiType.CreditCardNumber  -> """\b(?:\d{4}[ -]?){3}\d{4}\b""",
    PiiType.PhoneNumber       -> """\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}""",
    // The reference/spec email pattern plus a negative lookbehind on the
    // local-part class. Semantics-preserving for finditer (any mid-run
    // start that could match is subsumed by the leftmost run-start match,
    // since the class excludes '@'), but it makes scanning linear: without
    // it, a long alphabetic run costs O(n^2) — each scan position re-walks
    // the run (measured: a 1 MB single-token doc effectively hangs).
    PiiType.Email             -> """(?<![a-zA-Z0-9._%+-])[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""",
    PiiType.Ipv4              -> """\b(?:\d{1,3}\.){3}\d{1,3}\b""")

  private val flags =
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS

  private def compileCombined(table: IndexedSeq[(PiiType, String)]): Pattern = {
    val alternation = table.zipWithIndex
      .map { case ((_, pat), i) => s"(?<g$i>$pat)" }
      .mkString("|")
    Pattern.compile(alternation, flags)
  }

  /** Precompiled once per JVM/executor — the analog of the reference's
    * class-load-time `re.compile` (backend/pdf/PIIDetector.py:63-68). */
  val combined: Pattern = compileCombined(patterns)

  /** Reference-parity subset (SSN..credit card only) for golden tests. */
  val combinedReference: Pattern = compileCombined(patterns.take(6))

  /** Per-pattern compiled forms for the dispatch scanner. */
  private val compiledEach: Array[Pattern] = {
    // scanFast's applicability dispatch is hand-matched to this exact
    // 9-pattern table; adding a pattern requires extending both
    require(patterns.map(_._1) == PiiType.ordered,
      "pattern table out of sync with PiiType.ordered / scanFast dispatch")
    patterns.map { case (_, p) => Pattern.compile(p, flags) }.toArray
  }

  /** ASCII membership table for the email local-part class. */
  private val emailLocalClass: Array[Boolean] = {
    val t = new Array[Boolean](128)
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._%+-"
      .foreach(c => t(c) = true)
    t
  }

  /** BMP membership of a single-char regex class under this scanner's
    * flags, derived from the COMPILED pattern in one 64k sweep — the ONE
    * shared constructor for every dispatch gate (hand-listing fold pairs
    * is how the round-4 Unicode-parity leaks happened: 'i' folds with
    * U+0130/U+0131, 'k' with U+212A, [a-zA-Z] with U+017F — a hand table
    * that missed one fold char made scanFast skip emails the combined
    * regex matches, i.e. unscrubbed PII: ſmith@example.com matched
    * scan() but not scanFast). */
  private def classBitSet(classPattern: String,
                          from: Int = 0): java.util.BitSet = {
    val p = Pattern.compile(classPattern, flags)
    val bs = new java.util.BitSet(0x10000)
    var c = from
    while (c < 0x10000) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch) &&
          p.matcher(String.valueOf(ch)).matches()) bs.set(c)
      c += 1
    }
    bs
  }

  private val emailExtraChars: java.util.BitSet =
    classBitSet("[a-zA-Z0-9._%+-]", from = 128)
  @inline private def inEmailClass(c: Char): Boolean =
    if (c < 128) emailLocalClass(c) else emailExtraChars.get(c)

  /** 2nd/3rd chars of the credit-literal patterns ("cRedit...") — gates
    * the two credit regexes down from every 'c' in prose to ~"cre";
    * fold-exact via [[classBitSet]]. */
  private val creditFoldR = classBitSet(Pattern.quote("r"))
  private val creditFoldE = classBitSet(Pattern.quote("e"))

  /** Chars that can follow the leading digit group of the phone pattern
    * (`\)?[-.\s]?` — ')' or a separator), via [[classBitSet]] so `\s`
    * has the regex's own UNICODE_CHARACTER_CLASS extension (NBSP etc.),
    * not Character.isWhitespace's. */
  private val phoneSepSet: java.util.BitSet = classBitSet("""[-.\s)]""")

  // ---- fused per-char candidate flags (one 64 KiB table, one load per
  // character in the scan loop — replaces the previous chain of
  // Character.* calls and class lookups per position) ----
  private final val FDigit = 1 // Character.isDigit (BMP \d under UCC)
  private final val FCredit = 2 // 'c' | 'C'
  private final val FParen = 4 // '('
  private final val FEmail = 8 // email local-part class (fold-exact)
  private final val FWordish = 16 // isLetterOrDigit || '_' (subset of \w)
  private final val FHiSurr = 32 // high surrogate (possible astral digit)

  private val charFlags: Array[Byte] = {
    val t = new Array[Byte](0x10000)
    var c = 0
    while (c < 0x10000) {
      val ch = c.toChar
      var f = 0
      if (Character.isDigit(ch)) f |= FDigit
      if (ch == 'c' || ch == 'C') f |= FCredit
      if (ch == '(') f |= FParen
      if (inEmailClass(ch)) f |= FEmail
      if (Character.isLetterOrDigit(ch) || ch == '_') f |= FWordish
      if (Character.isHighSurrogate(ch)) f |= FHiSurr
      t(c) = f.toByte
      c += 1
    }
    t
  }

  /** First-char-dispatch scanner — semantically identical to [[scan]]
    * (differential-tested), ~2-3x faster on webtext.
    *
    * The combined-alternation engine re-tries all 9 alternatives at every
    * character; but every alternative's match can only START at a digit
    * (`\d`-led patterns), '(' (phone), 'c'/'C' (the credit literals), or
    * an email local-part run start (the lookbehind excludes mid-run
    * starts). Mid-word letters — most of webtext — can be skipped with
    * one table lookup. At candidate positions the original per-pattern
    * regexes are tried via anchored region `lookingAt` in alternation
    * order, preserving leftmost/first-alternative/non-overlapping
    * `finditer` semantics exactly.
    */
  /** Per-thread matcher reuse: Matcher allocation (plus its internal group
    * arrays) is 9 objects per document otherwise. Bounds flags persist
    * across reset(). */
  private val matchersTL = new ThreadLocal[Array[java.util.regex.Matcher]] {
    override def initialValue(): Array[java.util.regex.Matcher] =
      compiledEach.map { p =>
        val m = p.matcher("")
        m.useTransparentBounds(true)
        m.useAnchoringBounds(false)
        m
      }
  }

  def scanFast(text: String): Vector[PiiMatch] = {
    val n = text.length
    if (n == 0) return Vector.empty
    val out = new ArrayBuffer[PiiMatch]()
    val ms = matchersTL.get()
    val flagsT = charFlags
    // lazy matcher binding: a matcher is reset onto this document only
    // right before its first real attempt (boundMask bit per pattern) —
    // a candidate-free document pays ZERO matcher resets
    var boundMask = 0
    var pos = 0
    var prevF = 0 // flags of the previous char (0 at doc start)
    while (pos < n) {
      val c = text.charAt(pos)
      val f: Int = flagsT(c)
      // Candidate gate: one table load per character. A document with no
      // digits, no '(', no "cre"-shaped literal and no email-run starts —
      // most clean webtext — degenerates this whole scan to two array
      // loads and one branch per char (the doc-level pre-scan gate, fused
      // into the same pass instead of a separate one).
      val emailStart = (f & FEmail) != 0 && (prevF & FEmail) == 0
      var matched = false
      if ((f & (FDigit | FCredit | FParen | FHiSurr)) != 0 || emailStart) {
        // astral decimal digits (e.g. MATHEMATICAL BOLD DIGITS, U+1D7CE+)
        // ARE \d under UNICODE_CHARACTER_CLASS: the high surrogate alone
        // is not a digit char, so a char-level gate skipped positions
        // where the regex matches — unscrubbed PII. For astral digits the
        // cheap run prechecks are skipped and the regex settles it.
        val astralDigit = (f & FHiSurr) != 0 &&
          Character.isDigit(text.codePointAt(pos))
        val digit = (f & FDigit) != 0 || astralDigit
        val credit = (f & FCredit) != 0 && pos + 2 < n &&
          creditFoldR.get(text.charAt(pos + 1)) &&
          creditFoldE.get(text.charAt(pos + 2))
        val paren = (f & FParen) != 0
        // Email viability: the pattern is [class]+@... and '@' is not in
        // the class, so a match starting here REQUIRES the char right
        // after this email-class run to be '@' (any shorter split lands
        // on an in-class char). One table-walk over the run — which has
        // exactly one run start, so this stays linear — replaces a regex
        // attempt per word, the single largest cost on clean prose.
        val emailViable = emailStart && {
          var j = pos + 1
          while (j < n && (flagsT(text.charAt(j)) & FEmail) != 0) j += 1
          j < n && text.charAt(j) == '@'
        }
        if (digit || credit || paren || emailViable) {
          // Sound pruning (necessary conditions only — a pattern is never
          // skipped where it could match):
          //  - \b-led patterns (routing/account/card/ipv4) need a word
          //    boundary at pos; prev being a letter/digit/'_' (a strict
          //    subset of regex \w under UNICODE_CHARACTER_CLASS) proves
          //    there is none. Other \w chars (marks, join controls) still
          //    fall through to the regex, which settles it exactly.
          //  - the BMP digit-run length at pos decides which digit-led
          //    patterns are even shaped right (ssn needs exactly 3 then
          //    '-', routing exactly 9, account 10-17, card >= 4, ipv4
          //    <= 3 then '.'). The run metrics are EXACT only while the
          //    run stays in the BMP: an astral-digit start, or a high
          //    surrogate inside/terminating the run, disables the
          //    prechecks (conservative — the regex decides), closing the
          //    round-4-era gap where an ASCII digit followed by astral
          //    digits defeated the next-two-digits gate and leaked PII
          //    past the dispatch scanner.
          val boundary = digit && (prevF & FWordish) == 0
          var runLen = 0
          var runUnsafe = astralDigit
          if (digit && !astralDigit) {
            var j = pos
            val cap = math.min(n, pos + 19) // saturating: 19 = ">18"
            while (j < cap && (flagsT(text.charAt(j)) & FDigit) != 0) j += 1
            runLen = j - pos
            runUnsafe = j < n && (flagsT(text.charAt(j)) & FHiSurr) != 0
          }
          val exact = digit && !astralDigit && !runUnsafe && runLen < 19
          val d3 = astralDigit || runUnsafe || runLen >= 3
          var pi = 0
          while (pi < compiledEach.length && !matched) {
            val applies = (pi: @unchecked) match {
              case 0 => d3 && (!exact || (runLen == 3 && // ssn (\d{3}-...)
                pos + 3 < n && text.charAt(pos + 3) == '-'))
              case 1 => boundary && d3 && // routing (\b\d{9}\b)
                (!exact || runLen == 9)
              case 2 => boundary && d3 && // account (\b\d{10,17}\b)
                (!exact || (runLen >= 10 && runLen <= 17))
              case 3 | 4 => credit // credit score / rating
              case 5 => boundary && d3 && // card ((?:\d{4}[ -]?){3}\d{4})
                (!exact || runLen >= 4)
              case 6 => paren || (digit && d3 && // phone (\(?\d{3}...)
                // after the leading digit run: a bare 10+ run matches
                // outright; shorter runs need ')' or a separator right at
                // the run end (the groups' positions are forced, so a
                // non-sep terminator on a sub-10 run can never match)
                (!exact || runLen >= 10 || (pos + runLen < n &&
                  phoneSepSet.get(text.charAt(pos + runLen)))))
              case 7 => emailViable // email (lookbehind + '@'-gated)
              case 8 => boundary && // ipv4 (\b\d{1,3}\....)
                (!exact || (runLen <= 3 && pos + runLen < n &&
                  text.charAt(pos + runLen) == '.'))
            }
            if (applies) {
              val m = ms(pi)
              if ((boundMask & (1 << pi)) == 0) {
                m.reset(text)
                boundMask |= 1 << pi
              }
              m.region(pos, n)
              if (m.lookingAt()) {
                out += PiiMatch(m.group(), m.start(), m.end(),
                  PiiType.ordered(pi))
                pos = m.end()
                matched = true
              }
            }
            pi += 1
          }
        }
      }
      if (matched) prevF = flagsT(text.charAt(pos - 1))
      else { prevF = f; pos += 1 }
    }
    // drop the document reference from the matchers that were bound:
    // reset(text) otherwise pins the last-scanned string per executor
    // thread for the thread's lifetime (one pathological multi-MB doc x
    // pool size)
    var i = 0
    while (boundMask != 0) {
      if ((boundMask & 1) != 0) ms(i).reset("")
      boundMask >>>= 1
      i += 1
    }
    out.toVector
  }

  /** Leftmost, non-overlapping scan with per-alternative attribution.
    * Mirrors `_extract_direct_piis` (backend/pdf/PIIDetector.py:80-95). */
  def scan(text: String, pattern: Pattern = combined,
           nGroups: Int = patterns.length): Vector[PiiMatch] = {
    val out = new ArrayBuffer[PiiMatch]()
    val m = pattern.matcher(text)
    while (m.find()) {
      var i = 0
      var done = false
      while (i < nGroups && !done) {
        // Exactly one top-level named group participates per match; the
        // rating pattern's inner unnamed group shifts numeric indices, so
        // attribution goes through the group *names*.
        if (m.start(s"g$i") >= 0) {
          out += PiiMatch(m.group(s"g$i"), m.start(s"g$i"), m.end(s"g$i"),
                          PiiType.ordered(i))
          done = true
        }
        i += 1
      }
    }
    out.toVector
  }

  /** Bug-compatible refinement (reference: backend/pdf/PIIDetector.py:97-131;
    * effective semantics decoded in SURVEY §2.4 D2).
    *
    * The reference *intends* to trim the "credit score:" / "credit report:"
    * labels out of the span, but indexes the match-relative `match.text`
    * with the document-absolute `start_index` — mixing coordinate spaces.
    * We replicate the effective behavior exactly, including the degenerate
    * near-document-start paths:
    *
    *   - CREDIT_SCORE: walk `start` forward while `start < len(text)` and
    *     `text[start]` is not a digit — a no-op whenever the match starts
    *     at document offset >= its own length (so label + value both stay
    *     in the span and the label gets redacted; golden masked-01).
    *   - CREDIT_SCORE_RATING: `start += 14` unconditionally (correct by
    *     accident: "credit report:" is 14 chars), then skip whitespace
    *     while `start < len(text)` — again indexing match text with the
    *     absolute offset.
    *
    * Python `str.isdigit`/`str.isspace` are approximated by
    * `Character.isDigit`/`Character.isWhitespace`; they agree on the ASCII
    * range these labeled patterns can produce.
    */
  def refine(matches: Vector[PiiMatch]): Vector[PiiMatch] = matches.map { mt =>
    mt.piiType match {
      case PiiType.CreditScore =>
        val n = mt.text.length
        var s = mt.start
        while (s < n && !Character.isDigit(mt.text.charAt(s))) s += 1
        mt.copy(start = s)
      case PiiType.CreditScoreRating =>
        val n = mt.text.length
        var s = mt.start + 14
        while (s < n && Character.isWhitespace(mt.text.charAt(s))) s += 1
        mt.copy(start = s)
      case _ => mt
    }
  }

  /** scan + refine + stable sort by start (backend/pdf/PIIDetector.py:133-140).
    * The full-table default path uses the dispatch scanner; any custom
    * pattern subset (reference-parity tests) takes the combined-regex
    * path. The two scanners are differential-tested for equality. */
  def extract(text: String, pattern: Pattern = combined,
              nGroups: Int = patterns.length): Vector[PiiMatch] = {
    val raw =
      if (pattern eq combined) scanFast(text) else scan(text, pattern, nGroups)
    refine(raw).sortBy(_.start)(Ordering.Int)
  }

  /** Reference-subset extract, for golden-fixture parity tests. */
  def extractReference(text: String): Vector[PiiMatch] =
    extract(text, combinedReference, 6)

  /** Span→token join, first-match-wins.
    *
    * Document-local nested loop (reference: backend/pdf/PIIDetector.py:167-189):
    * for each token, the first (lowest-start, matches pre-sorted) overlapping
    * PII labels it, then `break`. Partial overlap labels the *whole* token.
    * Both sides live in one row — deliberately zero-shuffle (SURVEY §2.5).
    */
  def spanJoin(tokens: IndexedSeq[WordToken],
               matches: IndexedSeq[PiiMatch]): IndexedSeq[WordToken] = {
    if (matches.isEmpty) return tokens // common case: clean doc, zero work
    tokens.map { t =>
      if (t.detectedAs.isDefined) t
      else {
        var found: String = null
        var i = 0
        while (found == null && i < matches.length) {
          val m = matches(i)
          if (t.overlaps(m.start, m.end)) found = m.piiType.value
          i += 1
        }
        if (found == null) t else t.copy(detectedAs = Some(found))
      }
    }
  }

  /** Deterministic text scrub — the graft's analog of the reference's
    * black-box redaction annotations (backend/pdf/PDFRedactor.py:84-120),
    * masking text instead of pixels.
    *
    * Contract (golden-tested, byte-stable across runs/parallelism):
    * `scrubbed_text` is `full_text` with every labeled token's character
    * range replaced by the literal `[PII:<label>]`, where `<label>` is the
    * reference's enum value string. Unlabeled text is copied verbatim.
    */
  def scrub(fullText: String, labeled: IndexedSeq[WordToken]): String = {
    // common case: nothing labeled — the scrubbed text IS the full text
    var any = false
    var i = 0
    while (!any && i < labeled.length) {
      if (labeled(i).detectedAs.isDefined) any = true
      i += 1
    }
    if (!any) return fullText
    val sb = new java.lang.StringBuilder(fullText.length + 16)
    var pos = 0
    i = 0
    while (i < labeled.length) {
      val t = labeled(i)
      if (t.detectedAs.isDefined) {
        if (t.start > pos) sb.append(fullText, pos, t.start)
        sb.append("[PII:").append(t.detectedAs.get).append("]")
        pos = t.end
      }
      i += 1
    }
    if (pos < fullText.length) sb.append(fullText, pos, fullText.length)
    sb.toString
  }

  /** Full document-local detection pipeline over pre-extracted text:
    * tokenize (offset contract) → scan/refine/sort → span join → scrub.
    * Returns (fullText, matches, labeledTokens, scrubbedText).
    */
  def detectAndScrub(text: String, referenceOnly: Boolean = false)
      : (String, Vector[PiiMatch], IndexedSeq[WordToken], String) = {
    val (fullText, tokens) = Tokenizer.tokenize(text)
    val matches =
      if (referenceOnly) extractReference(fullText) else extract(fullText)
    val labeled = spanJoin(tokens, matches)
    (fullText, matches, labeled, scrub(fullText, labeled))
  }
}
