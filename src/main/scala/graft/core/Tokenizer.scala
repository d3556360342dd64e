package graft.core

import scala.collection.mutable.ArrayBuffer

/** Word tokenizer with the reference's running-offset contract.
  *
  * The reference rebuilds `full_text` from a word stream (PyMuPDF words,
  * backend/pdf/PDFAdapter.py:167-241): blank words are skipped *before*
  * index assignment (:213-216), words are joined by exactly one space
  * (:220), `end = start + len(word)` half-open (:218), `start = prev_end+1`
  * (:234), offsets continue across pages (:203-204), and the trailing space
  * is stripped (:239). Given the same word stream the output is
  * byte-deterministic — that is the "byte-identical extracted text per url"
  * contract (BASELINE.json input_hint).
  *
  * For webtext, the word stream is the input `text` split on Unicode
  * whitespace runs. The rebuilt `full_text` is therefore the canonical
  * single-space-normalized form of the page text, and every token is a
  * single contiguous `[start, end)` view into it (SURVEY §1.3).
  */
object Tokenizer {

  /** Split `text` into non-blank words on `Character.isWhitespace` runs.
    * Single forward pass, no regex — deterministic and allocation-light. */
  def words(text: String): IndexedSeq[String] = {
    val out = new ArrayBuffer[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val w0 = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > w0) out += text.substring(w0, i)
    }
    out.toIndexedSeq
  }

  /** Word count under the same contract as [[words]], without building the
    * word list — no substring allocation, one char pass. Called from both
    * the interpreted eval and the generated code of `graft_word_count`
    * (the codegen target must be a static-dispatch JVM method). */
  def wordCount(text: String): Long = {
    var i = 0
    val n = text.length
    var c = 0L
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      if (i < n) c += 1
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
    }
    c
  }

  /** Primitive-array form of [[tokenize]]: one fused pass producing
    * (fullText, words, startOffsets) with `end = start + word.length`
    * implied. The fused pipeline uses this and materializes [[WordToken]]
    * objects only for documents that actually have PII matches — on clean
    * webtext that skips ~150 object allocations per document. */
  def tokenizeArrays(text: String): (String, Array[String], Array[Int]) = {
    // raw doubling arrays, not ArrayBuffers: ArrayBuffer[Int] boxes every
    // start offset (an Integer per word on the hottest path in the
    // engine), and toArray copies a second time
    var ws = new Array[String](16)
    var starts = new Array[Int](16)
    var nW = 0
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    val n = text.length
    var start = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val w0 = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > w0) {
        val w = text.substring(w0, i)
        if (sb.length > 0) sb.append(' ')
        sb.append(w)
        if (nW == ws.length) {
          ws = java.util.Arrays.copyOf(ws, nW * 2)
          starts = java.util.Arrays.copyOf(starts, nW * 2)
        }
        ws(nW) = w
        starts(nW) = start
        nW += 1
        start += w.length + 1
      }
    }
    (sb.toString,
      if (nW == ws.length) ws else java.util.Arrays.copyOf(ws, nW),
      if (nW == starts.length) starts else java.util.Arrays.copyOf(starts, nW))
  }

  /** Materialize the token objects for a tokenizeArrays result. */
  def tokensOf(ws: Array[String], starts: Array[Int]): IndexedSeq[WordToken] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      Array.tabulate(ws.length)(k =>
        WordToken(ws(k), starts(k), starts(k) + ws(k).length)))

  /** Rebuild (fullText, tokens-with-offsets) per the reference contract. */
  def tokenize(text: String): (String, IndexedSeq[WordToken]) = {
    val (full, ws, starts) = tokenizeArrays(text)
    (full, tokensOf(ws, starts))
  }
}
