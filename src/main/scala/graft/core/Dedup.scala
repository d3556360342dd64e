package graft.core

import java.util.Locale
import scala.collection.mutable

/** Deduplication / fingerprinting primitives for the training-data ops
  * layer: word-shingle sets, MinHash signatures + LSH banding, SimHash,
  * and a rolling-hash document fingerprint.
  *
  * All hashing is explicit 64-bit FNV/mix math — deterministic across
  * JVMs, no `scala.util.hashing` (whose seeds can differ per run).
  */
object Dedup {

  final val DefaultShingleSize = 3
  final val DefaultNumHashes = 128
  final val DefaultBands = 32 // 32 bands x 4 rows

  /** Distinct hashed word k-shingles of the lowercased text. */
  def shingles(text: String, k: Int = DefaultShingleSize): Array[Long] = {
    val ws = Tokenizer.words(text).map(_.toLowerCase(Locale.ROOT))
    if (ws.length < k) {
      if (ws.isEmpty) Array.empty
      else Array(ws.foldLeft(0x9e3779b97f4a7c15L)((h, w) =>
        NGramLM.combine(h, NGramLM.hashWord(w))))
    } else {
      val set = mutable.HashSet[Long]()
      var i = 0
      while (i + k <= ws.length) {
        var h = 0x9e3779b97f4a7c15L
        var j = i
        while (j < i + k) { h = NGramLM.combine(h, NGramLM.hashWord(ws(j))); j += 1 }
        set += h
        i += 1
      }
      set.toArray
    }
  }

  /** Universal-hash family: h_i(x) = mix(x ^ seed_i). Seeds derived from a
    * fixed SplitMix64 stream (seed 42) — identical on every executor. */
  private val hashSeeds: Array[Long] = {
    val out = new Array[Long](DefaultNumHashes)
    var s = 42L
    var i = 0
    while (i < out.length) {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    out
  }

  private def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** MinHash signature (numHashes mins over the shingle set). Empty text →
    * all Long.MaxValue. NOTE: every empty doc shares that signature, so
    * empty docs MUST NOT be banded (see [[lshBandKeysGuarded]]) — on real
    * web data billions of near-empty pages would otherwise all land in one
    * quadratic LSH bucket. */
  def minHashSignature(text: String, k: Int = DefaultShingleSize,
                       numHashes: Int = DefaultNumHashes): Array[Long] =
    minHashFromShingles(shingles(text, k), numHashes)

  def minHashFromShingles(sh: Array[Long],
                          numHashes: Int = DefaultNumHashes): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var si = 0
    while (si < sh.length) {
      val x = sh(si)
      var i = 0
      while (i < numHashes) {
        val h = mix(x ^ hashSeeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      si += 1
    }
    sig
  }

  /** LSH band keys for a document's text with the empty-doc skew guard:
    * docs with no shingles emit NO bands (they cannot be near-duplicates of
    * anything by the shingle-Jaccard definition, and banding them would
    * collapse every empty/whitespace page into one quadratic bucket). */
  def lshBandKeysGuarded(text: String, k: Int = DefaultShingleSize,
                         bands: Int = DefaultBands): Array[Long] = {
    val sh = shingles(text, k)
    if (sh.isEmpty) Array.empty
    else lshBandKeys(minHashFromShingles(sh), bands)
  }

  /** LSH band keys: hash of each band's rows. Two docs sharing any band key
    * are near-dup candidates (b=32, r=4 → ~50% capture at J≈0.7). */
  def lshBandKeys(sig: Array[Long], bands: Int = DefaultBands): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L ^ b.toLong
      var r = 0
      while (r < rows) { h = NGramLM.combine(h, sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Estimated Jaccard from two MinHash signatures. */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** 64-bit SimHash over hashed word unigrams+bigrams (Charikar 2002). */
  def simHash(text: String): Long = {
    val ws = Tokenizer.words(text).map(_.toLowerCase(Locale.ROOT))
    val v = new Array[Int](64)
    def vote(h: Long): Unit = {
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) v(bit) += 1 else v(bit) -= 1
        bit += 1
      }
    }
    // each word hashed ONCE, previous hash carried for the bigram vote
    // (the bigram-at-i formulation re-hashed every word up to 3x); vote
    // multiset is identical — same simhash bit-for-bit
    var i = 0
    var prevH = 0L
    while (i < ws.length) {
      val h = NGramLM.hashWord(ws(i))
      vote(mix(h))
      if (i > 0) vote(mix(NGramLM.combine(prevH, h)))
      prevH = h
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (v(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling polynomial-hash document fingerprint (content-defined): the
    * min of window hashes per 64-char window, xor-folded — stable under
    * identical content, order-sensitive. */
  def fingerprint(text: String, window: Int = 64): Long = {
    if (text.isEmpty) return 0L
    val p = 1099511628211L
    var pow = 1L
    var i = 0
    while (i < window - 1) { pow *= p; i += 1 }
    var h = 0L
    var minH = Long.MaxValue
    var acc = 0L
    i = 0
    while (i < text.length) {
      h = h * p + text.charAt(i)
      if (i >= window) h -= pow * p * text.charAt(i - window)
      if (i >= window - 1 || i == text.length - 1) {
        val m = mix(h)
        if (m < minH) minH = m
        acc ^= java.lang.Long.rotateLeft(m, i & 63)
      }
      i += 1
    }
    mix(minH ^ acc)
  }
}
