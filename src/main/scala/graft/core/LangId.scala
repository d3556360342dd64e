package graft.core

import java.util.Locale

/** fastText-style language identifier (Joulin et al. 2016, "Bag of Tricks
  * for Efficient Text Classification").
  *
  * Character n-grams (n = 2..4) over the lowercased text with boundary
  * padding, hashed into B buckets (FNV-1a, hashing trick), scored against
  * per-language log-probability profiles (multinomial NB — the linear
  * classifier degenerate case of fastText with one epoch / closed form),
  * softmax for confidence.
  *
  * The model is synthesized deterministically at object init from the
  * embedded [[SeedCorpus]] — no external data, no RNG beyond the fixed
  * seed, pure sequential float math (SURVEY §7.5.4: no parallel reduction,
  * so scores are bit-identical across JVMs and parallelism levels).
  *
  * At Spark scale the profile table (5 langs x 2^15 floats ~ 640 KB) is
  * broadcast once per executor via the lazily-initialized singleton — it
  * never rides in task closures (SURVEY §2.8).
  */
object LangId {

  final val NGramMin = 2
  final val NGramMax = 4
  final val Buckets = 1 << 15
  private final val BucketMask = Buckets - 1

  val languages: IndexedSeq[String] = SeedCorpus.languages

  /** FNV-1a 32-bit over the chars of s[from, until). */
  private def fnv1a(s: CharSequence, from: Int, until: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h = (h ^ (c & 0xff)) * 0x01000193
      h = (h ^ ((c >> 8) & 0xff)) * 0x01000193
      i += 1
    }
    h
  }

  private def bucket(s: CharSequence, from: Int, until: Int): Int =
    fnv1a(s, from, until) & BucketMask

  /** Accumulate hashed n-gram counts of `text` into `acc`; returns total n-grams. */
  private def countNGrams(text: String, acc: Array[Int]): Long = {
    val padded = new java.lang.StringBuilder(text.length + 2)
      .append('<').append(text.toLowerCase(Locale.ROOT)).append('>')
    var total = 0L
    var n = NGramMin
    while (n <= NGramMax) {
      var i = 0
      val last = padded.length - n
      while (i <= last) {
        acc(bucket(padded, i, i + n)) += 1
        total += 1
        i += 1
      }
      n += 1
    }
    total
  }

  /** Per-language log-prob profiles, built once per JVM. */
  lazy val profiles: Array[Array[Float]] = {
    languages.zipWithIndex.map { case (lang, li) =>
      val counts = new Array[Int](Buckets)
      // 40k words of deterministic pseudo-corpus per language.
      val text = SeedCorpus.corpus(lang, 40000, seed = 42L + li).mkString(" ")
      val total = countNGrams(text, counts)
      val w = new Array[Float](Buckets)
      val denom = math.log(total.toDouble + 0.5 * Buckets)
      var b = 0
      while (b < Buckets) {
        w(b) = (math.log(counts(b) + 0.5) - denom).toFloat
        b += 1
      }
      w
    }.toArray
  }

  /** Predict (language, confidence) for a text. Empty/blank → ("und", 0.0). */
  def predict(text: String): (String, Double) = {
    if (text == null || text.isEmpty) return ("und", 0.0)
    val counts = new Array[Int](Buckets)
    val total = countNGrams(text, counts)
    if (total == 0) return ("und", 0.0)
    val scores = new Array[Double](languages.length)
    var li = 0
    while (li < languages.length) {
      val w = profiles(li)
      var s = 0.0
      var b = 0
      while (b < Buckets) {
        val c = counts(b)
        if (c != 0) s += c * w(b)
        b += 1
      }
      scores(li) = s / total // mean log-prob, length-normalized
      li += 1
    }
    // softmax over mean log-probs, temperature tuned for spread
    var maxS = scores(0)
    li = 1
    while (li < scores.length) { if (scores(li) > maxS) maxS = scores(li); li += 1 }
    var z = 0.0
    val temp = 8.0
    val ex = new Array[Double](scores.length)
    li = 0
    while (li < scores.length) {
      ex(li) = math.exp((scores(li) - maxS) * temp)
      z += ex(li)
      li += 1
    }
    var best = 0
    li = 1
    while (li < scores.length) { if (scores(li) > scores(best)) best = li; li += 1 }
    (languages(best), ex(best) / z)
  }
}
