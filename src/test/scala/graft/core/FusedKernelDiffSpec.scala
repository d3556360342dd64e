package graft.core

import java.util.Locale

import org.scalacheck.{Gen, Prop, Properties}
import Prop.forAll

/** Differential gates for the round-6 allocation-free kernel rewrites:
  * every fused fast path must be BIT-IDENTICAL to the reference
  * formulation it replaced (per-word lowercase+hash in Heuristics, the
  * scorer's word normalization in NGramLM, the padded lowercase n-gram
  * accumulation in LangId) — including on the Unicode edge cases whose
  * String.toLowerCase mapping is not per-char (İ, final sigma Σ,
  * surrogate pairs) and on blank/degenerate inputs. */
object FusedKernelDiffSpec extends Properties("graft.fusedkernels") {

  // word generator biased toward the hazardous alphabet: ASCII mixed-case,
  // digits/punct, accents, Greek incl. capital sigma, Turkish İ/ı,
  // fullwidth, CJK, emoji (surrogate pairs), combining marks
  private val hazardChars: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('.', '-', '_', '@', '%', '#', '…', '{', '!'),
    2 -> Gen.oneOf('é', 'É', 'à', 'ß', 'Ü', 'ç', 'Ñ'),
    2 -> Gen.oneOf('Σ', 'σ', 'ς', 'α', 'Ω', 'İ', 'ı'),
    1 -> Gen.oneOf('中', '文', '測', '試', '。'),
    1 -> Gen.oneOf('\uD83D', '\uDE00', 'Ａ'), // lone + paired surrogates
    1 -> Gen.oneOf(' ', '\n', '\t'))

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, hazardChars))
  private val text: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val fixedWords = Seq(
    "", "the", "THE", "The", "viagra", "VIAGRA", "Casino", "porno",
    "İstanbul", "ΣΟΦΟΣ", "ΟΔΟΣ", "naïve", "ÄRGER", "śĆ", "中文",
    "😀", "\uD83D", "\uDE00", "123", "...", "a1b2",
    "STRASSE", "straße", "ẞß")

  private def normRef(w: String): Long = {
    val f = w.filter(Character.isLetter).toLowerCase(Locale.ROOT)
    if (f.isEmpty) 0L else NGramLM.hashWord(f)
  }

  property("normWordHash == hash(filter(isLetter).toLowerCase), fixed") =
    Prop(fixedWords.forall(w => NGramLM.normWordHash(w) == normRef(w)))

  property("normWordHash == hash(filter(isLetter).toLowerCase), random") =
    forAll(word) { w => NGramLM.normWordHash(w) == normRef(w) }

  property("perplexityOfWords consistent with perplexityOfText") =
    forAll(Gen.listOf(word)) { ws0 =>
      val ws = ws0.filter(w => w.nonEmpty && !w.exists(Character.isWhitespace))
      val m = NGramLM.models("en")
      val viaWords = m.perplexityOfWords(ws.toIndexedSeq)
      val viaText = m.perplexityOfText(ws.mkString(" "))
      viaWords == viaText
    }

  property("langid fast accumulation == exact path, fixed") = Prop {
    Seq("", "a", "Hello World", "ΣΟΦΟΣ ΟΔΟΣ", "İstanbul kapı",
      "mixed ΣA😀 b", "中文測試。", "ALL CAPS TEXT", "a\nb\n\nc").forall { t =>
      LangId.bucketCountsForTest(t, exact = false) ==
        LangId.bucketCountsForTest(t, exact = true)
    }
  }

  property("langid fast accumulation == exact path, random") =
    forAll(text) { t =>
      LangId.bucketCountsForTest(t, exact = false) ==
        LangId.bucketCountsForTest(t, exact = true)
    }

  private def wordScanMatchesReference(wsIn: Seq[String], lang: String): Boolean = {
    val ws = wsIn.filter(w => w.nonEmpty && !w.exists(Character.isWhitespace))
      .toIndexedSeq
    val lower = ws.map(_.toLowerCase(Locale.ROOT))
    val (hashes, lens, lenSum, alpha, stop, block) =
      Heuristics.wordScanForTest(ws, lang)
    val stops = SeedCorpus.stopwordsFor(lang)
    hashes.toSeq == lower.map(NGramLM.hashWord) &&
      lens.toSeq == lower.map(_.length) &&
      lenSum == ws.map(_.length.toLong).sum &&
      alpha == ws.count(_.exists(Character.isLetter)) &&
      stop == lower.distinct.count(stops.contains) &&
      block == lower.count(Heuristics.Blocklist.contains)
  }

  property("heuristics fused word scan == reference, fixed") =
    Prop(Seq("en", "de").forall(wordScanMatchesReference(fixedWords, _)))

  property("heuristics fused word scan == reference, random") =
    forAll(Gen.listOf(word), Gen.oneOf("en", "fr", "es", "de", "zh", "xx")) {
      (ws, lang) => wordScanMatchesReference(ws, lang)
    }

  property("graft_is_blank == trim(BlankChars)-length-0 (old predicate)") = {
    import org.apache.spark.unsafe.types.UTF8String
    val trimSet = UTF8String.fromString(Blank.Chars)
    def ref(s: String): Boolean =
      UTF8String.fromString(s).trim(trimSet).numChars() == 0
    def fused(s: String): Boolean =
      graft.expr.Kernels.isBlankText(UTF8String.fromString(s))
    val fixed = Seq("", " ", " ", "　　", " \t\n ", "a", " a ",
      " x", "中", "😀", Blank.Chars, Blank.Chars + ".")
    Prop(fixed.forall(s => fused(s) == ref(s) && Blank.isBlankString(s) == ref(s))) &&
      forAll(text) { t => fused(t) == ref(t) && Blank.isBlankString(t) == ref(t) }
  }

  property("ArrayData-native cosine/ivf bit-identical to VecMath.cosine") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vec = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))
    forAll(vec, vec) { (x, y) =>
      val xa = x.toArray
      val ya = y.toArray
      val gx = new GenericArrayData(xa.map(java.lang.Double.valueOf(_): Any))
      val gy = new GenericArrayData(ya.map(java.lang.Double.valueOf(_): Any))
      // bit-level compare (cosine may legitimately be 0.0 vs -0.0 only if
      // the implementations diverge — they must not)
      java.lang.Double.doubleToRawLongBits(graft.expr.Kernels.cosine(gx, gy)) ==
        java.lang.Double.doubleToRawLongBits(VecMath.cosine(xa, ya))
    }
  }

  property("ivfAssign == argmax over VecMath.cosine (thread-cached centroids)") = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def ga(x: Array[Double]) =
      new GenericArrayData(x.map(java.lang.Double.valueOf(_): Any))
    val vec = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5.0, 5.0)).map(_.toArray))
    forAll(vec, Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, vec))) {
      (x, cents) =>
        val centsAD = new GenericArrayData(cents.map(ga(_): Any).toArray)
        val got = graft.expr.Kernels.ivfAssign(ga(x), centsAD)
        // reference: first index of the max cosine (ties -> lowest)
        var best = 0L
        var bestSim = Double.NegativeInfinity
        cents.zipWithIndex.foreach { case (c, i) =>
          val s = VecMath.cosine(x, c)
          if (s > bestSim) { bestSim = s; best = i.toLong }
        }
        // call twice: the second goes through the thread-local cache hit
        got == best && graft.expr.Kernels.ivfAssign(ga(x), centsAD) == best
    }
  }

  property("evaluate stable and rule-distinct on hazard texts") =
    forAll(text, Gen.oneOf("en", "de", "zh")) { (t, lang) =>
      val rs = Heuristics.evaluate(t, lang)
      rs.map(_.rule).distinct.size == rs.size &&
        Heuristics.evaluate(t, lang) == rs
    }
}
