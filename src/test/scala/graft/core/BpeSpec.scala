package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Trained-BPE gates: deterministic merges, lossless encoding, the exact
  * left-to-right non-overlapping merge semantics the DuckDB replace-chain
  * oracle mirrors, and real compression on in-domain words. */
class BpeSpec extends AnyFunSuite {

  test("merge table is deterministic, full-length, letters-only") {
    val m = Bpe.defaultMerges
    assert(m.length == Bpe.DefaultNumMerges)
    // retraining from the same frequencies reproduces it exactly
    val freq = scala.collection.mutable.HashMap[String, Int]()
    Seq("en", "fr", "es", "de").zipWithIndex.foreach { case (lang, li) =>
      SeedCorpus.corpus(lang, 5000, seed = 7000L + li).foreach { w =>
        val lw = w.toLowerCase(java.util.Locale.ROOT)
        freq(lw) = freq.getOrElse(lw, 0) + 1
      }
    }
    assert(Bpe.train(freq.toMap) == m)
    // symbols never contain the oracle's bracket delimiter
    assert(m.forall { case (a, b) => !(a + b).contains("|") })
  }

  test("encode is lossless: concatenated tokens rebuild the word") {
    val words = SeedCorpus.vocab("en") ++ SeedCorpus.vocab("fr") ++
      Seq("xyzzy", "a", "", "don't", "12-34", "a|b", "ZzZ".toLowerCase)
    words.foreach { w =>
      assert(Bpe.encode(w, Bpe.defaultMerges).mkString == w, s"word '$w'")
    }
  }

  test("applyMerge is left-to-right non-overlapping (the replace-chain " +
      "contract: 'a a a a' -> 'aa aa', 'a a a' -> 'aa a')") {
    def am(s: Seq[String]) = Bpe.applyMerge(s.toArray, "a", "a").toSeq
    assert(am(Seq("a", "a", "a", "a")) == Seq("aa", "aa"))
    assert(am(Seq("a", "a", "a")) == Seq("aa", "a"))
    assert(am(Seq("b", "a", "a", "c")) == Seq("b", "aa", "c"))
    assert(am(Seq("b", "c")) == Seq("b", "c"))
  }

  test("in-domain words compress; OOV gibberish stays near char-level") {
    // high-frequency corpus words must have learned merges
    assert(Bpe.tokenCount("the") <= 2)
    assert(Bpe.tokenCount("that") <= 3)
    val avgVocab = SeedCorpus.vocab("en").take(50)
      .map(w => Bpe.tokenCount(w).toDouble / w.length).sum / 50
    assert(avgVocab < 0.8, s"vocab compression ratio $avgVocab")
    // consonant gibberish shares no merges -> ~1 token per char
    assert(Bpe.tokenCount("zqxjvk") >= 5)
  }

  test("symbols are code points, not UTF-16 units: astral chars are ONE " +
      "token (matching DuckDB's per-codepoint split)") {
    val word = "a😀b" // a 😀 b
    val toks = Bpe.encode(word, Bpe.defaultMerges)
    assert(toks.length == 3, toks.toSeq)
    assert(toks.mkString == word)
  }

  test("countText: whitespace words, lowercased, summed") {
    assert(Bpe.countText("The the\nTHE") == 3L * Bpe.tokenCount("the"))
    assert(Bpe.countText("") == 0L)
    assert(Bpe.countText("   ") == 0L)
  }
}
