package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the synthesized quality models: langid separability,
  * perplexity ordering, heuristic rule correctness, dedup primitives.
  * All models are deterministic (fixed seeds), so exact assertions hold
  * across JVMs and runs (SURVEY §7.5.4).
  */
class QualityModelSpec extends AnyFunSuite {

  private def sampleText(lang: String, n: Int, seed: Long): String = {
    val rnd = new java.util.Random(seed)
    (1 to n).map(_ => SeedCorpus.sampleWord(lang, rnd)).mkString(" ")
  }

  test("langid separates the five seed languages") {
    SeedCorpus.languages.foreach { lang =>
      val text = sampleText(lang, 80, seed = 7)
      val (pred, conf) = LangId.predict(text)
      assert(pred == lang, s"$lang predicted as $pred (conf $conf)")
      assert(conf > 0.5, s"$lang conf=$conf")
    }
  }

  test("langid is deterministic and handles degenerate inputs") {
    val t = sampleText("fr", 50, 11)
    assert(LangId.predict(t) == LangId.predict(t))
    assert(LangId.predict("") == (("und", 0.0)))
    assert(LangId.predict(null) == (("und", 0.0)))
    // blank (not just empty) — whitespace n-grams must not score as a
    // language with real confidence
    assert(LangId.predict("   \n\t ") == (("und", 0.0)))
  }

  test("perplexity: in-domain text scores far lower than gibberish") {
    val inDomain = sampleText("en", 100, 3)
    val gibberish = (1 to 100).map(i => s"zzq${i}xv").mkString(" ")
    val pplIn = NGramLM.perplexity(inDomain, "en")
    val pplOut = NGramLM.perplexity(gibberish, "en")
    assert(pplIn < pplOut / 10, s"in=$pplIn out=$pplOut")
    assert(pplIn > 1.0)
  }

  test("perplexity is deterministic and uses the right language model") {
    val t = sampleText("de", 60, 5)
    assert(NGramLM.perplexity(t, "de") == NGramLM.perplexity(t, "de"))
    assert(NGramLM.perplexity(t, "de") < NGramLM.perplexity(t, "es"))
  }

  test("langid HOLDOUT accuracy >= 0.95: validation corpus from seeds " +
      "disjoint from training (42L+li) and from PagesSynth's " +
      "retry-until-agrees loop — closes the construction-consistency " +
      "circularity of the langid_pred oracle") {
    // 200 docs per language, 40-160 words each, seeded from a stream no
    // other generator uses; NO retry/validation — first sample is final
    SeedCorpus.languages.foreach { lang =>
      val li = SeedCorpus.languages.indexOf(lang)
      var correct = 0
      val nDocs = 200
      (0 until nDocs).foreach { d =>
        val rnd = new java.util.Random(0x601d0e77L + li * 100003L + d)
        val n = 40 + rnd.nextInt(121)
        val text = (1 to n).map { i =>
          val w = SeedCorpus.sampleWord(lang, rnd)
          if (i % 12 == 0) w + "." else w
        }.mkString(" ")
        if (LangId.predict(text)._1 == lang) correct += 1
      }
      val acc = correct.toDouble / nDocs
      assert(acc >= 0.95, f"holdout langid accuracy for $lang: $acc%.3f")
    }
  }

  test("perplexity HOLDOUT margin: on the same disjoint-seed validation " +
      "corpus, clean in-language text scores under the keep gate and " +
      "gibberish scores far above it, for every language") {
    SeedCorpus.languages.foreach { lang =>
      val li = SeedCorpus.languages.indexOf(lang)
      val ppls = (0 until 50).map { d =>
        val rnd = new java.util.Random(0x9e77e8b1L + li * 100003L + d)
        val text = (1 to 120).map(_ => SeedCorpus.sampleWord(lang, rnd))
          .mkString(" ")
        NGramLM.perplexity(text, lang)
      }.sorted
      val median = ppls(ppls.length / 2)
      assert(median <= Heuristics.PerplexityMax * 0.8,
        s"$lang holdout median ppl $median above the generator gate")
      // gibberish under the SAME model: random consonant words (full OOV)
      val rnd = new java.util.Random(0xbadc0de5L + li)
      val gib = (1 to 120).map { _ =>
        (1 to 5).map(_ => "bcdfghjklmnpqrstvwz".charAt(rnd.nextInt(19)))
          .mkString
      }.mkString(" ")
      val gibPpl = NGramLM.perplexity(gib, lang)
      assert(gibPpl > 2 * median,
        s"$lang gibberish ppl $gibPpl not above 2x clean median $median")
      assert(gibPpl > Heuristics.PerplexityMax,
        s"$lang gibberish ppl $gibPpl under the drop gate")
    }
  }

  test("heuristics: clean doc keeps, planted defects drop the right rule") {
    val clean = {
      val rnd = new java.util.Random(123)
      (1 to 8).map { _ =>
        val body = (1 to 12).map(_ => SeedCorpus.sampleWord("en", rnd))
        "the " + body.mkString(" ") + " of that."
      }.mkString(" ")
    }
    val cleanRules = Heuristics.evaluate(clean)
    assert(Heuristics.keep(cleanRules),
      cleanRules.filter(_.fired).map(_.rule).mkString(","))

    def fired(text: String): Set[String] =
      Heuristics.evaluate(text).filter(_.fired).map(_.rule).toSet

    assert(fired("too short doc.").contains("word_count_min"))
    assert(fired(clean + " ###### ## ## # # # # # # # # # # # # # # # # # " +
      "# # # # # # # # # # # # #").contains("symbol_to_word_ratio"))
    assert(fired(clean.replace("the", "0101 10")).contains("alpha_word_ratio"))
    assert(fired(clean + " lorem ipsum dolor").contains("lorem_ipsum"))
    val noStop = (1 to 60).map(i => s"word$i cat dog run fast.").mkString(" ")
    assert(fired(noStop).contains("stopword_count"))
    val repeated = ("alpha beta gamma delta epsilon zeta " * 30) +
      "the of and to be." // stopwords so only repetition fires
    assert(fired(repeated).exists(_.endsWith("gram_char_fraction")))
    val dupLines = (("this line is the same every time with all of that.\n") * 20)
    assert(fired(dupLines).contains("dup_line_fraction"))
  }

  test("toxicity blocklist: any hit drops, count in lineage, exact " +
      "lowercased-token membership (no substring matches)") {
    val clean = {
      val rnd = new java.util.Random(321)
      (1 to 8).map { _ =>
        val body = (1 to 12).map(_ => SeedCorpus.sampleWord("en", rnd))
        "the " + body.mkString(" ") + " of that."
      }.mkString(" ")
    }
    def rule(text: String): RuleResult =
      Heuristics.evaluate(text).find(_.rule == "blocklist_hit").get
    assert(!rule(clean).fired)
    val hit = rule(clean + " VIAGRA casino viagra")
    assert(hit.fired && hit.value == 3.0, hit)
    assert(!Heuristics.keep(Heuristics.evaluate(clean + " nsfw")))
    // exact token membership: substrings and punctuation-fused tokens
    // do not count (the oracle's list_contains mirror behaves the same)
    assert(!rule(clean + " casinos xxx.").fired)
  }

  test("dedup: minhash estimates jaccard, simhash tracks edits") {
    val a = sampleText("en", 200, 21)
    val bNear = a + " tail extra words here"
    val cFar = sampleText("en", 200, 99)

    val jNear = Dedup.jaccard(Dedup.shingles(a), Dedup.shingles(bNear))
    val jFar = Dedup.jaccard(Dedup.shingles(a), Dedup.shingles(cFar))
    assert(jNear > 0.8 && jFar < 0.5, s"jNear=$jNear jFar=$jFar")

    val estNear = Dedup.estimatedJaccard(
      Dedup.minHashSignature(a), Dedup.minHashSignature(bNear))
    assert(math.abs(estNear - jNear) < 0.15, s"est=$estNear true=$jNear")

    // near-dups share at least one LSH band; far docs share none
    val bandsA = Dedup.lshBandKeys(Dedup.minHashSignature(a)).toSet
    val bandsB = Dedup.lshBandKeys(Dedup.minHashSignature(bNear)).toSet
    val bandsC = Dedup.lshBandKeys(Dedup.minHashSignature(cFar)).toSet
    assert(bandsA.intersect(bandsB).nonEmpty)
    assert(bandsA.intersect(bandsC).isEmpty)

    val hNear = Dedup.hammingDistance(Dedup.simHash(a), Dedup.simHash(bNear))
    val hFar = Dedup.hammingDistance(Dedup.simHash(a), Dedup.simHash(cFar))
    assert(hNear < hFar, s"hNear=$hNear hFar=$hFar")

    // fingerprint: identical content identical, different content differs
    assert(Dedup.fingerprint(a) == Dedup.fingerprint(a))
    assert(Dedup.fingerprint(a) != Dedup.fingerprint(cFar))
  }

  test("dedup: empty/whitespace docs emit no LSH bands (skew guard)") {
    // Without the guard every empty page shares the all-MaxValue signature
    // and lands in ONE quadratic band bucket — a blowup on real web data.
    assert(Dedup.lshBandKeysGuarded("").isEmpty)
    assert(Dedup.lshBandKeysGuarded("   \n\t  ").isEmpty)
    assert(Dedup.lshBandKeysGuarded("real words present here").nonEmpty)
  }
}
