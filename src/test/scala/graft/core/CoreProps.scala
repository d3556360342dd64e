package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import Prop.forAll

/** Property-based coverage for the document-local kernel (SURVEY §5.4.3):
  * tokenizer round-trip, segment-slice identity, overlap algebra, scrub
  * idempotence, detection offset-stability under concatenation.
  * Runs under sbt's native ScalaCheck test framework.
  */
object CoreProps extends Properties("graft.core") {

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const(" "), Gen.const("\n"),
    Gen.const("\t"), Gen.const("#!?."), Gen.const("  "))).map(_.mkString)

  property("token round-trip: join(tokens,' ') == full_text") =
    forAll(textGen) { text =>
      val (full, toks) = Tokenizer.tokenize(text)
      toks.map(_.text).mkString(" ") == full
    }

  property("segment slice equals token text") =
    forAll(textGen) { text =>
      val (full, toks) = Tokenizer.tokenize(text)
      toks.forall(t => full.substring(t.start, t.end) == t.text)
    }

  property("tokenization idempotent on rebuilt text") =
    forAll(textGen) { text =>
      val (full, _) = Tokenizer.tokenize(text)
      Tokenizer.tokenize(full)._1 == full
    }

  private val spanGen: Gen[(Int, Int)] = for {
    s <- Gen.choose(0, 50)
    len <- Gen.choose(1, 10)
  } yield (s, s + len)

  property("overlap is symmetric and half-open") =
    forAll(spanGen, spanGen) { case ((a0, a1), (b0, b1)) =>
      val expected = a0 < b1 && b0 < a1
      WordToken("t", a0, a1).overlaps(b0, b1) == expected &&
        WordToken("u", b0, b1).overlaps(a0, a1) == expected
    }

  private val piiWordGen: Gen[String] = Gen.oneOf(
    "alpha", "123-45-6789", "beta", "987654321", "user@example.com", "text")

  property("scrub is idempotent") =
    forAll(Gen.listOf(piiWordGen)) { ws =>
      val text = ws.mkString(" ")
      val once = PiiDetector.detectAndScrub(text)._4
      PiiDetector.detectAndScrub(once)._4 == once
    }

  // adversarial doc generator for the scanner differential: pii strings,
  // digit runs, credit literals, emails mid-word, unicode digits, NBSP
  private val advDocGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.oneOf("123-45-6789", "987654321", "12345678901", "credit score: 750",
      "Credit Report: very good", "4111 1111 1111 1111", "(415) 555-0199",
      "a@b.com", "user.name+tag@example.co.uk", "10.1.2.3", "99999",
      "credit", "creditscore:750", "score:", "cred", "C", "(", "(((",
      "xcredit report: bad", "ab123-45-6789cd", "zz@", "@zz", "١٢٣-٤٥-٦٧٨٩",
      "credit score: 812", "1234567890@example.com", ".b@c.de",
      "-a@b.io", "12.34", "...", "#tag",
      // round-5 dispatch-rewrite shapes: astral-digit mixes, run-length
      // precheck boundaries, credit-literal fold traps
      "1𝟐𝟑-45-6789", "12𝟑4567",
      "123456789012345678", "12345678901234567", "9999999999999999999",
      "1.2.3.4", "12.34.56.78", "credıt score: 750",
      "cRedit report: poor", "cre", "crab 9"),
    Gen.alphaNumStr, Gen.const(" "), Gen.const("\n"),
    Gen.const(""))).map(_.mkString(" "))

  property("dispatch scanner == combined-regex scanner (differential)") =
    forAll(advDocGen) { doc =>
      PiiDetector.scanFast(doc) == PiiDetector.scan(doc)
    }

  property("numeric entity decode: any code point reference either " +
      "decodes to exactly that code point or degrades to a space — " +
      "NEVER throws (round-4 task-killer contract)") =
    forAll(Gen.chooseNum(-100, 0x120000)) { cp =>
      val dec = HtmlText.extract(s"x&#$cp;y")
      val hex = if (cp >= 0) HtmlText.extract(s"x&#x${cp.toHexString};y")
        else dec
      val control = cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
        (cp >= 0 && cp < 0x20 && cp != 9 && cp != 10 && cp != 13)
      val valid = cp >= 0 && cp <= 0x10FFFF &&
        !(cp >= 0xD800 && cp <= 0xDFFF) && !control && cp != 0xA0
      val expected =
        if (valid) "x" + new String(Character.toChars(cp)) + "y" else "x y"
      dec == expected && hex == expected
    }

  property("prefix detection offsets stable under concatenation") =
    forAll(Gen.listOf(piiWordGen), Gen.listOf(piiWordGen)) { (a, b) =>
      val ta = a.mkString(" ")
      val tb = b.mkString(" ")
      val combined =
        if (ta.isEmpty) tb else if (tb.isEmpty) ta else ta + " " + tb
      val msA = PiiDetector.extract(ta)
      val msAll = PiiDetector.extract(combined)
      msA.forall(m => msAll.exists(m2 => m2.start == m.start && m2.text == m.text))
    }
}
