package graft.core

import java.util.regex.Pattern
import org.scalatest.funsuite.AnyFunSuite

/** Per-pattern vector tables ported verbatim from
  * /root/reference/backend/tests/test_PIIDetector.py (valid/invalid vectors,
  * boundary-embedding cases, combined-pattern attribution) — the early
  * detector for Python-`re` vs Java-`Pattern` divergence (SURVEY §7.5.1).
  */
class PiiPatternSpec extends AnyFunSuite {

  private val flags = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE |
    Pattern.UNICODE_CHARACTER_CLASS

  private def pat(t: PiiType): Pattern =
    Pattern.compile(PiiDetector.patterns.find(_._1 == t).get._2, flags)

  private def firstMatch(p: Pattern, text: String): Option[String] = {
    val m = p.matcher(text)
    if (m.find()) Some(m.group()) else None
  }

  test("SSN vectors (test_PIIDetector.py:20-46)") {
    val p = pat(PiiType.Ssn)
    Seq("123-45-6789", "987-65-4321", "000-00-0000").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("12-345-6789", "123-456-789", "123456789", "123-45-678a",
        "123-4a-6789").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
  }

  test("routing number vectors incl. boundary embedding (:48-91)") {
    val p = pat(PiiType.RoutingNumber)
    Seq("123456789", "987654321", "000000000").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("12345678", "1234567890", "123456789a").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
    assert(firstMatch(p, "Account: 123456789 Balance").contains("123456789"))
    assert(firstMatch(p, "ID: 000123456789").isEmpty)
    assert(firstMatch(p, "123456789000").isEmpty)
    assert(firstMatch(p, "The routing number is 123456789.").contains("123456789"))
  }

  test("account number vectors (:93-133)") {
    val p = pat(PiiType.AccountNumber)
    Seq("1234567890", "12345678901234567", "123456789012345").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("123456789", "123456789012345678", "12345678a0").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
    assert(firstMatch(p, "Account: 1234567890 Type").contains("1234567890"))
  }

  test("credit score vectors (:135-163)") {
    val p = pat(PiiType.CreditScore)
    Seq("credit score: 750", "Credit Score: 680", "credit score:720",
        "Credit Score:  800").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("credit score: 75", "score: 750", "credit rating: 750").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
  }

  test("credit score rating vectors (:165-194)") {
    val p = pat(PiiType.CreditScoreRating)
    Seq("credit report: good", "Credit Report: Very Good",
        "Credit Report:Excellent", "Credit Report:     fair").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    assert(firstMatch(p, "credit report: 750").isEmpty)
  }

  test("phone number vectors (stale-but-specifying suite :196-227)") {
    val p = pat(PiiType.PhoneNumber)
    Seq("1234567890", "123-456-7890", "123.456.7890", "123 456 7890",
        "(123)456-7890", "(123) 456-7890", "(123)4567890").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("12345678", "123-45-67890", "123-456-789a", "abc-def-ghij").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
  }

  test("email vectors (:229-261)") {
    val p = pat(PiiType.Email)
    Seq("user@example.com", "test.email@domain.org", "user+tag@example.co.uk",
        "user_name@example-domain.com", "123@example.com",
        "user@sub.domain.com").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("userexample.com", "@example.com", "user@", "user@.com",
        "user@example", "user@example.c").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
  }

  test("credit card vectors (:263-290)") {
    val p = pat(PiiType.CreditCardNumber)
    Seq("1234567890123456", "1234 5678 9012 3456", "1234-5678-9012-3456")
      .foreach { s => assert(firstMatch(p, s).contains(s), s) }
    Seq("123456789012345", "12345678901234567", "1234-5678-9012-345a",
        "1234 5678 9012 345").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
  }

  test("combined-pattern attribution (:292-314)") {
    val cases = Seq(
      ("My SSN is 123-45-6789.", PiiType.Ssn, "123-45-6789"),
      ("Routing: 123456789", PiiType.RoutingNumber, "123456789"),
      ("Account: 123456789012", PiiType.AccountNumber, "123456789012"),
      ("Credit Score: 750", PiiType.CreditScore, "Credit Score: 750"),
      ("Credit report: Excellent", PiiType.CreditScoreRating,
        "Credit report: Excellent"),
      ("Card: 4111 1111 1111 1111", PiiType.CreditCardNumber,
        "4111 1111 1111 1111"),
      ("Phone: (123) 456-7890", PiiType.PhoneNumber, "(123) 456-7890"),
      ("Email: test@example.com", PiiType.Email, "test@example.com"))
    cases.foreach { case (text, tpe, value) =>
      val ms = PiiDetector.scan(text)
      assert(ms.nonEmpty, text)
      assert(ms.head.piiType == tpe, s"$text -> ${ms.head}")
      assert(ms.head.text == value, text)
    }
  }

  test("graft addition: IPv4 vectors") {
    val p = pat(PiiType.Ipv4)
    Seq("192.168.1.1", "10.0.0.255", "8.8.8.8").foreach { s =>
      assert(firstMatch(p, s).contains(s), s)
    }
    Seq("1.2.3", "a.b.c.d", "1..2.3.4").foreach { s =>
      assert(firstMatch(p, s).isEmpty, s)
    }
    // attribution: IP must not be shadowed by phone across dots
    val ms = PiiDetector.scan("server at 192.168.100.254 responded")
    assert(ms.map(m => (m.piiType, m.text)) ==
      Vector((PiiType.Ipv4, "192.168.100.254")))
  }

  test("finditer semantics: leftmost non-overlapping, resume at match end") {
    // SSN consumes its 11 chars; the embedded ROUTING candidate never emits
    val ms = PiiDetector.scan("x 123-45-6789 y 123456789 z")
    assert(ms.map(_.piiType) == Vector(PiiType.Ssn, PiiType.RoutingNumber))
    // ordered alternation, first-match-wins at a position:
    // bare 16 digits -> ACCOUNT (prio 3 beats CARD)
    assert(PiiDetector.scan("1234567890123456").head.piiType ==
      PiiType.AccountNumber)
    // separated groups -> CREDIT_CARD (routing/account \b fail)
    assert(PiiDetector.scan("1234 5678 9012 3456").head.piiType ==
      PiiType.CreditCardNumber)
  }

  test("dispatch scanner differential: 1000 synthetic pages + goldens") {
    var i = 0L
    while (i < 1000L) {
      graft.model.PagesSynth.generate(i, validated = false)._2.text.foreach { t =>
        assert(PiiDetector.scanFast(t) == PiiDetector.scan(t), s"doc $i")
      }
      i += 1
    }
    Seq("doc01.txt", "doc02.txt", "doc03.txt").foreach { f =>
      val src = scala.io.Source.fromResource(s"golden/$f", getClass.getClassLoader)
      val text = try src.mkString finally src.close()
      val (full, _) = Tokenizer.tokenize(text)
      assert(PiiDetector.scanFast(full) == PiiDetector.scan(full), f)
    }
  }

  test("linear scan on pathological runs (1 MB single token)") {
    // regression: the bare email pattern made this O(n^2) — each scan
    // position re-walked the alphabetic run (a 1 MB doc effectively hung)
    val doc = ("x" * 1000000) + " reach me at a@b.com ok"
    val t0 = System.nanoTime()
    val ms = PiiDetector.extract(doc)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(ms.map(_.text) == Vector("a@b.com"))
    assert(sec < 5.0, f"scan took $sec%.1f s — super-linear blowup")
    // digit-run flood stays linear too (phone matches tile the run)
    val digits = "9" * 1000000
    val t1 = System.nanoTime()
    val ms2 = PiiDetector.extract(digits)
    val sec2 = (System.nanoTime() - t1) / 1e9
    assert(ms2.nonEmpty && sec2 < 5.0, f"digit scan $sec2%.1f s")
  }

  test("scanFast == scan on astral digits and case-fold email starts " +
      "(PII-leak regression: the dispatch gate used char-level classes " +
      "narrower than the regex's Unicode semantics)") {
    // MATHEMATICAL BOLD digits are \d under UNICODE_CHARACTER_CLASS but
    // their high surrogate is not an isDigit char — scanFast skipped the
    // position and the SSN survived scrubbing
    val boldDigits = new String(Character.toChars(0x1D7CF)) * 3
    val astralSsn = s"pre $boldDigits-45-6789 post"
    assert(PiiDetector.scan(astralSsn).nonEmpty, "regex baseline")
    assert(PiiDetector.scanFast(astralSsn) == PiiDetector.scan(astralSsn))
    // CASE_INSENSITIVE | UNICODE_CASE folds U+017F (long s), U+212A
    // (Kelvin), U+0130/U+0131 onto [a-zA-Z]; an email starting with one
    // was found by scan() but missed by the ASCII-only dispatch table
    Seq('ſ', 'K', 'İ', 'ı').foreach { ch =>
      val t = s"contact ${ch}mith@example.com now"
      assert(PiiDetector.scan(t).exists(_.piiType == PiiType.Email),
        s"baseline $ch")
      assert(PiiDetector.scanFast(t) == PiiDetector.scan(t), s"fold $ch")
    }
    // and a fold char directly BEFORE an ascii email start suppresses the
    // start on both sides identically (lookbehind parity)
    val t2 = "xſabc@example.com y"
    assert(PiiDetector.scanFast(t2) == PiiDetector.scan(t2))
  }

  test("digit-run prechecks are sound at every boundary length and under " +
      "BMP/astral mixes (round-5 dispatch-table rewrite)") {
    // run lengths straddling every precheck boundary: 3 (ssn/ipv4), 4
    // (card), 8/9/10 (routing/account), 17/18/19+ (account upper edge,
    // saturation) — equality with the combined scan is the contract
    val runs = Seq(3, 4, 8, 9, 10, 16, 17, 18, 19, 25)
    runs.foreach { len =>
      Seq(s"x ${"9" * len} y", s"${"9" * len}", s"a${"9" * len}b",
        s"x ${"1" * len}.2.3.4 y").foreach { t =>
        assert(PiiDetector.scanFast(t) == PiiDetector.scan(t), s"run $len: $t")
      }
    }
    // an ASCII digit followed by ASTRAL digits defeated the old
    // next-two-digits gate: the high surrogate is not an isDigit char, so
    // d3 was false and the SSN was skipped — regex matches it (\d is Nd
    // including astral under UNICODE_CHARACTER_CLASS)
    val bold2 = new String(Character.toChars(0x1D7D0))
    val bold3 = new String(Character.toChars(0x1D7D1))
    val mixedSsn = s"pre 1$bold2$bold3-45-6789 post"
    assert(PiiDetector.scan(mixedSsn).exists(_.piiType == PiiType.Ssn),
      "regex baseline must match the mixed-astral SSN")
    assert(PiiDetector.scanFast(mixedSsn) == PiiDetector.scan(mixedSsn))
    // astral digit mid-run right after the start
    val mixed2 = s"x 12$bold3-45-6789 12${bold3}4567 y"
    assert(PiiDetector.scanFast(mixed2) == PiiDetector.scan(mixed2))
    // credit-literal fold gate: dotted/dotless i fold onto 'i', 'R' onto
    // 'r' — the 2nd/3rd-char gate is derived from the compiled pattern
    Seq("credıt score: 750", "cRedit report: gOOd", "crEdit score: 600",
      "credit card xx", "crisp bacon", "acre of land").foreach { t =>
      assert(PiiDetector.scanFast(t) == PiiDetector.scan(t), t)
    }
  }

  test("unicode parity traps: arabic-indic digits, NBSP") {
    // Python \d matches U+0660..9; Java needs UNICODE_CHARACTER_CLASS
    val arabicSsn = "١٢٣-٤٥-٦٧٨٩"
    assert(PiiDetector.scan(arabicSsn).exists(_.piiType == PiiType.Ssn))
    // \s with UNICODE_CHARACTER_CLASS matches NBSP, like Python
    assert(PiiDetector.scan("credit score: 750")
      .exists(_.piiType == PiiType.CreditScore))
  }
}
