package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Reference-parity gate: the decoded golden fixtures (FIXTURES.md §1,
  * decoded from /root/reference/backend/pdf/test_data PDFs and the masked
  * outputs under backend/output/jobs_2025-07-21T11-22-02/) run through the
  * full document-local pipeline. Asserts the exact match list, the exact
  * set of redacted tokens, and the byte-exact scrubbed text.
  */
class GoldenFixtureSpec extends AnyFunSuite {

  private def fixture(name: String): String = {
    val src = Source.fromResource(s"golden/$name", getClass.getClassLoader)
    try src.mkString finally src.close()
  }

  private def run(name: String) = {
    val (full, matches, labeled, scrubbed) =
      PiiDetector.detectAndScrub(fixture(name), referenceOnly = true)
    (full, matches, labeled.filter(_.detectedAs.isDefined), scrubbed)
  }

  test("doc01 — labeled values (masked-01 golden)") {
    val (_, matches, redacted, scrubbed) = run("doc01.txt")
    assert(matches.map(m => (m.piiType, m.text)) == Vector(
      (PiiType.Ssn, "123-45-7890"),
      (PiiType.AccountNumber, "1234567890123"), // 13 digits: ACCOUNT, not ROUTING
      (PiiType.RoutingNumber, "123456789"),
      (PiiType.CreditScoreRating, "CREDIT REPORT: VERY GOOD"),
      (PiiType.CreditScore, "CREDIT SCORE: 720")))

    // masked-01: labels survive EXCEPT the whole credit-score line; the
    // rating label survives, its value doesn't (SURVEY §2.4 D2).
    assert(redacted.map(t => (t.text, t.detectedAs.get)) == Vector(
      ("123-45-7890", "SSN"),
      ("1234567890123", "Account Number"),
      ("123456789", "Routing Number"),
      ("VERY", "Credit Score Rating"),
      ("GOOD", "Credit Score Rating"),
      ("CREDIT", "Credit Score"),
      ("SCORE:", "Credit Score"),
      ("720", "Credit Score")))

    assert(scrubbed ==
      "SSN: [PII:SSN] ACCT NO: [PII:Account Number] ROUTING NO: " +
      "[PII:Routing Number] CREDIT REPORT: [PII:Credit Score Rating] " +
      "[PII:Credit Score Rating] [PII:Credit Score] [PII:Credit Score] " +
      "[PII:Credit Score]")
  }

  test("doc02 — bare values (masked-02 golden)") {
    val (_, matches, redacted, scrubbed) = run("doc02.txt")
    assert(matches.map(m => (m.piiType, m.text)) == Vector(
      (PiiType.Ssn, "133-65-4567"),
      (PiiType.AccountNumber, "1234567890987"),
      (PiiType.RoutingNumber, "987654321")))
    assert(redacted.map(_.text) ==
      Vector("133-65-4567", "1234567890987", "987654321"))
    assert(scrubbed ==
      "[PII:SSN] [PII:Account Number] [PII:Routing Number]")
  }

  test("doc03 — three stanzas, mixed case (masked-03 golden)") {
    val (_, matches, redacted, _) = run("doc03.txt")
    // 5 matches per stanza; IGNORECASE covers 'SCore:'/'score:' variants
    assert(matches.length == 15)
    assert(matches.count(_.piiType == PiiType.Ssn) == 3)
    assert(matches.count(_.piiType == PiiType.AccountNumber) == 3)
    assert(matches.count(_.piiType == PiiType.RoutingNumber) == 3)
    assert(matches.count(_.piiType == PiiType.CreditScore) == 3)
    assert(matches.count(_.piiType == PiiType.CreditScoreRating) == 3)
    // '0987654321' = 10 digits -> ACCOUNT
    assert(matches.exists(m =>
      m.piiType == PiiType.AccountNumber && m.text == "0987654321"))

    val redactedTexts = redacted.map(_.text)
    // values always redacted
    Seq("123-45-7890", "412-67-9870", "213-45-7639",
        "1234567890123", "1234567890126", "0987654321",
        "123456789", "123456780", "123456778",
        "VERY", "GOOD", "POOR", "fair",
        "419", "500", "600").foreach { v =>
      assert(redactedTexts.contains(v), s"expected $v redacted")
    }
    // rating labels survive; score labels are redacted too
    assert(!redacted.exists(t => t.text == "REPORT:" || t.text == "Report:"))
    assert(redacted.count(t => t.detectedAs.contains("Credit Score") &&
      (t.text.equalsIgnoreCase("CREDIT") || t.text.equalsIgnoreCase("SCore:") ||
       t.text.equalsIgnoreCase("score:"))) >= 6)
  }

  test("refine degenerate path: match within the first len(match) chars") {
    // CREDIT_SCORE at document offset 0: the mixed-coordinate walk is NOT a
    // no-op — it advances start to the first digit of the match's own text
    // (correct by coincidence at offset 0). Bug-compatible per SURVEY §2.4.
    val ms = PiiDetector.extractReference("credit score: 750")
    assert(ms.head.start == 14) // points at '7'
    assert(ms.head.end == 17)

    // CREDIT_SCORE_RATING at offset 0: start += 14, then the whitespace
    // skip loop runs in match-text coordinates.
    val ms2 = PiiDetector.extractReference("credit report: good")
    assert(ms2.head.start == 15) // 0 + 14, then skips the space at idx 14
    assert(ms2.head.end == 19)

    // Deep in the document (abs start >= len(match.text)): both walks no-op
    val pad = "z " * 20
    val ms3 = PiiDetector.extractReference(pad + "credit score: 750")
    assert(ms3.head.start == pad.length) // label included in span
  }

  test("cross-boundary semantics: match spanning a token boundary labels both") {
    // partial overlap labels the WHOLE token (SURVEY §2.5c)
    val (_, _, labeled, _) = PiiDetector.detectAndScrub("abc123-45-6789xyz next")
    assert(labeled.head.detectedAs.contains("SSN"))
    assert(labeled.head.text == "abc123-45-6789xyz")
  }

  test("token overlapping two PIIs takes the earliest-starting one") {
    // one token covering both an SSN and a routing number
    val text = "123-45-6789;987654321"
    val (_, matches, labeled, _) = PiiDetector.detectAndScrub(text)
    assert(matches.length == 2)
    assert(labeled.head.detectedAs.contains("SSN"))
  }
}
