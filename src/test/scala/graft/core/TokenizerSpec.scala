package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer offset-contract vectors ported from
  * /root/reference/backend/tests/test_PDFAdapter.py (exact full_text and
  * per-token (start, end), incl. continuation across page/line boundaries).
  * Property-based coverage lives in [[CoreProps]] (ScalaCheck).
  */
class TokenizerSpec extends AnyFunSuite {

  test("single page contract (test_PDFAdapter.py:14-34)") {
    val (full, toks) = Tokenizer.tokenize("Hello World")
    assert(full == "Hello World")
    assert(toks.map(t => (t.text, t.start, t.end)) ==
      Vector(("Hello", 0, 5), ("World", 6, 11)))
  }

  test("offsets continue across boundaries (test_PDFAdapter.py:37-62)") {
    // page boundary in the reference == line boundary in the webtext graft
    val (full, toks) = Tokenizer.tokenize("Foo Bar\nBaz Qux")
    assert(full == "Foo Bar Baz Qux")
    assert(toks.map(t => (t.text, t.start, t.end)) == Vector(
      ("Foo", 0, 3), ("Bar", 4, 7), ("Baz", 8, 11), ("Qux", 12, 15)))
  }

  test("blank words skipped before index assignment (PDFAdapter.py:213-216)") {
    val (full, toks) = Tokenizer.tokenize("  a \t\n  b   c  ")
    assert(full == "a b c")
    assert(toks.map(t => (t.text, t.start, t.end)) ==
      Vector(("a", 0, 1), ("b", 2, 3), ("c", 4, 5)))
  }

  test("empty and whitespace-only inputs") {
    assert(Tokenizer.tokenize("") == (("", Vector())))
    assert(Tokenizer.tokenize(" \n\t ") == (("", Vector())))
  }
}
