package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** HtmlText extraction gates: script/style subtree removal, entity
  * decoding, block-tag line breaks — and the linearity regression for
  * script-heavy pages (the per-tag whole-document lowercase was O(n^2)). */
class HtmlTextSpec extends AnyFunSuite {

  test("drops script/style subtrees, decodes entities, breaks on blocks") {
    val html = "<html><head><style>p { color: red }</style>" +
      "<SCRIPT>var x = '<p>not text</p>';</SCRIPT></head>" +
      "<body><p>Tom &amp; Jerry &lt;3</p><div>second&nbsp;line</div></body></html>"
    val out = HtmlText.extract(html)
    assert(!out.contains("color"))
    assert(!out.contains("var x"))
    assert(out.contains("Tom & Jerry <3"))
    assert(out.contains("second line"))
    // block tags produced line structure
    assert(out.linesIterator.exists(_.trim == "Tom & Jerry <3"))
  }

  test("quoted attribute values containing '>' do not end the tag") {
    val html = "<body><a title=\"a>b\" href='x>y'>link text</a> tail</body>"
    val out = HtmlText.extract(html)
    assert(out.contains("link text"))
    assert(out.contains("tail"))
    assert(!out.contains("b\""), out) // the attribute remainder is not text
    assert(!out.contains("href"), out)
  }

  test("a stray '<' followed by prose apostrophes does not open a quote " +
      "that swallows the document (regression)") {
    val html = "<p>score <3 don't worry x > y</p><p>rest of the page</p>"
    val out = HtmlText.extract(html)
    // the stray-tag span `<3 ... >` is dropped (pre-existing behavior),
    // but everything after its first '>' survives
    assert(out.contains("y") && out.contains("rest of the page"), out)
  }

  test("an unterminated quoted attribute falls back to the first '>' " +
      "instead of dropping the remainder") {
    val html = "<a title=\"broken>text after</a><p>more content</p>"
    val out = HtmlText.extract(html)
    assert(out.contains("more content"), out)
  }

  test("comments are skipped entirely, including embedded '>' and tags") {
    val html = "<p>before</p><!-- a > b <p>not text</p> --><p>after</p>" +
      "<!-- truncated comment swallows the rest <p>gone</p>"
    val out = HtmlText.extract(html)
    assert(out.contains("before") && out.contains("after"))
    assert(!out.contains("not text") && !out.contains("a > b"))
    assert(!out.contains("gone"))
  }

  test("CDATA content passes through raw (no entity decode, no tag strip)") {
    val html = "<p>x</p><![CDATA[raw &amp; <p>literal</p>]]><p>y</p>"
    val out = HtmlText.extract(html)
    assert(out.contains("raw &amp; <p>literal</p>"), out)
    assert(out.contains("x") && out.contains("y"))
  }

  test("hex and extended named entities decode; apos variants agree") {
    assert(HtmlText.extract("<p>it&#x27;s &#X27;ok&#39; &apos;</p>")
      .contains("it's 'ok' '"))
    assert(HtmlText.extract("<p>a&mdash;b &ndash; c&hellip;</p>")
      .contains("a—b – c…"))
    assert(HtmlText.extract("<p>&ldquo;hi&rdquo; &rsquo; &lsquo;</p>")
      .contains("“hi” ’ ‘"))
    assert(HtmlText.extract("<p>&copy; 2026 &euro;5 &laquo;x&raquo;</p>")
      .contains("© 2026 €5 «x»"))
    // decimal still works, including above-BMP
    assert(HtmlText.extract("<p>&#8230; &#128512;</p>")
      .contains("… 😀"))
    // max valid code point decodes; one past it degrades to a space
    assert(HtmlText.extract("<p>&#x10FFFF;</p>").contains("􏿿"))
  }

  test("malformed numeric entities degrade to a space instead of throwing " +
      "(round-3 task-killer regression)") {
    // out-of-range (> U+10FFFF): Integer.parseInt succeeds, appendCodePoint
    // used to throw an uncaught IllegalArgumentException
    assert(HtmlText.extract("<p>a&#1114200;b</p>").contains("a b"))
    // negative reference — same path
    assert(HtmlText.extract("<p>a&#-5;b</p>").contains("a b"))
    // lone surrogate: valid for appendCodePoint but not UTF-8-encodable —
    // rejected to protect the byte-identical extracted-text contract
    assert(HtmlText.extract("<p>a&#xD800;b</p>").contains("a b"))
    assert(HtmlText.extract("<p>a&#57343;b</p>").contains("a b"))
    // non-numeric garbage after '#'
    assert(HtmlText.extract("<p>a&#x;b &#zz; c</p>").contains("a b   c"))
    // control references: NUL and C1 controls must never reach the
    // extracted bytes (a NUL poisons downstream consumers); tab/LF pass
    assert(HtmlText.extract("<p>a&#0;b&#31;c&#127;d&#150;e</p>")
      .contains("a b c d e"))
    assert(HtmlText.extract("<p>a&#9;b&#10;c</p>").contains("a\tb\nc"))
    // both spellings of NBSP normalize identically (word-count parity)
    assert(HtmlText.extract("<p>a&#160;b&#xA0;c&nbsp;d</p>")
      .contains("a b c d"))
  }

  test("table-driven: every HTML4 named entity decodes to its code point " +
      "(nbsp normalizing to a plain space), both bare and numeric forms " +
      "agreeing") {
    HtmlText.namedEntityTable.foreach { case (name, cp) =>
      val expected =
        if (cp == 160) "x y" else "x" + new String(Character.toChars(cp)) + "y"
      val named = HtmlText.extract(s"x&$name;y")
      assert(named == expected,
        s"&$name; decoded to ${named.map(_.toInt.toHexString)}")
      // the numeric spelling of the same code point must agree (except the
      // markup-significant five, whose numeric forms are also decoded —
      // still equal — and control-range points, which the table has none of)
      val numeric = HtmlText.extract(s"x&#$cp;y")
      assert(numeric == expected, s"&#$cp; vs &$name; disagree")
    }
    // case-sensitivity: the capitalized and lowercase names are distinct
    assert(HtmlText.extract("&eacute;") == "é")
    assert(HtmlText.extract("&Eacute;") == "É")
    assert(HtmlText.extract("&EACUTE;") == "&EACUTE;") // unknown → raw
  }

  test("overlong numeric references: all-digit bodies up to 24 chars " +
      "terminate at ';' and degrade to a space (out-of-range contract); " +
      "leading-zero refs still decode; 25+-digit runs pass through raw") {
    assert(HtmlText.extract("a&#123456789;b") == "a b")
    assert(HtmlText.extract("a&#999999999999999999999;b") == "a b")
    assert(HtmlText.extract("a&#x00000041;b") == "aAb") // 8 hex digits, valid
    assert(HtmlText.extract("a&#000000000065;b") == "aAb") // 12 digits, valid
    val tooLong = "a&#" + "9" * 25 + ";b"
    assert(HtmlText.extract(tooLong) == tooLong) // not entity-shaped → raw
  }

  test("unknown entity-shaped names and non-entity '&...;' prose pass " +
      "through RAW — ampersand prose is never silently deleted") {
    assert(HtmlText.extract("<p>a&unknown;b</p>").contains("a&unknown;b"))
    assert(HtmlText.extract("<p>Q&A; next</p>").contains("Q&A; next"))
    assert(HtmlText.extract("<p>R&D budget; approved</p>")
      .contains("R&D budget; approved"))
    assert(HtmlText.extract("<p>fish & chips; salt</p>")
      .contains("fish & chips; salt"))
    assert(HtmlText.extract("<p>a=1&b=2&c=3</p>").contains("a=1&b=2&c=3"))
  }

  test("headings emit line breaks (h1-h6 name parse includes the digit)") {
    val out = HtmlText.extract("<h1>Title</h1><p>Body text</p><h2>Sub</h2>")
    val lines = out.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    assert(lines == Seq("Title", "Body text", "Sub"), out)
  }

  test("ampersand-dense semicolon-free page extracts in linear time " +
      "(bounded entity scan regression)") {
    // 200k '&'-separated params, no semicolons: the unbounded indexOf(';')
    // made this O(n^2) — minutes of silent stall that no exception
    // surfaced (escaping even the per-row fault envelope)
    val sb = new StringBuilder("<p>")
    (1 to 200000).foreach(i => sb.append(s"k$i=v$i&"))
    sb.append("</p>")
    val t0 = System.nanoTime()
    val out = HtmlText.extract(sb.toString)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.contains("k200000=v200000"))
    assert(sec < 5.0, f"extract took $sec%.1f s — quadratic entity scan?")
  }

  test("entity-decoded punctuation feeds the heuristics: &hellip; counts " +
      "toward the symbol-to-word ratio like a literal ellipsis") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val clean = HtmlText.extract(s"<p>the of and that. done. good. $base</p>")
    val spammy = HtmlText.extract(
      s"<p>the of and that. done. good. $base " +
        (1 to 20).map(_ => "&hellip;").mkString(" ") + "</p>")
    assert(spammy.contains("… …"), spammy.takeRight(80))
    val rClean = Heuristics.evaluate(clean, "en")
    val rSpam = Heuristics.evaluate(spammy, "en")
    def sym(rs: Seq[RuleResult]) =
      rs.find(_.rule == "symbol_to_word_ratio").get
    assert(!sym(rClean).fired)
    // 20 ellipses over ~87 words > 0.1 — the decoded entity form must trip
    // the same rule the literal character does
    assert(sym(rSpam).fired, sym(rSpam))
  }

  test("script-heavy page extracts in linear time (regression)") {
    // 20k script tags; the old per-tag toLowerCase of the whole document
    // made this quadratic (~minutes). Budget is generous vs the ~100ms a
    // linear pass takes, while still failing loudly on O(n^2).
    val sb = new StringBuilder
    (1 to 20000).foreach { i =>
      sb.append(s"<p>para $i</p><script>x($i);</script>")
    }
    val html = sb.toString
    val t0 = System.nanoTime()
    val out = HtmlText.extract(html)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.contains("para 19999") && !out.contains("x(19999)"))
    assert(sec < 5.0, f"extract took $sec%.1f s — quadratic regression?")
  }
}
