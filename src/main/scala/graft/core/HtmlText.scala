package graft.core

/** Deterministic HTML → text extraction for rows that arrive with `html`
  * only (the graft analog of the reference's image-PDF → OCR branch,
  * backend/pdf/PDFRedactor.py:73-81: cheap predicate gates the expensive
  * extract). Single pass, no external parser: drops <script>/<style>
  * subtrees, skips <!-- comments -->, passes <![CDATA[...]]> content
  * through raw, strips tags (quote-aware, so '>' inside an attribute
  * value does not end the tag), and decodes the common entities. The
  * output feeds the same tokenizer contract, so extracted text is
  * byte-deterministic per input (BASELINE.json input_hint invariant).
  */
object HtmlText {

  def extract(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n / 2)
    // lowercased ONCE: searching for </script|</style from inside the loop
    // on a per-tag lowercase of the whole document is O(n^2) on pages with
    // many script tags — the same pathology class as the regex-scan trap
    var lowerAll: String = null
    def lower: String = {
      if (lowerAll == null) lowerAll = html.toLowerCase(java.util.Locale.ROOT)
      lowerAll
    }
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          // comments carry no text and may contain '>' / '<' freely —
          // skip the whole construct (truncated comment drops remainder)
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          // CDATA is character data: emit the raw content (no entity
          // decoding, per spec), skip the wrapper
          val end = html.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          sb.append(html, i + 9, stop)
          i = if (end < 0) n else end + 3
        } else {
          // tag close respects quoted attribute values: '>' inside
          // title="a>b" does not end the tag. A quote only counts as an
          // attribute-value delimiter when it FOLLOWS '=' (attr syntax):
          // a stray "<3 don't worry" in prose must not open a quote that
          // swallows the document. If the quote-aware scan finds no close
          // (unterminated quote), fall back to the first plain '>' — the
          // bounded pre-quote-awareness behavior — rather than dropping
          // the whole remainder.
          var j = i + 1
          var quote: Char = 0
          var close = -1
          var prevNonSpace: Char = 0
          while (j < n && close < 0) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if ((cj == '"' || cj == '\'') && prevNonSpace == '=') quote = cj
            else if (cj == '>') close = j
            if (!Character.isWhitespace(cj)) prevNonSpace = cj
            j += 1
          }
          if (close < 0 && quote != 0) close = html.indexOf('>', i + 1)
          if (close < 0) { i = n } // truncated tag: drop remainder
          else {
            val tag = html.substring(i + 1, close).trim
              .toLowerCase(java.util.Locale.ROOT)
            val name = tag.takeWhile(ch => ch.isLetter)
            if (name == "script" || name == "style") {
              val end = lower.indexOf(s"</$name", close)
              i = if (end < 0) n else {
                val e2 = html.indexOf('>', end)
                if (e2 < 0) n else e2 + 1
              }
            } else {
              // block-ish tags become line breaks so line rules still work
              if (name == "p" || name == "br" || name == "div" || name == "li" ||
                  name == "tr" || (name.length == 2 && name(0) == 'h' &&
                  name(1).isDigit)) sb.append('\n')
              else sb.append(' ')
              i = close + 1
            }
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > 0 && semi - i <= 8) {
          html.substring(i + 1, semi) match {
            case "amp" => sb.append('&')
            case "lt" => sb.append('<')
            case "gt" => sb.append('>')
            case "quot" => sb.append('"')
            case "apos" | "#39" => sb.append('\'')
            case "nbsp" => sb.append(' ')
            case other if other.startsWith("#") =>
              try sb.appendCodePoint(Integer.parseInt(other.drop(1)))
              catch { case _: NumberFormatException => sb.append(' ') }
            case _ => sb.append(' ')
          }
          i = semi + 1
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
