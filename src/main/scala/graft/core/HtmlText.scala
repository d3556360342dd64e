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

  /** Named entities beyond the XML five: the punctuation set ubiquitous on
    * real crawl pages (em/en dash, curly quotes, ellipsis) plus common
    * symbol/currency marks. An UNKNOWN entity-shaped name (`&foo;`)
    * passes through RAW, like a standards-following parser — prose such
    * as `Q&A; next` or `R&D budget; approved` must never be silently
    * deleted (an earlier revision swallowed any `&...;` span to a space,
    * which corrupted exactly that prose). The decoded punctuation feeds
    * the downstream heuristics — e.g. `&hellip;` becomes the literal `…`
    * the symbol-to-word-ratio rule counts. */
  private val NamedEntities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ",
      "mdash" -> "—", "ndash" -> "–",
      "rsquo" -> "’", "lsquo" -> "‘",
      "ldquo" -> "“", "rdquo" -> "”",
      "hellip" -> "…",
      "copy" -> "©", "reg" -> "®", "trade" -> "™",
      "bull" -> "•", "middot" -> "·",
      "laquo" -> "«", "raquo" -> "»",
      "deg" -> "°", "sect" -> "§", "para" -> "¶",
      "euro" -> "€", "pound" -> "£", "cent" -> "¢",
      "yen" -> "¥", "times" -> "×", "divide" -> "÷",
      "plusmn" -> "±"
    ).foreach { case (k, v) => m.put(k, v) }
    m
  }

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
            // letterOrDigit: a letters-only name turned "h1" into "h",
            // making the heading-newline branch below unreachable —
            // heading-structured pages merged onto one line and the
            // line-shape heuristics mis-scored them
            val name = tag.takeWhile(ch => ch.isLetterOrDigit)
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
        // entity window 10 covers the longest numeric form (&#x10FFFF;)
        // and every named entity in the table; the terminator search is
        // BOUNDED to the window — an unbounded indexOf(';') was O(n^2)
        // on ampersand-dense semicolon-sparse pages (URL query strings,
        // binary mislabeled as html), a stall no exception surfaces, so
        // it escaped even the per-row fault envelope
        var semi = -1
        var j = i + 1
        val jEnd = math.min(n, i + 11)
        while (j < jEnd && semi < 0) {
          if (html.charAt(j) == ';') semi = j
          j += 1
        }
        var consumed = false
        if (semi > i + 1) {
          val name = html.substring(i + 1, semi)
          if (name.charAt(0) == '#' && name.length > 1) {
            // numeric character reference, decimal (&#8230;) or hex
            // (&#x27; / &#X27;). Malformed and out-of-range references —
            // &#1114200; (> U+10FFFF), &#-5;, lone surrogates — decode to
            // a space instead of throwing: Integer.parseInt SUCCEEDS on
            // out-of-range/negative values and appendCodePoint then threw
            // an uncaught IllegalArgumentException that escaped the old
            // NumberFormatException-only catch and failed the whole stage
            // (an O1 per-document-isolation violation on real crawl data).
            // Surrogates are rejected too (not UTF-8-encodable — would
            // break the byte-identical extracted-text contract), as are
            // control references (&#0; etc. — a NUL in extracted text
            // poisons every downstream consumer; tab/newline/CR pass).
            // &#160;/&#xA0; normalize to ' ' exactly like &nbsp; so the
            // two spellings of NBSP cannot produce different word counts.
            val body = name.substring(1)
            val cp: Int =
              try {
                if (body.length > 1 &&
                    (body.charAt(0) == 'x' || body.charAt(0) == 'X'))
                  Integer.parseInt(body.substring(1), 16)
                else Integer.parseInt(body)
              } catch { case _: NumberFormatException => -1 }
            val isControl = cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
              (cp < 0x20 && cp != 9 && cp != 10 && cp != 13)
            if (cp == 0xA0) sb.append(' ')
            else if (cp >= 0 && cp <= 0x10FFFF && !isControl &&
                !(cp >= 0xD800 && cp <= 0xDFFF))
              sb.appendCodePoint(cp)
            else sb.append(' ')
            i = semi + 1
            consumed = true
          } else if (name.charAt(0).isLetter &&
              name.forall(_.isLetterOrDigit)) {
            // entity-shaped name: decode if known, else RAW passthrough
            // (prose like "Q&A; next" is not an entity)
            val rep = NamedEntities.get(name)
            if (rep != null) { sb.append(rep); i = semi + 1; consumed = true }
          }
        }
        if (!consumed) { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
