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

  /** The full HTML4 named-entity set (252 names + XML's `apos`) as
    * (name, code point) pairs — the HTML 4.01 character entity references
    * (Latin-1, symbols/Greek/math, markup-significant/Latin-Extended),
    * which cover what real crawl pages actually carry (`&agrave;`-class
    * accented letters routinely appear and, left raw, inflate the
    * symbol-ratio heuristic and pollute tokenization). Names are
    * case-sensitive per the standard (`&Agrave;` ≠ `&agrave;`). An
    * UNKNOWN entity-shaped name (`&foo;`) passes through RAW, like a
    * standards-following parser — prose such as `Q&A; next` or `R&D
    * budget; approved` must never be silently deleted. `&nbsp;` (and only
    * it) normalizes to a plain space, exactly like its numeric spellings
    * `&#160;`/`&#xA0;`, so the two forms can never produce different word
    * counts. */
  private val NamedEntityCodepoints: Seq[(String, Int)] = Seq(
    // markup-significant (the XML five)
    "quot" -> 34, "amp" -> 38, "apos" -> 39, "lt" -> 60, "gt" -> 62,
    // Latin-1 (ISO 8859-1, 160-255)
    "nbsp" -> 160, "iexcl" -> 161, "cent" -> 162, "pound" -> 163,
    "curren" -> 164, "yen" -> 165, "brvbar" -> 166, "sect" -> 167,
    "uml" -> 168, "copy" -> 169, "ordf" -> 170, "laquo" -> 171,
    "not" -> 172, "shy" -> 173, "reg" -> 174, "macr" -> 175,
    "deg" -> 176, "plusmn" -> 177, "sup2" -> 178, "sup3" -> 179,
    "acute" -> 180, "micro" -> 181, "para" -> 182, "middot" -> 183,
    "cedil" -> 184, "sup1" -> 185, "ordm" -> 186, "raquo" -> 187,
    "frac14" -> 188, "frac12" -> 189, "frac34" -> 190, "iquest" -> 191,
    "Agrave" -> 192, "Aacute" -> 193, "Acirc" -> 194, "Atilde" -> 195,
    "Auml" -> 196, "Aring" -> 197, "AElig" -> 198, "Ccedil" -> 199,
    "Egrave" -> 200, "Eacute" -> 201, "Ecirc" -> 202, "Euml" -> 203,
    "Igrave" -> 204, "Iacute" -> 205, "Icirc" -> 206, "Iuml" -> 207,
    "ETH" -> 208, "Ntilde" -> 209, "Ograve" -> 210, "Oacute" -> 211,
    "Ocirc" -> 212, "Otilde" -> 213, "Ouml" -> 214, "times" -> 215,
    "Oslash" -> 216, "Ugrave" -> 217, "Uacute" -> 218, "Ucirc" -> 219,
    "Uuml" -> 220, "Yacute" -> 221, "THORN" -> 222, "szlig" -> 223,
    "agrave" -> 224, "aacute" -> 225, "acirc" -> 226, "atilde" -> 227,
    "auml" -> 228, "aring" -> 229, "aelig" -> 230, "ccedil" -> 231,
    "egrave" -> 232, "eacute" -> 233, "ecirc" -> 234, "euml" -> 235,
    "igrave" -> 236, "iacute" -> 237, "icirc" -> 238, "iuml" -> 239,
    "eth" -> 240, "ntilde" -> 241, "ograve" -> 242, "oacute" -> 243,
    "ocirc" -> 244, "otilde" -> 245, "ouml" -> 246, "divide" -> 247,
    "oslash" -> 248, "ugrave" -> 249, "uacute" -> 250, "ucirc" -> 251,
    "uuml" -> 252, "yacute" -> 253, "thorn" -> 254, "yuml" -> 255,
    // Latin Extended / spacing modifiers
    "OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
    "Yuml" -> 376, "fnof" -> 402, "circ" -> 710, "tilde" -> 732,
    // Greek
    "Alpha" -> 913, "Beta" -> 914, "Gamma" -> 915, "Delta" -> 916,
    "Epsilon" -> 917, "Zeta" -> 918, "Eta" -> 919, "Theta" -> 920,
    "Iota" -> 921, "Kappa" -> 922, "Lambda" -> 923, "Mu" -> 924,
    "Nu" -> 925, "Xi" -> 926, "Omicron" -> 927, "Pi" -> 928,
    "Rho" -> 929, "Sigma" -> 931, "Tau" -> 932, "Upsilon" -> 933,
    "Phi" -> 934, "Chi" -> 935, "Psi" -> 936, "Omega" -> 937,
    "alpha" -> 945, "beta" -> 946, "gamma" -> 947, "delta" -> 948,
    "epsilon" -> 949, "zeta" -> 950, "eta" -> 951, "theta" -> 952,
    "iota" -> 953, "kappa" -> 954, "lambda" -> 955, "mu" -> 956,
    "nu" -> 957, "xi" -> 958, "omicron" -> 959, "pi" -> 960,
    "rho" -> 961, "sigmaf" -> 962, "sigma" -> 963, "tau" -> 964,
    "upsilon" -> 965, "phi" -> 966, "chi" -> 967, "psi" -> 968,
    "omega" -> 969, "thetasym" -> 977, "upsih" -> 978, "piv" -> 982,
    // general punctuation / spaces / format controls
    "ensp" -> 0x2002, "emsp" -> 0x2003, "thinsp" -> 0x2009,
    "zwnj" -> 0x200C, "zwj" -> 0x200D, "lrm" -> 0x200E, "rlm" -> 0x200F,
    "ndash" -> 0x2013, "mdash" -> 0x2014, "lsquo" -> 0x2018,
    "rsquo" -> 0x2019, "sbquo" -> 0x201A, "ldquo" -> 0x201C,
    "rdquo" -> 0x201D, "bdquo" -> 0x201E, "dagger" -> 0x2020,
    "Dagger" -> 0x2021, "bull" -> 0x2022, "hellip" -> 0x2026,
    "permil" -> 0x2030, "prime" -> 0x2032, "Prime" -> 0x2033,
    "lsaquo" -> 0x2039, "rsaquo" -> 0x203A, "oline" -> 0x203E,
    "frasl" -> 0x2044, "euro" -> 0x20AC,
    // letterlike symbols / arrows
    "image" -> 0x2111, "weierp" -> 0x2118, "real" -> 0x211C,
    "trade" -> 0x2122, "alefsym" -> 0x2135,
    "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192,
    "darr" -> 0x2193, "harr" -> 0x2194, "crarr" -> 0x21B5,
    "lArr" -> 0x21D0, "uArr" -> 0x21D1, "rArr" -> 0x21D2,
    "dArr" -> 0x21D3, "hArr" -> 0x21D4,
    // mathematical operators
    "forall" -> 0x2200, "part" -> 0x2202, "exist" -> 0x2203,
    "empty" -> 0x2205, "nabla" -> 0x2207, "isin" -> 0x2208,
    "notin" -> 0x2209, "ni" -> 0x220B, "prod" -> 0x220F,
    "sum" -> 0x2211, "minus" -> 0x2212, "lowast" -> 0x2217,
    "radic" -> 0x221A, "prop" -> 0x221D, "infin" -> 0x221E,
    "ang" -> 0x2220, "and" -> 0x2227, "or" -> 0x2228,
    "cap" -> 0x2229, "cup" -> 0x222A, "int" -> 0x222B,
    "there4" -> 0x2234, "sim" -> 0x223C, "cong" -> 0x2245,
    "asymp" -> 0x2248, "ne" -> 0x2260, "equiv" -> 0x2261,
    "le" -> 0x2264, "ge" -> 0x2265, "sub" -> 0x2282, "sup" -> 0x2283,
    "nsub" -> 0x2284, "sube" -> 0x2286, "supe" -> 0x2287,
    "oplus" -> 0x2295, "otimes" -> 0x2297, "perp" -> 0x22A5,
    "sdot" -> 0x22C5,
    // technical / shapes / suits
    "lceil" -> 0x2308, "rceil" -> 0x2309, "lfloor" -> 0x230A,
    "rfloor" -> 0x230B, "lang" -> 0x2329, "rang" -> 0x232A,
    "loz" -> 0x25CA, "spades" -> 0x2660, "clubs" -> 0x2663,
    "hearts" -> 0x2665, "diams" -> 0x2666)

  private val NamedEntities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    NamedEntityCodepoints.foreach { case (k, cp) =>
      m.put(k, if (cp == 160) " " else new String(Character.toChars(cp)))
    }
    m
  }

  /** Exposed for the table-driven HtmlTextSpec sweep. */
  def namedEntityTable: Seq[(String, Int)] = NamedEntityCodepoints

  /** Bounded named-entity window: longest name + ';' + slack. */
  private val NamedWindow: Int =
    NamedEntityCodepoints.iterator.map(_._1.length).max + 2

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
        // Entity scans are BOUNDED (numeric: 24-char body; named: longest
        // table name + 2) — an unbounded indexOf(';') was O(n^2) on
        // ampersand-dense semicolon-sparse pages (URL query strings,
        // binary mislabeled as html), a stall no exception surfaces, so
        // it escaped even the per-row fault envelope.
        var consumed = false
        if (i + 2 < n && html.charAt(i + 1) == '#') {
          // numeric character reference, decimal (&#8230;) or hex
          // (&#x27; / &#X27;). The body is scanned as an explicit ASCII
          // digit run (hex digits after x/X) up to 24 chars, so overlong
          // references like &#123456789; terminate at their ';' and take
          // the out-of-range branch below (they decode to a space, same
          // contract) instead of depending on a shared window; a body
          // longer than 24 digits is not entity-shaped (no encoder emits
          // one) and passes through raw. Malformed and out-of-range
          // references — &#1114200; (> U+10FFFF), lone surrogates —
          // decode to a space instead of throwing: Integer.parseInt
          // SUCCEEDS on out-of-range values and appendCodePoint then
          // threw an uncaught IllegalArgumentException that escaped the
          // old NumberFormatException-only catch and failed the whole
          // stage (an O1 per-document-isolation violation on real crawl
          // data). Surrogates are rejected too (not UTF-8-encodable —
          // would break the byte-identical extracted-text contract), as
          // are control references (&#0; etc. — a NUL in extracted text
          // poisons every downstream consumer; tab/newline/CR pass).
          // &#160;/&#xA0; normalize to ' ' exactly like &nbsp; so the two
          // spellings of NBSP cannot produce different word counts.
          var j = i + 2
          val hex = html.charAt(j) == 'x' || html.charAt(j) == 'X'
          if (hex) j += 1
          val bodyStart = j
          val bodyEnd = math.min(n, bodyStart + 24)
          while (j < bodyEnd && {
            val d = html.charAt(j)
            (d >= '0' && d <= '9') || (hex &&
              ((d >= 'a' && d <= 'f') || (d >= 'A' && d <= 'F')))
          }) j += 1
          def emitNumeric(cp: Int, after: Int): Unit = {
            val isControl = cp == 0x7F || (cp >= 0x80 && cp <= 0x9F) ||
              (cp < 0x20 && cp != 9 && cp != 10 && cp != 13)
            if (cp == 0xA0) sb.append(' ')
            else if (cp >= 0 && cp <= 0x10FFFF && !isControl &&
                !(cp >= 0xD800 && cp <= 0xDFFF))
              sb.appendCodePoint(cp)
            else sb.append(' ')
            i = after
            consumed = true
          }
          if (j > bodyStart && j < n && html.charAt(j) == ';') {
            val body = html.substring(bodyStart, j)
            val cp: Int =
              try Integer.parseInt(body, if (hex) 16 else 10)
              catch { case _: NumberFormatException => -1 }
            emitNumeric(cp, j + 1)
          } else {
            // not a well-formed digit run — legacy malformed-ref window:
            // any other `&#<body>;` terminated within 10 chars (&#-5;,
            // &#zz;, &#x;, &#12ab;) still degrades to a space, the
            // documented never-throw contract for entity-shaped garbage
            var semi = -1
            var j2 = i + 2
            val jEnd2 = math.min(n, i + 11)
            while (j2 < jEnd2 && semi < 0) {
              if (html.charAt(j2) == ';') semi = j2
              j2 += 1
            }
            if (semi > i + 2) {
              val body0 = html.substring(i + 2, semi)
              val cp: Int =
                try {
                  if (body0.length > 1 &&
                      (body0.charAt(0) == 'x' || body0.charAt(0) == 'X'))
                    Integer.parseInt(body0.substring(1), 16)
                  else Integer.parseInt(body0)
                } catch { case _: NumberFormatException => -1 }
              emitNumeric(cp, semi + 1)
            }
          }
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          var semi = -1
          var j = i + 1
          val jEnd = math.min(n, i + 1 + NamedWindow)
          while (j < jEnd && semi < 0) {
            if (html.charAt(j) == ';') semi = j
            j += 1
          }
          if (semi > i + 1) {
            val name = html.substring(i + 1, semi)
            if (name.forall(_.isLetterOrDigit)) {
              // entity-shaped name: decode if known, else RAW passthrough
              // (prose like "Q&A; next" is not an entity)
              val rep = NamedEntities.get(name)
              if (rep != null) { sb.append(rep); i = semi + 1; consumed = true }
            }
          }
        }
        if (!consumed) { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
