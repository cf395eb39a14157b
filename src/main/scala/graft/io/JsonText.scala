package graft.io

/** The ONE JSON string codec for every hand-built JSON surface (Azure
  * provider bodies, Atlas request/response builders, mock providers) —
  * previously three near-copies, two of which silently decoded the legal
  * escapes \b and \f to literal 'b'/'f'.
  *
  * escape: the full JSON escape set — quote, backslash, the named
  * control escapes, and \"u\"-form for every other control character
  * (JSON forbids them raw; PDF-scraped corpus text carries them).
  * unescape: the exact inverse, passing unknown escape pairs through
  * unchanged (lenient, like the JSON parsers these strings round-trip
  * through).
  */
object JsonText {

  def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\b' => "\\b"
      case '\f' => "\\f"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(isHex) =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
