package graft.functions

/** Driver-side JSON string escaping shared by the verify dump and the
  * serving envelope: backslash, quote, and ALL control chars (<0x20) —
  * a tab/CR in builder-authored SQL or a newline in a Spark exception
  * message would otherwise emit invalid JSON. */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
