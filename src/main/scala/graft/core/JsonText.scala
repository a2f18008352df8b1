package graft.core

/** The one JSON string escaper (Bench, Verify, HealthServer, EsBulk all
  * render small JSON by hand — divergent copies previously disagreed on
  * control characters). Escapes quote/backslash, the common whitespace
  * escapes, and \\u-escapes every other control char — lossless.
  */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** A quoted JSON string literal. */
  def str(s: String): String = "\"" + escape(s) + "\""
}
