package graft.core

/** Glob pattern support (`*` any-run, `?` single char) matching the
  * reference's matcher globs (/root/reference pkg/utils/glob.go:11).
  *
  * Compiled to SQL LIKE patterns so predicates stay inside Catalyst
  * (codegen + pushdown) instead of a UDF.
  */
object Glob {

  /** glob → SQL LIKE pattern. `*`→`%`, `?`→`_`; literal `%`/`_` escaped. */
  def toLike(glob: String): String =
    glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case c   => c.toString
    }

  /** glob → anchored regex (for rlike when LIKE can't express it). */
  def toRegex(glob: String): String =
    "^" + glob.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  /** Plain-Scala matcher (driver-side planning, e.g. route pre-filtering). */
  def matches(glob: String, s: String): Boolean = s.matches(toRegex(glob))
}
