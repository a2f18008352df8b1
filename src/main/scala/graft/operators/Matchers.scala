package graft.operators

import graft.core.Glob
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate atoms over the change-message envelope.
  *
  * The reference AND-combines all matchers in a group
  * (/root/reference pkg/core/matcher.go:12-22); config keys starting with
  * `match` instantiate them (pkg/matchers/matchers.go:16-33).
  *
  * Here each matcher compiles to a Catalyst `Column` predicate — codegen'd
  * and pushable into the source scan (partition/predicate pushdown replaces
  * the reference's hand-rolled route pre-filter,
  * pkg/inputs/mysqlstream/binlog_tailer.go:317-325).
  */
sealed trait Matcher {
  def predicate: Column
}

/** Glob on the database name (pkg/matchers/schema_matcher.go:26-32). */
final case class SchemaMatcher(glob: String, dbCol: String = "database") extends Matcher {
  def predicate: Column = col(dbCol).like(Glob.toLike(glob))
}

/** Any-of glob list on the table name (pkg/matchers/table_matcher.go:34-41). */
final case class TableMatcher(globs: Seq[String], tableCol: String = "table") extends Matcher {
  def predicate: Column =
    globs.map(g => col(tableCol).like(Glob.toLike(g))).reduce(_ || _)
}

/** Any-of regex list on the table name (pkg/matchers/table_regex_matcher.go:37-44). */
final case class TableRegexMatcher(regexes: Seq[String], tableCol: String = "table") extends Matcher {
  def predicate: Column = regexes.map(r => col(tableCol).rlike(r)).reduce(_ || _)
}

/** Regex on the DDL statement, only for ddl messages
  * (pkg/matchers/ddl_regex_matcher.go:31-37).
  */
final case class DdlRegexMatcher(regex: String, typeCol: String = "type",
    ddlCol: String = "ddl_statement") extends Matcher {
  def predicate: Column = col(typeCol) === "ddl" && col(ddlCol).rlike(regex)
}

/** DML op ∈ configured set (pkg/matchers/dml_operator_matcher.go:55-61). */
final case class DmlOpMatcher(ops: Seq[String], opCol: String = "op") extends Matcher {
  def predicate: Column = col(opCol).isin(ops: _*)
}

/** Arbitrary SQL expression matcher — a strict superset the reference lacks
  * (gravity has no expression language, docs/2.0/05-filters-en.md:86-103).
  */
final case class ExprMatcher(sql: String) extends Matcher {
  def predicate: Column = expr(sql)
}

object Matcher {
  /** AND-combine a matcher group (pkg/core/matcher.go:12-22). */
  def group(ms: Seq[Matcher]): Column =
    if (ms.isEmpty) lit(true) else ms.map(_.predicate).reduce(_ && _)
}
