package graft.sinks

/** DDL replay for the relational sink: classify the statement, rewrite
  * schema/table names to the routed targets, and make it idempotent.
  *
  * The reference replays six statement classes with target renames and
  * idempotency — IF EXISTS / IF NOT EXISTS injection and tolerance of
  * duplicate-column errors (/root/reference pkg/outputs/mysql/mysql.go:
  * 246-392, executeDDL 484-511). Statements are matched structurally
  * (regex-lite, like the reference's non-AST fallbacks); anything
  * unrecognized passes through untouched for the operator to review.
  */
object DdlRewriter {

  sealed trait DdlClass
  case object CreateDatabase extends DdlClass
  case object DropDatabase extends DdlClass
  case object CreateTable extends DdlClass
  case object DropTable extends DdlClass
  case object AlterTable extends DdlClass
  case object RenameTable extends DdlClass
  case object Other extends DdlClass

  private val createDb = """(?is)^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?[`"]?(\w+)[`"]?(.*)$""".r
  private val dropDb = """(?is)^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?[`"]?(\w+)[`"]?(.*)$""".r
  private val createTbl = """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)(.*)$""".r
  private val dropTbl = """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+)(.*)$""".r
  private val alterTbl = """(?is)^\s*ALTER\s+TABLE\s+(\S+)(.*)$""".r
  private val renameTbl = """(?is)^\s*RENAME\s+TABLE\s+(.*)$""".r

  def classify(sql: String): DdlClass = sql match {
    case createDb(_, _) => CreateDatabase
    case dropDb(_, _) => DropDatabase
    case createTbl(_, _) => CreateTable
    case dropTbl(_, _) => DropTable
    case alterTbl(_, _) => AlterTable
    case renameTbl(_) => RenameTable
    case _ => Other
  }

  /** Qualified name rewrite toward the routed target, in the requested
    * identifier dialect; an empty target schema renders the bare table
    * (ANSI targets like Derby address tables schema-less here).
    */
  private def retarget(targetDb: String, targetTable: String, quote: String): String =
    Seq(targetDb, targetTable).filter(_.nonEmpty)
      .map(n => s"$quote$n$quote").mkString(".")

  /** Rewrite a DDL statement toward (targetDb, targetTable), injecting
    * idempotency guards. Returns the statements to execute in order.
    * `quote` is the target's identifier quote (backtick for MySQL, "" for
    * bare-id ANSI targets).
    */
  def rewrite(sql: String, targetDb: String, targetTable: String,
      quote: String = "`"): Seq[String] =
    sql match {
      case createDb(_, rest) =>
        Seq(s"CREATE DATABASE IF NOT EXISTS $quote$targetDb$quote${rest.trim match {
          case "" => ""; case r => " " + r
        }}")
      case dropDb(_, _) =>
        Seq(s"DROP DATABASE IF EXISTS $quote$targetDb$quote")
      case createTbl(_, rest) =>
        Seq(s"CREATE TABLE IF NOT EXISTS ${retarget(targetDb, targetTable, quote)}${rest}")
      case dropTbl(_, _) =>
        Seq(s"DROP TABLE IF EXISTS ${retarget(targetDb, targetTable, quote)}")
      case alterTbl(_, rest) =>
        // TiDB executes one alter-spec per statement — split a multi-spec
        // ALTER into per-spec statements (mysql.go:246-392 multi-spec split)
        splitAlterSpecs(rest).map(spec =>
          s"ALTER TABLE ${retarget(targetDb, targetTable, quote)} $spec")
      case renameTbl(_) =>
        // rename collapses to targeting: the routed name IS the new name
        Seq.empty
      case other => Seq(other)
    }

  /** MySQL errno values safe to swallow on replay (duplicate column/key —
    * mysql.go ignores 1060/1061 so ALTER replays are idempotent).
    */
  val ignorableErrnos: Set[Int] = Set(1060, 1061, 1050, 1091)

  /** Replay-idempotency check across dialects: MySQL errnos above, plus
    * the ANSI/Derby SQLStates for "object already exists" (X0Y32, X0Y68),
    * duplicate column (42711 — the DB2/Derby family code), and
    * "column/object not found" on a replayed DROP (42X14, 42Y55).
    */
  def isIgnorable(e: java.sql.SQLException): Boolean =
    ignorableErrnos(e.getErrorCode) ||
      Option(e.getSQLState).exists(s =>
        s == "X0Y32" || s == "X0Y68" || s == "42711" || s == "42X14" || s == "42Y55")

  /** Split ALTER specs on top-level commas — commas inside parens
    * (column type args) or quotes (defaults, comments) don't split.
    */
  private[sinks] def splitAlterSpecs(rest: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var escaped = false
    rest.foreach { c =>
      if (quote != 0) {
        // backslash escapes inside string literals (MySQL default mode)
        // must not terminate the quote early
        cur += c
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == quote) quote = 0
      }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }
}

/** Bidirectional drop dedupe (mysql.go:246-392): in two-way replication a
  * DROP executed on the target is tailed back and would replay against the
  * origin — the reference remembers recent drops and skips the echo. The
  * suppression is TIME-windowed (an echo arrives within replication lag; a
  * legitimate re-DROP after a re-CREATE comes later and must execute) and
  * bounded in memory (LRU by insertion, O(capacity)).
  */
final class DdlDropDeduper(capacity: Int = 1024, windowMs: Long = 60000,
    clock: () => Long = () => System.currentTimeMillis()) extends Serializable {
  private val seen = new java.util.LinkedHashMap[String, java.lang.Long](16, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, java.lang.Long]): Boolean =
      size() > capacity
  }
  private def normalize(sql: String): String =
    sql.toLowerCase.replaceAll("[`\"]", "").replaceAll("\\s+", " ").trim

  /** True the first time a DROP statement is seen within the window;
    * false for its echo. Non-DROP statements always pass.
    */
  def shouldExecute(sql: String): Boolean = synchronized {
    DdlRewriter.classify(sql) match {
      case DdlRewriter.DropTable | DdlRewriter.DropDatabase =>
        val key = normalize(sql)
        val now = clock()
        val recent = Option(seen.get(key)).exists(t => now - t <= windowMs)
        seen.put(key, now)
        !recent
      case _ => true
    }
  }
}
