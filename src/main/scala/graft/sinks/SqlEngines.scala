package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** SQL-rendering engines for the relational upsert sink.
  *
  * The reference renders row batches into MySQL statements
  * (/root/reference pkg/sql_execution_engine/): multi-row `REPLACE INTO`
  * (mysql_replace_engine.go:59-88, SQL gen utils.go:19-52,77-107),
  * `INSERT IGNORE` (utils.go:109-127), single-row
  * `INSERT ... ON DUPLICATE KEY UPDATE` (utils.go:129-185), and isolated
  * single-key DELETEs. Batches are split so a DELETE is never batched with
  * writes (pkg/outputs/mysql/mysql.go:452-482).
  *
  * Statement rendering is pure (testable without a database); execution
  * goes through [[StatementExecutor]], the SPI a JDBC/foreachBatch writer
  * implements. All engines are idempotent per key (REPLACE semantics), the
  * property exactly-once delivery relies on when a micro-batch replays.
  */
final case class RenderedStatement(sql: String, args: Seq[Seq[Any]])

trait SqlEngine extends Serializable {
  def name: String

  /** The dialect's identifier quote string — MySQL backtick by default;
    * ANSI dialects (Derby/warehouse targets) override with `"` or with ""
    * (bare ids, case-folded by the target).
    */
  protected def idQuote: String = "`"

  /** Identifier quoting — wraps in the dialect quote. */
  protected def quoteId(c: String): String = s"$idQuote$c$idQuote"

  /** Quote one identifier SAFELY for interpolation into SQL text: embedded
    * quote chars are escaped by doubling (the MySQL/ANSI rule); unquoted
    * dialects cannot escape, so the charset is validated instead. Target
    * schema/table names can arrive from stream data when routes are
    * unconfigured — they must never reach SQL text unexamined (the
    * reference quotes target identifiers in pkg/outputs/mysql/mysql.go).
    */
  final def quoteIdent(id: String): String = {
    require(id.nonEmpty && id.forall(ch => ch >= ' '),
      s"invalid SQL identifier: ${id.take(64)}")
    if (idQuote.isEmpty) {
      require(id.forall(ch => ch.isLetterOrDigit || ch == '_'),
        s"identifier needs quoting but dialect renders bare ids: ${id.take(64)}")
      id
    } else quoteId(id.replace(idQuote, idQuote + idQuote))
  }

  /** `schema`.`table` rendered with the dialect's identifier quoting. */
  final def qualify(schema: String, table: String): String =
    Seq(schema, table).filter(_.nonEmpty).map(quoteIdent).mkString(".")

  /** Render writes (insert/update images) for one table; rows are final
    * per-key images (the scheduler already compacted the batch).
    */
  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement]

  /** Render a delete for one key. */
  def renderDelete(table: String, pkCols: Seq[String], pkValues: Seq[Any]): RenderedStatement = {
    val where = pkCols.map(c => s"${quoteId(c)} = ?").mkString(" AND ")
    RenderedStatement(s"DELETE FROM $table WHERE $where", Seq(pkValues))
  }

  protected def placeholderTuples(nCols: Int, nRows: Int): String = {
    val tuple = Seq.fill(nCols)("?").mkString("(", ",", ")")
    Seq.fill(nRows)(tuple).mkString(",")
  }

  protected def columnList(schema: StructType): String =
    schema.fieldNames.map(quoteId).mkString(",")

  protected def rowArgs(schema: StructType, rows: Seq[Row]): Seq[Seq[Any]] =
    Seq(rows.flatMap(r => schema.fieldNames.map(c => r.getAs[Any](c))))
}

/** Multi-row REPLACE INTO — the reference's default engine. */
object ReplaceEngine extends SqlEngine {
  val name = "mysql-replace-engine"
  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] =
    if (rows.isEmpty) Nil
    else Seq(RenderedStatement(
      s"REPLACE INTO $table (${columnList(schema)}) VALUES ${placeholderTuples(schema.length, rows.length)}",
      rowArgs(schema, rows)))
}

/** Multi-row INSERT IGNORE — append-only mode. */
object InsertIgnoreEngine extends SqlEngine {
  val name = "mysql-insert-ignore-engine"
  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] =
    if (rows.isEmpty) Nil
    else Seq(RenderedStatement(
      s"INSERT IGNORE INTO $table (${columnList(schema)}) VALUES ${placeholderTuples(schema.length, rows.length)}",
      rowArgs(schema, rows)))
}

/** Per-row INSERT ... ON DUPLICATE KEY UPDATE (MERGE-style upsert). */
object OnDupKeyUpdateEngine extends SqlEngine {
  val name = "mysql-insert-on-dup-key-update"
  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] =
    rows.map { r =>
      val sets = schema.fieldNames.map(c => s"`$c` = VALUES(`$c`)").mkString(",")
      RenderedStatement(
        s"INSERT INTO $table (${columnList(schema)}) VALUES ${placeholderTuples(schema.length, 1)} " +
          s"ON DUPLICATE KEY UPDATE $sets",
        Seq(schema.fieldNames.map(c => r.getAs[Any](c)).toSeq))
    }
}

/** Optimistic compare-and-set engine for bidirectional replication
  * (reference conflict-detect-engine, pkg/sql_execution_engine/
  * conflict_engine.go:113-200): INSERT plain; UPDATE/DELETE carry a WHERE
  * matching the OLD row image so a concurrent change on the target makes
  * the statement affect 0 rows — the caller treats that as a conflict
  * (logs it; optionally overrides with REPLACE).
  */
class ConflictDetect(quote: String = "`", nullSafeEq: String = "<=>") extends SqlEngine {
  val name = "conflict-detect-engine"
  override protected def idQuote: String = quote

  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] =
    rows.map { r =>
      RenderedStatement(
        s"INSERT INTO $table (${columnList(schema)}) VALUES ${placeholderTuples(schema.length, 1)}",
        Seq(schema.fieldNames.map(c => r.getAs[Any](c)).toSeq))
    }

  /** Guard WHERE clause. A genuinely-NULL old value renders `col IS NULL`
    * (no bound parameter): dialects configured with plain `=` instead of a
    * null-safe operator would otherwise never match (`col = NULL` is never
    * true), flagging every NULL-bearing old image as a conflict.
    */
  private def guardWhere(oldValues: Map[String, Any]): (String, Seq[Any]) = {
    val sorted = oldValues.toSeq.sortBy(_._1)
    val where = sorted.map { case (c, v) =>
      if (v == null) s"${quoteId(c)} IS NULL" else s"${quoteId(c)} $nullSafeEq ?"
    }.mkString(" AND ")
    (where, sorted.collect { case (_, v) if v != null => v })
  }

  /** UPDATE with optimistic old-image guard. */
  def renderGuardedUpdate(table: String, schema: StructType, newRow: Row,
      oldValues: Map[String, Any]): RenderedStatement = {
    val sets = schema.fieldNames.map(c => s"${quoteId(c)} = ?").mkString(",")
    val (where, guardVals) = guardWhere(oldValues)
    RenderedStatement(
      s"UPDATE $table SET $sets WHERE $where",
      Seq(schema.fieldNames.map(c => newRow.getAs[Any](c)).toSeq ++ guardVals))
  }

  /** DELETE with optimistic old-image guard. */
  def renderGuardedDelete(table: String, oldValues: Map[String, Any]): RenderedStatement = {
    val (where, guardVals) = guardWhere(oldValues)
    RenderedStatement(s"DELETE FROM $table WHERE $where", Seq(guardVals))
  }
}

/** MySQL-dialect conflict engine (backticks, null-safe `<=>`). */
object ConflictDetectEngine extends ConflictDetect()

/** Per-row ANSI MERGE upsert — the dialect for warehouse/Derby targets that
  * have no REPLACE INTO. Uses the single-row constant source form
  * (`USING SYSIBM.SYSDUMMY1`, the Derby/DB2 idiom); ON params carry CASTs
  * because Derby cannot infer untyped parameters in the ON clause.
  * Identifiers render unquoted (ANSI folds case; quoting would demand
  * exact-case DDL).
  */
final case class AnsiMergeEngine(pkCols: Seq[String]) extends SqlEngine {
  val name = "ansi-merge-engine"
  override protected def idQuote: String = ""

  private def sqlType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _ => "VARCHAR(32672)"
  }

  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] = {
    if (rows.isEmpty) return Nil
    // pk fields in SCHEMA order for both the rendered ON clause and the
    // bound args — deriving one from pkCols order and the other from the
    // schema would misalign composite keys
    val pkFields = schema.fields.filter(f => pkCols.contains(f.name))
    val nonPk = schema.fields.filterNot(f => pkCols.contains(f.name))
    val on = pkFields
      .map(f => s"t.${f.name} = CAST(? AS ${sqlType(f.dataType)})").mkString(" AND ")
    val matched =
      if (nonPk.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        nonPk.map(f => s"${f.name} = CAST(? AS ${sqlType(f.dataType)})").mkString(",") + " "
    val sql = s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on) " + matched +
      s"WHEN NOT MATCHED THEN INSERT (${columnList(schema)}) " +
      s"VALUES ${placeholderTuples(schema.length, 1)}"
    // one statement per row, NOT one multi-arg batch: Derby's MERGE breaks
    // under the JDBC batch API (DERBY-6892); the executor's PS cache keeps
    // the re-prepared cost at one prepare per partition
    rows.map { r =>
      RenderedStatement(sql, Seq(
        pkFields.map(f => r.getAs[Any](f.name)).toSeq ++
          nonPk.map(f => r.getAs[Any](f.name)) ++
          schema.fieldNames.map(c => r.getAs[Any](c))))
    }
  }
}

/** User-supplied SQL template (reference manual-engine): `{{columns}}`,
  * `{{placeholders}}`, `{{table}}` expand per batch.
  */
final case class ManualEngine(template: String) extends SqlEngine {
  val name = "manual-engine"
  def renderWrites(table: String, schema: StructType, rows: Seq[Row]): Seq[RenderedStatement] =
    if (rows.isEmpty) Nil
    else Seq(RenderedStatement(
      template
        .replace("{{table}}", table)
        .replace("{{columns}}", columnList(schema))
        .replace("{{placeholders}}", placeholderTuples(schema.length, rows.length)),
      rowArgs(schema, rows)))
}

/** Execution SPI: the JDBC writer implements this; tests record statements.
  * `execute` returns per-arg-batch affected-row counts — the
  * conflict-detect loop reads them (affected == 0 ⇒ conflict, reference
  * pkg/sql_execution_engine/conflict_engine.go:113-200).
  */
trait StatementExecutor {
  def execute(stmt: RenderedStatement): Array[Int]

  /** Run `f`'s statements atomically when the target supports it —
    * the internal-txn tagger needs its marker row committed in the SAME
    * transaction as the data writes (pkg/sql_execution_engine/
    * internal_txn_tagger.go). Default: best-effort passthrough.
    */
  def transactional[T](f: => T): T = f

  def close(): Unit = ()
}

/** JDBC-backed executor. Prepared statements are cached per SQL text (the
  * per-row engines — MERGE, conflict-detect — re-render the same SQL for
  * every row). Single-arg statements run through executeUpdate rather than
  * the batch API: Derby's MERGE NPEs inside executeBatch (DERBY-6892), and
  * executeUpdate returns the exact affected count the conflict loop needs.
  */
final class JdbcStatementExecutor(url: String, props: java.util.Properties)
    extends StatementExecutor {
  def this(url: String) = this(url, new java.util.Properties())
  private lazy val conn = java.sql.DriverManager.getConnection(url, props)
  private val cache = scala.collection.mutable.Map.empty[String, java.sql.PreparedStatement]
  def execute(stmt: RenderedStatement): Array[Int] = {
    val ps = cache.getOrElseUpdate(stmt.sql, conn.prepareStatement(stmt.sql))
    // statements are cached, so a failure must not leave residual state in
    // the PS (JDBC leaves post-failure batch contents implementation-
    // defined): clear batch/params in finally, else a swallowed
    // SQLException lets a later execute replay stale batched args
    if (stmt.args.lengthCompare(1) == 0) {
      try {
        stmt.args.head.zipWithIndex.foreach { case (a, i) => ps.setObject(i + 1, a) }
        Array(ps.executeUpdate())
      } finally {
        try ps.clearParameters() catch { case _: java.sql.SQLException => () }
      }
    } else {
      try {
        stmt.args.foreach { args =>
          args.zipWithIndex.foreach { case (a, i) => ps.setObject(i + 1, a) }
          ps.addBatch()
        }
        ps.executeBatch()
      } finally {
        try ps.clearBatch() catch { case _: java.sql.SQLException => () }
      }
    }
  }
  override def transactional[T](f: => T): T = {
    conn.setAutoCommit(false)
    try {
      val r = f
      conn.commit()
      r
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Exception => () }
        throw e
    } finally conn.setAutoCommit(true)
  }

  override def close(): Unit = {
    cache.values.foreach(ps => try ps.close() catch { case _: Exception => () })
    conn.close()
  }
}

/** Bidirectional-replication transaction tagger: a marker row written in
  * the same transaction as the batch's data statements, so a pipeline
  * tailing the TARGET recognizes (and elides) graft's own writes — the
  * write half of the loop-prevention pair whose read half is
  * KafkaCdc.dropInternalTraffic (reference internal_txn_tagger.go; marker
  * table `_gravity.gravity_txn_tags`).
  */
final case class InternalTxnTagger(tagTable: String, pipelineName: String) {
  // tagTable is interpolated into SQL text — configured, never from data,
  // but validated anyway so a bad config cannot smuggle SQL
  require(tagTable.nonEmpty &&
    tagTable.forall(ch => ch.isLetterOrDigit || ch == '_' || ch == '.'),
    s"invalid tag table identifier: ${tagTable.take(64)}")

  def render(): RenderedStatement =
    RenderedStatement(
      s"INSERT INTO $tagTable (pipeline_name, tagged_at) VALUES (?, ?)",
      Seq(Seq(pipelineName, new java.sql.Timestamp(System.currentTimeMillis()))))
}

object BatchSplitter {
  /** Split a per-key-compacted batch into engine calls with DELETEs
    * isolated, preserving intra-batch order (mysql.go:452-482). Rows must
    * carry an `op` column; returns ordered (isDelete, rows) runs.
    */
  def splitAroundDeletes(rows: Seq[Row], opCol: String = "op"): Seq[(Boolean, Seq[Row])] = {
    if (rows.isEmpty) return Nil
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Boolean, Seq[Row])]
    var cur = scala.collection.mutable.ArrayBuffer.empty[Row]
    var curDel = rows.head.getAs[String](opCol) == "delete"
    rows.foreach { r =>
      val del = r.getAs[String](opCol) == "delete"
      if (del != curDel || del) { // deletes always run alone
        if (cur.nonEmpty) runs += ((curDel, cur.toSeq))
        cur = scala.collection.mutable.ArrayBuffer.empty[Row]
        curDel = del
      }
      cur += r
    }
    if (cur.nonEmpty) runs += ((curDel, cur.toSeq))
    runs.toSeq
  }
}
