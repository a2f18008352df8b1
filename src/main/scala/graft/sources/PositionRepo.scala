package graft.sources

/** External-DB position repository — the reference's mysql position repo
  * (pkg/position_repos/mysql_repo.go:94-179: a `gravity_positions` table
  * keyed by pipeline name holding an opaque serialized position value, a
  * stage tag, and update timestamps, maintained with an idempotent
  * upsert).
  *
  * graft's PRIMARY position store is the streaming checkpoint (stronger:
  * positions commit atomically with the batch; see streaming.Positions).
  * This repo exists for parity with deployments that track positions in
  * an external database — cross-tool visibility, monitoring dashboards,
  * hand-off between replication tools — and for the two-stage backfill
  * bookmark shape when the bookmark must outlive the checkpoint dir.
  */
final case class PositionEntry(
    name: String,
    stage: String,
    value: String,
    updatedAt: java.sql.Timestamp)

trait PositionRepo extends AutoCloseable {
  def init(): Unit
  def get(pipelineName: String): Option[PositionEntry]
  def put(pipelineName: String, stage: String, value: String): Unit
  def delete(pipelineName: String): Unit
}

object PositionRepo {
  val Database = "_graft"
  val Table = "gravity_positions"

  /** Internal-traffic detection for the position store — replication of
    * the position table itself must be elided from the change stream
    * (position_repos IsPositionStoreEvent, mysql_repo.go:53-55).
    */
  def isPositionStoreEvent(database: String, table: String): Boolean =
    database == Database && table == Table
}

/** ANSI-JDBC implementation (proven against embedded Derby in
  * `PositionRepoSpec`; the SQL is deliberately dialect-minimal —
  * UPDATE-then-INSERT upsert instead of MySQL's ON DUPLICATE KEY, and an
  * explicit updated_at instead of ON UPDATE NOW()).
  */
final class JdbcPositionRepo(url: String,
    schema: String = PositionRepo.Database) extends PositionRepo {

  // the schema name (_graft, gravity's _gravity) needs quoting — a
  // leading underscore is illegal unquoted in standard SQL — but stock
  // MySQL only honors double quotes under ANSI_QUOTES, so pick the
  // dialect's own quote from the url: backticks for MySQL/MariaDB,
  // standard double quotes for Derby/Postgres/everything ANSI
  private val mysqlish =
    url.startsWith("jdbc:mysql:") || url.startsWith("jdbc:mariadb:")
  private def q(ident: String): String =
    if (mysqlish) s"`$ident`" else s""""$ident""""
  private def qualified = s"${q(schema)}.${q(PositionRepo.Table)}"

  private lazy val conn: java.sql.Connection =
    java.sql.DriverManager.getConnection(url)

  private def ignorable(e: java.sql.SQLException): Boolean =
    graft.sinks.DdlRewriter.isIgnorable(e)

  /** Idempotent: schema + table created if absent (mysql_repo Init's
    * CREATE DATABASE/TABLE IF NOT EXISTS, minus the legacy-table drop).
    */
  def init(): Unit = {
    val st = conn.createStatement()
    try {
      try st.execute(s"CREATE SCHEMA ${q(schema)}")
      catch { case e: java.sql.SQLException if ignorable(e) => () }
      // VARCHAR(8192) is the Derby/MySQL/Postgres intersection (Derby has
      // no TEXT; MySQL TEXT can't be a default; 8 KB comfortably holds
      // any GTID-set/file+pos JSON the tailers checkpoint)
      try st.execute(
        s"""CREATE TABLE $qualified (
           |  name VARCHAR(255) NOT NULL PRIMARY KEY,
           |  stage VARCHAR(20) NOT NULL,
           |  position VARCHAR(8192),
           |  created_at TIMESTAMP NOT NULL,
           |  updated_at TIMESTAMP NOT NULL
           |)""".stripMargin)
      catch { case e: java.sql.SQLException if ignorable(e) => () }
    } finally st.close()
  }

  def get(pipelineName: String): Option[PositionEntry] = {
    val ps = conn.prepareStatement(
      s"SELECT name, stage, position, updated_at FROM $qualified WHERE name = ?")
    try {
      ps.setString(1, pipelineName)
      val rs = ps.executeQuery()
      if (!rs.next()) None
      else Some(PositionEntry(rs.getString(1), rs.getString(2),
        rs.getString(3), rs.getTimestamp(4)))
    } finally ps.close()
  }

  /** Upsert; an empty position value is rejected like the reference
    * (mysql_repo.go:161-163 — an empty value always signals a caller
    * bug, never a legitimate position).
    */
  def put(pipelineName: String, stage: String, value: String): Unit = {
    require(value.nonEmpty, "empty position value")
    val upd = conn.prepareStatement(
      s"UPDATE $qualified SET stage = ?, position = ?, updated_at = CURRENT_TIMESTAMP WHERE name = ?")
    val n = try {
      upd.setString(1, stage); upd.setString(2, value); upd.setString(3, pipelineName)
      upd.executeUpdate()
    } finally upd.close()
    if (n == 0) {
      val ins = conn.prepareStatement(
        s"INSERT INTO $qualified (name, stage, position, created_at, updated_at) " +
          "VALUES (?, ?, ?, CURRENT_TIMESTAMP, CURRENT_TIMESTAMP)")
      try {
        ins.setString(1, pipelineName); ins.setString(2, stage); ins.setString(3, value)
        ins.executeUpdate()
      } finally ins.close()
    }
  }

  def delete(pipelineName: String): Unit = {
    val ps = conn.prepareStatement(s"DELETE FROM $qualified WHERE name = ?")
    try { ps.setString(1, pipelineName); ps.executeUpdate() } finally ps.close()
  }

  def close(): Unit = conn.close()
}
