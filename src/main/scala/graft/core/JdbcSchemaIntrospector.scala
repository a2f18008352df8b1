package graft.core

import org.apache.spark.sql.types._

/** Live schema introspection over JDBC `DatabaseMetaData` — the concrete
  * `fetch` behind [[SchemaCatalog]].
  *
  * The reference introspects the source database directly (`SHOW FULL
  * TABLES` / `SHOW INDEX` / information_schema,
  * /root/reference pkg/schema_store/utils.go:30-117, cached per database
  * in schema_store.go:142-148) and carries per-column metadata — name,
  * raw type, default, nullability, generatedness — plus primary-key and
  * unique-key column sets (schema_store.go:61-85). `DatabaseMetaData` is
  * the portable JDBC spelling of the same queries: `getColumns` ≙
  * information_schema.columns, `getPrimaryKeys` ≙ SHOW INDEX WHERE
  * Key_name='PRIMARY', `getIndexInfo(unique=true)` ≙ SHOW INDEX.
  */
object JdbcSchemaIntrospector {

  /** The reference's `schema_store.Column` analogue (schema_store.go:61-71). */
  final case class IntrospectedColumn(
      name: String,
      sqlType: String, // driver type name, e.g. "BIGINT", "VARCHAR"
      jdbcType: Int, // java.sql.Types constant
      precision: Int,
      scale: Int,
      nullable: Boolean,
      default: Option[String],
      isGenerated: Boolean,
      isAutoIncrement: Boolean)

  /** The reference's `schema_store.Table` analogue (schema_store.go:74-85). */
  final case class IntrospectedTable(
      schema: String,
      name: String,
      columns: Seq[IntrospectedColumn],
      primaryKey: Seq[String], // in key ordinal order
      uniqueKeys: Map[String, Seq[String]]) {

    def struct: StructType = StructType(columns.map(c =>
      StructField(c.name, toSpark(c), c.nullable)))

    /** Columns a writer must emit — generated/identity columns are
      * excluded (pkg/sql_execution_engine/utils.go:91-93 leaves them to
      * their DEFAULT).
      */
    def writableColumns: Seq[IntrospectedColumn] =
      columns.filterNot(c => c.isGenerated || c.isAutoIncrement)

    /** The schema a sink reconciles against: writable columns only. */
    def writableStruct: StructType = StructType(writableColumns.map(c =>
      StructField(c.name, toSpark(c), c.nullable)))
  }

  /** Sink-side live schema fetch: (schema, table) → writable StructType,
    * one introspection connection per miss (wrap in a SchemaCatalog for
    * caching + DDL invalidation).
    */
  def writableFetch(connect: () => java.sql.Connection): (String, String) => StructType =
    (db, table) => {
      val conn = connect()
      try introspect(conn, db, table).writableStruct
      finally conn.close()
    }

  /** JDBC type descriptor → Spark type (the information_schema twin of
    * MySqlTypes.toSpark, keyed on java.sql.Types instead of raw MySQL
    * type text).
    */
  def toSpark(c: IntrospectedColumn): DataType = {
    import java.sql.Types._
    c.jdbcType match {
      case BIGINT => LongType
      case INTEGER => IntegerType
      case SMALLINT | TINYINT => IntegerType
      case BOOLEAN | BIT => BooleanType
      case DOUBLE | FLOAT => DoubleType
      case REAL => FloatType
      case NUMERIC | DECIMAL => DecimalType(math.max(1, c.precision), math.max(0, c.scale))
      case TIMESTAMP | TIMESTAMP_WITH_TIMEZONE => TimestampType
      case DATE => DateType
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => BinaryType
      case _ => StringType
    }
  }

  /** Introspect one table. Identifier case: ANSI engines (Derby) fold
    * unquoted DDL to upper case, so an exact-case miss retries upper-cased
    * — the MySQL path is case-preserving and hits on the first try.
    *
    * Metadata name arguments are JDBC LIKE patterns: `_`/`%` in real
    * identifiers (table `t_a`!) are escaped with the driver's search
    * escape so only the exact name matches. An empty schema searches all
    * schemas — if the name exists in more than one, that's ambiguous and
    * fails loudly rather than merging two tables' columns.
    */
  def introspect(conn: java.sql.Connection, schema: String,
      table: String): IntrospectedTable = {
    val md = conn.getMetaData
    // name args are LIKE patterns and driver support for the search
    // escape is inconsistent (Derby ignores it in getColumns) — match the
    // pattern wide, then keep only EXACT schema/table name rows
    def cols(s: String, t: String): Seq[(String, IntrospectedColumn)] = {
      val rs = md.getColumns(null, if (s.isEmpty) null else s, t, null)
      val out = Seq.newBuilder[(String, IntrospectedColumn)]
      try while (rs.next()) {
        val rowSchema = Option(rs.getString("TABLE_SCHEM")).getOrElse("")
        val exact = rs.getString("TABLE_NAME") == t && (s.isEmpty || rowSchema == s)
        if (exact) out += ((rowSchema, IntrospectedColumn(
          name = rs.getString("COLUMN_NAME"),
          sqlType = rs.getString("TYPE_NAME"),
          jdbcType = rs.getInt("DATA_TYPE"),
          precision = rs.getInt("COLUMN_SIZE"),
          scale = { val v = rs.getInt("DECIMAL_DIGITS"); if (rs.wasNull()) 0 else v },
          nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          default = Option(rs.getString("COLUMN_DEF")).map(_.trim),
          isGenerated = scala.util.Try(rs.getString("IS_GENERATEDCOLUMN"))
            .toOption.contains("YES"),
          isAutoIncrement = scala.util.Try(rs.getString("IS_AUTOINCREMENT"))
            .toOption.contains("YES"))))
      } finally rs.close()
      out.result()
    }
    var (s, t) = (schema, table)
    var found = cols(s, t)
    if (found.isEmpty) { // ANSI case folding
      s = schema.toUpperCase; t = table.toUpperCase
      found = cols(s, t)
    }
    require(found.nonEmpty, s"introspect: no columns for $schema.$table " +
      "(table missing, or identifier case mismatch)")
    val bySchema = found.groupBy(_._1)
    require(bySchema.size == 1,
      s"introspect: table $table exists in multiple schemas " +
        s"(${bySchema.keys.mkString(", ")}) — qualify the target schema")
    if (s.isEmpty) s = bySchema.keys.head // pin pk/index lookups to it
    val columns = found.map(_._2)

    val pk = {
      val rs = md.getPrimaryKeys(null, if (s.isEmpty) null else s, t)
      val out = Seq.newBuilder[(Short, String)]
      try while (rs.next()) out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
      finally rs.close()
      out.result().sortBy(_._1).map(_._2)
    }

    val uniques = {
      val rs = md.getIndexInfo(null, if (s.isEmpty) null else s, t, true, false)
      val out = Seq.newBuilder[(String, Short, String)]
      try while (rs.next()) {
        val idx = rs.getString("INDEX_NAME")
        val c = rs.getString("COLUMN_NAME")
        if (idx != null && c != null) out += ((idx, rs.getShort("ORDINAL_POSITION"), c))
      } finally rs.close()
      out.result().groupBy(_._1)
        .view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    }

    IntrospectedTable(s, t, columns, pk, uniques)
  }

  /** A [[SchemaCatalog]] whose misses introspect live over a pooled-new
    * JDBC connection — cache + invalidate-on-DDL, fetch = real metadata.
    */
  def catalog(connect: () => java.sql.Connection): SchemaCatalog =
    new SchemaCatalog((db, table) => {
      val conn = connect()
      try introspect(conn, db, table).struct
      finally conn.close()
    })
}
