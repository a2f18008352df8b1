package graft.core

import graft.core.JdbcSchemaIntrospector._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Live-introspection goldens against embedded Derby — a real
  * DatabaseMetaData walk (PK, nullability, defaults, generated columns,
  * unique keys), plus DDL-invalidation re-fetch through SchemaCatalog.
  */
class JdbcSchemaIntrospectorSpec extends AnyFunSuite with graft.DerbyEngineIsolation {

  private def freshDb(): String =
    "jdbc:derby:memory:introspect" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"

  test("introspects a real Derby table: columns, PK order, nullability, defaults, generated") {
    val url = freshDb()
    val c = java.sql.DriverManager.getConnection(url)
    try {
      c.createStatement().execute(
        """CREATE TABLE app_orders (
          |  region_id INT NOT NULL,
          |  order_id BIGINT NOT NULL,
          |  status VARCHAR(8) DEFAULT 'open',
          |  amount DECIMAL(11,3),
          |  created TIMESTAMP NOT NULL,
          |  rowver BIGINT GENERATED ALWAYS AS IDENTITY,
          |  PRIMARY KEY (region_id, order_id))""".stripMargin)
      c.createStatement().execute(
        "CREATE UNIQUE INDEX uq_rowver ON app_orders (rowver)")

      // lower-case identifiers: the ANSI case-fold retry path
      val t = introspect(c, "", "app_orders")
      assert(t.primaryKey == Seq("REGION_ID", "ORDER_ID")) // key ordinal order
      val byName = t.columns.map(col => col.name -> col).toMap
      assert(!byName("REGION_ID").nullable && !byName("CREATED").nullable)
      assert(byName("STATUS").nullable)
      assert(byName("STATUS").default.contains("'open'"))
      assert(byName("AMOUNT").jdbcType == java.sql.Types.DECIMAL)
      assert(byName("ROWVER").isAutoIncrement || byName("ROWVER").isGenerated)
      assert(t.writableColumns.map(_.name) ==
        Seq("REGION_ID", "ORDER_ID", "STATUS", "AMOUNT", "CREATED"))
      assert(t.uniqueKeys.exists(_._2 == Seq("ROWVER")))

      assert(t.struct == StructType(Seq(
        StructField("REGION_ID", IntegerType, nullable = false),
        StructField("ORDER_ID", LongType, nullable = false),
        StructField("STATUS", StringType),
        StructField("AMOUNT", DecimalType(11, 3)),
        StructField("CREATED", TimestampType, nullable = false),
        StructField("ROWVER", LongType, nullable = false))))
    } finally c.close()
  }

  test("metadata name args are escaped: t_a must not match TAA; ambiguity fails loudly") {
    val url = freshDb()
    val c = java.sql.DriverManager.getConnection(url)
    try {
      // '_' in a real identifier is a LIKE wildcard to raw JDBC metadata
      // patterns — unescaped, "t_a" would merge TAA's columns in
      c.createStatement().execute("CREATE TABLE t_a (id BIGINT, v VARCHAR(4))")
      c.createStatement().execute("CREATE TABLE taa (other INT, x INT, y INT)")
      val t = introspect(c, "", "t_a")
      assert(t.columns.map(_.name) == Seq("ID", "V"))

      // same table name in two schemas: merging them would render writes
      // no single table accepts — must fail, not guess
      c.createStatement().execute("CREATE SCHEMA s1")
      c.createStatement().execute("CREATE SCHEMA s2")
      c.createStatement().execute("CREATE TABLE s1.dup (a INT)")
      c.createStatement().execute("CREATE TABLE s2.dup (b INT, c INT)")
      val e = intercept[IllegalArgumentException](introspect(c, "", "dup"))
      assert(e.getMessage.contains("multiple schemas"))
      // qualifying resolves it
      assert(introspect(c, "s1", "dup").columns.map(_.name) == Seq("A"))
    } finally c.close()
  }

  test("catalog fetch is live: DDL invalidation re-introspects the ALTERed table") {
    val url = freshDb()
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().execute(
      "CREATE TABLE t1 (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))")
    finally c.close()

    val cat = JdbcSchemaIntrospector.catalog(() =>
      java.sql.DriverManager.getConnection(url))
    val before = cat.schemaOf("", "T1")
    assert(before.fieldNames.toSeq == Seq("ID", "V"))

    val c2 = java.sql.DriverManager.getConnection(url)
    try c2.createStatement().execute("ALTER TABLE t1 ADD COLUMN extra INT")
    finally c2.close()

    // cached until the DDL event invalidates — then the re-fetch sees it
    assert(cat.schemaOf("", "T1").fieldNames.toSeq == Seq("ID", "V"))
    cat.invalidate("")
    assert(cat.schemaOf("", "T1").fieldNames.toSeq == Seq("ID", "V", "EXTRA"))
  }
}
