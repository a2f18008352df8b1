package graft.core

import graft.SparkSpec
import graft.core.MySqlTypes._
import org.apache.spark.sql.types._

class SchemaStoreSpec extends SparkSpec {

  test("mysql type mapping golden set (SURVEY §1.2)") {
    assert(toSpark("bigint unsigned") == DecimalType(20, 0))
    assert(toSpark("bigint") == LongType)
    assert(toSpark("int unsigned") == LongType)
    assert(toSpark("int(11)") == IntegerType)
    assert(toSpark("mediumint") == IntegerType)
    assert(toSpark("tinyint(1)") == BooleanType)
    assert(toSpark("decimal(11,3)") == DecimalType(11, 3))
    assert(toSpark("float(11,3)") == DoubleType)
    assert(toSpark("double(25,3)") == DoubleType)
    assert(toSpark("datetime(6)") == TimestampType)
    assert(toSpark("timestamp(6)") == TimestampType)
    assert(toSpark("date") == DateType)
    assert(toSpark("time") == StringType)
    assert(toSpark("tinyblob") == BinaryType)
    assert(toSpark("varchar(5000)") == StringType)
    assert(toSpark("char(5)") == StringType)
    assert(toSpark("json") == StringType)
    assert(toSpark("enum('a','b')") == StringType)
    assert(toSpark("bit(8)") == BinaryType)
  }

  test("unsigned fix-ups re-sign binlog values (msg.go:230-273 behavior)") {
    assert(unsignedFixup(-1L, 8) == 255L)
    assert(unsignedFixup(-1L, 16) == 65535L)
    assert(unsignedFixup(-1L, 24) == 16777215L)
    assert(unsignedFixup(-1L, 32) == 4294967295L)
    assert(unsignedFixup(127L, 8) == 127L)
    assert(unsignedBigintFixup(-1L) == new java.math.BigDecimal("18446744073709551615"))
    assert(unsignedBigintFixup(5L) == java.math.BigDecimal.valueOf(5L))
  }

  test("mediumint 3-byte re-sign (msg.go:253-263 behavior)") {
    assert(mediumintResign(0x800000) == -8388608)
    assert(mediumintResign(0xffffff) == -1)
    assert(mediumintResign(0x7fffff) == 8388607)
    assert(mediumintResign(42) == 42)
  }

  test("generated columns excluded from writes; struct built from metadata") {
    val cols = Seq(
      SourceColumn("id", "bigint unsigned", nullable = false),
      SourceColumn("ge", "int", isGenerated = true),
      SourceColumn("name", "varchar(31)"))
    assert(writableColumns(cols).map(_.name) == Seq("id", "name"))
    assert(toStruct(cols) == StructType(Seq(
      StructField("id", DecimalType(20, 0), nullable = false),
      StructField("ge", IntegerType),
      StructField("name", StringType))))
  }

  test("schema catalog caches and invalidates per database on DDL") {
    var fetches = 0
    val cat = new SchemaCatalog((_, _) => { fetches += 1; StructType(Nil) })
    cat.schemaOf("db1", "t1"); cat.schemaOf("db1", "t1"); cat.schemaOf("db2", "t1")
    assert(fetches == 2)
    cat.invalidate("db1")
    cat.schemaOf("db1", "t1"); cat.schemaOf("db2", "t1")
    assert(fetches == 3) // db1 refetched, db2 still cached
  }
}
