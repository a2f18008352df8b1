package graft.operators

import graft.SparkSpec
import graft.core.Glob
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def env() = Seq(
    ("db0", "users", "insert"),
    ("db1", "users", "update"),
    ("db1", "orders_x", "delete"),
    ("analytics", "users", "insert"))
    .toDF("database", "table", "op")

  test("glob compiles to LIKE: * ? and literal escapes") {
    assert(Glob.toLike("ab*") == "ab%")
    assert(Glob.toLike("a?c") == "a_c")
    assert(Glob.toLike("a_b%c") == "a\\_b\\%c")
    assert(Glob.matches("db*", "db12") && !Glob.matches("db?", "db12"))
  }

  test("matcher group ANDs; accept/reject filter") {
    val acc = AcceptFilter(Seq(SchemaMatcher("db*"), TableMatcher(Seq("us*"))))
    assert(acc(env()).select("database").as[String].collect().toSet == Set("db0", "db1"))
    val rej = RejectFilter(Seq(DmlOpMatcher(Seq("delete"))))
    assert(rej(env()).count() == 3)
  }

  test("table regex + ddl regex matchers") {
    val m = TableRegexMatcher(Seq("^orders_.*$"))
    assert(env().filter(m.predicate).count() == 1)
    val ddl = Seq(("ddl", "ALTER TABLE t ADD c INT"), ("dml", "ALTER"))
      .toDF("type", "ddl_statement")
    assert(ddl.filter(DdlRegexMatcher("^ALTER TABLE").predicate).count() == 1)
  }

  test("delete/rename columns on enveloped maps respect matcher gate") {
    val df = Seq(
      ("db0", Map("a" -> "1", "b" -> "2"), Map("a" -> "1")),
      ("db1", Map("a" -> "3", "b" -> "4"), Map("a" -> "3")))
      .toDF("database", "data", "pks")
      .withColumn("old", lit(null).cast("map<string,string>"))
      .withColumn("table", lit("t"))
    val del = DeleteColumnsFilter(Seq("b"), Seq(SchemaMatcher("db0")), enveloped = true)
    val afterDel = del(df).select("database", "data").as[(String, Map[String, String])]
      .collect().toMap
    assert(afterDel("db0") == Map("a" -> "1") && afterDel("db1") == Map("a" -> "3", "b" -> "4"))

    val ren = RenameColumnsFilter(Seq("a"), Seq("z"), Seq(SchemaMatcher("db1")), enveloped = true)
    val afterRen = ren(df).select("database", "data").as[(String, Map[String, String])]
      .collect().toMap
    assert(afterRen("db1").contains("z") && afterRen("db0").contains("a"))
  }

  test("router: first-match-wins, * passthrough, exists prefilter") {
    val r = Router.mysql(Seq(
      Route(Seq(SchemaMatcher("db0")), Map("schema" -> "cold", "table" -> "t_cold")),
      Route(Seq(DmlOpMatcher(Seq("delete"))), Map("schema" -> "tomb", "table" -> "*")),
      Route(Seq(SchemaMatcher("db1")), Map("schema" -> "hot"))))
    val out = r.assign(env())
      .select("database", "op", "tgt_schema", "tgt_table")
      .as[(String, String, String, String)].collect().toSet
    assert(out.contains(("db0", "insert", "cold", "t_cold")))
    // delete route wins over the db1 route; `*`/absent table passes through
    assert(out.contains(("db1", "delete", "tomb", "orders_x")))
    assert(out.contains(("db1", "update", "hot", "users")))
    // analytics matches no route
    assert(env().filter(!r.exists).select("database").as[String].collect().toSeq ==
      Seq("analytics"))
  }

  test("process sidecar: rows cross a real process boundary and come back transformed") {
    val df = Seq((1L, "keep_abc"), (2L, "drop_me"), (3L, "keep_xyz")).toDF("id", "v")
    // transform: sed rewrites a value — proves bytes really left the JVM
    val transformed = ProcessSidecarFilter(Seq("sed", "s/keep_abc/KEPT/"))(df)
      .orderBy("id").select("v").as[String].collect().toSeq
    assert(transformed == Seq("KEPT", "drop_me", "keep_xyz"))
    // drop: lines the sidecar omits disappear (sed deletes them; sed exits
    // 0 even when a partition's every line is deleted, unlike grep)
    val dropped = ProcessSidecarFilter(Seq("sed", "/drop_me/d"))(df)
      .select("id").as[Long].collect().sorted.toSeq
    assert(dropped == Seq(1L, 3L))
    // a failing sidecar fails the task loudly
    intercept[Exception] {
      ProcessSidecarFilter(Seq("false"))(df).collect()
    }
  }

  test("fanOut derives targets from a fully-literal route config without a data scan") {
    val r = Router.mysql(Seq(
      Route(Seq(SchemaMatcher("db0")), Map("schema" -> "cold", "table" -> "t_cold")),
      Route(Seq(SchemaMatcher("db1")), Map("schema" -> "hot", "table" -> "t_hot"))))
    val branches = r.fanOut(env().filter(r.exists), "table").toMap
    assert(branches.keySet == Set("t_cold", "t_hot"))
    assert(branches.values.map(_.count()).sum == env().filter(r.exists).count())
    // explicit knownTargets override both config and data
    val only = r.fanOut(env().filter(r.exists), "table", knownTargets = Seq("t_cold"))
    assert(only.map(_._1) == Seq("t_cold"))
  }

  test("AddMissingColumns reconciles to target schema with defaults") {
    val df = Seq((1L, "x")).toDF("id", "v")
    val target = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("flag", org.apache.spark.sql.types.IntegerType)))
    val out = AddMissingColumns(target, Map("flag" -> 7))(df)
    assert(out.columns.toSet == Set("id", "v", "flag"))
    assert(out.select("flag").as[Int].head() == 7)
  }
}
