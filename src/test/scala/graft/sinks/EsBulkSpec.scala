package graft.sinks

import graft.SparkSpec

/** Goldens for the rendered ES payloads — shapes mirror what the
  * reference's elastic client would PUT/POST (cited per method).
  */
class EsBulkSpec extends SparkSpec {
  import spark.implicits._

  test("index name derivation matches helper.go") {
    assert(EsBulk.indexName("Orders") == "orders")
    assert(EsBulk.indexName("__hidden") == "hidden")
    assert(EsBulk.indexName("-+_Tbl") == "tbl")
  }

  test("bulk action/metadata lines: index, delete, upsert, script upsert") {
    assert(EsBulk.indexAction("orders", "1_2", """{"a":1}""") ==
      "{\"index\":{\"_index\":\"orders\",\"_id\":\"1_2\"}}\n{\"a\":1}")
    assert(EsBulk.deleteAction("orders", "9") ==
      """{"delete":{"_index":"orders","_id":"9"}}""")
    assert(EsBulk.upsertAction("o", "1", """{"v":"x"}""", 3) ==
      "{\"update\":{\"_index\":\"o\",\"_id\":\"1\",\"retry_on_conflict\":3}}\n" +
        "{\"doc\":{\"v\":\"x\"},\"upsert\":{\"v\":\"x\"}}")
    val script = EsBulk.scriptUpsertAction("o", "1",
      EsBulk.insertListScriptName,
      """{"message":{"id":7},"field":"items","key":"id","value":7}""",
      """{"items":[{"id":7}]}""", 3)
    val Array(meta, payload) = script.split("\n")
    assert(meta == """{"update":{"_index":"o","_id":"1","retry_on_conflict":3}}""")
    assert(payload.startsWith("""{"script":{"id":"GraftEsModelListInsertScript","params":"""))
    assert(payload.endsWith(""""upsert":{"items":[{"id":7}]}}"""))
    // child delete carries NO upsert: a missing parent must stay missing
    val del = EsBulk.scriptAction("o", "1", EsBulk.deleteListScriptName,
      """{"field":"items","key":"id","value":7}""", 3)
    assert(!del.contains("upsert"))
  }

  test("metadata escaping survives hostile ids") {
    val a = EsBulk.deleteAction("i", "a\"b\\c")
    assert(a == """{"delete":{"_index":"i","_id":"a\"b\\c"}}""")
  }

  test("stored scripts cover replace-or-append, merge-or-append, remove") {
    val ins = EsBulk.insertListScript
    assert(ins.contains("removeIf") && ins.contains("add(params.message)")
      && ins.contains("put(params.field,[params.message])"))
    assert(EsBulk.updateListScript.contains("putAll(params.updates)"))
    assert(EsBulk.deleteListScript.contains("removeIf")
      && !EsBulk.deleteListScript.contains("add"))
    assert(EsBulk.storedScriptBody("a\"b") ==
      """{"script":{"lang":"painless","source":"a\"b"}}""")
  }

  test("index creation and mapping update bodies (v7 and v6 type wrapping)") {
    val props = EsBulk.mappingProperties(
      objectProps = Seq("profile"), nestedProps = Seq("items", "tags"))
    assert(props == """{"properties":{"profile":{"type":"object"},""" +
      """"items":{"type":"nested"},"tags":{"type":"nested"}}}""")
    assert(EsBulk.createIndexBody(5, 1, props) ==
      s"""{"settings":{"number_of_shards":5,"number_of_replicas":1},"mappings":$props}""")
    assert(EsBulk.createIndexBody(5, 1, props, es6TypeName = Some("doc")) ==
      s"""{"settings":{"number_of_shards":5,"number_of_replicas":1},"mappings":{"doc":$props}}""")
    assert(EsBulk.updateMappingBody(props) == props)
  }

  test("index setup decision: create when absent, delta when partial, no-op when mapped") {
    import EsBulk._
    val create = planIndexSetup(None, Seq("profile"), Seq("items"), 5, 1)
    assert(create == CreateIndex(createIndexBody(5, 1,
      mappingProperties(Seq("profile"), Seq("items")))))
    // index exists with profile mapped: only the missing nested prop goes
    val delta = planIndexSetup(Some(Set("profile")), Seq("profile"), Seq("items"), 5, 1)
    assert(delta == UpdateMapping("""{"properties":{"items":{"type":"nested"}}}"""))
    assert(planIndexSetup(Some(Set("profile", "items")),
      Seq("profile"), Seq("items"), 5, 1) == NoChange)
  }

  test("bulkLines renders assembled docs as NDJSON fragments, codegen only") {
    val df = Seq(
      ("db0", "orders", "insert", 1L, "a"),
      ("db0", "orders", "delete", 2L, "b"))
      .toDF("database", "table", "op", "id", "v")
      .withColumn("tgt_index", org.apache.spark.sql.functions.lit("orders"))
    val assembled = EsDocs.assemble(df, Seq("id"), Seq("id", "v"))
    val lines = EsBulk.bulkLines(assembled).as[String].collect().sorted
    assert(lines.toSeq == Seq(
      "{\"delete\":{\"_index\":\"orders\",\"_id\":\"2\"}}",
      "{\"index\":{\"_index\":\"orders\",\"_id\":\"1\"}}\n{\"id\":1,\"v\":\"a\"}"))
  }
}
