package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Elasticsearch wire-payload rendering — the pure, testable half of the
  * ES/EsModel outputs (transport is an SPI; no cluster in the harness).
  *
  * Covers what the reference renders through the olivere/elastic client:
  *   - `_bulk` NDJSON action/metadata lines: index & delete for the plain
  *     ES output (/root/reference pkg/outputs/elasticsearch/
  *     elasticsearch.go:116-199), update-with-upsert and stored-script
  *     upserts for esmodel (pkg/outputs/esmodel/esmodel.go:257-330,
  *     360-395);
  *   - the three esmodel painless scripts that maintain child arrays
  *     in-place, and the PUT `_scripts/<name>` bodies (esmodel.go:23-71);
  *   - index-creation and put-mapping bodies with object/nested property
  *     mappings (checkAndSetIndex, esmodel.go:542-673).
  *
  * docID = PK values joined "_" and index = lowercased table name with
  * leading `_-+` stripped (pkg/outputs/elasticsearch/helper.go:12-25).
  */
object EsBulk {

  /** genIndexName (helper.go:21-25). */
  def indexName(table: String): String =
    table.toLowerCase.dropWhile(c => c == '_' || c == '-' || c == '+')

  // ---- minimal deterministic JSON rendering (stable key order) ----------

  private def q(s: String): String = graft.core.JsonText.str(s)

  // ---- _bulk action/metadata lines --------------------------------------

  /** `{"index":{...}}` + doc — the plain ES output's non-delete path
    * (elasticsearch.go:141-152). `docJson` must already be a JSON object.
    */
  def indexAction(index: String, id: String, docJson: String): String =
    s"""{"index":{"_index":${q(index)},"_id":${q(id)}}}""" + "\n" + docJson

  /** `{"delete":{...}}` (elasticsearch.go:135-140). */
  def deleteAction(index: String, id: String): String =
    s"""{"delete":{"_index":${q(index)},"_id":${q(id)}}}"""

  /** esmodel main/one-one doc upsert: update with doc+upsert both set to
    * the rendered image (esmodel.go:257-296 Doc(data).Upsert(data)).
    */
  def upsertAction(index: String, id: String, docJson: String,
      retryOnConflict: Int): String =
    s"""{"update":{"_index":${q(index)},"_id":${q(id)},"retry_on_conflict":$retryOnConflict}}""" +
      "\n" + s"""{"doc":$docJson,"upsert":$docJson}"""

  /** esmodel one-many script upsert: stored script + params, with the
    * one-element array as the upsert document (esmodel.go:297-324).
    * `paramsJson` carries message/field/key/value exactly as the script
    * expects.
    */
  def scriptUpsertAction(index: String, id: String, scriptName: String,
      paramsJson: String, upsertJson: String, retryOnConflict: Int): String =
    s"""{"update":{"_index":${q(index)},"_id":${q(id)},"retry_on_conflict":$retryOnConflict}}""" +
      "\n" +
      s"""{"script":{"id":${q(scriptName)},"params":$paramsJson},"upsert":$upsertJson}"""

  /** esmodel child-delete: stored delete-script, no upsert — a missing
    * parent doc must stay missing (esmodel.go:385-395).
    */
  def scriptAction(index: String, id: String, scriptName: String,
      paramsJson: String, retryOnConflict: Int): String =
    s"""{"update":{"_index":${q(index)},"_id":${q(id)},"retry_on_conflict":$retryOnConflict}}""" +
      "\n" + s"""{"script":{"id":${q(scriptName)},"params":$paramsJson}}"""

  // ---- stored scripts (esmodel.go:23-71, verbatim semantics) ------------

  val insertListScriptName = "GraftEsModelListInsertScript"
  val updateListScriptName = "GraftEsModelListUpdateScript"
  val deleteListScriptName = "GraftEsModelListDeleteScript"

  /** Replace-or-append a child in the parent's array field by child key. */
  val insertListScript: String =
    "if(ctx._source.containsKey(params.field)){" +
      "Map it= ctx._source.get(params.field).find(item -> item.get(params.key) == params.value);" +
      "if(it != null && !it.isEmpty()){" +
      "ctx._source.get(params.field).removeIf(item -> item.get(params.key) == params.value);}" +
      "ctx._source.get(params.field).add(params.message);}" +
      "else{ctx._source.put(params.field,[params.message]);}"

  /** Merge updates into the matching child, or append when absent. */
  val updateListScript: String =
    "if(ctx._source.containsKey(params.field))" +
      "{Map it= ctx._source.get(params.field).find(item -> item.get(params.key) == params.value);" +
      "if(it != null && !it.isEmpty()){it.putAll(params.updates)}" +
      "else{ctx._source.get(params.field).add(params.message)}}" +
      "else{ctx._source.put(params.field,[params.message])}"

  /** Remove the matching child from the array field. */
  val deleteListScript: String =
    "if(ctx._source.containsKey(params.field)){" +
      "ctx._source.get(params.field).removeIf(item -> item.get(params.key) == params.value);}"

  def storedScripts: Map[String, String] = Map(
    insertListScriptName -> insertListScript,
    updateListScriptName -> updateListScript,
    deleteListScriptName -> deleteListScript)

  /** PUT `_scripts/<name>` body (esmodel.go checkEsScript PUTs these). */
  def storedScriptBody(source: String): String =
    s"""{"script":{"lang":"painless","source":${q(source)}}}"""

  // ---- index setup (checkAndSetIndex, esmodel.go:542-673) ---------------

  /** `properties` mapping: one-one object sub-docs map as `object`,
    * one-many child arrays as `nested` (esmodel.go:573-594).
    */
  def mappingProperties(objectProps: Seq[String], nestedProps: Seq[String]): String = {
    val entries =
      objectProps.map(p => s"${q(p)}:{\"type\":\"object\"}") ++
        nestedProps.map(p => s"${q(p)}:{\"type\":\"nested\"}")
    s"""{"properties":{${entries.mkString(",")}}}"""
  }

  /** Index-creation body: settings + mappings; ES6 wraps the mapping in
    * the type name, ES7+ does not (createIndex, esmodel.go:619-655).
    */
  def createIndexBody(shards: Int, replicas: Int, mappingJson: String,
      es6TypeName: Option[String] = None): String = {
    val mappings = es6TypeName match {
      case Some(t) => s"""{${q(t)}:$mappingJson}"""
      case None => mappingJson
    }
    s"""{"settings":{"number_of_shards":$shards,"number_of_replicas":$replicas},""" +
      s""""mappings":$mappings}"""
  }

  /** PUT `_mapping` body for adding properties to an existing index
    * (updateIndex, esmodel.go:657-673 — the body IS the properties map).
    */
  def updateMappingBody(mappingJson: String): String = mappingJson

  sealed trait IndexSetup
  case object NoChange extends IndexSetup
  final case class CreateIndex(body: String) extends IndexSetup
  final case class UpdateMapping(body: String) extends IndexSetup

  /** The checkAndSetIndex decision (esmodel.go:543-616): diff the route's
    * one-one object / one-many nested properties against the index's
    * existing mapping; only MISSING properties are added. No index →
    * create with settings+mappings; index exists → put-mapping with the
    * delta; everything present → no call at all.
    *
    * @param existingProps properties already mapped on the index, or None
    *                      when the index does not exist
    */
  def planIndexSetup(existingProps: Option[Set[String]],
      objectProps: Seq[String], nestedProps: Seq[String],
      shards: Int, replicas: Int,
      es6TypeName: Option[String] = None): IndexSetup = {
    val have = existingProps.getOrElse(Set.empty)
    val missingObj = objectProps.filterNot(have)
    val missingNested = nestedProps.filterNot(have)
    val mapping = mappingProperties(missingObj, missingNested)
    existingProps match {
      case None => CreateIndex(createIndexBody(shards, replicas, mapping, es6TypeName))
      case Some(_) if missingObj.isEmpty && missingNested.isEmpty => NoChange
      case Some(_) => UpdateMapping(updateMappingBody(mapping))
    }
  }

  // ---- DataFrame-level bulk assembly ------------------------------------

  /** Render an [[EsDocs.assemble]]d frame (doc_id, index, doc, op) into
    * one `_bulk` NDJSON fragment per row — entirely as codegen'd string
    * expressions (to_json handles metadata escaping), no UDF: at scale
    * this is a projection over the change stream, and the transport only
    * concatenates partition-local chunks.
    */
  def bulkLines(assembled: DataFrame): DataFrame = {
    def meta(action: String): Column =
      to_json(struct(struct(
        col("index").as("_index"), col("doc_id").as("_id")).as(action)))
    val line = when(col("op") === graft.core.ChangeLog.Delete, meta("delete"))
      .otherwise(concat(meta("index"), lit("\n"), col("doc")))
    assembled.select(line.as("bulk"))
  }
}
