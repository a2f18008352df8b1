package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators._
import graft.streaming.PipelinePlan
import scala.jdk.CollectionConverters._

/** Declarative pipeline configuration → PipelinePlan.
  *
  * The reference assembles a pipeline from TOML: input → filters (each
  * gated by `match-*` matcher keys) → output with routes
  * (/root/reference pkg/config/config_v3.go:44-70, plugin wiring
  * pkg/app/server.go:38-105, matcher keys pkg/matchers/matchers.go:16-33).
  * This front end keeps the same vocabulary in JSON (Jackson ships with
  * Spark) and compiles to the Spark-first plan the runner executes.
  *
  * {{{
  * {
  *   "name": "orders-replication",
  *   "filters": [
  *     {"type": "accept", "match-schema": "db*", "match-dml-op": ["insert","update","delete"]},
  *     {"type": "delete-columns", "columns": ["secret"]},
  *     {"type": "rename-columns", "from": ["amt"], "to": ["amount"]},
  *     {"type": "expr", "column": "amount_cents", "sql": "CAST(amount * 100 AS BIGINT)"}
  *   ],
  *   "routes": [
  *     {"match-schema": "db0", "target-schema": "cold", "target-table": "orders_cold"},
  *     {"match-schema": "db*", "target-schema": "hot", "target-table": "*"}
  *   ],
  *   "pk": ["o_orderkey"],
  *   "checkpoint": "/tmp/ckpt"
  * }
  * }}}
  */
object PipelineConfig {

  private val mapper = new ObjectMapper()

  def parse(json: String): PipelinePlan = {
    val root = mapper.readTree(json)
    PipelinePlan(
      name = req(root, "name").asText(),
      transforms = Option(root.get("filters")).map(parseFilters).getOrElse(Nil),
      router = Option(root.get("routes")).map(parseRoutes),
      pkCols = req(root, "pk").elements().asScala.map(_.asText()).toSeq,
      checkpoint = Option(root.get("checkpoint")).map(_.asText()).getOrElse(""))
  }

  private def req(n: JsonNode, field: String): JsonNode = {
    val v = n.get(field)
    require(v != null, s"pipeline config: missing required field '$field'")
    v
  }

  /** `match-*` keys on any node AND-combine into a matcher group
    * (pkg/core/matcher.go:12-22).
    */
  def parseMatchers(n: JsonNode): Seq[Matcher] = {
    val out = Seq.newBuilder[Matcher]
    Option(n.get("match-schema")).foreach(v => out += SchemaMatcher(v.asText()))
    Option(n.get("match-table")).foreach(v => out += TableMatcher(strList(v)))
    Option(n.get("match-table-regex")).foreach(v => out += TableRegexMatcher(strList(v)))
    Option(n.get("match-ddl-regex")).foreach(v => out += DdlRegexMatcher(v.asText()))
    Option(n.get("match-dml-op")).foreach(v => out += DmlOpMatcher(strList(v)))
    Option(n.get("match-expr")).foreach(v => out += ExprMatcher(v.asText()))
    out.result()
  }

  private def parseFilters(arr: JsonNode): Seq[TransformOp] =
    arr.elements().asScala.map { f =>
      val enveloped = Option(f.get("enveloped")).exists(_.asBoolean())
      f.get("type").asText() match {
        case "accept" => AcceptFilter(parseMatchers(f))
        case "reject" => RejectFilter(parseMatchers(f))
        case "delete-columns" =>
          DeleteColumnsFilter(strList(req(f, "columns")), parseMatchers(f), enveloped)
        case "rename-columns" =>
          RenameColumnsFilter(strList(req(f, "from")), strList(req(f, "to")),
            parseMatchers(f), enveloped)
        case "expr" => ExprTransform(req(f, "column").asText(), req(f, "sql").asText())
        case other => throw new IllegalArgumentException(s"unknown filter type '$other'")
      }
    }.toSeq

  private def parseRoutes(arr: JsonNode): Router =
    Router.mysql(arr.elements().asScala.map { r =>
      val targets = Seq("schema", "table").flatMap { t =>
        Option(r.get(s"target-$t")).map(v => t -> v.asText())
      }.toMap
      Route(parseMatchers(r), targets)
    }.toSeq)

  private def strList(v: JsonNode): Seq[String] =
    if (v.isArray) v.elements().asScala.map(_.asText()).toSeq else Seq(v.asText())
}
