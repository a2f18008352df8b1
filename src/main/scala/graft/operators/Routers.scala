package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Routing: choose the target (schema/table, topic, index) per row.
  *
  * The reference routes first-match-wins over matcher groups
  * (/root/reference pkg/outputs/routers/mysql_router.go:16-43), with `*`
  * meaning passthrough of the source name. In Spark a route table compiles
  * to one chained `when(...)` expression per target column — a single
  * codegen'd projection; the per-target fan-out is then a partitioned write
  * or a filtered branch per target, not a per-row dispatch loop.
  */
final case class Route(matchers: Seq[Matcher], targets: Map[String, String])

final case class Router(routes: Seq[Route], passthrough: Map[String, Column]) {

  /** Add `tgt_<name>` columns via first-match-wins when-chains: the first
    * route whose matcher group matches is selected, and ALL its targets
    * apply (`*` / absent = keep the source name, mysql_router.go:34-40);
    * later routes are not consulted for any column.
    */
  def assign(df: DataFrame): DataFrame = {
    val names = routes.flatMap(_.targets.keys).distinct
    names.foldLeft(df) { (d, name) =>
      val fallthrough = passthrough.getOrElse(name, lit(null))
      val assigned = routes.foldRight(fallthrough) { (r, els) =>
        val v = r.targets.get(name) match {
          case Some("*") | None => fallthrough
          case Some(t) => lit(t)
        }
        when(Matcher.group(r.matchers), v).otherwise(els)
      }
      d.withColumn(s"tgt_$name", assigned)
    }
  }

  /** Rows matched by at least one route — the reference uses `router.Exists`
    * to skip unrouted tables at the source (binlog_tailer.go:317-325); here
    * it is a pushable filter.
    */
  def exists: Column =
    if (routes.isEmpty) lit(true)
    else routes.map(r => Matcher.group(r.matchers)).reduce(_ || _)

  /** Split into one frame per target value. Targets come from the route
    * CONFIG when it fully determines them (every route names a literal
    * target and the input is `exists`-filtered) or from `knownTargets`;
    * scanning the data for distinct targets is the last resort — it is
    * bounded only by what the stream contains, and an unexpected table in
    * a poisoned stream would fan out unbounded work. `maxScanTargets`
    * bounds that last-resort scan (default 10000); a legitimate wide-target
    * deployment raises it instead of enumerating `knownTargets`.
    */
  def fanOut(df: DataFrame, targetCol: String,
      knownTargets: Seq[String] = Nil,
      maxScanTargets: Int = 10000): Seq[(String, DataFrame)] = {
    val assigned = assign(df)
    val c = s"tgt_$targetCol"
    val fromConfig = routes.flatMap(_.targets.get(targetCol)).filter(_ != "*").distinct
    val configComplete =
      routes.nonEmpty && routes.forall(_.targets.get(targetCol).exists(_ != "*"))
    val targets =
      if (knownTargets.nonEmpty) knownTargets.distinct
      else if (configComplete) fromConfig
      else graft.core.Bounded.collect(
        assigned.select(c).distinct(), maxScanTargets,
        s"Router.fanOut($targetCol)/data-scan",
        "name every route target in the config (or pass knownTargets), or " +
          "raise maxScanTargets for a legitimately wide deployment; a " +
          "poisoned stream must not mint targets")
        .map(_.getString(0)).toSeq
    targets.map(t => t -> assigned.filter(col(c) === t))
  }
}

object Router {
  /** MySQL-style route: target-schema/target-table
    * (pkg/outputs/routers/mysql_router.go:16-43).
    */
  def mysql(routes: Seq[Route]): Router =
    Router(routes, Map("schema" -> col("database"), "table" -> col("table")))

  /** Kafka-style route: dml-topic (pkg/outputs/routers/kafka_router.go:27-61). */
  def kafka(routes: Seq[Route]): Router =
    Router(routes, Map("topic" -> concat_ws(".", col("database"), col("table"))))

  /** ES-style route: target-index (pkg/outputs/routers/elasticsearch_router.go:33-60). */
  def elasticsearch(routes: Seq[Route]): Router =
    Router(routes, Map("index" -> col("table")))
}
