package graft.sinks

import graft.core.ChangeLog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kafka wire-format encoders, declarative (`to_json(struct(...))` — stays
  * in codegen; the Kafka sink then just reads `key`/`value`/`topic`
  * columns).
  *
  * Two formats reproduce the reference's serde
  * (/root/reference pkg/core/encoding/rdb_json.go):
  *   - v0.1  (rdb_json.go:18-104): header {version, database, table, type,
  *     ts (epoch sec), time_zone, host} + data/old/pks as STRING->STRING
  *     maps (all values stringified; times as "yyyy-MM-dd HH:mm:ss[.f]").
  *   - 2.0.alpha (rdb_json.go:106-170): same header minus ts/tz/host,
  *     typed JSON values, times as RFC3339.
  *
  * Partitioning: key = first dependency hash (PK hash) so one key's
  * changes stay totally ordered within a partition — the reference's
  * manual partitioner (pkg/outputs/async_kafka/async_kafka.go:196-201)
  * becomes Kafka's own key-hash partitioning.
  */
object KafkaJson {
  val Version01 = "0.1"
  val Version20 = "2.0.alpha"

  /** v0.1 value for a map-encoded envelope stream (data/old/pks already
    * MAP<STRING,STRING>).
    */
  def valueV01(host: String, timeZone: String = "Asia/Shanghai"): Column =
    to_json(struct(
      lit(Version01).as("version"),
      col("database"), col("table"),
      col("op").as("type"),
      unix_timestamp(col("event_ts")).as("ts"),
      lit(timeZone).as("time_zone"),
      lit(host).as("host"),
      col("data"), col("old"), col("pks")))

  /** 2.0.alpha value for a typed stream: payload columns become the typed
    * `data` object; pk columns the `pks` object.
    */
  def valueV20(payloadCols: Seq[String], pkCols: Seq[String]): Column =
    to_json(struct(
      lit(Version20).as("version"),
      col("database"), col("table"),
      col("op").as("type"),
      struct(payloadCols.map(col): _*).as("data"),
      struct(pkCols.map(col): _*).as("pks")))

  /** Build the v0.1 stringified payload map from typed columns: every
    * value rendered as a string, timestamps in the reference's layout
    * "2006-01-02 15:04:05.999999999" — i.e. seconds with the fractional
    * part's trailing zeros trimmed (rdb_json.go:40,54-56). NULLs stay
    * NULL map values.
    */
  def stringifyV01(df: DataFrame, cols: Seq[String]): Column = {
    val pairs = cols.flatMap { c =>
      val rendered = df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType =>
          regexp_replace(date_format(col(c), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            "\\.?0+$", "")
        case _ => col(c).cast("string")
      }
      Seq(lit(c), rendered)
    }
    map(pairs: _*)
  }

  /** Sticky partition key: hex of the PK dependency hash. */
  def partitionKey(pkCols: Seq[String]): Column =
    hex(ChangeLog.depHash(pkCols))

  /** Assemble the frame a `writeStream.format("kafka")` sink consumes. */
  def toKafkaFrame(df: DataFrame, value: Column, pkCols: Seq[String],
      topic: Column): DataFrame =
    df.select(partitionKey(pkCols).as("key"), value.as("value"), topic.as("topic"))
}
