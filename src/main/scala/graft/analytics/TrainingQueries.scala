package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) over documents + embeddings. Filled in incrementally.
  */
object TrainingQueries {
  def all: Seq[CatalogQuery] = Seq.empty
}
