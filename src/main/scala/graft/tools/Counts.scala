package graft.tools

import graft.analytics.Catalog

/** Generated-counts source for SURVEY.md's status header (the r06 verdict
  * caught a typed "41 suites" drifting from the real 47 — counts must come
  * from the build, not prose). `tools/counts.sh` combines this with the
  * spec-file greps; no SparkSession needed, the catalog is pure data.
  */
object Counts {
  def main(args: Array[String]): Unit = {
    val qs = Catalog.all
    println(s"catalog_entries=${qs.size}")
    println(s"oracle_entries=${qs.count(_.oracle.isDefined)}")
    println(s"bench_entries=${qs.count(_.bench)}")
  }
}
