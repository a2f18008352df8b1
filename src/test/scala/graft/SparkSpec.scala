package graft

import graft.core.Engine
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.local("graft-test", cores = 4)
  def sf0001 = "/root/testdata/sf0.001"
}
