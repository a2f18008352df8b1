package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedSpec extends SparkSpec {
  import spark.implicits._

  test("within-bound collect returns every row; over-bound trips with the lever") {
    val df = (1L to 20L).toDF("x")
    assert(Bounded.collect(df, 20, "site", "lever").length == 20)
    val e = intercept[RuntimeException] {
      Bounded.collect(df, 10, "gph_test/label-pairs", "shard the delta")
    }
    assert(e.getMessage.contains("gph_test/label-pairs"))
    assert(e.getMessage.contains("bound 10"))
    assert(e.getMessage.contains("shard the delta"), "message must carry the remediation lever")
  }

  test("the guard costs one extra row, never a full over-bound collect") {
    // a planted 1M-row 'delta' against bound 100: the limit(bound+1) plan
    // pulls 101 rows to the driver, not 1M — the OOM the tripwire replaces
    val big = spark.range(1000000).select(col("id").as("x"))
    val e = intercept[RuntimeException] {
      Bounded.collect(big, 100, "planted/over-bound-delta", "split the batch")
    }
    assert(e.getMessage.contains("split the batch"))
  }

  test("router fan-out data-scan fallback is guarded against minted targets") {
    // a poisoned stream carrying 10k+ distinct target tables must raise
    // the diagnostic, not fan out unbounded work
    import graft.operators.{Route, Router}
    val poisoned = spark.range(10001)
      .select(lit("db").as("database"), concat(lit("t"), col("id")).as("table"),
        lit("insert").as("op"))
    val r = Router.mysql(Seq(Route(Nil, Map("schema" -> "db", "table" -> "*"))))
    val e = intercept[RuntimeException] { r.fanOut(poisoned, "table") }
    assert(e.getMessage.contains("Router.fanOut(table)/data-scan"))
    assert(e.getMessage.contains("knownTargets"))
    // the tuning knob: a legitimately wide deployment raises the bound
    // instead of enumerating knownTargets — same stream, no trip
    val wide = r.fanOut(poisoned, "table", maxScanTargets = 10001)
    assert(wide.size == 10001)
  }
}
