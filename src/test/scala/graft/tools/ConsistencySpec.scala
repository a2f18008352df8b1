package graft.tools

import graft.SparkSpec

class ConsistencySpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies missing/extra/mismatched rows") {
    val src = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "v", "x")
    val tgt = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0))
      .toDF("id", "v", "x")
    val d = Consistency.diff(src, tgt, Seq("id"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(d == Map(2L -> "mismatch", 3L -> "missing_in_target", 4L -> "missing_in_source"))
  }

  test("checksum equality iff same content (order-independent)") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((2L, "y"), (1L, "x")).toDF("id", "v")
    val c = Seq((1L, "x"), (2L, "z")).toDF("id", "v")
    assert(Consistency.checksum(a) == Consistency.checksum(b))
    assert(Consistency.checksum(a) != Consistency.checksum(c))
  }

  test("symmetric except finds one-sided rows") {
    val a = Seq(1L, 2L, 3L).toDF("id")
    val b = Seq(2L, 3L, 4L).toDF("id")
    val (l, r) = Consistency.symmetricExcept(a, b)
    assert(l.as[Long].collect().toSet == Set(1L))
    assert(r.as[Long].collect().toSet == Set(4L))
  }
}
