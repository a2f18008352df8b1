package graft.operators

import graft.SparkSpec
import graft.operators.MsgPb._
import org.apache.spark.sql.functions._

/** Conformance + transport for the msgpb filter-plugin wire contract.
  *
  * The golden byte strings below were derived BY HAND from the protobuf
  * wire specification applied to protocol/msgpb/message.proto (field
  * numbers, wire types, varint/length-delimited layout, Any with
  * type.googleapis.com urls, proto3 default omission) — NOT produced by
  * the codec under test. They pin the exact bytes a gogo/protobuf peer
  * exchanges for the reference-shaped message
  *
  *   Msg{version:"0.1", database:"db1", table:"t", msgType:"dml",
  *       timestamp:{1700000000s, 5ns},
  *       dml:{op:"update", data:{id: Int64Value(42),
  *            name: StringValue("x")}, pks:{id: Int64Value(42)}}}
  */
class MsgPbSpec extends SparkSpec {

  private val goldenMsg = Msg(
    version = "0.1", database = "db1", table = "t", msgType = "dml",
    tsSeconds = 1700000000L, tsNanos = 5,
    dml = Some(Dml(
      op = "update",
      data = Seq("id" -> PbValue.I64(42L), "name" -> PbValue.Str("x")),
      old = Seq.empty,
      pks = Seq("id" -> PbValue.I64(42L)))))

  private val goldenRequestHex =
    "0adf010a03302e3112036462311a01742203646d6c2a080880e2cfaa06100532c0010a0675" +
    "7064617465123a0a02696412340a2e747970652e676f6f676c65617069732e636f6d2f676f" +
    "6f676c652e70726f746f6275662e496e74363456616c75651202082a123e0a046e616d6512" +
    "360a2f747970652e676f6f676c65617069732e636f6d2f676f6f676c652e70726f746f6275" +
    "662e537472696e6756616c756512030a0178223a0a02696412340a2e747970652e676f6f67" +
    "6c65617069732e636f6d2f676f6f676c652e70726f746f6275662e496e74363456616c7565" +
    "1202082a"

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("FilterRequest encodes byte-identical to the hand-derived golden wire form") {
    assert(hex(encodeFilterRequest(goldenMsg)) == goldenRequestHex)
  }

  test("golden wire bytes decode to the reference-shaped Msg") {
    assert(decodeFilterRequest(unhex(goldenRequestHex)) == goldenMsg)
  }

  test("FilterResponse golden: echoed msg + continueNext=true") {
    val rspHex = goldenRequestHex + "1001" // field 2 varint 1
    val rsp = decodeFilterResponse(unhex(rspHex))
    assert(rsp == FilterResponse(Some(goldenMsg), continueNext = true, None))
    assert(hex(encodeFilterResponse(rsp)) == rspHex)
  }

  test("full Any scalar set of pkg/core/encoding/pb.go round-trips") {
    val all: Seq[(String, PbValue)] = Seq(
      "i32" -> PbValue.I32(-7), // negative int32: 10-byte sign-extended varint
      "i64" -> PbValue.I64(Long.MinValue),
      "u32" -> PbValue.U32(0xffffffffL),
      "u64" -> PbValue.U64(-1L), // bits of uint64 max
      "f32" -> PbValue.F32(1.5f),
      "f64" -> PbValue.F64(-2.25),
      "str" -> PbValue.Str("héllo"),
      "bool" -> PbValue.Bool(true),
      "bytes" -> PbValue.Bytes(Vector[Byte](0, 1, -1)),
      "time" -> PbValue.Time(123456789L, 987654321),
      "null" -> PbValue.Null,
      "zero" -> PbValue.I64(0L), // proto3 default: omitted payload byte
      "empty_str" -> PbValue.Str(""))
    val m = Msg(version = "2.0.alpha", database = "d", table = "t",
      msgType = "dml", dml = Some(Dml("insert", all, Seq.empty, Seq.empty)))
    assert(decodeMsg(encodeMsg(m)) == m)
  }

  test("DDL messages round-trip") {
    val m = Msg(version = "0.1", database = "db", table = "t", msgType = "ddl",
      ddl = Some(Ddl("ALTER TABLE t ADD COLUMN c INT")))
    assert(decodeMsg(encodeMsg(m)) == m)
  }

  test("decoder tolerates pb.go's un-prefixed FloatValue type_url quirk") {
    // pkg/core/encoding/pb.go:137 matches "google.protobuf.FloatValue"
    // WITHOUT the type.googleapis.com/ prefix — accept both on decode
    def f32Any(url: String): Array[Byte] = {
      def varint(v: Long): Array[Byte] = {
        var x = v; val b = Array.newBuilder[Byte]
        while ((x & ~0x7fL) != 0) { b += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
        (b += x.toByte).result()
      }
      def ld(f: Int, p: Array[Byte]): Array[Byte] =
        varint((f << 3) | 2) ++ varint(p.length.toLong) ++ p
      val bits = java.lang.Float.floatToRawIntBits(3.5f)
      val payload = Array[Byte](0x0d,
        (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
        ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
      val anyB = ld(1, url.getBytes("UTF-8")) ++ ld(2, payload)
      val entry = ld(1, "f".getBytes("UTF-8")) ++ ld(2, anyB)
      val dml = ld(1, "insert".getBytes("UTF-8")) ++ ld(2, entry)
      ld(6, dml)
    }
    for (url <- Seq("google.protobuf.FloatValue",
        "type.googleapis.com/google.protobuf.FloatValue")) {
      val m = decodeMsg(f32Any(url))
      assert(m.dml.get.data == Seq("f" -> PbValue.F32(3.5f)), url)
    }
  }

  test("framing: multi-frame stream round-trips; truncation raises EOF") {
    val bos = new java.io.ByteArrayOutputStream()
    val frames = Seq(Array[Byte](1, 2, 3), Array.emptyByteArray,
      Array.fill[Byte](300)(7)) // 300 forces a 2-byte varint length
    frames.foreach(writeFrame(bos, _))
    val in = new java.io.ByteArrayInputStream(bos.toByteArray)
    frames.foreach { f =>
      assert(readFrame(in).get.toSeq == f.toSeq)
    }
    assert(readFrame(in).isEmpty) // clean EOF on the boundary
    val cut = bos.toByteArray.dropRight(5)
    val in2 = new java.io.ByteArrayInputStream(cut)
    readFrame(in2); readFrame(in2)
    intercept[java.io.EOFException](readFrame(in2))
  }

  test("implausible frame length is a protocol error, not an allocation crash") {
    // varint 2^40 as a frame length
    val bogus = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte, 0x10)
    val in = new java.io.ByteArrayInputStream(bogus)
    val e = intercept[java.io.EOFException](readFrame(in))
    assert(e.getMessage.contains("implausible"))
  }

  test("a sidecar that exits without answering every request fails the task (no silent loss)") {
    import spark.implicits._
    val env = (1L to 50L).map(i => (i, "insert", "O")).toDF("seq", "op", "status")
      .select(col("seq"), col("op"),
        map(lit("o_orderstatus"), col("status")).as("data"),
        expr("map()").cast("map<string,string>").as("old"),
        map(lit("k"), col("seq").cast("string")).as("pks"))
    // `true` exits 0 immediately: stdout EOF with every request unanswered
    val filter = MsgPbSidecarFilter(Seq("true"))
    val e = intercept[Exception] {
      filter(env).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ causes(t.getCause)
    assert(causes(e).exists(_.contains("unanswered")), causes(e).mkString(" | "))
  }

  test("msgpb sidecar end-to-end: mutation + continueNext drop through a real process") {
    import spark.implicits._
    val env = Seq(
      (1L, "insert", "O"), (2L, "update", "F"), (3L, "delete", "O"), (4L, "insert", "P"))
      .toDF("seq", "op", "status")
      .select(col("seq"), col("op"),
        lit("db1").as("database"), lit("orders").as("table"),
        map(lit("o_orderstatus"), col("status")).as("data"),
        expr("map()").cast("map<string,string>").as("old"),
        map(lit("o_orderkey"), col("seq").cast("string")).as("pks"))
    val filter = MsgPbSidecarFilter(Seq(
      s"${sys.props("java.home")}/bin/java",
      "-cp", sys.props("java.class.path"),
      "graft.operators.MsgPbStatusSidecar"))
    val got = filter(env)
      .select(col("seq"), col("op"), element_at(col("data"), "o_orderstatus").as("st"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "insert", "OPEN"), // O -> OPEN mutated across the wire
      (2L, "update", "F"),
      (4L, "insert", "P"))) // seq 3 dropped by continueNext=false
  }
}
