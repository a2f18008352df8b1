package graft.sources

import graft.SparkSpec

/** Round-trip tests: a minimal protobuf wire WRITER here encodes
  * `slave.binlog.Binlog` messages per protocol/tidb/tidb.proto, and the
  * production decoder reads them back.
  */
class TidbProtoSpec extends SparkSpec {
  import spark.implicits._

  // ---- tiny wire writer ---------------------------------------------------

  private class W {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): W = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wire: Int): W = varint((field.toLong << 3) | wire)
    def vint(field: Int, v: Long): W = { tag(field, 0); varint(v) }
    def str(field: Int, s: String): W = bytes(field, s.getBytes("UTF-8"))
    def bytes(field: Int, b: Array[Byte]): W = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def fixed64(field: Int, v: Long): W = {
      tag(field, 1)
      (0 until 8).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt)); this
    }
    def msg(field: Int)(f: W => Unit): W = { val w = new W; f(w); bytes(field, w.toBytes) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def column(f: W => Unit): W => Unit = w => f(w)

  private def dmlBinlog(commitTs: Long): Array[Byte] = {
    val w = new W
    w.vint(1, 0) // type = DML
    w.vint(2, commitTs)
    w.msg(3) { dml => // DMLData
      dml.msg(1) { t => // Table
        t.str(1, "dbx").str(2, "users")
        t.msg(3)(ci => { ci.str(1, "id"); ci.str(2, "bigint"); ci.vint(3, 1) })
        t.msg(3)(ci => { ci.str(1, "name"); ci.str(2, "varchar"); () })
        t.msg(3)(ci => { ci.str(1, "score"); ci.str(2, "double"); () })
        // insert (1, 'alice', 1.5)
        t.msg(4) { m =>
          m.vint(1, 0)
          m.msg(2) { row =>
            row.msg(1)(c => { c.vint(2, 1L); () })
            row.msg(1)(c => { c.str(6, "alice"); () })
            row.msg(1)(c => { c.fixed64(4, java.lang.Double.doubleToLongBits(1.5)); () })
          }
          ()
        }
        // update (1, 'bob', NULL) with old image (1, 'alice', 1.5)
        t.msg(4) { m =>
          m.vint(1, 1)
          m.msg(2) { row =>
            row.msg(1)(c => { c.vint(2, 1L); () })
            row.msg(1)(c => { c.str(6, "bob"); () })
            row.msg(1)(c => { c.vint(1, 1); () }) // is_null
          }
          m.msg(3) { row =>
            row.msg(1)(c => { c.vint(2, 1L); () })
            row.msg(1)(c => { c.str(6, "alice"); () })
            row.msg(1)(c => { c.fixed64(4, java.lang.Double.doubleToLongBits(1.5)); () })
          }
          ()
        }
        // delete (1, ...)
        t.msg(4) { m =>
          m.vint(1, 2)
          m.msg(2) { row =>
            row.msg(1)(c => { c.vint(2, 1L); () })
            row.msg(1)(c => { c.str(6, "bob"); () })
            row.msg(1)(c => { c.vint(1, 1); () })
          }
          ()
        }
        ()
      }
      ()
    }
    w.toBytes
  }

  private def ddlBinlog(commitTs: Long): Array[Byte] = {
    val w = new W
    w.vint(1, 1) // type = DDL
    w.vint(2, commitTs)
    w.msg(4) { d =>
      d.str(1, "dbx").str(2, "users")
      d.bytes(3, "ALTER TABLE users ADD COLUMN age INT".getBytes("UTF-8"))
      ()
    }
    w.toBytes
  }

  test("decodes DML binlog: ops, column mapping, pk extraction, unknown fields skipped") {
    val ts = 450000000000000000L // a TiDB TSO
    val b = TidbProto.decodeBinlog(dmlBinlog(ts))
    assert(b.tp == 0 && b.commitTs == ts)
    val rows = TidbProto.toEnvelope(b, baseSeq = 1000)
    assert(rows.map(_.op) == Seq("insert", "update", "delete"))
    assert(rows.forall(r => r.database == "dbx" && r.table == "users"))
    val ins = rows.head
    assert(ins.data == Map("id" -> "1", "name" -> "alice", "score" -> "1.5"))
    assert(ins.pks == Map("id" -> "1")) // is_primary_key from ColumnInfo
    val upd = rows(1)
    assert(upd.data == Map("id" -> "1", "name" -> "bob")) // NULL column absent
    assert(upd.old == Map("id" -> "1", "name" -> "alice", "score" -> "1.5"))
    assert(rows.map(_.seq) == Seq(1000L, 1001L, 1002L)) // ordered within txn
    assert(ins.event_ts.getTime == (ts >> 18)) // TSO physical millis
  }

  test("decodes DDL binlog into a ddl envelope row") {
    val rows = TidbProto.toEnvelope(TidbProto.decodeBinlog(ddlBinlog(1L << 18)), 0)
    assert(rows.size == 1)
    assert(rows.head.op == "ddl" && rows.head.ddl_statement.startsWith("ALTER TABLE"))
  }

  test("binary value column decodes to the envelope frame on executors") {
    val df = Seq((7L, dmlBinlog(1L << 18)), (8L, ddlBinlog(2L << 18)))
      .toDF("seq", "value")
    val env = TidbProto.envelopeFromBinary(df)
    assert(env.count() == 4) // 3 DML rows + 1 DDL row
    val ops = env.select("op").as[String].collect().sorted.toSeq
    assert(ops == Seq("ddl", "delete", "insert", "update"))
    // per-message seq headroom keeps rows from different messages ordered
    val seqs = env.select("seq").as[Long].collect().sorted.toSeq
    assert(seqs == Seq(7L << 20, (7L << 20) + 1, (7L << 20) + 2, 8L << 20))
  }
}
