package graft.operators

/** A REAL msgpb filter plugin: a standalone JVM process that speaks only
  * the wire contract — varint-framed FilterRequest in on stdin,
  * FilterResponse out on stdout — with no Spark on its classpath path at
  * runtime. Used by the `cdc_sidecar_msgpb` catalog entry and
  * `MsgPbSpec`; the role gravity gives a user's grpc-sidecar binary
  * (pkg/filters/grpc_sidecar_filter.go:38-45).
  *
  * Behavior (chosen to be oracle-expressible):
  *   - data["o_orderstatus"] == "O"  ->  "OPEN"
  *   - op == "delete"                ->  continueNext = false (drop)
  */
object MsgPbStatusSidecar {
  def main(args: Array[String]): Unit = {
    val in = new java.io.BufferedInputStream(System.in)
    val out = new java.io.BufferedOutputStream(System.out)
    var frame = MsgPb.readFrame(in)
    while (frame.isDefined) {
      val msg = MsgPb.decodeFilterRequest(frame.get)
      val dml = msg.dml.getOrElse(sys.error("status sidecar: no DmlMsg"))
      val newData = dml.data.map {
        case ("o_orderstatus", MsgPb.PbValue.Str("O")) =>
          "o_orderstatus" -> MsgPb.PbValue.Str("OPEN")
        case kv => kv
      }
      val rsp = MsgPb.FilterResponse(
        msg = Some(msg.copy(dml = Some(dml.copy(data = newData)))),
        continueNext = dml.op != "delete",
        error = None)
      MsgPb.writeFrame(out, MsgPb.encodeFilterResponse(rsp))
      out.flush() // synchronous rpc shape: the client may block on this reply
      frame = MsgPb.readFrame(in)
    }
    out.flush()
  }
}
