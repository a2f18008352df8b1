package graft.functions

import graft.SparkSpec
import graft.analytics.Catalog

/** The real-codec multimodal seat: golden 4×4 PNG with exact pixel
  * values through encode→decode, the synthetic-source round trip, exact
  * nearest-neighbor resize vs a re-derivation, container demux
  * (including loud failure on corrupt prefixes), and the catalog entry
  * re-derived driver-side from the closed-form pixel source at sf0.001.
  */
class ImageCodecSpec extends SparkSpec {

  test("golden 4x4 PNG: encode -> decode round-trips exact pixel values") {
    // hand-picked pixels, including channel extremes and asymmetry that
    // would expose an x/y swap or a channel-order (RGB vs BGR) bug
    val golden = Array(
      Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff),
      Array(0x000000, 0x123456, 0x654321, 0x808080),
      Array(0x010203, 0xfedcba, 0x112233, 0x998877),
      Array(0x0a0b0c, 0xd0e0f0, 0x7f7f7f, 0x3c5a96))
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, golden(y)(x))
    val png = ImageCodec.encodePng(img)
    // a REAL PNG container: 8-byte magic
    assert(png.take(8).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
      0x1a, 0x0a).map(_.toByte))
    val back = ImageCodec.decodePng(png)
    assert(back.getWidth == 4 && back.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == golden(y)(x),
        s"pixel ($x,$y)")
  }

  test("synthetic source round-trips through the codec bit-exactly") {
    val (id, f, w, h) = (12345L, 3L, 21, 13)
    val back = ImageCodec.decodePng(
      ImageCodec.encodePng(ImageCodec.synthImage(id, f, w, h)))
    assert(back.getWidth == w && back.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = back.getRGB(x, y)
      assert(((p >> 16) & 0xff) == ImageCodec.synthR(id, f, x, y))
      assert(((p >> 8) & 0xff) == ImageCodec.synthG(id, f, x, y))
      assert((p & 0xff) == ImageCodec.synthB(id, f, x, y))
    }
  }

  test("nearest-neighbor resize matches the floor-mapping re-derivation") {
    val src = ImageCodec.synthImage(7L, 0L, 23, 17)
    val out = ImageCodec.resizeNearest(src, 16, 11)
    for (y <- 0 until 11; x <- 0 until 16)
      assert(out.getRGB(x, y) == src.getRGB(x * 23 / 16, y * 17 / 11),
        s"out pixel ($x,$y)")
  }

  test("frame container round-trips; corrupt prefixes fail loudly") {
    val frames = (0 until 5).map(f =>
      ImageCodec.encodePng(ImageCodec.synthImage(99L, f.toLong, 8, 8)))
    val packed = ImageCodec.packFrames(frames)
    val back = ImageCodec.unpackFrames(packed).toSeq
    assert(back.map(_._1) == (0 until 5))
    back.foreach { case (f, png) =>
      val img = ImageCodec.decodePng(png)
      val (r, g, b) = ImageCodec.channelSums(img)
      val exp = (for (y <- 0 until 8; x <- 0 until 8)
        yield (ImageCodec.synthR(99L, f.toLong, x, y).toLong,
          ImageCodec.synthG(99L, f.toLong, x, y).toLong,
          ImageCodec.synthB(99L, f.toLong, x, y).toLong))
        .foldLeft((0L, 0L, 0L)) { case ((a, c, e), (r2, g2, b2)) =>
          (a + r2, c + g2, e + b2) }
      assert((r, g, b) == exp, s"frame $f sums")
    }
    // truncated header (mid-prefix EOF)
    val trunc = packed.take(packed.length - frames.last.length - 2)
    val e1 = intercept[IllegalArgumentException] {
      ImageCodec.unpackFrames(trunc).toSeq
    }
    assert(e1.getMessage.contains("image_codec"))
    // oversize length prefix pointing past the container
    val oversize = Array[Byte](0x7f, -1, -1, -1) ++ frames.head
    val e2 = intercept[IllegalArgumentException] {
      ImageCodec.unpackFrames(oversize).toSeq
    }
    assert(e2.getMessage.contains("exceeds container"))
    // undecodable frame bytes fail loudly too
    val garbage = ImageCodec.packFrames(Seq(Array[Byte](1, 2, 3, 4)))
    val e3 = intercept[IllegalArgumentException] {
      ImageCodec.unpackFrames(garbage).foreach { case (_, b) =>
        ImageCodec.decodePng(b)
      }
    }
    assert(e3.getMessage.contains("undecodable"))
  }

  test("mm entries at sf0.001: decoded-pixel stats equal the closed form") {
    val feats = Catalog.queries("mm_binary_features")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(n_chars AS INT) AS nc")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(feats.size == docs.length && docs.nonEmpty)
    docs.take(20).foreach { case (id, nc) =>
      val (w, h) = (nc % 48 + 8, nc % 32 + 8)
      var (r, g, b) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        r += ImageCodec.synthR(id, 0L, x, y)
        g += ImageCodec.synthG(id, 0L, x, y)
        b += ImageCodec.synthB(id, 0L, x, y)
      }
      assert(feats(id) == ((w.toLong, h.toLong, r, g, b)), s"doc $id")
    }
    // frame sample: stride-3 demux, sums re-derived for one doc
    val fr = Catalog.queries("mm_frame_sample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (id0, nc0) = docs.head
    val nFrames = nc0 % 24 + 4
    (0 until nFrames).filter(_ % 3 == 0).foreach { f =>
      var (r, g, b) = (0L, 0L, 0L)
      for (y <- 0 until 8; x <- 0 until 8) {
        r += ImageCodec.synthR(id0, f.toLong, x, y)
        g += ImageCodec.synthG(id0, f.toLong, x, y)
        b += ImageCodec.synthB(id0, f.toLong, x, y)
      }
      assert(fr((id0, f.toLong)) == ((r, g, b)), s"doc $id0 frame $f")
    }
    assert(fr.keys.count(_._1 == id0) == (0 until nFrames).count(_ % 3 == 0))
  }

  test("prep_vlm_pack at sf0.001: placeholder counts and packed layout re-derive") {
    val got = Catalog.queries("prep_vlm_pack")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(n_chars AS INT) AS nc",
        "CAST(size(split(text, ' ')) AS LONG) AS n_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    // per-doc sample: image span = <img> + ceil(w/4)*ceil(h/4) patches +
    // </img> from the DECODED dims, then the text span
    val samples = docs.map { case (id, nc, nText) =>
      val (w, h) = (nc % 48 + 8, nc % 32 + 8)
      val nImg = ((w + 3) / 4).toLong * ((h + 3) / 4).toLong + 2L
      val k = md5hex(s"vlm|$id")
      val shard = ("0123456789abcdef".indexOf(k.head)).toLong % 8
      (shard, k, id, nImg, nText)
    }
    val exp = samples.groupBy(_._1).toSeq.flatMap { case (shard, g) =>
      val ordered = g.sortBy(t => (t._2, t._3))
      val totals = ordered.map(t => t._4 + t._5)
      val cumBefore = totals.scanLeft(0L)(_ + _).init
      val withBin = ordered.zip(cumBefore).map { case (t, cb) => (t, cb / 2048) }
      withBin.groupBy(_._2).map { case (bin, docsIn) =>
        val segs = docsIn.map(_._1).flatMap { case (_, k, id, nImg, nText) =>
          Seq((k, id, 0, nImg, "img"), (k, id, 1, nText, "txt")) }
        val cums = segs.map(_._4).scanLeft(0L)(_ + _).tail
        (shard, bin) -> ((docsIn.map(_._1._3).distinct.size.toLong,
          segs.map(_._4).sum,
          ("0" +: cums.map(_.toString)).mkString(","),
          segs.map(_._5).mkString(",")))
      }
    }.toMap
    assert(got == exp, "packed VLM layout must re-derive from decoded dims")
    // the layout is genuinely multimodal: every bin alternates img,txt
    // per doc, and image spans dominated by patch counts vary per doc
    assert(got.values.forall(_._4.split(",").grouped(2)
      .forall(p => p.length == 2 && p(0) == "img" && p(1) == "txt")))
    assert(samples.map(_._4).distinct.length > 1,
      "patch counts must vary with decoded dims")
  }
}
