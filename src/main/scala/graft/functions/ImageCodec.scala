package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec seat for the multimodal operators: PNG encode/decode
  * through the JDK's javax.imageio (lossless, no native dependency), a
  * deterministic synthetic pixel source, exact nearest-neighbor resize,
  * and a length-prefixed multi-frame container (the toy "video" format
  * the frame-sample operator demuxes).
  *
  * Determinism contract: the per-pixel formula is pure integer
  * arithmetic, PNG is lossless, and the resize is an explicit
  * nearest-neighbor loop (never Graphics2D, whose interpolation is
  * implementation-defined) — so stats computed from DECODED pixels are
  * bit-identical to the closed-form the DuckDB oracle evaluates, on any
  * JVM. Encoded byte LENGTH is encoder-dependent and must never be
  * oracle-gated; pixel values are.
  *
  * Reference seat: gravity moves opaque payloads without decoding
  * (SURVEY §2.8 — no media operators at all); this family is part of the
  * training-data surface the Spark engine adds. At 100 TB the decode
  * runs batched inside mapPartitions — per-task codec reuse, no
  * driver-side bytes.
  */
object ImageCodec {

  // ImageIO defaults to FILE-backed stream caching: every encode/decode
  // creates and deletes a temp file, which dominates the cost of these
  // kilobyte-sized images (thousands of temp files per task, fs-contended
  // when the codec runs 32-way). Memory-backed streams are bit-identical
  // (the codec output is unaffected) and remove that fixed cost.
  ImageIO.setUseCache(false)

  /** Deterministic RGB source: channel values for pixel (x, y) of frame
    * `f` of document `id`. All operands non-negative, so `% 256` agrees
    * between JVM and SQL engines.
    */
  def synthR(id: Long, f: Long, x: Int, y: Int): Int =
    ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
  def synthG(id: Long, f: Long, x: Int, y: Int): Int =
    ((id * 17 + f * 23 + x * 11 + y * 5) % 256).toInt
  def synthB(id: Long, f: Long, x: Int, y: Int): Int =
    ((id * 29 + f * 37 + x * 3 + y * 19) % 256).toInt

  def synthImage(id: Long, f: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (synthR(id, f, x, y) << 16) | (synthG(id, f, x, y) << 8) | synthB(id, f, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Real PNG bytes (8-byte magic + IHDR/IDAT/IEND chunks). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, "png", bos))
      throw new IllegalStateException("image_codec: no PNG writer available")
    bos.toByteArray
  }

  /** Real PNG decode; fails loudly on anything that is not an image. */
  def decodePng(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(
        s"image_codec: undecodable payload (${bytes.length} bytes)")
    img
  }

  /** Per-channel pixel sums of a decoded image — the oracle-gated stat. */
  def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var (r, g, b) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    (r, g, b)
  }

  /** Exact nearest-neighbor resize: out(x, y) = src(x·srcW div outW,
    * y·srcH div outH) — floor mapping, the SQL-reproducible definition.
    */
  def resizeNearest(src: BufferedImage, outW: Int, outH: Int): BufferedImage = {
    val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < outH) {
      val sy = y * src.getHeight / outH
      var x = 0
      while (x < outW) {
        out.setRGB(x, y, src.getRGB(x * src.getWidth / outW, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Toy multi-frame container: each frame is a 4-byte big-endian length
    * prefix + PNG bytes, concatenated. The demux below is the real
    * container-parsing half of frame sampling; the per-frame decode goes
    * through decodePng.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    frames.foreach { fb =>
      bos.write(Array[Byte](
        (fb.length >>> 24).toByte, (fb.length >>> 16).toByte,
        (fb.length >>> 8).toByte, fb.length.toByte))
      bos.write(fb)
    }
    bos.toByteArray
  }

  /** Demux to (frameIdx, frameBytes); fails loudly on a truncated or
    * oversize length prefix instead of decoding garbage.
    */
  def unpackFrames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
    new Iterator[(Int, Array[Byte])] {
      private var off = 0
      private var idx = 0
      override def hasNext: Boolean = off < payload.length
      override def next(): (Int, Array[Byte]) = {
        if (off + 4 > payload.length)
          throw new IllegalArgumentException(
            s"image_codec: truncated frame header at offset $off")
        val len = ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
          ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
        // Long arithmetic: off + 4 + len overflows Int for a hostile
        // 0x7fffffff prefix, silently passing the bound and attempting a
        // 2 GB copy instead of failing loudly
        if (len < 0 || off.toLong + 4L + len > payload.length)
          throw new IllegalArgumentException(
            s"image_codec: frame $idx length $len exceeds container " +
              s"(${payload.length - off - 4} bytes left)")
        val fb = java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)
        off += 4 + len
        val out = (idx, fb)
        idx += 1
        out
      }
    }
}
