package graft.functions

import graft.SparkSpec
import graft.analytics.Catalog

/** The ustar shard container: exact round trips across block-boundary
  * sizes, GNU tar conformance (the system `tar` must list and extract
  * our bytes), loud failure on tampered checksums / truncation, and the
  * catalog entry re-derived at sf0.001.
  */
class TarArchiveSpec extends SparkSpec {

  private val members = Seq(
    "empty.txt" -> Array.emptyByteArray,
    "one.txt" -> "x".getBytes("UTF-8"),
    "block511.bin" -> Array.tabulate(511)(i => (i % 251).toByte),
    "block512.bin" -> Array.tabulate(512)(i => (i % 253).toByte),
    "block513.bin" -> Array.tabulate(513)(i => (i % 255).toByte),
    "utf8-ß中.txt" -> "héllo ß中 𝄞".getBytes("UTF-8"))

  test("round trip across block-boundary sizes, byte-exact") {
    val back = TarArchive.unpack(TarArchive.pack(members))
    assert(back.map(_._1) == members.map(_._1))
    back.zip(members).foreach { case ((n, got), (_, exp)) =>
      assert(got.toSeq == exp.toSeq, s"member $n")
    }
  }

  test("GNU tar lists and extracts our archive (external conformance)") {
    assume(new java.io.File("/usr/bin/tar").exists ||
      new java.io.File("/bin/tar").exists)
    val dir = java.nio.file.Files.createTempDirectory("graft-tar")
    val f = dir.resolve("shard.tar")
    java.nio.file.Files.write(f, TarArchive.pack(members))
    import scala.sys.process._
    val listing = Seq("tar", "-tf", f.toString).!!.split("\n").toSeq
    // GNU tar octal-escapes non-ASCII names in listings (display only);
    // exact byte fidelity is asserted via extraction below
    assert(listing.size == members.size &&
      listing.take(5) == members.map(_._1).take(5), s"tar -tf saw $listing")
    val xdir = dir.resolve("x")
    java.nio.file.Files.createDirectories(xdir)
    assert(Seq("tar", "-xf", f.toString, "-C", xdir.toString).! == 0)
    // ASCII members byte-compare through the filesystem; the UTF-8 name
    // can't round-trip through this container's non-UTF-8 JVM filesystem
    // charset, so its bytes are covered by the parser round-trip test
    members.filter(_._1.forall(_ < 128)).foreach { case (n, data) =>
      val got = java.nio.file.Files.readAllBytes(xdir.resolve(n))
      assert(got.toSeq == data.toSeq, s"extracted $n")
    }
  }

  test("randomized member sets round-trip byte-exactly") {
    val rng = new scala.util.Random(7)
    (0 until 20).foreach { trial =>
      val n = 1 + rng.nextInt(12)
      val ms = (0 until n).map { i =>
        val size = rng.nextInt(2000) // crosses 0/511/512/513 regions often
        (f"m$trial%02d_$i%02d.bin",
          Array.fill(size)(rng.nextInt(256).toByte))
      }
      val back = TarArchive.unpack(TarArchive.pack(ms))
      assert(back.map(_._1) == ms.map(_._1), s"trial $trial names")
      back.zip(ms).foreach { case ((nm, got), (_, exp)) =>
        assert(java.util.Arrays.equals(got, exp), s"trial $trial member $nm")
      }
    }
  }

  test("tampered checksum, bad magic, and truncation fail loudly") {
    val tar = TarArchive.pack(members)
    val tampered = tar.clone()
    tampered(0) = (tampered(0) ^ 0x01).toByte // name byte flips checksum
    val e1 = intercept[IllegalArgumentException](TarArchive.unpack(tampered))
    assert(e1.getMessage.contains("checksum"))
    val badMagic = tar.clone()
    badMagic(257) = 'X'
    val e2 = intercept[IllegalArgumentException](TarArchive.unpack(badMagic))
    assert(e2.getMessage.contains("magic"))
    val trunc = tar.take(700) // inside the first member's data
    val e3 = intercept[IllegalArgumentException](TarArchive.unpack(trunc))
    assert(e3.getMessage.contains("truncated"))
  }

  test("end-of-archive marker: one zero block, garbage tail, and garbage in block 2 all fail") {
    val tar = TarArchive.pack(members)
    // truncated AT the marker: drop the second zero block
    val oneBlock = tar.dropRight(512)
    val e1 = intercept[IllegalArgumentException](TarArchive.unpack(oneBlock))
    assert(e1.getMessage.contains("end-of-archive"), e1.getMessage)
    // nonzero byte inside the second zero block
    val dirty = tar.clone()
    dirty(tar.length - 100) = 0x41
    val e2 = intercept[IllegalArgumentException](TarArchive.unpack(dirty))
    assert(e2.getMessage.contains("second"), e2.getMessage)
    // garbage appended after a valid two-block marker
    val tail = tar ++ "JUNK".getBytes("US-ASCII")
    val e3 = intercept[IllegalArgumentException](TarArchive.unpack(tail))
    assert(e3.getMessage.contains("trailing garbage"), e3.getMessage)
    // zero fill after the marker (blocking-factor padding) stays legal
    val padded = tar ++ new Array[Byte](512 * 6)
    assert(TarArchive.unpack(padded).map(_._1) == members.map(_._1))
  }

  test("space-prefixed checksum field (POSIX-legal writer variant) parses") {
    val tar = TarArchive.pack(Seq("a.txt" -> "hi".getBytes("US-ASCII")))
    // rewrite a "0006147<NUL><SP>"-style field as "  6147<NUL><SP>" with leading spaces:
    // shift digits right, pad left with spaces (sum over the field bytes
    // must stay equal: chksum is computed with the field AS spaces, so
    // its own bytes never enter the sum)
    val h = tar.clone()
    val digits = new String(h, 148, 8, "US-ASCII")
      .trim.dropWhile(_ == '0')
    val repl = (" " * (6 - digits.length)) + digits + "\u0000 "
    repl.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => h(148 + i) = b }
    val back = TarArchive.unpack(h)
    assert(back.map(_._1) == Seq("a.txt"))
    // and an all-spaces checksum field fails with the descriptive error,
    // not a bare NumberFormatException
    val blank = tar.clone()
    (148 until 156).foreach(i => blank(i) = ' ')
    val e = intercept[IllegalArgumentException](TarArchive.unpack(blank))
    assert(e.getMessage.contains("unparseable checksum"), e.getMessage)
  }

  test("prep_tar_shards at sf0.001: members re-derive from the source table") {
    val got = Catalog.queries("prep_tar_shards")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
      assert(got(id) == ((id / 100, b.length.toLong, md)), s"doc $id")
    }
  }
}
