package graft.functions

/** POSIX ustar tar archives, hand-rolled to the spec (IEEE 1003.1
  * pax/ustar header layout) — the WebDataset-style shard container a
  * training pipeline exports samples into and data loaders stream back.
  * Writer and parser both live here so shards round-trip without any
  * external dependency; the parser validates magic and header checksums
  * and fails loudly on truncation (the wire-client discipline).
  *
  * Spark seat: shards are bounded member groups (shard id = key div
  * shardSize), rendered per group inside mapGroups — shard COUNT grows
  * with the corpus, shard SIZE stays bounded, so the 100 TB export is
  * embarrassingly parallel with bounded task memory.
  */
object TarArchive {

  private val BlockSize = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL, zero-padded (the ustar convention)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"tar: value $v overflows $width-byte octal field")
    val out = new Array[Byte](width)
    val padded = ("0" * (width - 1 - s.length)) + s
    var i = 0
    while (i < width - 1) { out(i) = padded.charAt(i).toByte; i += 1 }
    out(width - 1) = 0
    out
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    require(nb.length <= 100, s"tar: name '$name' exceeds 100 bytes")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420 /* 0644 */, 8), 0, h, 100, 8) // mode
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime (deterministic 0)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5) // magic + NUL at 262
    h(263) = '0'; h(264) = '0' // version "00"
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    // chksum: 6 octal digits, NUL, space
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    i = 0
    while (i < 6) { h(148 + i) = padded.charAt(i).toByte; i += 1 }
    h(154) = 0; h(155) = ' '
    h
  }

  /** Render one archive from (name, payload) members, in order. */
  def pack(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      bos.write(header(name, data.length.toLong))
      bos.write(data)
      val pad = (BlockSize - data.length % BlockSize) % BlockSize
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](2 * BlockSize)) // end-of-archive marker
    bos.toByteArray
  }

  /** Parse an archive back to (name, payload) members; validates the
    * ustar magic and every header checksum, and fails loudly on a
    * truncated member or a missing end marker.
    */
  def unpack(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done) {
      if (off + BlockSize > bytes.length)
        throw new IllegalArgumentException(
          s"tar: truncated header at offset $off (${bytes.length} bytes)")
      val h = java.util.Arrays.copyOfRange(bytes, off, off + BlockSize)
      if (h.forall(_ == 0)) {
        // ustar end-of-archive marker is TWO zero blocks — verify the
        // second (a truncated-at-the-marker archive must fail loudly),
        // and refuse nonzero trailing bytes after it (zero fill up to a
        // blocking factor is spec-legal; anything else is garbage)
        val second = off + BlockSize
        if (second + BlockSize > bytes.length)
          throw new IllegalArgumentException(
            s"tar: truncated end-of-archive marker at offset $off " +
              "(one zero block, second missing)")
        var i = second
        while (i < second + BlockSize) {
          if (bytes(i) != 0)
            throw new IllegalArgumentException(
              s"tar: nonzero byte at offset $i inside the second " +
                "end-of-archive block")
          i += 1
        }
        while (i < bytes.length) {
          if (bytes(i) != 0)
            throw new IllegalArgumentException(
              s"tar: trailing garbage at offset $i after end-of-archive marker")
          i += 1
        }
        done = true
      }
      else {
        val magic = new String(h, 257, 5, "US-ASCII")
        if (magic != "ustar")
          throw new IllegalArgumentException(
            s"tar: bad magic '$magic' at offset $off")
        var expected = 0L
        var i = 0
        while (i < BlockSize) {
          expected += (if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xff)
          i += 1
        }
        // POSIX permits the chksum field to be space- OR NUL-terminated
        // and some writers space-PREFIX the digits: normalize NULs to
        // spaces and trim before parsing, and fail descriptively on a
        // field with no octal digits at all
        val csRaw = new String(h, 148, 8, "US-ASCII")
          .replace('\u0000', ' ').trim
        if (csRaw.isEmpty || !csRaw.forall(c => c >= '0' && c <= '7'))
          throw new IllegalArgumentException(
            s"tar: unparseable checksum field '$csRaw' at offset $off")
        val stored = java.lang.Long.parseLong(csRaw, 8)
        if (stored != expected)
          throw new IllegalArgumentException(
            s"tar: header checksum mismatch at offset $off ($stored != $expected)")
        val nameEnd = {
          var e = 0
          while (e < 100 && h(e) != 0) e += 1
          e
        }
        val name = new String(h, 0, nameEnd, "UTF-8")
        val size = java.lang.Long.parseLong(
          new String(h, 124, 11, "US-ASCII").trim, 8)
        val dataStart = off + BlockSize
        if (dataStart + size > bytes.length)
          throw new IllegalArgumentException(
            s"tar: member '$name' truncated ($size bytes declared, " +
              s"${bytes.length - dataStart} available)")
        val sz = size.toInt
        out += name -> java.util.Arrays.copyOfRange(
          bytes, dataStart, dataStart + sz)
        val pad = (BlockSize - sz % BlockSize) % BlockSize
        off = dataStart + sz + pad
      }
    }
    out.result()
  }
}
