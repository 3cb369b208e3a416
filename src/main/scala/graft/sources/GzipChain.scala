package graft.sources

import java.io.{EOFException, InputStream, PushbackInputStream}
import java.util.zip.{CRC32, Inflater, ZipException}

/** Member-at-a-time decoder for concatenated-gzip streams — the framing
  * web crawls actually ship (Common Crawl WARCs compress each record as
  * its own gzip member so readers can skip records without decompressing
  * the file; ref `warc_files` layout, WARC/1.1 annex on record-at-time
  * compression).
  *
  * Why not `java.util.zip.GZIPInputStream`? It reads concatenated members,
  * but when the bytes after a member's trailer are not a valid gzip header
  * it treats them as junk and reports CLEAN EOF — a corrupt middle member
  * silently truncates the file with no fault. That violates the engine's
  * quarantine discipline (nothing vanishes silently): this decoder hand
  * parses the member framing (RFC 1952: magic, header + optional fields,
  * raw-deflate body, CRC32+ISIZE trailer) and THROWS on anything malformed
  * — [[Warc.parseStream]] maps the throw to a quarantine row with the
  * records-recovered count.
  *
  * Memory: one `Inflater` + a fixed 64 KiB compressed-read buffer; output
  * is produced incrementally through the `InputStream` contract, so the
  * decompressed stream is never materialized. One member may be larger
  * than a record (a whole file can legally be a single member) — streaming
  * holds regardless, because inflate is pull-driven.
  */
final class GzipChainStream(raw: InputStream) extends InputStream {

  private val in = new PushbackInputStream(raw, GzipChainStream.BUF)
  private val inflater = new Inflater(true) // nowrap: we frame gzip ourselves
  private val crc = new CRC32
  private val cbuf = new Array[Byte](GzipChainStream.BUF)
  private var inMember = false
  private var chainDone = false
  private val one = new Array[Byte](1)

  override def read(): Int = {
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (true) {
      if (chainDone) return -1
      if (!inMember) {
        if (!openMember()) { chainDone = true; return -1 }
      }
      val n = inflate(b, off, len)
      if (n > 0) { crc.update(b, off, n); return n }
      // n == 0 with a finished inflater → member body done: check trailer,
      // push back the inflater's overread, loop to probe the next member.
      closeMember()
    }
    -1 // unreachable
  }

  /** Read + validate one member header. False on clean EOF before any
    * magic byte (end of chain); throws on anything malformed.
    */
  private def openMember(): Boolean = {
    val b0 = in.read()
    if (b0 < 0) return false
    val b1 = in.read()
    if (b0 != 0x1f || b1 != 0x8b)
      throw new ZipException(s"not a gzip member header: 0x${b0.toHexString}${if (b1 < 0) "<eof>" else b1.toHexString}")
    val cm = in.read()
    if (cm != 8) throw new ZipException(s"unsupported gzip compression method $cm")
    val flg = in.read()
    if (flg < 0) throw new EOFException("eof in gzip header")
    skipFully(6) // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte little-endian length + data
      val x0 = in.read(); val x1 = in.read()
      if (x0 < 0 || x1 < 0) throw new EOFException("eof in gzip FEXTRA")
      skipFully(x0 | (x1 << 8))
    }
    if ((flg & 0x08) != 0) skipZeroTerminated() // FNAME
    if ((flg & 0x10) != 0) skipZeroTerminated() // FCOMMENT
    if ((flg & 0x02) != 0) skipFully(2)         // FHCRC
    inflater.reset()
    crc.reset()
    inMember = true
    true
  }

  /** One inflate step; feeds compressed bytes on demand. Returns produced
    * byte count (0 only when the member's deflate stream is finished).
    */
  private def inflate(b: Array[Byte], off: Int, len: Int): Int = {
    while (true) {
      if (inflater.finished()) return 0
      if (inflater.needsInput()) {
        val n = in.read(cbuf, 0, cbuf.length)
        if (n < 0) throw new EOFException("eof inside gzip deflate stream")
        lastFed = n
        inflater.setInput(cbuf, 0, n)
      }
      val produced =
        try inflater.inflate(b, off, len)
        catch { case e: java.util.zip.DataFormatException =>
          throw new ZipException(s"corrupt deflate data: ${e.getMessage}") }
      if (produced > 0 || inflater.finished()) return produced
      // produced == 0, not finished → needs more input; loop feeds it
    }
    0 // unreachable
  }

  /** Validate the member trailer (CRC32 + ISIZE) and return the
    * inflater's overread to the pushback buffer. The overread is the
    * unconsumed tail of the last `setInput` region, i.e. the final
    * `getRemaining` bytes of `cbuf[0, lastFed)`.
    */
  private def closeMember(): Unit = {
    val over = inflater.getRemaining
    if (over > 0) in.unread(cbuf, lastFed - over, over)
    val tr = new Array[Byte](8)
    readFully(tr)
    val gotCrc = le32(tr, 0)
    val gotLen = le32(tr, 4)
    if (gotCrc != (crc.getValue & 0xffffffffL))
      throw new ZipException(f"gzip CRC mismatch: stored 0x$gotCrc%08x computed 0x${crc.getValue & 0xffffffffL}%08x")
    if (gotLen != (inflater.getBytesWritten & 0xffffffffL))
      throw new ZipException(s"gzip ISIZE mismatch: stored $gotLen actual ${inflater.getBytesWritten & 0xffffffffL}")
    inMember = false
  }

  private var lastFed = 0

  private def readFully(b: Array[Byte]): Unit = {
    var got = 0
    while (got < b.length) {
      val r = in.read(b, got, b.length - got)
      if (r < 0) throw new EOFException("eof in gzip trailer")
      got += r
    }
  }

  private def skipFully(n: Int): Unit = {
    var left = n
    while (left > 0) {
      if (in.read() < 0) throw new EOFException("eof in gzip header")
      left -= 1
    }
  }

  private def skipZeroTerminated(): Unit = {
    var b = in.read()
    while (b > 0) b = in.read()
    if (b < 0) throw new EOFException("eof in gzip header string")
  }

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  override def close(): Unit = { inflater.end(); raw.close() }
}

object GzipChainStream {
  private val BUF = 64 * 1024

  /** True when the first two bytes carry the gzip magic. */
  def looksGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b
}
