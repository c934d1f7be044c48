package graft.ext

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, GZIPOutputStream, Inflater}

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) reader/writer — the de-facto
  * LLM-corpus interchange format (Common Crawl ships WARC/WET/WAT), and
  * the one first-touch ingestion surface a real training pipeline hits
  * before anything in this engine runs. Self-written from the public
  * spec (ISO 28500:2017 / the IIPC warc-specifications text); no
  * archive libraries involved — same discipline as [[Containers]].
  *
  * Byte layout of one record (all header text US-ASCII, CRLF line ends):
  * {{{
  *   WARC/1.0<CRLF>
  *   <name>: <value><CRLF>     (incl. a mandatory Content-Length)
  *   <CRLF>
  *   <content block: exactly Content-Length bytes>
  *   <CRLF><CRLF>
  * }}}
  * A WARC FILE is just records back to back. The compressed convention
  * (Common Crawl's `.warc.gz`) gzips EACH RECORD AS ITS OWN GZIP MEMBER
  * and concatenates the members — that is what makes a 1 GB shard
  * seekable: a reader can start at any member boundary. [[splitGzipMembers]]
  * recovers those boundaries exactly (by running the DEFLATE stream, not
  * by scanning for magic bytes — `1f 8b` can occur INSIDE compressed
  * data, so magic-scanning is wrong by construction).
  *
  * Loud-failure contract (the [[Containers]] posture): a malformed
  * version line, a missing/non-numeric Content-Length, a truncated
  * content block, a missing record terminator, a bad gzip header/CRC —
  * each throws with the byte offset. Silent best-effort parsing of a
  * corrupt crawl shard is how bad bytes become training data.
  *
  * The parser is Content-Length-driven, never delimiter-driven: the
  * content block may itself contain `WARC/1.0<CRLF>` (an archived HTTP
  * response body quoting a WARC record — common in real crawls) and the
  * walker must skip it by length. `WarcSpec` pins that trap.
  *
  * Scale shape: one WARC shard = one task ([[graft.ops.WarcCorpus]]);
  * records stream out of a per-partition iterator. Nothing here is
  * per-corpus state.
  */
object Warc {

  /** One WARC record: ordered header list (order and duplicate names
    * round-trip faithfully) + raw content block. Header NAME matching is
    * case-insensitive per the spec ([[header]]); writing preserves the
    * caller's casing.
    */
  final case class WarcRecord(headers: Seq[(String, String)],
      payload: Array[Byte]) {
    /** First header with this name, case-insensitively (spec §4). */
    def header(name: String): Option[String] = {
      val n = name.toLowerCase(java.util.Locale.ROOT)
      headers.collectFirst {
        case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == n => v
      }
    }
    def warcType: Option[String] = header("WARC-Type")
  }

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize one record. Content-Length is computed from the payload
    * and appended by the writer — a caller-provided Content-Length would
    * either duplicate or contradict the block, so it is rejected.
    */
  def writeRecord(r: WarcRecord): Array[Byte] = {
    require(r.header("Content-Length").isEmpty,
      "writeRecord: Content-Length is computed from the payload, do not set it")
    val out = new ByteArrayOutputStream(r.payload.length + 256)
    out.write("WARC/1.0\r\n".getBytes("US-ASCII"))
    (r.headers :+ ("Content-Length" -> r.payload.length.toString)).foreach {
      case (k, v) =>
        require(!k.contains(':') && !(k + v).exists(c => c == '\r' || c == '\n'),
          s"writeRecord: header '$k' contains a delimiter byte")
        out.write(s"$k: $v\r\n".getBytes("US-ASCII"))
    }
    out.write(Crlf)
    out.write(r.payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Serialize a record sequence as an UNCOMPRESSED WARC stream. */
  def writeWarc(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => out.write(writeRecord(r)))
    out.toByteArray
  }

  /** Write `bytes` onto `out` as ONE complete gzip member, releasing the
    * member's Deflater immediately. `finish()` alone leaves the Deflater's
    * native buffers for the GC cleaner — a task streaming millions of
    * members accumulates unbounded native memory between GCs — so this
    * goes through `close()` (which ends the default Deflater) behind a
    * close-shield that keeps the shared underlying stream open.
    */
  def gzipMember(out: java.io.OutputStream, bytes: Array[Byte]): Unit = {
    val underlying = out
    val shield = new java.io.FilterOutputStream(underlying) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        underlying.write(b, off, len)
      override def close(): Unit = flush()
    }
    val gz = new GZIPOutputStream(shield)
    gz.write(bytes)
    gz.close() // finish member + end Deflater; shield keeps `out` open
  }

  /** Serialize as the Common Crawl `.warc.gz` convention: each record
    * its own gzip member, members concatenated.
    */
  def writeWarcGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach(r => gzipMember(out, writeRecord(r)))
    out.toByteArray
  }

  // ------------------------------------------------------------- parse

  private def fail(pos: Int, what: String): Nothing =
    throw new IllegalArgumentException(s"WARC: $what at offset $pos")

  /** Read one US-ASCII line ending in CRLF; returns (line, posAfterCrlf).
    * Bare LF is a malformation, not a lenient alternative.
    */
  private def readLine(b: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) {
      if (b(i) == '\n') fail(i, "bare LF in header (CRLF required)")
      i += 1
    }
    if (i + 1 >= b.length) fail(pos, "unterminated header line")
    (new String(b, pos, i - pos, "US-ASCII"), i + 2)
  }

  /** Record-boundary walker over an uncompressed WARC byte stream.
    * Content-Length-driven (see object scaladoc); every malformation
    * throws with its offset.
    */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      val (version, p1) = readLine(bytes, pos)
      if (!version.startsWith("WARC/") ||
          !version.drop(5).matches("""\d+\.\d+"""))
        fail(pos, s"expected WARC version line, got '${version.take(20)}'")
      var p = p1
      val headers = ArrayBuffer.empty[(String, String)]
      var blank = false
      while (!blank) {
        val (line, pn) = readLine(bytes, p)
        if (line.isEmpty) blank = true
        else {
          val i = line.indexOf(':')
          if (i <= 0) fail(p, s"malformed header line '${line.take(40)}'")
          headers += ((line.substring(0, i), line.substring(i + 1).trim))
        }
        p = pn
      }
      val lenStr = headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("Content-Length") => v
      }.getOrElse(fail(pos, "record without Content-Length"))
      val lenL = try lenStr.toLong catch {
        case _: NumberFormatException =>
          fail(pos, s"non-numeric Content-Length '$lenStr'")
      }
      if (lenL < 0 || lenL > Int.MaxValue - 8L)
        fail(pos, s"Content-Length $lenL out of range for an in-memory record")
      val len = lenL.toInt
      if (p.toLong + len + 4 > bytes.length)
        fail(p, s"content block of $len bytes overruns the stream")
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + len)
      p += len
      if (!(bytes(p) == '\r' && bytes(p + 1) == '\n' &&
            bytes(p + 2) == '\r' && bytes(p + 3) == '\n'))
        fail(p, "missing CRLFCRLF record terminator")
      pos = p + 4
      out += WarcRecord(
        headers.filterNot(_._1.equalsIgnoreCase("Content-Length")).toSeq,
        payload)
    }
    out.toSeq
  }

  /** Split a multi-member gzip stream at EXACT member boundaries by
    * running each member's DEFLATE stream with a raw `Inflater` and
    * reading the 8-byte trailer behind it — never by scanning for the
    * `1f 8b` magic, which legally occurs inside compressed data. Each
    * member's CRC32 and ISIZE trailer fields are verified; any mismatch,
    * short trailer, or unsupported header flag throws with the member's
    * start offset. Returns the decompressed members in order.
    */
  def splitGzipMembers(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      // --- member header (RFC 1952 §2.3)
      if (pos + 10 > bytes.length) fail(start, "truncated gzip header")
      if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b)
        fail(start, "bad gzip magic")
      if (bytes(pos + 2) != 8) fail(start, "gzip CM is not DEFLATE")
      val flg = bytes(pos + 3) & 0xff
      if ((flg & 0xe0) != 0) fail(start, "reserved gzip FLG bits set")
      pos += 10 // magic, CM, FLG, MTIME(4), XFL, OS
      if ((flg & 4) != 0) { // FEXTRA
        if (pos + 2 > bytes.length) fail(start, "truncated FEXTRA")
        val xlen = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8)
        pos += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME, zero-terminated
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (pos < bytes.length && bytes(pos) != 0) pos += 1
        pos += 1
      }
      if ((flg & 2) != 0) pos += 2 // FHCRC
      if (pos > bytes.length) fail(start, "truncated gzip header fields")
      // --- raw DEFLATE body
      val inf = new Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new Array[Byte](64 * 1024)
      val body = new ByteArrayOutputStream()
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput())
            fail(start, "truncated DEFLATE stream")
          body.write(buf, 0, n)
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          fail(start, s"corrupt DEFLATE stream (${e.getMessage})")
      }
      pos = bytes.length - inf.getRemaining
      inf.end()
      // --- trailer: CRC32 + ISIZE, little-endian
      if (pos + 8 > bytes.length) fail(start, "truncated gzip trailer")
      def le32(o: Int): Long =
        ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      val data = body.toByteArray
      val crc = new CRC32(); crc.update(data)
      if (crc.getValue != le32(pos))
        fail(start, "gzip CRC32 mismatch")
      if ((data.length & 0xffffffffL) != le32(pos + 4))
        fail(start, "gzip ISIZE mismatch")
      pos += 8
      out += data
    }
    out.toSeq
  }

  /** Parse a `.warc.gz` stream (per-record gzip members, or any
    * member-to-record grouping — members are parsed independently and
    * their records concatenated in stream order).
    */
  def parseWarcGz(bytes: Array[Byte]): Seq[WarcRecord] =
    splitGzipMembers(bytes).flatMap(parseWarc)

  /** Split an HTTP-response content block (what a `WARC-Type: response`
    * record of a real crawl carries — `Content-Type: application/http`)
    * into (status line, headers, body): status line to the first CRLF,
    * header lines to the empty line, body = everything after, BY OFFSET
    * — the body is bytes (images, gzipped HTML), never line-walked.
    * Loud failures: a block with no CRLFCRLF split, or a status line
    * that is not `HTTP/<v> <code> …`. The header map is ordered like
    * [[WarcRecord.headers]]; status code returns parsed.
    */
  def httpResponseParts(block: Array[Byte])
      : (Int, Seq[(String, String)], Array[Byte]) = {
    var i = 0
    while (i + 3 < block.length &&
        !(block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n')) i += 1
    if (i + 3 >= block.length)
      fail(0, "HTTP response block without CRLFCRLF header terminator")
    val head = new String(block, 0, i, "US-ASCII")
    val lines = head.split("\r\n", -1)
    val status = lines.head
    if (!status.matches("HTTP/\\d(\\.\\d)? \\d{3}.*"))
      fail(0, s"malformed HTTP status line '${status.take(40)}'")
    val code = status.split(" ", 3)(1).toInt
    val headers = lines.tail.toSeq.map { l =>
      val c = l.indexOf(':')
      if (c <= 0) fail(0, s"malformed HTTP header line '${l.take(40)}'")
      (l.substring(0, c), l.substring(c + 1).trim)
    }
    (code, headers,
      java.util.Arrays.copyOfRange(block, i + 4, block.length))
  }
}
