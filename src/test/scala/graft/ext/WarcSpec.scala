package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ext.Warc.WarcRecord

/** WARC codec: byte-exact round trips, the Content-Length-skip trap
  * (content quoting a record header), the gzip member splitter's
  * boundary/CRC discipline, and every loud-failure contract. The
  * Spark-side end-to-end proof is q236/q237/q238's oracle hash.
  */
class WarcSpec extends AnyFunSuite with Matchers {

  private def rec(id: Int, payload: Array[Byte]): WarcRecord =
    WarcRecord(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> s"<urn:graft:$id>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "Content-Type" -> "text/plain"), payload)

  private val rnd = new scala.util.Random(11)

  test("records round-trip exactly, including empty and binary payloads") {
    val recs = Seq(
      rec(0, Array.emptyByteArray),
      rec(1, "hello world".getBytes("US-ASCII")),
      rec(2, Array.fill(4096)(rnd.nextInt(256).toByte)))
    val back = Warc.parseWarc(Warc.writeWarc(recs))
    back.size shouldBe 3
    back.zip(recs).foreach { case (b, a) =>
      b.headers shouldBe a.headers
      b.payload shouldBe a.payload
    }
  }

  test("header lookup is case-insensitive; order and casing round-trip") {
    val r = WarcRecord(Seq("WARC-Type" -> "warcinfo", "X-Custom" -> "v1",
      "x-custom" -> "v2"), "p".getBytes)
    val b = Warc.parseWarc(Warc.writeRecord(r)).head
    b.header("warc-type") shouldBe Some("warcinfo")
    b.header("X-CUSTOM") shouldBe Some("v1") // first wins
    b.headers.map(_._1) shouldBe Seq("WARC-Type", "X-Custom", "x-custom")
  }

  test("trap: a content block quoting 'WARC/1.0' is skipped by length") {
    val decoy = "preamble\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record\r\n\r\n"
    val recs = Seq(rec(1, decoy.getBytes("US-ASCII")),
      rec(2, "tail".getBytes("US-ASCII")))
    val back = Warc.parseWarc(Warc.writeWarc(recs))
    back.size shouldBe 2 // a delimiter-scanner would report 3+
    new String(back.head.payload, "US-ASCII") shouldBe decoy
    new String(back(1).payload, "US-ASCII") shouldBe "tail"
  }

  test("loud failures: version, Content-Length, truncation, terminator") {
    val good = Warc.writeRecord(rec(1, "abcdef".getBytes))
    // bad version line
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
    // missing Content-Length
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc("WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n".getBytes("US-ASCII"))
    // truncated payload
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc(good.dropRight(5))
    // clobbered CRLFCRLF terminator
    val noTerm = good.clone(); noTerm(good.length - 3) = 'X'
    an[IllegalArgumentException] should be thrownBy Warc.parseWarc(noTerm)
    // bare LF in a header line
    an[IllegalArgumentException] should be thrownBy
      Warc.parseWarc("WARC/1.0\nContent-Length: 0\r\n\r\n\r\n\r\n".getBytes("US-ASCII"))
  }

  test("writeRecord rejects caller-set Content-Length and delimiter bytes") {
    an[IllegalArgumentException] should be thrownBy
      Warc.writeRecord(WarcRecord(Seq("Content-Length" -> "5"), "abcde".getBytes))
    an[IllegalArgumentException] should be thrownBy
      Warc.writeRecord(WarcRecord(Seq("X" -> "a\r\nY: b"), Array.emptyByteArray))
  }

  test("gzip members split at exact boundaries and round-trip") {
    val recs = (0 until 5).map(i =>
      rec(i, Array.fill(200 + 37 * i)(rnd.nextInt(256).toByte)))
    val gz = Warc.writeWarcGz(recs)
    val members = Warc.splitGzipMembers(gz)
    members.size shouldBe 5
    members.zip(recs).foreach { case (m, r) =>
      Warc.parseWarc(m).head.payload shouldBe r.payload
    }
    Warc.parseWarcGz(gz).size shouldBe 5
  }

  test("gzip splitter is DEFLATE-driven, not magic-scanning") {
    // payload containing the gzip magic 1f 8b mid-record must not split
    val p = Array[Byte](1, 2, 0x1f, 0x8b.toByte, 8, 0, 3, 4)
    val gz = Warc.writeWarcGz(Seq(rec(1, p), rec(2, p)))
    val members = Warc.splitGzipMembers(gz)
    members.size shouldBe 2
    Warc.parseWarc(members.head).head.payload shouldBe p
  }

  test("gzip loud failures: bad magic, CRC mismatch, truncated stream") {
    val gz = Warc.writeWarcGz(Seq(rec(1, "payload".getBytes)))
    an[IllegalArgumentException] should be thrownBy
      Warc.splitGzipMembers("not gzip".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Warc.splitGzipMembers(gz.dropRight(3)) // inside the trailer
    val badCrc = gz.clone(); badCrc(gz.length - 6) = (badCrc(gz.length - 6) ^ 0xff).toByte
    an[IllegalArgumentException] should be thrownBy Warc.splitGzipMembers(badCrc)
  }

  test("multi-record member streams parse (shard grouping convention)") {
    val recs = (0 until 4).map(i => rec(i, s"doc $i".getBytes))
    // one member holding all four records — legal, parsed in order
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(out)
    z.write(Warc.writeWarc(recs)); z.finish()
    val back = Warc.parseWarcGz(out.toByteArray)
    back.size shouldBe 4
    back.map(r => new String(r.payload, "US-ASCII")) shouldBe
      (0 until 4).map(i => s"doc $i")
  }
  test("httpResponseParts: status/headers/body split BY OFFSET") {
    val body = Array[Byte](1, 2, '\r', '\n', '\r', '\n', 3) // binary, with a fake split inside
    val block = ("HTTP/1.1 301 Moved\r\nLocation: /x\r\n" +
      "Content-Type: image/png\r\n\r\n").getBytes("US-ASCII") ++ body
    val (code, headers, got) = Warc.httpResponseParts(block)
    code shouldBe 301
    headers shouldBe Seq("Location" -> "/x", "Content-Type" -> "image/png")
    got shouldBe body // split at the FIRST CRLFCRLF; body bytes untouched
  }

  test("httpResponseParts: loud failures") {
    an[IllegalArgumentException] should be thrownBy
      Warc.httpResponseParts("HTTP/1.1 200 OK\r\nA: b".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Warc.httpResponseParts("ICY 200 OK\r\n\r\n".getBytes("US-ASCII"))
    an[IllegalArgumentException] should be thrownBy
      Warc.httpResponseParts(
        "HTTP/1.1 200 OK\r\nnocolonhere\r\n\r\n".getBytes("US-ASCII"))
  }
}
