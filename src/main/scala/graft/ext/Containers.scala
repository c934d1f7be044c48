package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

import graft.ext.Multimodal.Frame

/** REAL media-container codecs, self-written from the public format
  * specifications — no image/audio libraries involved.
  *
  * The stub codec ([[Multimodal.StubCodec]]) keeps the media operator
  * family hash-checkable offline, but it never exercises a real
  * container's byte layout. These two formats are simple enough to
  * implement exactly from the public spec, which closes that caveat for
  * one image and one audio modality end-to-end:
  *
  *  - WAV: RIFF chunk stream (Microsoft/IBM Multimedia Programming
  *    Interface spec, 1991) — "RIFF" header, chunk walk with WORD
  *    alignment (odd-sized chunks carry a pad byte), "fmt " (PCM, mono,
  *    16-bit LE) and "data" chunks in any order with foreign chunks
  *    (e.g. "LIST") skipped.
  *  - BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (Windows DIB spec),
  *    24 bpp uncompressed, BOTTOM-UP row order, each row padded to a
  *    4-byte boundary, pixel data at the offset the file header declares.
  *
  * The encoders deliberately emit the traps a lazy parser trips over:
  * the WAV writer inserts a LIST chunk (with an odd-sized payload)
  * BETWEEN fmt and data, and the BMP writer picks widths that are not
  * multiples of 4 so the row padding is nonzero. A decoder that assumes
  * "data starts at byte 44" or "rows are w·3 bytes, top-down" produces
  * garbage — the q188/q189 oracle twins recompute the expected
  * samples/pixels arithmetically, so a hash match proves the
  * encode → parse chain is lossless THROUGH the container layout.
  */
object Containers {

  // --------------------------------------------------------------- WAV

  /** Serialize 16-bit signed mono PCM samples into a real RIFF/WAVE
    * container. Layout: RIFF header, "fmt " chunk, a "LIST"/INFO chunk
    * with an odd-sized text payload (so the spec's WORD-alignment pad
    * byte is actually present and a chunk-walking parser must honor
    * it), then the "data" chunk, samples little-endian.
    */
  def wavBytes(samples: Array[Int], sampleRate: Int = 16000): Array[Byte] = {
    val info = "graft".getBytes("US-ASCII") // 5 bytes — odd on purpose
    val listBody = 4 + 8 + info.length // "INFO" + sub-chunk header + text
    val listPad = listBody & 1
    val dataLen = samples.length * 2
    val dataPad = dataLen & 1 // always 0 for 16-bit, kept for spec fidelity
    val riffLen = 4 + (8 + 16) + (8 + listBody + listPad) + (8 + dataLen + dataPad)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    // fmt : PCM(1), mono, sampleRate, byteRate, blockAlign, 16 bits
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    // LIST/INFO with an IART sub-chunk — a foreign chunk mid-stream
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      .put("INFO".getBytes("US-ASCII"))
      .put("IART".getBytes("US-ASCII")).putInt(info.length).put(info)
    if (listPad == 1) buf.put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i).toShort); i += 1 }
    if (dataPad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** Parse a RIFF/WAVE container: validate the magic, WALK the chunk
    * stream (id + LE size, odd sizes padded to WORD boundaries), accept
    * "fmt " and "data" in any order, skip everything else. Requires
    * PCM / mono / 16-bit; returns signed samples in [-32768, 32767].
    */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "decodeWav: missing RIFF magic")
    val riffLen = buf.getInt
    require(riffLen >= 4 && 8 + riffLen <= bytes.length,
      s"decodeWav: RIFF length $riffLen exceeds payload")
    require(fourCC() == "WAVE", "decodeWav: not a WAVE form")
    var fmtSeen = false
    var data: Array[Int] = null
    val end = 8 + riffLen
    while (buf.position() + 8 <= end) {
      val id = fourCC()
      val len = buf.getInt
      require(len >= 0 && buf.position() + len <= end,
        s"decodeWav: chunk '$id' length $len overruns the form")
      val next = buf.position() + len + (len & 1) // WORD-align per spec
      id match {
        case "fmt " =>
          require(len >= 16, "decodeWav: fmt chunk too short")
          val tag = buf.getShort; val ch = buf.getShort
          buf.getInt; buf.getInt; buf.getShort // rates + blockAlign unused
          val bits = buf.getShort
          require(tag == 1 && ch == 1 && bits == 16,
            s"decodeWav: need PCM mono 16-bit, got tag=$tag ch=$ch bits=$bits")
          fmtSeen = true
        case "data" =>
          require(len % 2 == 0, "decodeWav: odd data length for 16-bit PCM")
          val out = new Array[Int](len / 2)
          var i = 0
          while (i < out.length) { out(i) = buf.getShort.toInt; i += 1 }
          data = out
        case _ => () // LIST/INFO, fact, … — skip
      }
      buf.position(math.min(next, end))
    }
    require(fmtSeen, "decodeWav: no fmt chunk")
    require(data != null, "decodeWav: no data chunk")
    data
  }

  // --------------------------------------------------------------- BMP

  /** Serialize a grayscale frame as a real 24 bpp uncompressed BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER): pixel (v, v, v), rows
    * BOTTOM-UP, each padded to a 4-byte boundary, pixel data at the
    * declared offset.
    */
  def bmpBytes(f: Frame): Array[Byte] = {
    val rowLen = f.width * 3
    val pad = (4 - rowLen % 4) % 4
    val imgLen = (rowLen + pad) * f.height
    val off = 14 + 40
    val buf = ByteBuffer.allocate(off + imgLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(off + imgLen)
      .putShort(0).putShort(0).putInt(off)
    buf.putInt(40).putInt(f.width).putInt(f.height).putShort(1).putShort(24)
      .putInt(0).putInt(imgLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = f.height - 1 // bottom-up: last image row first in the file
    while (y >= 0) {
      var x = 0
      while (x < f.width) {
        val v = (f.pixels(y * f.width + x) & 0xff).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24 bpp uncompressed BMP into a grayscale frame: honor the
    * file header's pixel-data OFFSET (not a hardcoded 54), bottom-up row
    * order, and per-row 4-byte padding. Gray value = blue channel (the
    * encoder writes equal channels; a color-aware caller would luma-mix
    * here).
    */
  def decodeBmp(bytes: Array[Byte]): Frame = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "decodeBmp: missing BM magic")
    buf.getInt; buf.getShort; buf.getShort
    val off = buf.getInt
    val hdrSize = buf.getInt
    require(hdrSize >= 40, s"decodeBmp: need BITMAPINFOHEADER, got size $hdrSize")
    val w = buf.getInt
    val h = buf.getInt
    require(w > 0 && h > 0, s"decodeBmp: unsupported dimensions ${w}x$h")
    buf.getShort // planes
    val bpp = buf.getShort
    val compression = buf.getInt
    require(bpp == 24 && compression == 0,
      s"decodeBmp: need 24 bpp uncompressed, got bpp=$bpp comp=$compression")
    val rowLen = w * 3
    val pad = (4 - rowLen % 4) % 4
    require(off + (rowLen + pad) * h <= bytes.length,
      "decodeBmp: pixel data overruns payload")
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = off + (rowLen + pad) * y
      val imgY = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        px(imgY * w + x) = bytes(fileRow + x * 3) & 0xff
        x += 1
      }
      y += 1
    }
    Frame(w, h, px)
  }
}
