package graft.ops

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord source/sink — the TensorFlow training-data interchange
  * format, hand-built from the two public specs (no TF dependency):
  *
  *  - record framing (tensorflow/core/lib/io/record_writer):
  *    `uint64 length (LE) · uint32 masked-crc32c(length bytes) · data ·
  *    uint32 masked-crc32c(data)`, mask(c) = ((c >>> 15) | (c << 17)) +
  *    0xa282ead8 in uint32 arithmetic;
  *  - payload: a `tf.train.Example` protobuf
  *    (Example.features.feature: map<string, Feature>, Feature one of
  *    BytesList / FloatList / Int64List), encoded with the standard
  *    proto wire format — varints, length-delimited submessages, packed
  *    numeric lists.
  *
  * Both CRCs verify on read and every structural surprise (bad tag,
  * truncated record, missing feature) throws — the [[graft.ext.Warc]]
  * loud-failure posture; a corrupt byte must never silently become
  * training data. The column mapping is type-driven and REFUSES doubles:
  * `float_list` is float32, and narrowing must be the caller's explicit
  * `.cast("float")`, never a silent sink-side loss.
  *
  * Scale shape: identical to [[WarcCorpus]] — one shard = one task on
  * both sides (TFRecord has no block index, so files are the unit of
  * parallelism; at 100 TB that is tens of thousands of shards), records
  * stream through both the writer and the reader iterator, and the
  * sink commits through the [[ShardSink]] task/job protocol.
  */
object TfRecord {

  // ------------------------------------------------------------ framing

  private val MaskDelta = 0xa282ead8

  /** The TFRecord "masked" CRC32C of `bytes` (int holds the uint32). */
  private[ops] def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(bytes, 0, bytes.length)
    val crc = c.getValue.toInt // low 32 bits
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** Frame one payload onto `out`. */
  private[ops] def writeFramed(out: OutputStream, payload: Array[Byte]): Unit = {
    val len = le64(payload.length.toLong)
    out.write(len)
    out.write(le32(maskedCrc(len)))
    out.write(payload)
    out.write(le32(maskedCrc(payload)))
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(
        s"TfRecord: truncated stream (wanted $n bytes, got $off)")
      off += r
    }
    buf
  }

  /** Stream the framed payloads out of a TFRecord byte stream, verifying
    * both CRCs per record. The iterator is lazy — one record in memory
    * at a time.
    */
  private[ops] def readFramed(in: InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextPayload: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        val first = in.read()
        if (first < 0) { done = true; return }
        val lenBytes = (first.toByte +: readFully(in, 7)).toArray
        val lenCrc = ByteBuffer.wrap(readFully(in, 4))
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(lenCrc == maskedCrc(lenBytes),
          "TfRecord: length CRC mismatch (corrupt or not a TFRecord file)")
        val len = ByteBuffer.wrap(lenBytes)
          .order(ByteOrder.LITTLE_ENDIAN).getLong
        require(len >= 0 && len <= Int.MaxValue.toLong - 16,
          s"TfRecord: implausible record length $len")
        val payload = readFully(in, len.toInt)
        val dataCrc = ByteBuffer.wrap(readFully(in, 4))
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(dataCrc == maskedCrc(payload),
          "TfRecord: data CRC mismatch (corrupt record)")
        nextPayload = payload
      }
      override def hasNext: Boolean = {
        if (!done && nextPayload == null) advance()
        !done
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val p = nextPayload; nextPayload = null; p
      }
    }

  // ----------------------------------------------------- proto encoding

  /** One Example feature value — the three `tf.train.Feature` kinds. */
  sealed trait Feat
  final case class I64s(v: Seq[Long]) extends Feat
  final case class F32s(v: Seq[Float]) extends Feat
  final case class Bts(v: Seq[Array[Byte]]) extends Feat

  private def writeVarint(b: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      b.write(((v & 0x7FL) | 0x80L).toInt); v = v >>> 7
    }
    b.write(v.toInt & 0x7F)
  }

  private def writeLenDelim(b: ByteArrayOutputStream, field: Int,
      bytes: Array[Byte]): Unit = {
    writeVarint(b, (field << 3) | 2L)
    writeVarint(b, bytes.length.toLong)
    b.write(bytes, 0, bytes.length)
  }

  private def featBytes(f: Feat): Array[Byte] = {
    // the list submessage: packed numerics / repeated bytes in field 1
    val list = new ByteArrayOutputStream()
    f match {
      case I64s(vs) if vs.nonEmpty =>
        val packed = new ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLenDelim(list, 1, packed.toByteArray)
      case F32s(vs) if vs.nonEmpty =>
        val packed = ByteBuffer.allocate(4 * vs.length)
          .order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(v => packed.putFloat(v))
        writeLenDelim(list, 1, packed.array())
      case Bts(vs) => vs.foreach(writeLenDelim(list, 1, _))
      case _ => // empty numeric list: empty submessage, kind preserved
    }
    val kind = f match { case _: Bts => 1; case _: F32s => 2; case _: I64s => 3 }
    val feat = new ByteArrayOutputStream()
    writeLenDelim(feat, kind, list.toByteArray)
    feat.toByteArray
  }

  /** Serialize one `tf.train.Example`. Map-entry order follows the given
    * sequence (column order) — byte-deterministic output.
    */
  private[ops] def encodeExample(feats: Seq[(String, Feat)]): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    feats.foreach { case (name, f) =>
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes("UTF-8"))
      writeLenDelim(entry, 2, featBytes(f))
      writeLenDelim(features, 1, entry.toByteArray)
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray)
    example.toByteArray
  }

  // ----------------------------------------------------- proto decoding

  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        require(pos < end, "TfRecord: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "TfRecord: varint too long")
      }
      v
    }
    def lenDelim(): Reader = {
      val len = varint()
      require(len >= 0 && pos + len <= end, "TfRecord: truncated submessage")
      val r = new Reader(buf, pos, pos + len.toInt)
      pos += len.toInt
      r
    }
    def bytes(): Array[Byte] = {
      val r = lenDelim()
      java.util.Arrays.copyOfRange(buf, r.pos, r.end)
    }
  }

  private def parseFeat(r: Reader): Feat = {
    if (!r.hasMore) return I64s(Nil) // kindless empty Feature{}
    val tag = r.varint()
    require((tag & 7) == 2, s"TfRecord: unexpected Feature wire type $tag")
    val kind = (tag >> 3).toInt
    val list = r.lenDelim()
    require(!r.hasMore, "TfRecord: multiple kinds in one Feature")
    kind match {
      case 1 => // BytesList: repeated length-delimited field 1
        val vs = Seq.newBuilder[Array[Byte]]
        while (list.hasMore) {
          val t = list.varint()
          require(t == 0x0A, s"TfRecord: unexpected BytesList tag $t")
          vs += list.bytes()
        }
        Bts(vs.result())
      case 2 => // FloatList: packed field 1
        if (!list.hasMore) F32s(Nil)
        else {
          val t = list.varint()
          require(t == 0x0A, s"TfRecord: unexpected FloatList tag $t")
          val packed = list.lenDelim()
          require((packed.end - packed.pos) % 4 == 0,
            "TfRecord: FloatList payload not a multiple of 4")
          val bb = ByteBuffer.wrap(packed.buf, packed.pos,
            packed.end - packed.pos).order(ByteOrder.LITTLE_ENDIAN)
          F32s(Seq.fill((packed.end - packed.pos) / 4)(bb.getFloat))
        }
      case 3 => // Int64List: packed field 1
        if (!list.hasMore) I64s(Nil)
        else {
          val t = list.varint()
          require(t == 0x0A, s"TfRecord: unexpected Int64List tag $t")
          val packed = list.lenDelim()
          val vs = Seq.newBuilder[Long]
          while (packed.hasMore) vs += packed.varint()
          I64s(vs.result())
        }
      case k => throw new IllegalArgumentException(
        s"TfRecord: unknown Feature kind $k")
    }
  }

  /** Parse one `tf.train.Example` payload to its feature map. Strict:
    * any tag outside the Example/Features/Feature schema throws.
    */
  private[ops] def decodeExample(payload: Array[Byte]): Map[String, Feat] = {
    val top = new Reader(payload, 0, payload.length)
    if (!top.hasMore) return Map.empty // Example{} — no features
    val tag = top.varint()
    require(tag == 0x0A, s"TfRecord: unexpected Example tag $tag")
    val features = top.lenDelim()
    require(!top.hasMore, "TfRecord: trailing bytes after Example.features")
    val out = Map.newBuilder[String, Feat]
    while (features.hasMore) {
      val t = features.varint()
      require(t == 0x0A, s"TfRecord: unexpected Features tag $t")
      val entry = features.lenDelim()
      val kt = entry.varint()
      require(kt == 0x0A, s"TfRecord: unexpected map-entry key tag $kt")
      val name = new String(entry.bytes(), "UTF-8")
      val vt = entry.varint()
      require(vt == 0x12, s"TfRecord: unexpected map-entry value tag $vt")
      out += name -> parseFeat(entry.lenDelim())
      require(!entry.hasMore, "TfRecord: trailing bytes in map entry")
    }
    out.result()
  }

  // ------------------------------------------------------ column mapping

  private def rowFeat(dt: DataType, name: String, row: Row, i: Int): Feat = {
    // tf.train.Example has no null encoding — refuse loudly by column
    // name (the double-column refusal's discipline), not with a bare
    // NullPointerException deep inside a write task.
    if (row.isNullAt(i)) throw new IllegalArgumentException(
      s"TfRecord: column '$name' is NULL — tf.train.Example has no null " +
        "encoding; filter or coalesce before writing")
    dt match {
      case LongType => I64s(Seq(row.getLong(i)))
      case IntegerType => I64s(Seq(row.getInt(i).toLong))
      case BooleanType => I64s(Seq(if (row.getBoolean(i)) 1L else 0L))
      case FloatType => F32s(Seq(row.getFloat(i)))
      case StringType => Bts(Seq(row.getString(i).getBytes("UTF-8")))
      case BinaryType => Bts(Seq(row.getAs[Array[Byte]](i)))
      case ArrayType(LongType, _) => I64s(row.getSeq[Long](i))
      case ArrayType(IntegerType, _) => I64s(row.getSeq[Int](i).map(_.toLong))
      case ArrayType(FloatType, _) => F32s(row.getSeq[Float](i))
      case ArrayType(StringType, _) =>
        Bts(row.getSeq[String](i).map(_.getBytes("UTF-8")))
      case ArrayType(BinaryType, _) => Bts(row.getSeq[Array[Byte]](i))
      case DoubleType | ArrayType(DoubleType, _) =>
        throw new IllegalArgumentException(
          s"TfRecord: column '$name' is double — float_list is float32; " +
            "cast('float') explicitly (silent narrowing refused)")
      case other => throw new IllegalArgumentException(
        s"TfRecord: unsupported column type $other for '$name'")
    }
  }

  private def featValue(dt: DataType, name: String, f: Feat): Any = {
    def one[T](vs: Seq[T]): T = {
      require(vs.length == 1,
        s"TfRecord: feature '$name' has ${vs.length} values, schema wants a scalar")
      vs.head
    }
    (dt, f) match {
      case (LongType, I64s(vs)) => one(vs)
      case (IntegerType, I64s(vs)) => one(vs).toInt
      case (BooleanType, I64s(vs)) => one(vs) != 0L
      case (FloatType, F32s(vs)) => one(vs)
      case (StringType, Bts(vs)) => new String(one(vs), "UTF-8")
      case (BinaryType, Bts(vs)) => one(vs)
      case (ArrayType(LongType, _), I64s(vs)) => vs
      case (ArrayType(IntegerType, _), I64s(vs)) => vs.map(_.toInt)
      case (ArrayType(FloatType, _), F32s(vs)) => vs
      case (ArrayType(StringType, _), Bts(vs)) =>
        vs.map(new String(_, "UTF-8"))
      case (ArrayType(BinaryType, _), Bts(vs)) => vs
      // an empty numeric list decodes kindless (I64s(Nil)) — accept it
      // for any empty-able schema type
      case (ArrayType(FloatType, _), I64s(Nil)) => Seq.empty[Float]
      case (ArrayType(StringType, _) | ArrayType(BinaryType, _), I64s(Nil)) =>
        Seq.empty[Any]
      case _ => throw new IllegalArgumentException(
        s"TfRecord: feature '$name' kind does not match schema type $dt")
    }
  }

  // ------------------------------------------------------------- surface

  /** Write `df` as `shards` TFRecord files of `tf.train.Example`s (one
    * per row; feature names = column names, kinds from column types —
    * doubles refused, see object doc) under the [[ShardSink]] commit
    * protocol.
    */
  def write(df: DataFrame, path: String, shards: Int): Unit = {
    val fields = df.schema.fields
    // type-check the mapping BEFORE launching the job: a refused column
    // must fail on the driver, not n-tasks-deep
    fields.foreach(f => f.dataType match {
      case DoubleType | ArrayType(DoubleType, _) =>
        throw new IllegalArgumentException(
          s"TfRecord: column '${f.name}' is double — float_list is " +
            "float32; cast('float') explicitly (silent narrowing refused)")
      case LongType | IntegerType | BooleanType | FloatType | StringType |
          BinaryType | ArrayType(LongType, _) | ArrayType(IntegerType, _) |
          ArrayType(FloatType, _) | ArrayType(StringType, _) |
          ArrayType(BinaryType, _) => ()
      case other => throw new IllegalArgumentException(
        s"TfRecord: unsupported column type $other for '${f.name}'")
    })
    ShardSink.writeSharded(df, path, shards,
      i => f"part-$i%05d.tfrecord", "TfRecord.write") { (_, out, it) =>
      it.foreach { row =>
        val feats = fields.indices.map { i =>
          fields(i).name -> rowFeat(fields(i).dataType, fields(i).name, row, i)
        }
        writeFramed(out, encodeExample(feats))
      }
    }
  }

  /** Read TFRecord shards under `path` (dir or glob) with an EXPLICIT
    * schema — the [[JsonlCorpus]] rule: schema inference would be a full
    * extra corpus pass at 100 TB, and silent coercion is how bad bytes
    * become training data. Every schema field must be present in every
    * record (missing feature = loud failure). One shard = one task.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    ShardSink.preflight(spark, path, "TfRecord.read")
    val fields = schema.fields
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]](
        org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { shardIt =>
        shardIt.flatMap { bytes =>
          readFramed(new java.io.ByteArrayInputStream(bytes)).map { payload =>
            val feats = decodeExample(payload)
            Row.fromSeq(fields.map { f =>
              val v = feats.getOrElse(f.name, throw new IllegalArgumentException(
                s"TfRecord: record is missing feature '${f.name}'"))
              featValue(f.dataType, f.name, v)
            }.toSeq)
          }
        }
      }
  }
}
