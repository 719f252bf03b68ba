package graft.api

import org.apache.spark.sql.Row

/** MessagePack codec for the command-output envelopes — the reference's
  * third output_type next to json and xml (grn_ctx_impl_msgpack in
  * lib/msgpack.c, packers wired through lib/output.c:293-1161: arrays →
  * msgpack arrays, maps → msgpack maps, Int8..UInt64 → minimal-width ints,
  * Float32 → float32 at output.c:719, doubles/Time → float64 at :819/:1089,
  * text → str at :861, binary → bin at :919, bool/nil at :1007/:1039).
  *
  * Pure Scala off the public MessagePack spec
  * (github.com/msgpack/msgpack/blob/master/spec.md) — no third-party codec.
  * Encoding rules:
  *   - integers use the smallest representation (positive fixint / uint8-64
  *     for non-negatives above fixint range, negative fixint / int8-64 for
  *     negatives) — the same minimal-width choice the C packers make
  *   - Float packs float32, Double packs float64 (NaN/Inf pack as-is:
  *     unlike JSON, msgpack represents them natively)
  *   - String packs str (fixstr/str8/str16/str32) in UTF-8
  *   - Array[Byte] packs bin8/16/32 (JSON renders base64; msgpack is the
  *     binary-clean envelope, matching output.c:919)
  *   - Seq/Array/Row pack arrays; Map packs a map with stringified keys
  *   - Timestamps pack float64 epoch seconds (the v1 JSON Time semantics)
  *
  * [[unpack]] is the exact inverse (arrays → Vector[Any], maps →
  * Map[String, Any], all ints → Long, float32 → Float, float64 → Double);
  * the spec round-trips every envelope through it. */
object Msgpack {

  // ---- packing ----

  def pack(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    write(out, v)
    out.toByteArray
  }

  private def writeByte(out: java.io.ByteArrayOutputStream, b: Int): Unit =
    out.write(b & 0xff)

  private def writeN(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0) {
      if (v < 0x80L) writeByte(out, v.toInt) // positive fixint
      else if (v < 0x100L) { writeByte(out, 0xcc); writeN(out, v, 1) } // uint8
      else if (v < 0x10000L) { writeByte(out, 0xcd); writeN(out, v, 2) } // uint16
      else if (v < 0x100000000L) { writeByte(out, 0xce); writeN(out, v, 4) } // uint32
      else { writeByte(out, 0xcf); writeN(out, v, 8) } // uint64
    } else {
      if (v >= -32L) writeByte(out, 0xe0 | (v + 64).toInt & 0x1f) // negative fixint
      else if (v >= -0x80L) { writeByte(out, 0xd0); writeN(out, v, 1) } // int8
      else if (v >= -0x8000L) { writeByte(out, 0xd1); writeN(out, v, 2) } // int16
      else if (v >= -0x80000000L) { writeByte(out, 0xd2); writeN(out, v, 4) } // int32
      else { writeByte(out, 0xd3); writeN(out, v, 8) } // int64
    }
  }

  private def writeStr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = b.length
    if (n < 32) writeByte(out, 0xa0 | n) // fixstr
    else if (n < 0x100) { writeByte(out, 0xd9); writeN(out, n, 1) } // str8
    else if (n < 0x10000) { writeByte(out, 0xda); writeN(out, n, 2) } // str16
    else { writeByte(out, 0xdb); writeN(out, n, 4) } // str32
    out.write(b, 0, n)
  }

  private def writeArrayHeader(out: java.io.ByteArrayOutputStream, n: Int): Unit = {
    if (n < 16) writeByte(out, 0x90 | n) // fixarray
    else if (n < 0x10000) { writeByte(out, 0xdc); writeN(out, n, 2) } // array16
    else { writeByte(out, 0xdd); writeN(out, n, 4) } // array32
  }

  private def writeMapHeader(out: java.io.ByteArrayOutputStream, n: Int): Unit = {
    if (n < 16) writeByte(out, 0x80 | n) // fixmap
    else if (n < 0x10000) { writeByte(out, 0xde); writeN(out, n, 2) } // map16
    else { writeByte(out, 0xdf); writeN(out, n, 4) } // map32
  }

  private def write(out: java.io.ByteArrayOutputStream, v: Any): Unit = v match {
    case null => writeByte(out, 0xc0)
    case b: Boolean => writeByte(out, if (b) 0xc3 else 0xc2)
    case s: String => writeStr(out, s)
    case b: Byte => writeInt(out, b.toLong)
    case s: Short => writeInt(out, s.toLong)
    case i: Int => writeInt(out, i.toLong)
    case l: Long => writeInt(out, l)
    case f: Float =>
      writeByte(out, 0xca); writeN(out, java.lang.Float.floatToIntBits(f) & 0xffffffffL, 4)
    case d: Double =>
      writeByte(out, 0xcb); writeN(out, java.lang.Double.doubleToLongBits(d), 8)
    case bd: java.math.BigDecimal => write(out, bd.doubleValue)
    case bd: scala.math.BigDecimal => write(out, bd.toDouble)
    case t: java.sql.Timestamp => write(out, t.getTime / 1000.0)
    case t: java.time.LocalDateTime =>
      write(out, t.toEpochSecond(java.time.ZoneOffset.UTC) + t.getNano / 1e9)
    case b: Array[Byte] =>
      val n = b.length
      if (n < 0x100) { writeByte(out, 0xc4); writeN(out, n, 1) } // bin8
      else if (n < 0x10000) { writeByte(out, 0xc5); writeN(out, n, 2) } // bin16
      else { writeByte(out, 0xc6); writeN(out, n, 4) } // bin32
      out.write(b, 0, n)
    case a: Array[_] =>
      writeArrayHeader(out, a.length); a.foreach(write(out, _))
    case s: scala.collection.Seq[_] =>
      writeArrayHeader(out, s.length); s.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      // deterministic order: sort by stringified key, like the labeled
      // drilldown rendering in CommandFormat.envelope
      val entries = m.toSeq.map { case (k, x) => (String.valueOf(k), x) }.sortBy(_._1)
      writeMapHeader(out, entries.length)
      entries.foreach { case (k, x) => writeStr(out, k); write(out, x) }
    case r: Row =>
      writeArrayHeader(out, r.length)
      var i = 0
      while (i < r.length) { write(out, r.get(i)); i += 1 }
    case other =>
      throw new IllegalArgumentException(
        s"msgpack: unsupported value class ${other.getClass.getName}")
  }

  // ---- unpacking (exact inverse; ints widen to Long, maps key by String) ----

  def unpack(bytes: Array[Byte]): Any = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val v = read(buf)
    require(!buf.hasRemaining, s"msgpack: ${buf.remaining} trailing bytes")
    v
  }

  private def readStr(buf: java.nio.ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readArray(buf: java.nio.ByteBuffer, n: Int): Vector[Any] =
    Vector.fill(n)(read(buf))

  private def readMap(buf: java.nio.ByteBuffer, n: Int): Map[String, Any] =
    (0 until n).map { _ =>
      val k = read(buf) match {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"msgpack: non-str map key ${other}")
      }
      k -> read(buf)
    }.toMap

  private def read(buf: java.nio.ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x < 0x80 => x.toLong // positive fixint
      case x if x >= 0xe0 => (x - 0x100).toLong // negative fixint
      case x if (x & 0xf0) == 0x90 => readArray(buf, x & 0x0f)
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => { val n = buf.get() & 0xff; val a = new Array[Byte](n); buf.get(a); a }
      case 0xc5 => { val n = buf.getShort() & 0xffff; val a = new Array[Byte](n); buf.get(a); a }
      case 0xc6 => { val n = buf.getInt(); val a = new Array[Byte](n); buf.get(a); a }
      case 0xca => buf.getFloat()
      case 0xcb => buf.getDouble()
      case 0xcc => (buf.get() & 0xff).toLong
      case 0xcd => (buf.getShort() & 0xffff).toLong
      case 0xce => buf.getInt() & 0xffffffffL
      case 0xcf =>
        val v = buf.getLong()
        require(v >= 0, "msgpack: uint64 above Long.MaxValue")
        v
      case 0xd0 => buf.get().toLong
      case 0xd1 => buf.getShort().toLong
      case 0xd2 => buf.getInt().toLong
      case 0xd3 => buf.getLong()
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xdc => readArray(buf, buf.getShort() & 0xffff)
      case 0xdd => readArray(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf => readMap(buf, buf.getInt())
      case other =>
        throw new IllegalArgumentException(f"msgpack: unsupported tag 0x$other%02x")
    }
  }
}
