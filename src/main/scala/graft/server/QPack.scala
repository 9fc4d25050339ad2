package graft.server

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** qpack — SiriDB's binary serialization format
  * (/root/reference/include/qpack/qpack.h:14-69,
  * src/qpack/qpack.c:404-540 encode, :696+ decode), bridged to Jackson
  * trees so both transports share one handler surface. All multi-byte
  * scalars are little-endian (the reference memcpy's host-endian x86).
  *
  * Type bytes: 0..63 fixed +int, 64..123 fixed -int (-60..-1 as
  * 63 - v), 125..127 doubles -1/0/1, 128..227 fixed raw len 0..99,
  * 228..231 RAW8/16/32/64, 232..235 INT8/16/32/64, 236 DOUBLE,
  * 237..242 ARRAY0..5, 243..248 MAP0..5, 249 TRUE, 250 FALSE,
  * 251 NULL, 252/254 ARRAY_OPEN/CLOSE, 253/255 MAP_OPEN/CLOSE.
  */
object QPack {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- encode ----

  def encode(node: JsonNode): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    write(out, node)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, node: JsonNode): Unit = node match {
    case n if n.isIntegralNumber => writeInt(out, n.asLong())
    case n if n.isNumber => writeDouble(out, n.asDouble())
    case n if n.isTextual => writeRaw(out, n.asText().getBytes(StandardCharsets.UTF_8))
    case n if n.isBoolean => out.write(if (n.asBoolean()) 249 else 250)
    case n if n.isNull => out.write(251)
    case a: ArrayNode =>
      out.write(252)
      a.forEach(e => write(out, e))
      out.write(254)
    case o: ObjectNode =>
      out.write(253)
      o.properties().forEach { e =>
        writeRaw(out, e.getKey.getBytes(StandardCharsets.UTF_8))
        write(out, e.getValue)
      }
      out.write(255)
    case other =>
      writeRaw(out, other.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** qp_add_int64 (qpack.c:482-540). */
  private def writeInt(out: ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v < 64) out.write(v.toInt)
    else if (v >= -60 && v < 0) out.write(63 - v.toInt)
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) {
      out.write(232); out.write(v.toInt & 0xFF)
    } else if (v >= Short.MinValue && v <= Short.MaxValue) {
      out.write(233); writeLE(out, v, 2)
    } else if (v >= Int.MinValue && v <= Int.MaxValue) {
      out.write(234); writeLE(out, v, 4)
    } else { out.write(235); writeLE(out, v, 8) }
  }

  /** qp_add_double (qpack.c:448-473): -1/0/1 pack as one byte. */
  private def writeDouble(out: ByteArrayOutputStream, d: Double): Unit = {
    if (d == 0.0) out.write(126)
    else if (d == 1.0) out.write(127)
    else if (d == -1.0) out.write(125)
    else { out.write(236); writeLE(out, java.lang.Double.doubleToLongBits(d), 8) }
  }

  /** QP_PREPARE_RAW (qpack.c:45-76). */
  private def writeRaw(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    val len = b.length
    if (len < 100) out.write(128 + len)
    else if (len <= 0xFF) { out.write(228); out.write(len) }
    else if (len <= 0xFFFF) { out.write(229); writeLE(out, len.toLong, 2) }
    else { out.write(230); writeLE(out, len.toLong, 4) }
    out.write(b, 0, len)
  }

  private def writeLE(out: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  // ---- decode ----

  /** Decode one value. Trailing open containers may be unclosed (the
    * reference's packers often leave the outer map open — the unpacker
    * just hits QP_END). */
  def decode(buf: Array[Byte]): JsonNode = {
    val r = new Reader(buf)
    if (r.atEnd) mapper.nullNode() else r.readValue()
  }

  private final class Reader(buf: Array[Byte]) {
    var p = 0
    def atEnd: Boolean = p >= buf.length
    private def u8(): Int = { val v = buf(p) & 0xFF; p += 1; v }
    private def peek: Int = buf(p) & 0xFF

    private def readLE(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (buf(p + i) & 0xFFL) << (8 * i); i += 1 }
      p += n; v
    }

    private def signed(v: Long, bits: Int): Long = (v << (64 - bits)) >> (64 - bits)

    private def raw(len: Int): String = {
      val s = new String(buf, p, len, StandardCharsets.UTF_8); p += len; s
    }

    def readValue(): JsonNode = {
      val tp = u8()
      tp match {
        case t if t < 64 => mapper.getNodeFactory.numberNode(t.toLong)
        case t if t < 124 => mapper.getNodeFactory.numberNode((63 - t).toLong)
        case 124 => mapper.nullNode() // QP_HOOK, unused by SiriDB
        case 125 => mapper.getNodeFactory.numberNode(-1.0)
        case 126 => mapper.getNodeFactory.numberNode(0.0)
        case 127 => mapper.getNodeFactory.numberNode(1.0)
        case t if t < 228 => mapper.getNodeFactory.textNode(raw(t - 128))
        case 228 => mapper.getNodeFactory.textNode(raw(readLE(1).toInt))
        case 229 => mapper.getNodeFactory.textNode(raw(readLE(2).toInt))
        case 230 => mapper.getNodeFactory.textNode(raw(readLE(4).toInt))
        case 231 => mapper.getNodeFactory.textNode(raw(readLE(8).toInt))
        case 232 => mapper.getNodeFactory.numberNode(signed(readLE(1), 8))
        case 233 => mapper.getNodeFactory.numberNode(signed(readLE(2), 16))
        case 234 => mapper.getNodeFactory.numberNode(signed(readLE(4), 32))
        case 235 => mapper.getNodeFactory.numberNode(readLE(8))
        case 236 => mapper.getNodeFactory
          .numberNode(java.lang.Double.longBitsToDouble(readLE(8)))
        case t if t >= 237 && t <= 242 => // ARRAY0..5
          val a = mapper.createArrayNode()
          (0 until (t - 237)).foreach(_ => a.add(readValue()))
          a
        case t if t >= 243 && t <= 248 => // MAP0..5
          val o = mapper.createObjectNode()
          (0 until (t - 243)).foreach { _ =>
            val k = readValue().asText(); o.set[JsonNode](k, readValue())
          }
          o
        case 249 => mapper.getNodeFactory.booleanNode(true)
        case 250 => mapper.getNodeFactory.booleanNode(false)
        case 251 => mapper.nullNode()
        case 252 => // ARRAY_OPEN .. ARRAY_CLOSE (or end of buffer)
          val a = mapper.createArrayNode()
          while (!atEnd && peek != 254) a.add(readValue())
          if (!atEnd) p += 1
          a
        case 253 => // MAP_OPEN .. MAP_CLOSE (or end of buffer)
          val o = mapper.createObjectNode()
          while (!atEnd && peek != 255) {
            val k = readValue().asText(); o.set[JsonNode](k, readValue())
          }
          if (!atEnd) p += 1
          o
        case other =>
          throw new IllegalArgumentException(s"qpack: unexpected type byte $other at ${p - 1}")
      }
    }
  }
}
