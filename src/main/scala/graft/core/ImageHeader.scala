package graft.core

/** Pure-JVM image-header dimension decode — no codec libraries needed.
  * This is the REAL half of the multimodal decode seam
  * ([[graft.operators.Multimodal]]): pixel decoding stays a declared stub
  * (no codec libs offline), but width/height come from the actual bytes
  * for the three container formats whose headers are trivially parseable.
  *
  *  - PNG:  8-byte signature, then the IHDR chunk is mandated first —
  *    width/height are big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
  *  - JPEG: `FF D8` SOI, then marker segments; the frame header SOFn
  *    (`FF C0..CF` except C4/C8/CC) carries height/width as big-endian
  *    u16 at segment offsets +5/+7 (ITU T.81 §B.2.2).
  *  - GIF:  `GIF87a`/`GIF89a`, logical-screen width/height little-endian
  *    u16 at offsets 6/8 (GIF89a spec §18).
  *
  * Returns None when no signature matches or the header is truncated —
  * callers fall back to their stub features. CRCs are not verified
  * (dimension extraction, not integrity checking).
  */
object ImageHeader {

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val pngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** (width, height), or None if the bytes carry no recognizable header. */
  def parse(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length >= 24 && b.startsWith(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      parseJpeg(b)
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
             b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None
  }

  private def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 1 < b.length) {
      // fill bytes: any number of FFs may pad before a marker (T.81 §B.1.1.2)
      if ((b(i) & 0xff) != 0xff) return None
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val m = b(j) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOF dims read through j+7 — a header-only buffer ending exactly
        // at the width field is valid
        if (j + 8 > b.length) return None
        return Some((be16(b, j + 6), be16(b, j + 4))) // (width, height)
      }
      if (m == 0xd9 || m == 0xda) return None // EOI / scan data: no SOF seen
      if (m >= 0xd0 && m <= 0xd7 || m == 0x01) i = j + 1 // RST/TEM: no length
      else {
        if (j + 2 >= b.length) return None
        val segLen = be16(b, j + 1)
        if (segLen < 2) return None
        i = j + 1 + segLen
      }
    }
    None
  }

  /** Wrap a payload in a minimal PNG container: REAL signature + IHDR
    * (8-bit RGBA, CRC left zero — [[parse]]-valid, not render-valid) with
    * the payload appended raw after the header. 33 bytes of overhead. The
    * fixture generator for the header-decode oracle; a production pipeline
    * carries actual image bytes through the same seam.
    */
  def pngWrap(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33 + payload.length)
    out.put(pngSig)
    out.putInt(13)
    out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(width)
    out.putInt(height)
    out.put(8.toByte)  // bit depth
    out.put(6.toByte)  // color type RGBA
    out.put(0.toByte)  // compression
    out.put(0.toByte)  // filter
    out.put(0.toByte)  // interlace
    out.putInt(0)      // CRC not computed (header-only container)
    out.put(payload)
    out.array()
  }
}
