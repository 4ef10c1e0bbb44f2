package graft.text

/** Lightweight charset detection for blob/file text payloads — the role of
  * the reference's Ude.CharsetDetector in its DB blob dispatch
  * (/root/reference/Docodo.NET/DataSources/DBDataSource.cs:88-97), without
  * an external statistical model:
  *
  *   1. byte-order marks win (UTF-8, UTF-16 LE/BE);
  *   2. else, if the bytes decode as STRICT UTF-8, it's UTF-8 (random
  *      single-byte text virtually never validates);
  *   3. else windows-1252 (the de-facto superset of latin-1 on the web).
  *
  * Deterministic, allocation-light, and conservative: pure-ASCII text is
  * valid UTF-8, so the common case never misroutes.
  */
object CharsetSniff {

  final case class Detected(charset: java.nio.charset.Charset, bomLen: Int)

  def detect(bytes: Array[Byte]): Detected = {
    if (bytes == null || bytes.isEmpty)
      return Detected(java.nio.charset.StandardCharsets.UTF_8, 0)
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return Detected(java.nio.charset.StandardCharsets.UTF_8, 3)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return Detected(java.nio.charset.StandardCharsets.UTF_16LE, 2)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return Detected(java.nio.charset.StandardCharsets.UTF_16BE, 2)
    if (isValidUtf8(bytes))
      Detected(java.nio.charset.StandardCharsets.UTF_8, 0)
    else
      Detected(java.nio.charset.Charset.forName("windows-1252"), 0)
  }

  /** decode with the detected charset (BOM stripped). */
  def decode(bytes: Array[Byte]): String = {
    val d = detect(bytes)
    if (bytes == null) "" else new String(bytes, d.bomLen, bytes.length - d.bomLen, d.charset)
  }

  /** strict UTF-8 validity scan (no decoder allocation). */
  def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xFF
      val len =
        if (b < 0x80) 1
        else if (b >= 0xC2 && b <= 0xDF) 2
        else if (b >= 0xE0 && b <= 0xEF) 3
        else if (b >= 0xF0 && b <= 0xF4) 4
        else return false
      if (i + len > n) return false
      var j = 1
      while (j < len) {
        val c = bytes(i + j) & 0xFF
        if (c < 0x80 || c > 0xBF) return false
        // reject overlong/surrogate/out-of-range forms at the boundary byte
        if (j == 1) {
          if (b == 0xE0 && c < 0xA0) return false
          if (b == 0xED && c > 0x9F) return false
          if (b == 0xF0 && c < 0x90) return false
          if (b == 0xF4 && c > 0x8F) return false
        }
        j += 1
      }
      i += len
    }
    true
  }
}
