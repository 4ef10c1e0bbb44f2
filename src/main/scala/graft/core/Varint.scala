package graft.core



/** Delta + 15-bit varint posting codec.
  *
  * Semantics match the reference posting codec
  * (/root/reference/Docodo.NET/IndexSequence.cs:13-15,63-84,114-136):
  * ascending unsigned 64-bit values are delta-encoded; each delta is split
  * into 16-bit units of 15 payload bits plus a high continuation bit,
  * low-order payload first. We serialize the units little-endian into
  * bytes so blocks store as Parquet BinaryType.
  *
  * This is a clean-room Scala implementation of the published algorithm
  * shape (delta + varint), not a translation of the reference code.
  */
object Varint {
  private final val Bits = 15
  private final val Overflow = 1 << Bits          // 0x8000 continuation bit
  private final val Mask = Overflow - 1           // 0x7FFF payload mask

  /** Append one delta's varint units to `out` (as packed bytes, LE). */
  @inline private def putDelta(out: ByteVec, delta0: Long): Unit = {
    var diff = delta0
    var go = true
    while (go) {
      if (java.lang.Long.compareUnsigned(diff, Mask.toLong) > 0) {
        val unit = (Overflow | (diff & Mask)).toInt
        out += (unit & 0xFF).toByte
        out += ((unit >>> 8) & 0xFF).toByte
        diff = diff >>> Bits
      } else {
        val unit = (diff & Mask).toInt
        out += (unit & 0xFF).toByte
        out += ((unit >>> 8) & 0xFF).toByte
        go = false
      }
    }
  }

  /** Append ONE value's units to `out` — the public splice point for
    * building/merging delta streams incrementally (run combiner + merger):
    * a follow-on run's first delta is rewritten against the previous run's
    * last value, the rest of its bytes are copied verbatim. */
  def putOne(out: ByteVec, v: Long): Unit = putDelta(out, v)

  /** Byte length of the first varint in `bytes` (0 for empty input) — how
    * many bytes to skip when splicing a run's delta stream after another. */
  def firstLen(bytes: Array[Byte]): Int = {
    if (bytes.length == 0) return 0
    var p = 0
    while ((bytes(p + 1) & 0x80) != 0) p += 2
    p + 2
  }

  /** Encode ascending values (deltas against `base`, first delta = xs(0)-base). */
  def encode(xs: Array[Long], base: Long = 0L): Array[Byte] = {
    val out = new ByteVec(xs.length * 2 + 8)
    var last = base
    var i = 0
    while (i < xs.length) {
      putDelta(out, xs(i) - last)
      last = xs(i)
      i += 1
    }
    out.toArray
  }

  /** Encode a sequence of raw (non-cumulative) unsigned values, e.g. tfs. */
  def encodeRaw(xs: Array[Long]): Array[Byte] = {
    val out = new ByteVec(xs.length * 2 + 8)
    var i = 0
    while (i < xs.length) { putDelta(out, xs(i)); i += 1 }
    out.toArray
  }

  /** Decode `n` cumulative values starting from `base`. */
  def decode(bytes: Array[Byte], n: Int, base: Long = 0L): Array[Long] = {
    val out = new Array[Long](n)
    var last = base
    var p = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var more = true
      while (more) {
        val unit = ((bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8))
        p += 2
        more = (unit & Overflow) != 0
        last += (unit & Mask).toLong << shift
        shift += Bits
      }
      out(i) = last
      i += 1
    }
    out
  }

  /** Decode `n` raw (non-cumulative) values. */
  def decodeRaw(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var p = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val unit = ((bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8))
        p += 2
        more = (unit & Overflow) != 0
        v += (unit & Mask).toLong << shift
        shift += Bits
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Streaming decoder over packed bytes — used by the block-max scorer to
    * walk postings without materializing arrays.
    */
  final class Reader(bytes: Array[Byte], base: Long = 0L) {
    private var p = 0
    private var last = base
    def hasNext: Boolean = p < bytes.length
    /** reset the cumulative base (per-doc position chains restart at 0). */
    def rebase(b: Long): Unit = { last = b }
    def next(): Long = {
      var shift = 0
      var more = true
      while (more) {
        val unit = ((bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8))
        p += 2
        more = (unit & Overflow) != 0
        last += (unit & Mask).toLong << shift
        shift += Bits
      }
      last
    }
    /** Skip `n` values without decoding them — just walk the continuation
      * bits. Used to jump over position chains of documents a query's
      * presence prescreen already rejected. */
    def skip(n: Long): Unit = {
      var i = 0L
      while (i < n) {
        while ((bytes(p + 1) & 0x80) != 0) p += 2
        p += 2
        i += 1
      }
    }
    /** next raw (non-cumulative) value */
    def nextRaw(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val unit = ((bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8))
        p += 2
        more = (unit & Overflow) != 0
        v += (unit & Mask).toLong << shift
        shift += Bits
      }
      v
    }
  }
}
