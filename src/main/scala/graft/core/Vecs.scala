package graft.core

/** Growable primitive vectors for the hot paths (posting encode/decode and
  * the positional kernel). Scala's ArrayBuffer[Long]/[Byte] box every
  * element; at millions of postings per task that allocation pressure
  * dominates the build, so these are plain unboxed arrays.
  */
final class LongVec(initial: Int = 16) {
  private var arr = new Array[Long](math.max(4, initial))
  private var n = 0
  def length: Int = n
  def isEmpty: Boolean = n == 0
  def nonEmpty: Boolean = n != 0
  def last: Long = arr(n - 1)
  def apply(i: Int): Long = arr(i)
  def clear(): Unit = n = 0
  def +=(v: Long): this.type = {
    if (n == arr.length) {
      val na = new Array[Long](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    arr(n) = v
    n += 1
    this
  }
  def ++=(vs: LongVec): this.type = {
    var i = 0
    while (i < vs.length) { this += vs(i); i += 1 }
    this
  }
  def toArray: Array[Long] = java.util.Arrays.copyOf(arr, n)
}

final class ByteVec(initial: Int = 32) {
  private var arr = new Array[Byte](math.max(8, initial))
  private var n = 0
  def length: Int = n
  def +=(v: Byte): this.type = {
    if (n == arr.length) {
      val na = new Array[Byte](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    arr(n) = v
    n += 1
    this
  }
  def ++=(vs: Array[Byte]): this.type = {
    while (n + vs.length > arr.length) {
      val na = new Array[Byte](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    System.arraycopy(vs, 0, arr, n, vs.length)
    n += vs.length
    this
  }
  /** append vs[from..) — splice tail of an independently encoded stream. */
  def appendSlice(vs: Array[Byte], from: Int): this.type = {
    val len = vs.length - from
    while (n + len > arr.length) {
      val na = new Array[Byte](arr.length * 2)
      System.arraycopy(arr, 0, na, 0, n)
      arr = na
    }
    System.arraycopy(vs, from, arr, n, len)
    n += len
    this
  }
  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, n)
}
