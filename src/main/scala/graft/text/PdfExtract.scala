package graft.text

import java.util.zip.Inflater
import scala.collection.mutable

/** Pure-JDK PDF per-page text extraction — the role of the reference's
  * PdfSharpTextExtractor in its PDF document source
  * (/root/reference/Docodo.NET/DataSources/DocumentDataSource.cs:27-120:
  * page 0 = headers from the Info dictionary, pages 1..N = per-PDF-page
  * extracted text). The reference's extractor submodule is a library
  * binding; this is an independent implementation of the public PDF 1.7
  * spec (ISO 32000-1) sized for TEXT extraction only:
  *
  *   - cross-reference: classic `xref` tables, xref STREAMS (/Type/XRef,
  *     /W-packed, PNG-predicted) and compressed objects in /ObjStm object
  *     streams, with /Prev chains and hybrid /XRefStm;
  *   - stream filters: FlateDecode (with TIFF/PNG predictors),
  *     ASCIIHexDecode, ASCII85Decode, RunLengthDecode;
  *   - content interpreter: BT/ET text runs, Tj/TJ/'/" show operators,
  *     Td/TD/Tm/T* line tracking, TJ kerning → word-gap heuristic, form
  *     XObject recursion, inline-image skip;
  *   - font decoding: simple-font byte maps (Standard/WinAnsi/MacRoman
  *     base encodings + /Differences glyph names) overridden by /ToUnicode
  *     CMaps (bfchar + bfrange), and 2-byte Type0/Identity-H codes.
  *
  * Encrypted PDFs are rejected (the reference logs "Error open pdf" and
  * indexes nothing — same observable behavior via `tryExtract`).
  *
  * Thread-safe: each call parses into local state only, so the extractor
  * can run inside `mapPartitions` tasks with no shared caches.
  */
object PdfExtract {

  /** Extracted document: per-PDF-page text plus Info-dict metadata. */
  final case class PdfDoc(pages: IndexedSeq[String], title: String, author: String) {
    /** pages joined with form-feed — the engine's pre-paginated body
      * contract (IndexBuilder.pagesOf splits on '\f' when
      * BuildConfig.formFeedPages is set). Page text never contains '\f'
      * (the interpreter maps it to space). */
    def body: String = pages.mkString("\f")
  }

  final class PdfError(msg: String) extends RuntimeException(msg)

  /** Decompression-bomb guard: a kilobyte of Flate/LZW input can expand
    * to gigabytes and OOM a crawler task (an Error, not an Exception).
    * Streams decoding past this many bytes abort with PdfError (the
    * document skips). Test hook: -Dgraft.pdf.maxstream=N. */
  private[text] def maxDecodedStream: Long =
    sys.props.get("graft.pdf.maxstream").map(_.toLong).getOrElse(256L << 20)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  /** Strict extraction; throws PdfError on malformed/encrypted input. */
  def extract(bytes: Array[Byte]): PdfDoc = new Doc(bytes).extract()

  /** The data-source entry point: None on any failure (reference prints
    * an error and skips the document). */
  def tryExtract(bytes: Array[Byte]): Option[PdfDoc] =
    try Some(extract(bytes)) catch { case _: Exception => None }

  // ----------------------------------------------------------------- model

  private sealed trait Obj
  private final case class PNum(v: Double) extends Obj { def i: Int = v.toInt; def l: Long = v.toLong }
  private final case class PStr(bytes: Array[Byte]) extends Obj
  private final case class PName(v: String) extends Obj
  private final case class PBool(v: Boolean) extends Obj
  private case object PNull extends Obj
  private final case class PArr(items: Vector[Obj]) extends Obj
  private final case class PDict(m: Map[String, Obj]) extends Obj
  private final case class PRef(num: Int, gen: Int) extends Obj
  private final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  private final case class POp(name: String) extends Obj // content-stream operator keyword

  // ----------------------------------------------------------------- lexer

  /** Recursive-descent parser over a byte window. `resolveLength` lets the
    * top-level document resolve indirect /Length refs; content streams pass
    * null and never contain streams. */
  private final class Lexer(val in: Array[Byte], var pos: Int, end0: Int = -1,
                            resolveLength: Obj => Option[Long] = null) {
    val end: Int = if (end0 < 0) in.length else end0
    // recursive-descent nesting guard: hostile "[[[[…" / "<<<<…" input
    // would otherwise overflow the JVM stack (an Error, uncatchable by
    // tryExtract) inside a crawler task
    private var depth = 0
    private val MaxDepth = 256

    def atEnd: Boolean = pos >= end
    private def cur: Int = if (pos < end) in(pos) & 0xFF else -1

    private def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == 12
    private def isDelim(c: Int) =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

    def skipWs(): Unit = {
      var going = true
      while (going) {
        while (!atEnd && isWs(cur)) pos += 1
        if (cur == '%') { while (!atEnd && cur != '\n' && cur != '\r') pos += 1 }
        else going = false
      }
    }

    def peekKeyword(kw: String): Boolean = {
      skipWs()
      if (pos + kw.length > end) return false
      var i = 0
      while (i < kw.length) { if (in(pos + i) != kw.charAt(i)) return false; i += 1 }
      val after = if (pos + kw.length < end) in(pos + kw.length) & 0xFF else -1
      after == -1 || isWs(after) || isDelim(after)
    }

    def expectKeyword(kw: String): Unit = {
      if (!peekKeyword(kw)) throw new PdfError(s"expected '$kw' at $pos")
      pos += kw.length
    }

    /** Parse the next object (or POp for a bare keyword). */
    def next(): Obj = {
      skipWs()
      if (atEnd) throw new PdfError("unexpected end of input")
      if (depth > MaxDepth) throw new PdfError("object nesting too deep")
      cur match {
        case '<' =>
          if (pos + 1 < end && in(pos + 1) == '<') parseDict()
          else parseHexString()
        case '(' => parseLiteralString()
        case '/' => parseName()
        case '[' =>
          pos += 1
          depth += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (cur != ']') {
            items += next()
            skipWs()
            if (atEnd) throw new PdfError("unterminated array")
          }
          pos += 1
          depth -= 1
          PArr(items.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          parseNumberOrRef()
        case _ =>
          val kw = parseBareKeyword()
          kw match {
            case "true"  => PBool(true)
            case "false" => PBool(false)
            case "null"  => PNull
            case other   => POp(other)
          }
      }
    }

    private def parseBareKeyword(): String = {
      val sb = new StringBuilder
      var c = cur
      while (!atEnd && !isWs(c) && !isDelim(c)) { sb.append(c.toChar); pos += 1; c = cur }
      if (sb.isEmpty) { pos += 1; sb.append(in(pos - 1).toChar) } // lone delimiter noise
      sb.toString
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      var c = cur
      while (!atEnd && !isWs(c) && !isDelim(c)) {
        if (c == '#' && pos + 2 < end) {
          val h = Character.digit(in(pos + 1), 16) * 16 + Character.digit(in(pos + 2), 16)
          if (h >= 0) { sb.append(h.toChar); pos += 3 } else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
        c = cur
      }
      PName(sb.toString)
    }

    private def parseNumberOrRef(): Obj = {
      val n1 = parseNumber()
      if (n1.v >= 0 && n1.v == math.floor(n1.v)) {
        val save = pos
        skipWs()
        val c = cur
        if (c >= '0' && c <= '9') {
          val n2 = parseNumber()
          skipWs()
          if (cur == 'R' && (pos + 1 >= end || isWs(in(pos + 1) & 0xFF) || isDelim(in(pos + 1) & 0xFF))) {
            pos += 1
            return PRef(n1.i, n2.i)
          }
        }
        pos = save
      }
      n1
    }

    private def parseNumber(): PNum = {
      val start = pos
      if (cur == '+' || cur == '-') pos += 1
      while (!atEnd && ((cur >= '0' && cur <= '9') || cur == '.')) pos += 1
      val s = new String(in, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
      try PNum(s.toDouble) catch { case _: NumberFormatException => PNum(0) }
    }

    private def parseHexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      while (!atEnd && cur != '>') {
        val d = Character.digit(cur, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
        pos += 1
      }
      if (hi >= 0) out.write(hi * 16) // odd digit count: trailing zero nibble
      pos += 1
      PStr(out.toByteArray)
    }

    private def parseLiteralString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (!atEnd && depth > 0) {
        val c = cur
        pos += 1
        c match {
          case '\\' =>
            if (!atEnd) {
              val e = cur
              pos += 1
              e match {
                case 'n' => out.write('\n')
                case 'r' => out.write('\r')
                case 't' => out.write('\t')
                case 'b' => out.write('\b')
                case 'f' => out.write(12)
                case '(' => out.write('(')
                case ')' => out.write(')')
                case '\\' => out.write('\\')
                case '\r' => if (cur == '\n') pos += 1 // line continuation
                case '\n' => // line continuation
                case d if d >= '0' && d <= '7' =>
                  var v = d - '0'
                  var k = 0
                  while (k < 2 && !atEnd && cur >= '0' && cur <= '7') { v = v * 8 + (cur - '0'); pos += 1; k += 1 }
                  out.write(v & 0xFF)
                case other => out.write(other)
              }
            }
          case '(' => depth += 1; out.write('(')
          case ')' => depth -= 1; if (depth > 0) out.write(')')
          case other => out.write(other)
        }
      }
      PStr(out.toByteArray)
    }

    private def parseDict(): Obj = {
      pos += 2 // '<<'
      depth += 1
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!(cur == '>' && pos + 1 < end && in(pos + 1) == '>')) {
        next() match {
          case PName(k) => m += (k -> next())
          case other => throw new PdfError(s"dict key is not a name: $other at $pos")
        }
        skipWs()
        if (atEnd) throw new PdfError("unterminated dict")
      }
      pos += 2
      depth -= 1
      val dict = PDict(m.result())
      // stream payload follows?
      val save = pos
      skipWs()
      if (peekKeyword("stream")) {
        pos += "stream".length
        if (cur == '\r') pos += 1
        if (cur == '\n') pos += 1
        val dataStart = pos
        val len: Option[Long] = dict.m.get("Length").flatMap {
          case PNum(v) => Some(v.toLong)
          case r: PRef => if (resolveLength == null) None else resolveLength(r)
          case _ => None
        }
        val dataEnd = len match {
          case Some(l) if dataStart + l <= end =>
            val e = dataStart + l.toInt
            // verify endstream actually follows; else fall back to scanning
            val probe = new Lexer(in, e, end)
            if (probe.peekKeyword("endstream")) e else scanEndstream(dataStart)
          case _ => scanEndstream(dataStart)
        }
        pos = dataEnd
        skipWs()
        if (peekKeyword("endstream")) pos += "endstream".length
        PStream(dict, java.util.Arrays.copyOfRange(in, dataStart, dataEnd))
      } else { pos = save; dict }
    }

    private def scanEndstream(from: Int): Int = {
      var i = from
      val kw = "endstream".getBytes
      while (i + kw.length <= end) {
        var j = 0
        while (j < kw.length && in(i + j) == kw(j)) j += 1
        if (j == kw.length) {
          // trim the EOL that precedes endstream
          var e = i
          if (e > from && in(e - 1) == '\n') e -= 1
          if (e > from && in(e - 1) == '\r') e -= 1
          return e
        }
        i += 1
      }
      throw new PdfError("unterminated stream")
    }
  }

  // ------------------------------------------------------------- document

  private final case class XrefEntry(kind: Int, a: Long, b: Int) // kind: 1=offset(a), 2=(objstm a, idx b)

  private final class Doc(bytes: Array[Byte]) {
    if (!isPdf(bytes)) throw new PdfError("missing %PDF header")

    private val xref = mutable.HashMap.empty[Int, XrefEntry]
    private var trailer: Map[String, Obj] = Map.empty
    private val cache = mutable.HashMap.empty[Int, Obj]
    loadXref()

    // ---- xref ----

    private def loadXref(): Unit = {
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val at = tail.lastIndexOf("startxref")
      if (at < 0) throw new PdfError("no startxref")
      val lx = new Lexer(bytes, tailStart + at)
      lx.expectKeyword("startxref")
      var offset = lx.next() match {
        case n: PNum => n.l
        case _ => throw new PdfError("bad startxref offset")
      }
      while (offset > 0 && xrefSeen.add(offset)) {
        offset = parseXrefSection(offset)
      }
      if (trailer.contains("Encrypt")) throw new PdfError("encrypted PDF unsupported")
      if (!trailer.contains("Root")) throw new PdfError("no document catalog")
    }

    /** Offsets already visited across the /Prev chain AND hybrid /XRefStm
      * hops — a crafted file whose XRefStm points back at an already-parsed
      * section must not recurse (StackOverflowError is an Error, so it would
      * escape tryExtract's Exception catch and kill the Spark task). */
    // lazy: loadXref() runs from the constructor before vals declared here
    private lazy val xrefSeen = mutable.HashSet.empty[Long]

    /** Parse one xref section (classic table or xref stream) at `offset`;
      * returns the /Prev offset or 0. First-seen entries win (later /Prev
      * sections are older). */
    private def parseXrefSection(offset: Long): Long = {
      if (offset < 0 || offset >= bytes.length) throw new PdfError("xref offset out of range")
      val lx = new Lexer(bytes, offset.toInt, -1, resolveLengthHook)
      if (lx.peekKeyword("xref")) {
        lx.pos += "xref".length
        var going = true
        while (going) {
          if (lx.peekKeyword("trailer")) {
            lx.pos += "trailer".length
            val t = lx.next() match {
              case PDict(m) => m
              case _ => throw new PdfError("bad trailer")
            }
            t.foreach { case (k, v) => if (!trailer.contains(k)) trailer += (k -> v) }
            // hybrid-reference file: also fold in the xref stream's entries
            t.get("XRefStm").foreach {
              case n: PNum => if (xrefSeen.add(n.l)) parseXrefSection(n.l)
              case _ =>
            }
            return t.get("Prev") match { case Some(n: PNum) => n.l; case _ => 0L }
          }
          val start = lx.next() match { case n: PNum => n.i; case _ => throw new PdfError("bad xref section") }
          val count = lx.next() match { case n: PNum => n.i; case _ => throw new PdfError("bad xref section") }
          var i = 0
          while (i < count) {
            val off = lx.next() match { case n: PNum => n.l; case _ => throw new PdfError("bad xref entry") }
            val gen = lx.next() match { case n: PNum => n.i; case _ => throw new PdfError("bad xref entry") }
            val kind = lx.next() match { case POp(k) => k; case _ => throw new PdfError("bad xref entry") }
            if (kind == "n" && !xref.contains(start + i))
              xref(start + i) = XrefEntry(1, off, gen)
            i += 1
          }
          going = true
        }
        0L
      } else {
        // xref STREAM: "num gen obj <</Type/XRef .../W[...]>> stream"
        lx.next(); lx.next() // obj number, generation
        lx.expectKeyword("obj")
        val s = lx.next() match {
          case st: PStream => st
          case _ => throw new PdfError("xref offset points at a non-stream object")
        }
        val d = s.dict.m
        val data = decodeStream(s)
        val w = d.get("W") match {
          case Some(PArr(items)) => items.map { case n: PNum => n.i; case _ => 0 }
          case _ => throw new PdfError("xref stream missing /W")
        }
        val size = d.get("Size") match { case Some(n: PNum) => n.i; case _ => 0 }
        val index: Seq[(Int, Int)] = d.get("Index") match {
          case Some(PArr(items)) =>
            items.grouped(2).collect { case Vector(a: PNum, b: PNum) => (a.i, b.i) }.toSeq
          case _ => Seq((0, size))
        }
        val rowLen = w.sum
        var p = 0
        def field(width: Int): Long = {
          var v = 0L
          var k = 0
          while (k < width) { v = (v << 8) | (data(p) & 0xFF); p += 1; k += 1 }
          v
        }
        index.foreach { case (start, count) =>
          var i = 0
          while (i < count && p + rowLen <= data.length) {
            val t = if (w(0) == 0) 1L else field(w(0))
            val f2 = field(w(1))
            val f3 = field(w(2)).toInt
            val num = start + i
            if (!xref.contains(num)) {
              if (t == 1L) xref(num) = XrefEntry(1, f2, f3)
              else if (t == 2L) xref(num) = XrefEntry(2, f2, f3)
            }
            i += 1
          }
        }
        d.foreach { case (k, v) => if (!trailer.contains(k)) trailer += (k -> v) }
        d.get("Prev") match { case Some(n: PNum) => n.l; case _ => 0L }
      }
    }

    private val resolveLengthHook: Obj => Option[Long] = {
      case PRef(num, _) =>
        // /Length refs in classic files point at plain integer objects
        // reachable from the xref we are still building; resolve only if
        // the entry is already known, else the lexer scans for endstream.
        xref.get(num).collect { case XrefEntry(1, off, _) =>
          val lx = new Lexer(bytes, off.toInt)
          lx.next(); lx.next(); lx.expectKeyword("obj")
          lx.next() match { case n: PNum => n.l; case _ => -1L }
        }.filter(_ >= 0)
      case _ => None
    }

    // ---- objects ----

    def getObj(num: Int): Obj = cache.getOrElse(num, {
      val o = xref.get(num) match {
        case None => PNull
        case Some(XrefEntry(1, off, _)) =>
          if (off < 0 || off >= bytes.length) PNull
          else {
            val lx = new Lexer(bytes, off.toInt, -1, resolveLengthHook)
            lx.next(); lx.next()
            lx.expectKeyword("obj")
            lx.next()
          }
        case Some(XrefEntry(2, stmNum, _)) =>
          loadObjStm(stmNum.toInt)
          cache.getOrElse(num, PNull)
        case _ => PNull
      }
      cache(num) = o
      o
    })

    /** Parse every object of an /ObjStm into the cache at once. */
    private def loadObjStm(stmNum: Int): Unit = {
      getObjRaw(stmNum) match {
        case s: PStream =>
          val data = decodeStream(s)
          val n = s.dict.m.get("N") match { case Some(x: PNum) => x.i; case _ => 0 }
          val first = s.dict.m.get("First") match { case Some(x: PNum) => x.i; case _ => 0 }
          val hdr = new Lexer(data, 0)
          val pairs = (0 until n).map { _ =>
            val num = hdr.next() match { case x: PNum => x.i; case _ => -1 }
            val off = hdr.next() match { case x: PNum => x.i; case _ => -1 }
            (num, off)
          }
          pairs.foreach { case (num, off) =>
            if (num >= 0 && off >= 0 && first + off < data.length && !cache.contains(num)) {
              val lx = new Lexer(data, first + off)
              cache(num) = lx.next()
            }
          }
        case _ =>
      }
    }

    /** Like getObj but without caching the /ObjStm container itself wrong. */
    private def getObjRaw(num: Int): Obj = xref.get(num) match {
      case Some(XrefEntry(1, off, _)) if off >= 0 && off < bytes.length =>
        val lx = new Lexer(bytes, off.toInt, -1, resolveLengthHook)
        lx.next(); lx.next()
        lx.expectKeyword("obj")
        lx.next()
      case _ => PNull
    }

    def resolve(o: Obj): Obj = {
      var cur = o
      var depth = 0
      while (depth < 32) {
        cur match {
          case PRef(num, _) => cur = getObj(num); depth += 1
          case other => return other
        }
      }
      PNull
    }

    private def dictOf(o: Obj): Map[String, Obj] = resolve(o) match {
      case PDict(m) => m
      case PStream(PDict(m), _) => m
      case _ => Map.empty
    }

    // ---- filters ----

    def decodeStream(s: PStream): Array[Byte] = {
      val filters: Seq[String] = resolve(s.dict.m.getOrElse("Filter", PNull)) match {
        case PName(n) => Seq(n)
        case PArr(items) => items.map { case PName(n) => n; case _ => "" }
        case _ => Nil
      }
      val parms: Seq[Map[String, Obj]] = resolve(s.dict.m.getOrElse("DecodeParms", PNull)) match {
        case PDict(m) => Seq(m)
        case PArr(items) => items.map(i => dictOf(i))
        case _ => Nil
      }
      var data = s.raw
      filters.zipWithIndex.foreach { case (f, i) =>
        val p = if (i < parms.length) parms(i) else Map.empty[String, Obj]
        data = f match {
          case "FlateDecode" | "Fl" => applyPredictor(inflate(data), p)
          case "LZWDecode" | "LZW" => applyPredictor(lzw(data), p)
          case "ASCIIHexDecode" | "AHx" => asciiHex(data)
          case "ASCII85Decode" | "A85" => ascii85(data)
          case "RunLengthDecode" | "RL" => runLength(data)
          case "" => data
          case other => throw new PdfError(s"unsupported filter $other")
        }
      }
      data
    }

    private def num(m: Map[String, Obj], k: String, dflt: Int): Int =
      resolve(m.getOrElse(k, PNull)) match { case n: PNum => n.i; case _ => dflt }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val cap = maxDecodedStream
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished() && !inf.needsDictionary()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) {
            // truncated deflate data: keep whatever inflated
            return out.toByteArray
          }
          out.write(buf, 0, n)
          if (out.size() > cap) throw new PdfError("decoded stream exceeds size cap")
        }
        out.toByteArray
      } catch {
        case _: java.util.zip.DataFormatException => out.toByteArray
      } finally inf.end()
    }

    private def applyPredictor(data: Array[Byte], parms: Map[String, Obj]): Array[Byte] = {
      val predictor = num(parms, "Predictor", 1)
      if (predictor <= 1) return data
      val colors = num(parms, "Colors", 1)
      val bpc = num(parms, "BitsPerComponent", 8)
      val columns = num(parms, "Columns", 1)
      val bpp = math.max(1, colors * bpc / 8)
      val rowLen = (columns * colors * bpc + 7) / 8
      if (predictor == 2) { // TIFF horizontal differencing (8-bit components)
        val out = data.clone()
        var r = 0
        while (r * rowLen < out.length) {
          val base = r * rowLen
          var i = bpp
          while (i < rowLen && base + i < out.length) {
            out(base + i) = (out(base + i) + out(base + i - bpp)).toByte
            i += 1
          }
          r += 1
        }
        return out
      }
      // PNG predictors: each row prefixed with a filter-type byte
      val stride = rowLen + 1
      val rows = data.length / stride
      val out = new Array[Byte](rows * rowLen)
      val prev = new Array[Byte](rowLen)
      var r = 0
      while (r < rows) {
        val ft = data(r * stride) & 0xFF
        val src = r * stride + 1
        val dst = r * rowLen
        var i = 0
        while (i < rowLen) {
          val raw = data(src + i) & 0xFF
          val left = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
          val up = prev(i) & 0xFF
          val upLeft = if (i >= bpp) prev(i - bpp) & 0xFF else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) / 2)
            case 4 =>
              val pp = left + up - upLeft
              val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - upLeft)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
            case _ => raw
          }
          out(dst + i) = v.toByte
          i += 1
        }
        System.arraycopy(out, dst, prev, 0, rowLen)
        r += 1
      }
      out
    }

    /** PDF LZWDecode: TIFF-style LZW — variable 9..12-bit codes, MSB-first,
      * clear code 256, EOD 257, code width grows one code EARLY (at table
      * sizes 511/1023/2047, per the PDF spec's EarlyChange=1 default). */
    private def lzw(data: Array[Byte]): Array[Byte] = {
      val cap = maxDecodedStream
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
      val dict = new java.util.ArrayList[Array[Byte]](4096)
      def resetDict(): Unit = {
        dict.clear()
        var i = 0
        while (i < 256) { dict.add(Array(i.toByte)); i += 1 }
        dict.add(null); dict.add(null) // 256 clear, 257 EOD
      }
      resetDict()
      var width = 9
      var bitBuf = 0L
      var bitCnt = 0
      var prev: Array[Byte] = null
      var i = 0
      var done = false
      while (!done && (i < data.length || bitCnt >= width)) {
        while (bitCnt < width && i < data.length) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xFF)
          bitCnt += 8
          i += 1
        }
        if (bitCnt < width) done = true
        else {
          val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
          bitCnt -= width
          if (code == 256) { resetDict(); width = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < dict.size() && dict.get(code) != null) dict.get(code)
              else if (code == dict.size() && prev != null) prev :+ prev(0) // KwKwK
              else { done = true; null }
            if (entry != null) {
              out.write(entry)
              if (out.size() > cap) throw new PdfError("decoded stream exceeds size cap")
              if (prev != null) dict.add(prev :+ entry(0))
              prev = entry
              // EarlyChange=1: widen one code before the table fills
              if (dict.size() + 1 >= (1 << width) && width < 12) width += 1
            }
          }
        }
      }
      out.toByteArray
    }

    private def asciiHex(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var i = 0
      while (i < data.length && data(i) != '>') {
        val d = Character.digit(data(i), 16)
        if (d >= 0) { if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 } }
        i += 1
      }
      if (hi >= 0) out.write(hi * 16)
      out.toByteArray
    }

    private def ascii85(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val grp = new Array[Int](5)
      var n = 0
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val c = data(i) & 0xFF
        if (c == '~') done = true
        else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
        else if (c >= '!' && c <= 'u') {
          grp(n) = c - '!'
          n += 1
          if (n == 5) {
            var v = 0L
            var k = 0
            while (k < 5) { v = v * 85 + grp(k); k += 1 }
            out.write((v >> 24).toInt); out.write((v >> 16).toInt); out.write((v >> 8).toInt); out.write(v.toInt)
            n = 0
          }
        }
        i += 1
      }
      if (n > 1) { // partial group: pad with 'u', emit n-1 bytes
        var k = n
        while (k < 5) { grp(k) = 84; k += 1 }
        var v = 0L
        k = 0
        while (k < 5) { v = v * 85 + grp(k); k += 1 }
        val b = Array((v >> 24).toInt, (v >> 16).toInt, (v >> 8).toInt, v.toInt)
        k = 0
        while (k < n - 1) { out.write(b(k)); k += 1 }
      }
      out.toByteArray
    }

    private def runLength(data: Array[Byte]): Array[Byte] = {
      val cap = maxDecodedStream
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      var done = false
      while (i < data.length && !done && out.size() <= cap) {
        val l = data(i) & 0xFF
        i += 1
        if (l == 128) done = true
        else if (l < 128) { out.write(data, i, math.min(l + 1, data.length - i)); i += l + 1 }
        else { val n = 257 - l; if (i < data.length) { var k = 0; while (k < n) { out.write(data(i)); k += 1 } }; i += 1 }
      }
      out.toByteArray
    }

    // ---- page tree ----

    def extract(): PdfDoc = {
      val root = dictOf(trailer("Root"))
      val pagesRoot = root.getOrElse("Pages", PNull)
      val pages = Vector.newBuilder[(Map[String, Obj], Map[String, Obj])] // (pageDict, resources)
      val visited = mutable.HashSet.empty[Int]
      def walk(node: Obj, inheritedRes: Map[String, Obj], depth: Int): Unit = {
        if (depth > 64) return
        node match {
          case r: PRef => if (visited.add(r.num)) walk(getObj(r.num), inheritedRes, depth)
          case _ =>
            val d = dictOf(node)
            val res = d.get("Resources").map(dictOf).filter(_.nonEmpty).getOrElse(inheritedRes)
            resolve(d.getOrElse("Type", PNull)) match {
              case PName("Pages") =>
                resolve(d.getOrElse("Kids", PNull)) match {
                  case PArr(kids) => kids.foreach(k => walk(k, res, depth + 1))
                  case _ =>
                }
              case _ => // /Page (or missing type on a leaf)
                if (d.contains("Contents") || d.get("Type").contains(PName("Page")))
                  pages += ((d, res))
            }
        }
      }
      walk(pagesRoot, Map.empty, 0)
      val texts = pages.result().map { case (pageDict, res) =>
        val content = contentBytes(pageDict)
        if (content.isEmpty) "" else extractContent(content, res, 0)
      }
      val (title, author) = infoMeta()
      PdfDoc(texts, title, author)
    }

    private def contentBytes(pageDict: Map[String, Obj]): Array[Byte] = {
      def bytesOf(o: Obj): Array[Byte] = resolve(o) match {
        case s: PStream => decodeStream(s)
        case _ => Array.emptyByteArray
      }
      resolve(pageDict.getOrElse("Contents", PNull)) match {
        case PArr(items) =>
          val out = new java.io.ByteArrayOutputStream()
          items.foreach { it => out.write(bytesOf(it)); out.write('\n') }
          out.toByteArray
        case s: PStream => decodeStream(s)
        case _ => Array.emptyByteArray
      }
    }

    private def infoMeta(): (String, String) = {
      val info = trailer.get("Info").map(dictOf).getOrElse(Map.empty)
      def str(k: String): String = resolve(info.getOrElse(k, PNull)) match {
        case PStr(b) => pdfTextString(b)
        case _ => ""
      }
      (str("Title"), str("Author"))
    }

    // ---- fonts ----

    /** code → text decoder for one font resource. */
    private final class FontDec(val twoByte: Boolean,
                                simple: Array[String],
                                toUni: Map[Int, String]) {
      def decode(b: Array[Byte]): String = {
        val sb = new StringBuilder(b.length)
        if (twoByte) {
          var i = 0
          while (i + 1 < b.length) {
            val code = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
            sb.append(toUni.getOrElse(code,
              if (code >= 32 && !Character.isISOControl(code)) code.toChar.toString else ""))
            i += 2
          }
        } else {
          var i = 0
          while (i < b.length) {
            val code = b(i) & 0xFF
            val viaMap = toUni.get(code)
            if (viaMap.isDefined) sb.append(viaMap.get)
            else if (simple != null && simple(code) != null) sb.append(simple(code))
            else if (code >= 32 && code < 127) sb.append(code.toChar)
            i += 1
          }
        }
        sb.toString
      }
    }

    private val fontCache = mutable.HashMap.empty[Obj, FontDec]

    private def fontDecoder(fontObj: Obj): FontDec = fontCache.getOrElseUpdate(fontObj, {
      val d = dictOf(fontObj)
      val subtype = resolve(d.getOrElse("Subtype", PNull)) match { case PName(n) => n; case _ => "" }
      val toUni: Map[Int, String] = resolve(d.getOrElse("ToUnicode", PNull)) match {
        case s: PStream => parseToUnicode(decodeStream(s))
        case _ => Map.empty
      }
      if (subtype == "Type0") new FontDec(true, null, toUni)
      else {
        val table = new Array[String](256)
        val base = resolve(d.getOrElse("Encoding", PNull))
        val (baseName, diffs) = base match {
          case PName(n) => (n, Vector.empty[Obj])
          case PDict(m) =>
            val bn = resolve(m.getOrElse("BaseEncoding", PNull)) match { case PName(n) => n; case _ => "" }
            val df = resolve(m.getOrElse("Differences", PNull)) match { case PArr(it) => it; case _ => Vector.empty[Obj] }
            (bn, df)
          case _ => ("", Vector.empty[Obj])
        }
        fillBaseEncoding(table, baseName)
        var code = 0
        diffs.foreach {
          case n: PNum => code = n.i
          case PName(g) => if (code >= 0 && code < 256) { table(code) = glyphToUnicode(g); code += 1 }
          case _ =>
        }
        new FontDec(false, table, toUni)
      }
    })

    private def fillBaseEncoding(table: Array[String], name: String): Unit = {
      // printable ASCII is shared by Standard/WinAnsi/MacRoman
      var c = 32
      while (c < 127) { table(c) = c.toChar.toString; c += 1 }
      val charset: java.nio.charset.Charset = name match {
        case "WinAnsiEncoding" => java.nio.charset.Charset.forName("windows-1252")
        case "MacRomanEncoding" =>
          if (java.nio.charset.Charset.isSupported("x-MacRoman"))
            java.nio.charset.Charset.forName("x-MacRoman")
          else java.nio.charset.StandardCharsets.ISO_8859_1
        case _ => java.nio.charset.StandardCharsets.ISO_8859_1 // Standard ≈ ASCII; high range approximated
      }
      c = 128
      while (c < 256) {
        val s = new String(Array(c.toByte), charset)
        if (s.nonEmpty && !Character.isISOControl(s.charAt(0)) && s.charAt(0) != '�')
          table(c) = s
        c += 1
      }
    }

    // ---- content interpretation ----

    private def extractContent(content: Array[Byte], res: Map[String, Obj], depth: Int): String = {
      if (depth > 8) return ""
      val fonts: Map[String, Obj] = resolve(res.getOrElse("Font", PNull)) match {
        case PDict(m) => m
        case _ => Map.empty
      }
      val xobjects: Map[String, Obj] = resolve(res.getOrElse("XObject", PNull)) match {
        case PDict(m) => m
        case _ => Map.empty
      }
      val sb = new StringBuilder
      var font: FontDec = null
      var lastTmY = Double.NaN
      val stack = mutable.ArrayBuffer.empty[Obj]
      def newline(): Unit =
        if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
      def show(o: Obj): Unit = o match {
        case PStr(b) =>
          val f = if (font != null) font else new FontDec(false, null, Map.empty)
          sb.append(f.decode(b).replace('\f', ' '))
        case _ =>
      }
      val lx = new Lexer(content, 0)
      var going = true
      while (going) {
        lx.skipWs()
        if (lx.atEnd) going = false
        else {
          val tok = try lx.next() catch { case _: PdfError => going = false; PNull }
          tok match {
            case POp(op) =>
              op match {
                case "Tf" =>
                  if (stack.length >= 2) stack(stack.length - 2) match {
                    case PName(fname) => fonts.get(fname).foreach(fo => font = fontDecoder(fo))
                    case _ =>
                  }
                case "Tj" => if (stack.nonEmpty) show(stack.last)
                case "'" => newline(); if (stack.nonEmpty) show(stack.last)
                case "\"" => newline(); if (stack.nonEmpty) show(stack.last)
                case "TJ" =>
                  if (stack.nonEmpty) stack.last match {
                    case PArr(items) =>
                      items.foreach {
                        case s: PStr => show(s)
                        // kerning gap wider than ~a space width (text-space
                        // thousandths) reads as a word break
                        case n: PNum => if (n.v < -120 &&
                          sb.nonEmpty && sb.charAt(sb.length - 1) != ' ' && sb.charAt(sb.length - 1) != '\n')
                          sb.append(' ')
                        case _ =>
                      }
                    case _ =>
                  }
                case "Td" | "TD" =>
                  if (stack.length >= 2) (stack(stack.length - 2), stack.last) match {
                    case (tx: PNum, ty: PNum) =>
                      if (ty.v != 0) newline()
                      else if (tx.v != 0 && sb.nonEmpty && sb.charAt(sb.length - 1) != ' ' &&
                        sb.charAt(sb.length - 1) != '\n') sb.append(' ')
                    case _ =>
                  }
                case "T*" => newline()
                case "Tm" =>
                  if (stack.length >= 6) stack.last match {
                    case y: PNum =>
                      // an absolute move to a different (or first) baseline
                      // after shown text reads as a line break
                      if (lastTmY.isNaN || y.v != lastTmY) newline()
                      lastTmY = y.v
                    case _ =>
                  }
                case "BT" => newline(); lastTmY = Double.NaN
                case "Do" =>
                  if (stack.nonEmpty) stack.last match {
                    case PName(xn) =>
                      xobjects.get(xn).foreach { xo =>
                        resolve(xo) match {
                          case s: PStream =>
                            val st = resolve(s.dict.m.getOrElse("Subtype", PNull))
                            if (st == PName("Form")) {
                              val formRes = s.dict.m.get("Resources").map(dictOf).getOrElse(res)
                              val inner = extractContent(decodeStream(s), formRes, depth + 1)
                              if (inner.nonEmpty) { newline(); sb.append(inner); newline() }
                            }
                          case _ =>
                        }
                      }
                    case _ =>
                  }
                case "BI" =>
                  // inline image: skip bytes to "EI" delimited by whitespace
                  var i = lx.pos
                  val in = lx.in
                  var found = false
                  while (!found && i + 1 < lx.end) {
                    if (in(i) == 'E' && in(i + 1) == 'I' &&
                      (i == 0 || in(i - 1) == ' ' || in(i - 1) == '\n' || in(i - 1) == '\r' || in(i - 1) == '\t') &&
                      (i + 2 >= lx.end || in(i + 2) == ' ' || in(i + 2) == '\n' || in(i + 2) == '\r' || in(i + 2) == '\t')) {
                      found = true
                      lx.pos = i + 2
                    }
                    i += 1
                  }
                  if (!found) going = false
                case _ => // operator with no text effect
              }
              stack.clear()
            case other => stack += other
          }
        }
      }
      // tidy: collapse space runs around newlines, collapse blank-line runs
      val raw = sb.toString
      val tidy = raw.replaceAll("[ \t]*\n[ \t]*", "\n").replaceAll("\n{3,}", "\n\n").trim
      tidy
    }

    // ---- ToUnicode CMaps ----

    private def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
      val m = Map.newBuilder[Int, String]
      val lx = new Lexer(data, 0)
      val pending = mutable.ArrayBuffer.empty[Obj]
      def codeOf(b: Array[Byte]): Int = {
        var v = 0
        b.foreach(x => v = (v << 8) | (x & 0xFF))
        v
      }
      def utf16(b: Array[Byte]): String = new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
      var mode = 0 // 0 none, 1 bfchar, 2 bfrange
      var going = true
      while (going) {
        lx.skipWs()
        if (lx.atEnd) going = false
        else {
          val tok = try lx.next() catch { case _: PdfError => going = false; PNull }
          tok match {
            case POp("beginbfchar") => mode = 1; pending.clear()
            case POp("beginbfrange") => mode = 2; pending.clear()
            case POp("endbfchar") | POp("endbfrange") =>
              if (mode == 1) {
                pending.grouped(2).foreach {
                  case mutable.ArrayBuffer(PStr(src), PStr(dst)) => m += (codeOf(src) -> utf16(dst))
                  case _ =>
                }
              } else if (mode == 2) {
                pending.grouped(3).foreach {
                  case mutable.ArrayBuffer(PStr(lo), PStr(hi), dst) =>
                    val l = codeOf(lo); val h = codeOf(hi)
                    dst match {
                      case PStr(d0) =>
                        var c = l
                        while (c <= h && c - l < 65536) {
                          val d = d0.clone()
                          // increment the LAST code unit by the offset
                          val off = c - l
                          if (d.length >= 2) {
                            val last = (((d(d.length - 2) & 0xFF) << 8) | (d(d.length - 1) & 0xFF)) + off
                            d(d.length - 2) = (last >> 8).toByte
                            d(d.length - 1) = last.toByte
                          }
                          m += (c -> utf16(d))
                          c += 1
                        }
                      case PArr(items) =>
                        var c = l
                        items.foreach {
                          case PStr(d) => if (c <= h) { m += (c -> utf16(d)); c += 1 }
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
              }
              mode = 0
              pending.clear()
            case other => if (mode != 0) pending += other
          }
        }
      }
      m.result()
    }
  }

  // ---- shared helpers ----

  /** PDF text string: UTF-16BE with BOM, else PDFDocEncoding (≈latin-1). */
  private def pdfTextString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Adobe Glyph List subset covering the names simple-font /Differences
    * arrays use in practice, plus the uniXXXX/uXXXXXX conventions. */
  private[text] def glyphToUnicode(g: String): String = {
    if (g.startsWith("uni") && g.length >= 7) {
      try return new String(Character.toChars(Integer.parseInt(g.substring(3, 7), 16)))
      catch { case _: NumberFormatException => }
    }
    if (g.startsWith("u") && g.length >= 5 && g.length <= 7) {
      try return new String(Character.toChars(Integer.parseInt(g.substring(1), 16)))
      catch { case _: NumberFormatException => }
    }
    if (g.length == 1) return g
    Agl.getOrElse(g, "")
  }

  private val Agl: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "dagger" -> "†", "daggerdbl" -> "‡", "periodcentered" -> "·",
    "guillemotleft" -> "«", "guillemotright" -> "»",
    "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
    "agrave" -> "à", "acircumflex" -> "â", "ccedilla" -> "ç",
    "uumlaut" -> "ü", "udieresis" -> "ü", "oumlaut" -> "ö",
    "odieresis" -> "ö", "aumlaut" -> "ä", "adieresis" -> "ä",
    "szlig" -> "ß", "germandbls" -> "ß", "ntilde" -> "ñ",
    "aacute" -> "á", "iacute" -> "í", "oacute" -> "ó",
    "uacute" -> "ú", "degree" -> "°", "copyright" -> "©",
    "registered" -> "®", "trademark" -> "™", "Euro" -> "€",
    "sterling" -> "£", "yen" -> "¥", "cent" -> "¢",
    "section" -> "§", "paragraph" -> "¶")
}
