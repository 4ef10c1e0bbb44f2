package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Programmatic PDF builders for PdfExtractSpec: the sandbox has no PDF
  * corpus (the reference's XUnitDocodoTest/pdfs/ is gitignored upstream
  * too), so fixtures are assembled byte-exactly from the PDF 1.7 spec —
  * classic xref tables, xref streams + object streams, and the filter/
  * encoding variants the extractor supports.
  */
object PdfFixtures {

  def bytes(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  /** Assemble a classic-xref PDF. Objects must be numbered 1..n in order;
    * object 1 is the catalog (/Root). */
  def pdf(objs: Seq[(Int, Array[Byte])], trailerExtra: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(bytes(s))
    w("%PDF-1.5\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.foreach { case (num, body) =>
      offsets(num) = out.size()
      w(s"$num 0 obj\n")
      out.write(body)
      w("\nendobj\n")
    }
    val maxNum = objs.map(_._1).max
    val xrefOff = out.size()
    w(s"xref\n0 ${maxNum + 1}\n")
    w("0000000000 65535 f \n")
    (1 to maxNum).foreach { i =>
      w(f"${offsets.getOrElse(i, 0)}%010d 00000 n \n")
    }
    w(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R $trailerExtra >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** A content/arbitrary stream object body with explicit /Length. */
  def stream(dictEntries: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes(s"<< /Length ${data.length} $dictEntries >>\nstream\n"))
    out.write(data)
    out.write(bytes("\nendstream"))
    out.toByteArray
  }

  def flate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def asciiHex(data: Array[Byte]): Array[Byte] =
    bytes(data.map(b => f"${b & 0xFF}%02X").mkString + ">")

  /** Valid (literal-only) TIFF/PDF LZW stream: emits clear, each byte as
    * its literal code, then EOD — while mirroring the decoder's table
    * growth and EarlyChange width bookkeeping, so code widths stay in
    * lockstep past the 9→10→11-bit boundaries. */
  def lzwLiteral(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var dictSize = 258
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xFF).toInt)
        bitCnt -= 8
      }
    }
    emit(256) // clear
    var first = true
    data.foreach { b =>
      emit(b & 0xFF)
      if (!first) {
        dictSize += 1
        if (dictSize + 1 >= (1 << width) && width < 12) width += 1
      }
      first = false
    }
    emit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** The standard 5-object skeleton around one content stream. */
  def onePage(content: String, fontDict: String = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
              contentObj: Array[Byte] = null): Array[Byte] = {
    val c = if (contentObj != null) contentObj else stream("", bytes(content))
    pdf(Seq(
      1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>"),
      2 -> bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
      3 -> bytes("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      4 -> c,
      5 -> bytes(fontDict)))
  }

  /** An xref-STREAM PDF: catalog/pages/page/font live compressed in an
    * /ObjStm; the xref stream is FlateDecode + PNG predictor 12. */
  def xrefStreamPdf(content: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(bytes(s))
    w("%PDF-1.5\n")

    // object stream payload: objects 1 (catalog), 2 (pages), 3 (page), 5 (font)
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
      5 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = inner.map(_._2)
    val offs = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = inner.map(_._1).zip(offs).map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = bytes(header + bodies.mkString("\n") + "\n")
    val first = header.length

    // obj 4: content stream (plain)
    val o4 = out.size()
    w("4 0 obj\n")
    out.write(stream("", bytes(content)))
    w("\nendobj\n")

    // obj 6: the ObjStm (flate to exercise the decode path)
    val o6 = out.size()
    val objStmData = flate(payload)
    w("6 0 obj\n")
    out.write(stream(s"/Type /ObjStm /N ${inner.size} /First $first /Filter /FlateDecode", objStmData))
    w("\nendobj\n")

    // obj 7: xref stream, W=[1 4 2], rows for objects 0..7
    val o7 = out.size()
    def row(t: Int, a: Long, b: Int): Array[Byte] =
      Array(t.toByte,
        ((a >> 24) & 0xFF).toByte, ((a >> 16) & 0xFF).toByte, ((a >> 8) & 0xFF).toByte, (a & 0xFF).toByte,
        ((b >> 8) & 0xFF).toByte, (b & 0xFF).toByte)
    val rows: Seq[Array[Byte]] = Seq(
      row(0, 0, 0),      // 0: free
      row(2, 6, 0),      // 1: in objstm 6, idx 0
      row(2, 6, 1),      // 2
      row(2, 6, 2),      // 3
      row(1, o4, 0),     // 4: direct
      row(2, 6, 3),      // 5
      row(1, o6, 0),     // 6: the objstm itself
      row(1, o7, 0))     // 7: this xref stream
    // PNG predictor 12 ("Up"): prefix each row with filter type 0 (None) —
    // legal predicted data that exercises the unfiltering path
    val predicted = new java.io.ByteArrayOutputStream()
    rows.foreach { r => predicted.write(0); predicted.write(r) }
    val xrefData = flate(predicted.toByteArray)
    w("7 0 obj\n")
    out.write(stream(
      "/Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R /Filter /FlateDecode " +
        "/DecodeParms << /Predictor 12 /Columns 7 >>", xrefData))
    w("\nendobj\n")

    w(s"startxref\n$o7\n%%EOF\n")
    out.toByteArray
  }
}
