package graft.text

/** Build morphological vocabularies (.voc) from plain dictionary sources —
  * the counterpart of `Vocab.loadDocodo`. Mirrors the role of the
  * reference's VocBuilder / OpenCorporaVocBuilder / FreeLibVocBuilder
  * (/root/reference/Docodo.NET/Dict.cs:109-270): group all inflected forms
  * of a lemma under one group number, keyed by STEMMED form (the analyzer
  * stems a token before the vocab lookup, Build.cs:197).
  *
  * Input format (generic, covers both reference source shapes after their
  * XML/plain parsing): one lemma per line,
  *   `lemma<TAB>form1 form2 form3 ...`
  * (the lemma itself is always included as a form; lines starting with ';'
  * are comments). Group numbers are assigned in file order starting at 1 —
  * group 0 means "unknown" in the lookup, so it is never assigned.
  */
object VocBuilder {

  /** stem→group entries from lemma lines; first mapping of a stem wins
    * (a stem shared by two lemmas stays with the earlier group, as
    * Dictionary.Add-with-skip does in the reference builders). */
  def fromLemmaLines(lines: Iterator[String], stemmerName: String): Map[String, Int] = {
    val stem = Analyzer.stemmerByName(stemmerName)
    val entries = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var group = 0
    lines.foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith(";")) {
        group += 1
        val parts = line.split("\t", 2)
        val lemma = parts(0).trim.toLowerCase(java.util.Locale.ROOT)
        val forms = lemma +: (if (parts.length > 1)
          parts(1).split("\\s+").toSeq.map(_.trim.toLowerCase(java.util.Locale.ROOT))
        else Seq.empty)
        forms.filter(_.nonEmpty).foreach { f =>
          val s = stem(f)
          if (s != null && s.nonEmpty && !entries.contains(s)) entries(s) = group
        }
      }
    }
    entries.toMap
  }

  /** Serialize entries in the reference's binary .voc format: repeated
    * [.NET BinaryWriter string: 7-bit-varint byte length + UTF-8]
    * [Int32 LE group], keys sorted (Vocab.loadDocodo derives the letter
    * range from first/last keys, so ordering matters). */
  def writeDocodo(entries: Map[String, Int], out: java.io.OutputStream): Unit = {
    entries.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var len = bytes.length
      while (len >= 0x80) { out.write((len & 0x7F) | 0x80); len >>>= 7 }
      out.write(len)
      out.write(bytes)
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
  }

  /** lemma file → .voc file; returns the number of entries. */
  def buildFile(inPath: String, outPath: String, stemmerName: String): Int = {
    val src = scala.io.Source.fromFile(inPath, "UTF-8")
    val entries = try fromLemmaLines(src.getLines(), stemmerName) finally src.close()
    val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(outPath))
    try writeDocodo(entries, os) finally os.close()
    entries.size
  }
}
