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

  /** Incremental stem→group accumulator shared by every source parser;
    * first mapping of a stem wins (a stem shared by two lemmas stays with
    * the earlier group, as Dictionary.Add-with-skip does in the reference
    * builders). Group numbers start at 1 (0 = "unknown" in the lookup). */
  private final class GroupAcc(stemmerName: String) {
    private val stem = Analyzer.stemmerByName(stemmerName)
    private val entries = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    private var group = 0
    def add(forms: Iterable[String]): Unit = {
      group += 1
      forms.iterator
        .map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
        .foreach { f =>
          val s = stem(f)
          if (s != null && s.nonEmpty && !entries.contains(s)) entries(s) = group
        }
    }
    def result: Map[String, Int] = entries.toMap
  }

  /** stem→group entries from lemma lines (`lemma<TAB>form1 form2 ...`). */
  def fromLemmaLines(lines: Iterator[String], stemmerName: String): Map[String, Int] = {
    val acc = new GroupAcc(stemmerName)
    lines.foreach { line0 =>
      val line = line0.trim
      if (line.nonEmpty && !line.startsWith(";")) {
        val parts = line.split("\t", 2)
        val lemma = parts(0)
        val forms = lemma +: (if (parts.length > 1)
          parts(1).split("\\s+").toSeq else Seq.empty)
        acc.add(forms)
      }
    }
    acc.result
  }

  /** stem→group entries from an OpenCorpora XML dump: every `t` attribute
    * of elements inside a `<lemma>` element (the `<l>` lemma form and each
    * `<f>` inflected form) joins that lemma's group — the same collection
    * rule as the reference's OpenCorporaVocBuilder
    * (/root/reference/Docodo.NET/Dict.cs:214-255). StAX streaming: a full
    * dictionary dump never materializes. */
  def fromOpenCorporaXml(in: java.io.InputStream, stemmerName: String = "ru"): Map[String, Int] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in)
    val acc = new GroupAcc(stemmerName)
    val forms = scala.collection.mutable.ArrayBuffer.empty[String]
    var insideLemma = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "lemma") { forms.clear(); insideLemma = true }
            else if (insideLemma) {
              val t = r.getAttributeValue(null, "t")
              if (t != null && t.nonEmpty) forms += t
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "lemma" && insideLemma) {
              if (forms.nonEmpty) acc.add(forms)
              insideLemma = false
            }
          case _ => ()
        }
      }
    } finally r.close()
    acc.result
  }

  /** stem→group entries from a FreeLib-format folder: each line's first two
    * space-separated tokens form a group (Dict.cs:260-294). */
  def fromFreeLibFolder(folder: String, stemmerName: String = "en"): Map[String, Int] = {
    val acc = new GroupAcc(stemmerName)
    val dir = new java.io.File(folder)
    val files = Option(dir.listFiles()).getOrElse(Array.empty).filter(_.isFile).sortBy(_.getName)
    files.foreach { file =>
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().foreach { l =>
        val a = l.split(' ')
        if (a.length >= 2 && a(0).nonEmpty && a(1).nonEmpty) acc.add(a.take(2).toSeq)
      } finally src.close()
    }
    acc.result
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
  def buildFile(inPath: String, outPath: String, stemmerName: String): Int =
    buildFile(inPath, outPath, stemmerName, "lemmas")

  /** source → .voc file; `format` is one of `lemmas` (default tab format),
    * `opencorpora` (XML dump file), `freelib` (folder of word-pair files).
    * Returns the number of entries. */
  def buildFile(inPath: String, outPath: String, stemmerName: String, format: String): Int = {
    val entries = format match {
      case "opencorpora" =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(inPath))
        try fromOpenCorporaXml(in, stemmerName) finally in.close()
      case "freelib" => fromFreeLibFolder(inPath, stemmerName)
      case "lemmas" =>
        val src = scala.io.Source.fromFile(inPath, "UTF-8")
        try fromLemmaLines(src.getLines(), stemmerName) finally src.close()
      case other => throw new IllegalArgumentException(
        s"unknown vocab format '$other' (expected lemmas|opencorpora|freelib)")
    }
    val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(outPath))
    try writeDocodo(entries, os) finally os.close()
    entries.size
  }
}
