package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional data sources producing the engine's `pages` input schema
  * (`url, warc_ts, html, text, lang` + optional `header`), the Spark-first
  * counterparts of the reference's pluggable IIndexDataSource family.
  */

/** XML manifest source (≙ reference XmlDataSource,
  * /root/reference/Docodo.NET/DataSources/XmlDataSource.cs): the manifest
  * lists `<document>` elements whose child elements are fields; the `file`
  * field is the document's text path (relative to `<basepath>` or the
  * manifest's directory), every other field becomes a header line. The
  * manifest itself is parsed on the driver — manifests are small by
  * construction — while document CONTENT is loaded distributed (one task
  * per slice of the entry list), so corpus size is bounded by the cluster,
  * not the driver.
  */
object XmlManifestSource {

  final case class Entry(file: String, fields: Seq[(String, String)])

  /** parse the manifest with the JDK's streaming XML reader. */
  def parseManifest(manifestPath: String): (String, Seq[Entry]) = {
    val dir = {
      val p = java.nio.file.Paths.get(manifestPath).toAbsolutePath.getParent
      if (p == null) "" else p.toString
    }
    var basepath = dir
    val entries = Seq.newBuilder[Entry]
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(manifestPath))
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      val r = f.createXMLStreamReader(in)
      var inDoc = false
      var fieldName: String = null
      var fields = Seq.newBuilder[(String, String)]
      val text = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val name = r.getLocalName
            if (name == "document") { inDoc = true; fields = Seq.newBuilder }
            else if (inDoc || name == "basepath") { fieldName = name; text.clear() }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            if (fieldName != null) text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            if (name == "document") {
              inDoc = false
              val fs = fields.result()
              fs.find(_._1 == "file") match {
                case Some((_, file)) => entries += Entry(file, fs.filterNot(_._1 == "file"))
                case None => // reference logs "no file field" and skips
              }
            } else if (fieldName == name) {
              val v = text.toString.trim
              if (name == "basepath") {
                basepath = if (v.contains(":") || v.startsWith("/")) v
                else java.nio.file.Paths.get(dir, v).toString
              } else if (inDoc) fields += (name -> v)
              fieldName = null
            }
          case _ =>
        }
      }
      r.close()
    } finally in.close()
    (basepath, entries.result())
  }

  /** manifest → pages DataFrame (text loaded distributed; header carries
    * the manifest's fields like the reference's AddRecordBase). */
  def pages(spark: SparkSession, manifestPath: String,
            sourceName: String = "xml"): DataFrame = {
    import spark.implicits._
    val (basepath, entries) = parseManifest(manifestPath)
    val slices = math.max(1, math.min(entries.size, spark.sparkContext.defaultParallelism * 3))
    spark.createDataset(entries.map(e => (e.file, e.fields)))(
        org.apache.spark.sql.Encoders.product[(String, Seq[(String, String)])])
      .repartition(slices)
      .map { case (file, fields) =>
        val path = java.nio.file.Paths.get(basepath, file)
        val body = new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
        val header = (Seq("Name" -> file, "Source" -> sourceName) ++ fields)
          .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
        (file, null.asInstanceOf[Array[Byte]], body, header)
      }
      .toDF("url", "html", "text", "header")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("lang", lit(null).cast("string"))
      .select($"url", $"warc_ts", $"html", $"text", $"lang", $"header")
  }
}

/** Documents-folder source (≙ reference DocumentsDataSource,
  * /root/reference/Docodo.NET/DataSources/DocumentDataSource.cs:20-160):
  * recursively walks a root directory and dispatches per extension —
  * `.txt` → charset-detected paged text, `.html`/`.htm` → the byte-exact
  * HTML extraction pipeline, `.pdf` → per-PDF-page text via the pure-JDK
  * extractor (pages joined with '\f'; build with
  * `BuildConfig(formFeedPages = true)` so page numbers match PDF pages).
  *
  * Headers mirror the reference's `.dscr` companion-file scheme
  * (DataSources.cs:380-438): base `Name=`/`Source=` lines (PDFs add
  * `Title=`/`Author=` from the Info dictionary first,
  * DocumentDataSource.cs:59-72), then `<file>.dscr`, then each ancestor
  * directory's `.dscr` from the file upward — FIRST-seen key wins, and a
  * malformed or duplicate line aborts the rest of that file (the
  * reference's Dictionary.Add-throws behavior). Deviations, documented:
  * the ancestor walk stops at the source root (not the filesystem root),
  * and HTML names are root-relative like the other types (the reference
  * passes the absolute path for HTML only).
  *
  * Driver lists paths only (tiny); content reads and extraction run
  * distributed, one task per path slice — at corpus scale the file tree
  * must live on shared storage, the same contract the reference's
  * folder walk has.
  */
object DocumentsSource {

  private val Exts = Set(".txt", ".pdf", ".html", ".htm")

  /** reference dscr merge: first-seen wins; a line without '=' or with a
    * duplicate key aborts the REST of that file (DataSources.cs:386-397). */
  private[sources] def mergeDscrLines(dict: java.util.LinkedHashMap[String, String],
                                      lines: Iterator[String]): Unit = {
    val it = lines
    var ok = true
    while (ok && it.hasNext) {
      val line = it.next()
      if (!line.replaceAll("^ +", "").startsWith(";")) {
        val eq = line.indexOf('=')
        if (eq < 0) ok = false
        else {
          val k = line.substring(0, eq)
          val v = line.substring(eq + 1).replaceAll("[\r\n]+$", "")
          if (dict.containsKey(k)) ok = false
          else dict.put(k, v)
        }
      }
    }
  }

  private def addDscrFile(dict: java.util.LinkedHashMap[String, String],
                          p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      try {
        val raw = java.nio.file.Files.readAllBytes(p)
        mergeDscrLines(dict, graft.text.CharsetSniff.decode(raw).linesIterator)
      } catch { case _: java.io.IOException => }
    }

  private[sources] def dscrHeaders(rootDir: String, rel: String,
                                   base: Seq[(String, String)]): String = {
    val root = java.nio.file.Paths.get(rootDir).toAbsolutePath.normalize
    val file = root.resolve(rel)
    val dict = new java.util.LinkedHashMap[String, String]()
    base.foreach { case (k, v) => if (!dict.containsKey(k)) dict.put(k, v) }
    addDscrFile(dict, file.resolveSibling(file.getFileName.toString + ".dscr"))
    var dir = file.getParent
    while (dir != null && dir.startsWith(root)) {
      addDscrFile(dict, dir.resolve(".dscr"))
      dir = dir.getParent
    }
    val sb = new StringBuilder
    dict.forEach((k, v) => { sb.append(k).append('=').append(v).append('\n'); () })
    sb.toString
  }

  /** Stream the walk into a staged listing file instead of a driver-held
    * Seq: `createDataset(paths)` embeds every path in the query plan, so a
    * 10^8-file corpus would hold the whole listing in driver memory twice.
    * The listing stages to `listDir` (must be cluster-visible storage when
    * running multi-executor; defaults to the JVM temp dir, correct for
    * local mode) and is read back as a distributed text scan. Returns
    * (path, count). */
  private def stageListing(rootDir: String, listDir: Option[String]): (String, Long) = {
    val root = java.nio.file.Paths.get(rootDir).toAbsolutePath.normalize
    val target = listDir.map(d => java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(d), "graft-doclist", ".txt"))
      .getOrElse(java.nio.file.Files.createTempFile("graft-doclist", ".txt"))
    val out = java.nio.file.Files.newBufferedWriter(target,
      java.nio.charset.StandardCharsets.UTF_8)
    var n = 0L
    val st = java.nio.file.Files.walk(root)
    try {
      st.forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          val name = p.getFileName.toString.toLowerCase(java.util.Locale.ROOT)
          val dot = name.lastIndexOf('.')
          if (dot >= 0 && Exts.contains(name.substring(dot))) {
            out.write(root.relativize(p).toString)
            out.newLine()
            n += 1
          }
        }
      }
    } finally { st.close(); out.close() }
    (target.toString, n)
  }

  def pages(spark: SparkSession, rootDir: String,
            sourceName: String = "doc", listDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val (listPath, n) = stageListing(rootDir, listDir)
    val slices = math.max(1, math.min(n, spark.sparkContext.defaultParallelism.toLong * 3).toInt)
    spark.read.textFile(listPath).repartition(slices).flatMap { rel =>
      val p = java.nio.file.Paths.get(rootDir).resolve(rel)
      val lower = rel.toLowerCase(java.util.Locale.ROOT)
      def bytesOf: Array[Byte] = java.nio.file.Files.readAllBytes(p)
      if (lower.endsWith(".pdf")) {
        graft.text.PdfExtract.tryExtract(bytesOf).filter(_.body.nonEmpty).map { doc =>
          val base =
            (if (doc.title.nonEmpty) Seq("Title" -> doc.title) else Nil) ++
              Seq("Name" -> rel) ++
              (if (doc.author.nonEmpty) Seq("Author" -> doc.author) else Nil) ++
              Seq("Source" -> sourceName)
          (rel, null.asInstanceOf[Array[Byte]], doc.body,
            dscrHeaders(rootDir, rel, base))
        }
      } else if (lower.endsWith(".txt")) {
        val body = graft.text.CharsetSniff.decode(bytesOf)
        Some((rel, null.asInstanceOf[Array[Byte]], body,
          dscrHeaders(rootDir, rel, Seq("Name" -> rel, "Source" -> sourceName))))
      } else { // html: extraction + header synthesis happen in the builder
        Some((rel, bytesOf, null.asInstanceOf[String], null.asInstanceOf[String]))
      }
    }.toDF("url", "html", "text", "header")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("lang", lit(null).cast("string"))
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"), col("header"))
  }
}

/** Database source (≙ reference DBDataSourceBase Text mode,
  * /root/reference/Docodo.NET/DataSources/DBDataSource.cs): rows of a
  * select become documents; `nameCol` is the unique document name,
  * `textCol` the body, and every `headerCols` value becomes a header
  * line. Built on `spark.read.jdbc`, so predicate pushdown / partitioned
  * reads come from Spark's JDBC relation, not hand-rolled cursors.
  */
object DbSource {

  /** content sniff of a blob's first bytes, the reference's dispatch rule
    * (DBDataSource.cs:98-130): %PDF magic → Pdf, "<html" within the first
    * 4000 bytes → Html, else Text (UTF-8 per the engine's charset
    * contract; the reference runs a charset detector here). */
  private[sources] final val SniffPdf = 0
  private[sources] final val SniffHtml = 1
  private[sources] final val SniffText = 2
  private[sources] def sniff(bytes: Array[Byte]): Int = {
    if (bytes == null || bytes.isEmpty) SniffText
    else if (bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F') SniffPdf
    else {
      val head = new String(bytes, 0, math.min(4000, bytes.length),
        java.nio.charset.StandardCharsets.UTF_8)
      if (head.contains("<html")) SniffHtml else SniffText
    }
  }

  private def headerExpr(nameCol: String, headerCols: Seq[String], sourceName: String) =
    concat(
      (Seq(concat_ws("", lit("Name="), col(nameCol), lit("\n")),
        lit(s"Source=$sourceName\n")) ++
        headerCols.map(c => concat_ws("", lit(s"$c="), coalesce(col(c).cast("string"), lit("")), lit("\n")))): _*)

  private def shape(df: DataFrame): DataFrame = {
    df.withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("lang", lit(null).cast("string"))
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"), col("header"))
  }

  /** IndexType.Text: the text column IS the body. */
  def pages(spark: SparkSession, jdbcUrl: String, query: String,
            nameCol: String, textCol: String, headerCols: Seq[String] = Nil,
            sourceName: String = "db",
            connectionProperties: java.util.Properties = new java.util.Properties()): DataFrame = {
    val rel = spark.read.jdbc(jdbcUrl, s"($query) graft_src", connectionProperties)
    rel.select(
      col(nameCol).cast("string").as("url"),
      lit(null).cast("timestamp").as("warc_ts"),
      lit(null).cast("binary").as("html"),
      col(textCol).cast("string").as("text"),
      lit(null).cast("string").as("lang"),
      headerExpr(nameCol, headerCols, sourceName).as("header"))
  }

  /** IndexType.Blob (DBDataSource.cs:51-103): documents stored in a blob
    * column, dispatched by content sniff — HTML blobs go through the
    * extraction pipeline (`html` column), text blobs decode with charset
    * detection, %PDF blobs extract per-page text ('\f'-joined pages; build
    * with formFeedPages=true). Sniffing runs distributed, per JDBC
    * partition. */
  def blobPages(spark: SparkSession, jdbcUrl: String, query: String,
                nameCol: String, blobCol: String, headerCols: Seq[String] = Nil,
                sourceName: String = "db",
                connectionProperties: java.util.Properties = new java.util.Properties()): DataFrame = {
    import spark.implicits._
    val rel = spark.read.jdbc(jdbcUrl, s"($query) graft_src", connectionProperties)
    val base = rel.select(
      col(nameCol).cast("string").as("url"),
      col(blobCol).cast("binary").as("blob"),
      headerExpr(nameCol, headerCols, sourceName).as("header"))
      .as[(String, Array[Byte], String)]
    val dispatched = base.flatMap { case (url, blob, header) =>
      sniff(blob) match {
        case SniffHtml => Some((url, blob, null.asInstanceOf[String], header))
        case SniffText =>
          // charset-detected decode (BOM / strict-UTF-8 scan / cp1252
          // fallback), the reference's Ude.CharsetDetector role
          Some((url, null.asInstanceOf[Array[Byte]],
            if (blob == null) "" else graft.text.CharsetSniff.decode(blob),
            header))
        case _ => // %PDF → per-page extraction (unreadable pdfs skip)
          graft.text.PdfExtract.tryExtract(blob).filter(_.body.nonEmpty)
            .map(doc => (url, null.asInstanceOf[Array[Byte]], doc.body, header))
      }
    }.toDF("url", "html", "text", "header")
    shape(dispatched)
  }

  /** IndexType.File (DBDataSource.cs:110-136): the column holds a path
    * relative to `basePath`; file bytes are read distributed and
    * dispatched with the same sniff (a `.pdf` extension short-circuits
    * straight to the PDF extractor like the reference's extension
    * check). */
  def filePages(spark: SparkSession, jdbcUrl: String, query: String,
                nameCol: String, fileCol: String, basePath: String,
                headerCols: Seq[String] = Nil, sourceName: String = "db",
                connectionProperties: java.util.Properties = new java.util.Properties()): DataFrame = {
    import spark.implicits._
    val rel = spark.read.jdbc(jdbcUrl, s"($query) graft_src", connectionProperties)
    val base = rel.select(
      col(nameCol).cast("string").as("url"),
      col(fileCol).cast("string").as("file"),
      headerExpr(nameCol, headerCols, sourceName).as("header"))
      .as[(String, String, String)]
    val dispatched = base.flatMap { case (url, file, header) =>
      if (file == null) None
      else {
        val p = java.nio.file.Paths.get(basePath, file)
        if (!java.nio.file.Files.exists(p)) None
        else {
          val bytes = java.nio.file.Files.readAllBytes(p)
          def asPdf = graft.text.PdfExtract.tryExtract(bytes).filter(_.body.nonEmpty)
            .map(doc => (url, null.asInstanceOf[Array[Byte]], doc.body, header))
          if (file.toLowerCase(java.util.Locale.ROOT).endsWith(".pdf")) asPdf
          else sniff(bytes) match {
            case SniffHtml => Some((url, bytes, null.asInstanceOf[String], header))
            case SniffText =>
              Some((url, null.asInstanceOf[Array[Byte]],
                graft.text.CharsetSniff.decode(bytes), header))
            case _ => asPdf
          }
        }
      }
    }.toDF("url", "html", "text", "header")
    shape(dispatched)
  }
}
