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
    * extraction pipeline (`html` column), text blobs decode as UTF-8, PDF
    * blobs are skipped (PDF extraction is declared out of scope, SURVEY
    * §2.1 S4). Sniffing runs distributed, per JDBC partition. */
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
        case _ => None // %PDF: out of scope
      }
    }.toDF("url", "html", "text", "header")
    shape(dispatched)
  }

  /** IndexType.File (DBDataSource.cs:110-136): the column holds a path
    * relative to `basePath`; file bytes are read distributed and
    * dispatched with the same sniff (a `.pdf` extension short-circuits to
    * the PDF skip like the reference's extension check). */
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
      if (file == null || file.toLowerCase(java.util.Locale.ROOT).endsWith(".pdf")) None
      else {
        val p = java.nio.file.Paths.get(basePath, file)
        if (!java.nio.file.Files.exists(p)) None
        else {
          val bytes = java.nio.file.Files.readAllBytes(p)
          sniff(bytes) match {
            case SniffHtml => Some((url, bytes, null.asInstanceOf[String], header))
            case SniffText =>
              Some((url, null.asInstanceOf[Array[Byte]],
                graft.text.CharsetSniff.decode(bytes), header))
            case _ => None
          }
        }
      }
    }.toDF("url", "html", "text", "header")
    shape(dispatched)
  }
}
