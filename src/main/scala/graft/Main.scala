package graft

import graft.query.SearchOptions
import graft.spark.{IndexBuilder, IndexStore, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.SparkSession

/** Console host — the engine's CLI (≙ reference Program.cs:52-265, with
  * spark-submit-friendly subcommands instead of an interactive loop):
  *
  *   build <pagesParquet> <indexDir> [--no-headers] [--no-stemming]
  *         [--stops <file>] [--page-size N] [--bucket-bits N]
  *   query <indexDir> <request...>        (full positional search)
  *   bm25  <indexDir> <k> <words...>      (top-k scoring)
  *   suggest <indexDir> <prefix>          (autocomplete)
  *   serve <indexDir> [port]              (REST host, GET /search?req=)
  *   histogram <indexDir> [n]             (top terms by cf)
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // zstd shuffle: build exchanges compress ~2.2x tighter than lz4;
      // shuffle bytes are the scaling bottleneck on shared disks
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_SHUFFLE_CODEC", "zstd"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "build" :: pages :: indexDir :: rest =>
      val spark = session()
      var cfg = IndexBuilder.BuildConfig()
      var r = rest
      while (r.nonEmpty) r match {
        case "--no-headers" :: t => cfg = cfg.copy(includeHeaders = false); r = t
        case "--no-stemming" :: t => cfg = cfg.copy(stemming = false); r = t
        case "--stops" :: f :: t =>
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try cfg = cfg.copy(stopWords = Analyzer.parseStopWords(src.getLines()))
          finally src.close()
          r = t
        case "--page-size" :: n :: t => cfg = cfg.copy(pageSize = n.toInt); r = t
        case "--form-feed-pages" :: t => cfg = cfg.copy(formFeedPages = true); r = t
        case "--voc" :: f :: t =>
          val name = new java.io.File(f).getName.split("\\.")(0)
          val in = new java.io.FileInputStream(f)
          try cfg = cfg.copy(vocabs = cfg.vocabs :+ graft.text.Vocab.loadDocodo(in, name))
          finally in.close()
          r = t
        case "--bucket-bits" :: n :: t => cfg = cfg.copy(bucketBits = n.toInt); r = t
        case other :: t => System.err.println(s"unknown option $other"); r = t
        case Nil => ()
      }
      val stats = IndexBuilder.build(spark, spark.read.parquet(pages), indexDir, cfg)
      println(s"built: nDocs=${stats.nDocs} postings=${stats.totalPostings} avgdl=${stats.avgdl} resumed=${stats.resumedStages.mkString(",")}")
      spark.stop()

    case "crawl" :: url :: out :: rest =>
      // crawl a site into a pages parquet (≙ reference WebDataSource); the
      // result feeds `build` (use --form-feed-pages for crawled PDFs)
      val spark = session()
      var cfg = graft.sources.WebCrawler.Config()
      var workDir: Option[String] = None
      var r = rest
      while (r.nonEmpty) r match {
        case "--max-items" :: n :: t => cfg = cfg.copy(maxItems = n.toInt); r = t
        case "--max-depth" :: n :: t => cfg = cfg.copy(maxDepth = n.toInt); r = t
        case "--types" :: re :: t => cfg = cfg.copy(indexTypes = re); r = t
        case "--politeness-ms" :: n :: t => cfg = cfg.copy(politenessMs = n.toInt); r = t
        case "--robots" :: t => cfg = cfg.copy(respectRobots = true); r = t
        // round-scoped parquet staging — must be cluster-visible storage
        // when running multi-executor (java temp is local-mode only)
        case "--work-dir" :: d :: t => workDir = Some(d); r = t
        case other :: t => System.err.println(s"unknown option $other"); r = t
        case Nil => ()
      }
      val work = workDir.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-crawl").toString)
      val df = graft.sources.WebCrawler.pages(spark, url, work, cfg)
      df.write.mode("overwrite").parquet(out)
      println(s"crawled: docs=${spark.read.parquet(out).count()} → $out")
      spark.stop()

    case "builddocs" :: folder :: indexDir :: rest =>
      // index a documents folder (txt/html/pdf + .dscr headers) directly
      val spark = session()
      val pages = graft.sources.DocumentsSource.pages(spark, folder)
      val cfg = IndexBuilder.BuildConfig(sourceName = "doc", formFeedPages = true,
        pageSize = rest match { case "--page-size" :: n :: _ => n.toInt; case _ => 0 })
      val stats = IndexBuilder.build(spark, pages, indexDir, cfg)
      println(s"built: nDocs=${stats.nDocs} postings=${stats.totalPostings} avgdl=${stats.avgdl}")
      spark.stop()

    case "buildsrc" :: indexDir :: rest =>
      // multi-source build (≙ reference -source:type,arg repeats,
      // Program.cs:90-134): union every source's pages into ONE index.
      //   --source doc,<folder> | web,<url>[,<typesRegex>] | xml,<manifest>
      //            | parquet,<path> | db,<propsFile>
      // db props file keys: url, query, nameCol, mode=text|blob|file,
      // textCol|blobCol|fileCol, basePath (file mode), headerCols=a,b
      val spark = session()
      var cfg = IndexBuilder.BuildConfig(formFeedPages = true)
      var srcs = List.empty[org.apache.spark.sql.DataFrame]
      var crawlWork: Option[String] = None
      var r = rest
      // pre-scan the FULL option list for --work-dir: web sources stage
      // their crawl while parsing, so the work dir must be known before the
      // first --source web,... is constructed wherever it appears
      crawlWork = rest.sliding(2).collectFirst {
        case List("--work-dir", d) => d
      }
      var nWeb = 0 // distinct staging subdir per web source: two crawls
                   // sharing one --work-dir would overwrite each other's
                   // fetched-* parquet BEFORE the lazy union materializes
                   // (the first source would silently read the second's rows)
      while (r.nonEmpty) r match {
        case "--work-dir" :: d :: t => crawlWork = Some(d); r = t
        case "--source" :: spec :: t =>
          val parts = spec.split(",", 3)
          srcs = (parts(0) match {
            case "doc" => graft.sources.DocumentsSource.pages(spark, parts(1))
            case "xml" => graft.sources.XmlManifestSource.pages(spark, parts(1))
            case "parquet" => spark.read.parquet(parts(1))
            case "web" =>
              val c = graft.sources.WebCrawler.Config(
                indexTypes = if (parts.length > 2) parts(2) else "")
              nWeb += 1
              graft.sources.WebCrawler.pages(spark, parts(1),
                crawlWork.map(d => s"$d/src-$nWeb").getOrElse(
                  java.nio.file.Files.createTempDirectory("graft-crawl").toString), c)
            case "db" =>
              val p = new java.util.Properties()
              val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(parts(1)))
              try p.load(in) finally in.close()
              def req(k: String) = Option(p.getProperty(k)).getOrElse(
                throw new IllegalArgumentException(s"db props: missing $k"))
              val hdrs = Option(p.getProperty("headerCols"))
                .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
              p.getProperty("mode", "text") match {
                case "blob" => graft.sources.DbSource.blobPages(spark, req("url"),
                  req("query"), req("nameCol"), req("blobCol"), hdrs)
                case "file" => graft.sources.DbSource.filePages(spark, req("url"),
                  req("query"), req("nameCol"), req("fileCol"), req("basePath"), hdrs)
                case _ => graft.sources.DbSource.pages(spark, req("url"),
                  req("query"), req("nameCol"), req("textCol"), hdrs)
              }
            case other => throw new IllegalArgumentException(s"unknown source type $other")
          }) :: srcs
          r = t
        case "--page-size" :: n :: t => cfg = cfg.copy(pageSize = n.toInt); r = t
        case "--no-stemming" :: t => cfg = cfg.copy(stemming = false); r = t
        case other :: t => System.err.println(s"unknown option $other"); r = t
        case Nil => ()
      }
      require(srcs.nonEmpty, "at least one --source required")
      // allowMissingColumns: plain parquet pages have no header column
      val all = srcs.reverse.reduce(_.unionByName(_, allowMissingColumns = true))
      val st = IndexBuilder.build(spark, all, indexDir, cfg)
      println(s"built: nDocs=${st.nDocs} postings=${st.totalPostings} sources=${srcs.size}")
      spark.stop()

    case "append" :: pages :: indexDir :: rest =>
      // appends inherit the INDEX's persisted analyzer/pagination, so there
      // are no tunable flags here — but a typo'd/unsupported option must
      // not pass silently (the user would believe it took effect)
      rest.foreach(o => System.err.println(s"unknown option $o (append takes none)"))
      val spark = session()
      val batchId = IndexStore.readStageDetail(indexDir, "stream", "lastBatchId")
        .map(_.toLong + 1).getOrElse(0L)
      val n = graft.streaming.StreamingIndexer.appendBatch(
        spark, spark.read.parquet(pages), indexDir, IndexBuilder.BuildConfig(), batchId)
      val v = IndexStore.currentVersion(indexDir).getOrElse(0)
      println(s"appended: docs=$n snapshot=v$v")
      spark.stop()

    case "query" :: indexDir :: req0 =>
      val spark = session()
      // --at <version> pins an older snapshot (time travel)
      val (pin, req) = req0 match {
        case "--at" :: v :: rest => (Some(v.toInt), rest)
        case r => (None, r)
      }
      val out = SparkSearcher.open(spark, indexDir, pin)
        .search(req.mkString(" "), SearchOptions(dist = 40))
      println(s"found ${out.docs.size} docs, ${out.nFoundPages} pages")
      out.docs.foreach { d =>
        println(f"  ${d.docId}%6d rank=${d.rank}%.3f bm25=${d.bm25}%.4f ${d.name}")
        d.pages.take(2).foreach(p => println(s"       [${p.pageId}] ${p.text.take(160)}"))
      }
      spark.stop()

    case "bm25" :: indexDir :: k :: words =>
      val spark = session()
      searcher(spark, indexDir).bm25TopK(words, k.toInt)
        .foreach { case (d, s) => println(f"  $d%8d  $s%.6f") }
      spark.stop()

    case "suggest" :: indexDir :: prefix :: Nil =>
      val spark = session()
      searcher(spark, indexDir).suggest(prefix).foreach(println)
      spark.stop()

    case "histogram" :: indexDir :: rest =>
      val spark = session()
      import org.apache.spark.sql.functions._
      val n = rest.headOption.map(_.toInt).getOrElse(20)
      searcher(spark, indexDir).termStats.toDF()
        .orderBy(desc("cf"), col("term")).limit(n)
        .collect().foreach(r => println(f"  ${r.getString(0)}%-24s cf=${r.getLong(2)} df=${r.getLong(1)}"))
      spark.stop()

    case "compact" :: indexDir :: Nil =>
      // Iceberg rewrite-data-files analog: consolidate batch deltas into
      // one file set; old snapshots stay readable until vacuum
      val spark = session()
      val st = graft.spark.Compactor.compact(spark, indexDir)
      println(s"compacted: v${st.version} docs=${st.nDocs} postings=${st.totalPostings} " +
        s"files ${st.postingsFilesBefore}→${st.postingsFilesAfter}")
      spark.stop()

    case "info" :: indexDir :: Nil =>
      // index info (≙ reference console 'O', Program.cs:308-316)
      val snap = IndexStore.readSnapshot(indexDir).getOrElse {
        System.err.println(s"no committed snapshot at $indexDir"); sys.exit(1)
      }
      val versions = IndexStore.listVersions(indexDir)
      val spark = session()
      val words = searcher(spark, indexDir).termStats.count()
      println(s"version: v${snap.version} (available: ${versions.mkString(", ")})")
      println(s"docs: ${snap.nDocs}  avgdl: ${snap.avgdl}  postings: ${snap.totalPostings}")
      println(s"words: $words")
      println(s"files: " + snap.files.map { case (t, fs) => s"$t=${fs.size}" }.mkString(" "))
      locally {
        val lin = IndexStore.readLineage(indexDir, snap.version)
        val inp = IndexStore.readLineageInputs(indexDir, snap.version)
        if (lin.nonEmpty)
          println(s"lineage: ${lin.size} shard entries" +
            (if (inp.nonEmpty) s", ${inp.size} input partitions " +
              s"(docIds ${inp.values.map(_.firstDocId).min}..${inp.values.map(_.lastDocId).max})"
             else ""))
      }
      spark.stop()

    case "vacuum" :: indexDir :: rest =>
      // Iceberg-style expire-snapshots: keep the newest N versions
      val keep = rest match {
        case "--keep" :: n :: _ => n.toInt
        case _ => 2
      }
      val (expired, deleted) = IndexStore.vacuum(indexDir, keep)
      println(s"vacuumed: expiredSnapshots=$expired deletedFiles=$deleted keep=$keep")

    case "buildvoc" :: in :: out :: rest =>
      // lemma file / OpenCorpora XML dump / FreeLib folder → binary .voc
      // usable via --voc
      def opt(name: String, default: String): String =
        rest.sliding(2).collectFirst { case Seq(`name`, v) => v }.getOrElse(default)
      val format = opt("--format", "lemmas")
      val stemmer = opt("--stemmer", if (format == "opencorpora") "ru" else "en")
      val n = graft.text.VocBuilder.buildFile(in, out, stemmer, format)
      println(s"built vocab: entries=$n stemmer=$stemmer format=$format → $out")

    case "console" :: indexDir :: Nil =>
      // interactive search with per-keystroke autocomplete (Program.cs:268)
      val spark = session()
      try ConsoleRepl.run(searcher(spark, indexDir))
      finally spark.stop() // scripted/piped stdin reaches EOF and returns

    case "serve" :: indexDir :: rest =>
      val spark = session()
      val port = rest.headOption.map(_.toInt).getOrElse(9001)
      Server.serve(searcher(spark, indexDir), port, block = true)

    case _ =>
      System.err.println(
        "usage: graft.Main build <pages.parquet> <indexDir> [opts] | buildsrc <indexDir> --source doc|web|xml|db|parquet,<arg>... | crawl <url> <pages.parquet> [--max-items N] [--max-depth N] [--types re] [--politeness-ms N] | builddocs <folder> <indexDir> [--page-size N] | append <pages.parquet> <indexDir> | query <indexDir> [--at v] <req> | bm25 <indexDir> <k> <words...> | suggest <indexDir> <prefix> | histogram <indexDir> [n] | info <indexDir> | compact <indexDir> | buildvoc <lemmas.txt|dict.xml|folder> <out.voc> [--stemmer en|ru|de|fr] [--format lemmas|opencorpora|freelib] | console <indexDir> | serve <indexDir> [port]")
      sys.exit(2)
  }

  private def searcher(spark: SparkSession, indexDir: String): SparkSearcher =
    SparkSearcher.open(spark, indexDir)
}
