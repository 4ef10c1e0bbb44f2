package graft.tools

import org.apache.spark.sql.SparkSession

/** Fast-iteration probe for the positional searchBatch path: builds the
  * bench index ONCE, then times the Bench's 40-query batch repeatedly at
  * one parallelism level. Run with GRAFT_TIMING=1 for per-phase marks
  * (resolve/plan/fieldPass/evalSelect/textFetch) and per-stage metrics.
  *
  * Usage: GRAFT_TIMING=1 GRAFT_PROBE_DOCS=200000 GRAFT_PROBE_CPUS=32
  *        sbt "runMain graft.tools.SearchProbe"
  */
object SearchProbe {

  private def parts: Int = sys.env.getOrElse("GRAFT_PROBE_PARTS", "32").toInt

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-sprobe-$cpus")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_SPARK_LOCAL_DIR", sys.props("java.io.tmpdir")))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_TIMING"))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val secs = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
          val m = i.taskMetrics
          System.err.println(
            f"[sprobe-stg] ${i.stageId}%3d wall=$secs%6.2fs tasks=${i.numTasks}%3d cpu=${m.executorCpuTime / 1e9}%6.2fs run=${m.executorRunTime / 1e3}%6.2fs des=${m.executorDeserializeTime / 1e3}%5.2fs gc=${m.jvmGCTime / 1e3}%5.2fs in=${m.inputMetrics.bytesRead / 1e6}%6.1fMB res=${m.resultSize / 1e6}%5.1fMB ${i.name.take(50)}")
        }
      })
    s
  }

  /** The Bench's positional query mix (8 shapes × 5 term cycles, all
    * distinct — searchBatch dedups repeats). */
  def benchQueries: Seq[(String, graft.query.SearchOptions)] =
    graft.Bench.searchQueryBatch(40)

  /** Structural rendering: PageHit.pos is an Array[Int], so case-class ==
    * is reference equality there — render arrays as lists for comparison.
    * (Also used by graft.Bench's hot-vs-cold identity check.) */
  def canonical(o: graft.query.SearchOut): String = {
    val docs = o.docs.map { d =>
      val pages = d.pages.map(p =>
        s"${p.pageId}|${p.pos.mkString(",")}|${p.rank}|${p.text}").mkString(";")
      s"${d.docId}|${d.name}|${d.rank}|${d.bm25}|$pages|${d.headers.toSeq.sorted}|${d.foundWords}|${d.summary}"
    }.mkString("\n")
    s"${o.nFoundPages}/${o.words}/${o.error}\n$docs"
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "200000").toLong
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val idxDir = s"${sys.props("java.io.tmpdir")}/graft-sprobe-idx-$nDocs-p$parts"
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$nDocs"

    if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
      val s = session(32)
      graft.fixtures.PagesGen.pages(s, nDocs, parts = 32)
        .write.mode("overwrite").parquet(corpusPath)
      s.stop()
    }
    if (!new java.io.File(idxDir + "/CURRENT").exists()) {
      val s = session(32)
      graft.spark.IndexBuilder.build(s, s.read.parquet(corpusPath), idxDir,
        graft.spark.IndexBuilder.BuildConfig(bucketBits = 9))
      s.stop()
    }

    val s = session(cpus)
    try {
      val searcher = new graft.spark.SparkSearcher(s, idxDir, graft.text.Analyzer())
      val qs = benchQueries
      var ref: Seq[String] = null
      (0 until reps).foreach { r =>
        val t0 = System.nanoTime()
        val out = searcher.searchBatch(qs)
        val sec = (System.nanoTime() - t0) / 1e9
        val canon = out.map(canonical)
        if (ref == null) ref = canon
        else if (canon != ref) {
          canon.zip(ref).zipWithIndex.filter { case ((a, b), _) => a != b }.take(3)
            .foreach { case ((a, b), qi) =>
              System.err.println(s"[sprobe-DIVERGED] qi=$qi")
              System.err.println(s"  was: ${b.take(400)}")
              System.err.println(s"  now: ${a.take(400)}")
            }
          sys.error("searchBatch diverged across reps")
        }
        println(f"[sprobe] rep=$r sec=$sec%.3f qps=${qs.length / sec}%.2f hits=${out.map(_.docs.length).sum}")
      }
    } finally s.stop()
  }
}
