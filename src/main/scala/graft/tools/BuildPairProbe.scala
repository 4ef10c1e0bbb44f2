package graft.tools

import org.apache.spark.sql.SparkSession

/** Fast-iteration probe for the index-build scaling pair: builds the SAME
  * corpus at local[lo] and local[hi] in one JVM (warm JIT for both legs),
  * alternating leg order per rep. With GRAFT_TIMING=1 the IndexBuilder's
  * per-stage marks (stage1-doctext .. stage4-termstats) land on stderr
  * between the [bpair] leg=... begin/end lines, giving the per-stage
  * c-lo vs c-hi decomposition the 8->32 writeup is built from.
  *
  * Usage: GRAFT_PROBE_DOCS=1000000 GRAFT_PROBE_LO=8 GRAFT_PROBE_HI=32
  *        GRAFT_PROBE_PAIRS=3 sbt "runMain graft.tools.BuildPairProbe"
  */
object BuildPairProbe {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bprobe-$cpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PROBE_PARTS",
          math.max(cpus, 8).toString)) // same parts on BOTH legs via env = identical per-task work
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
            f"[bprobe-stg] ${i.stageId}%3d wall=$secs%7.2fs tasks=${i.numTasks}%3d cpu=${m.executorCpuTime / 1e9}%7.2fs run=${m.executorRunTime / 1e3}%7.2fs gc=${m.jvmGCTime / 1e3}%5.2fs sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.0fMB sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%6.0fMB in=${m.inputMetrics.bytesRead / 1e6}%6.0fMB out=${m.outputMetrics.bytesWritten / 1e6}%6.0fMB ${i.name.take(46)}")
        }
      })
    s
  }

  private def rmrf(p: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(p))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "200000").toLong
    val loC = sys.env.getOrElse("GRAFT_PROBE_LO", "8").toInt
    val hiC = sys.env.getOrElse("GRAFT_PROBE_HI", "32").toInt
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$nDocs"
    if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
      val s = session(32)
      graft.fixtures.PagesGen.pages(s, nDocs, parts = 64)
        .write.mode("overwrite").parquet(corpusPath)
      s.stop()
    }

    def leg(cpus: Int): Double = {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft-bprobe-idx-$cpus"
      rmrf(idxDir)
      val s = session(cpus)
      try {
        System.err.println(s"[bpair] leg=c$cpus begin")
        val t0 = System.nanoTime()
        graft.spark.IndexBuilder.build(s, s.read.parquet(corpusPath), idxDir,
          graft.spark.IndexBuilder.BuildConfig(bucketBits = 9))
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bpair] leg=c$cpus end sec=$sec%.2f")
        sec
      } finally { s.stop(); rmrf(idxDir) }
    }

    // JIT/classload warm: one small build so neither leg pays first-build costs
    locally {
      val s = session(hiC)
      val warm = s"${sys.props("java.io.tmpdir")}/graft-bprobe-warm"
      rmrf(warm)
      try graft.spark.IndexBuilder.build(s,
        graft.fixtures.PagesGen.pages(s, 300, parts = 4).toDF(), warm,
        graft.spark.IndexBuilder.BuildConfig(bucketBits = 9))
      finally { s.stop(); rmrf(warm) }
    }

    val ratio = hiC.toDouble / loC
    (0 until sys.env.getOrElse("GRAFT_PROBE_PAIRS", "3").toInt).foreach { i =>
      val (tLo, tHi) =
        if (i % 2 == 0) { val a = leg(loC); val b = leg(hiC); (a, b) }
        else { val b = leg(hiC); val a = leg(loC); (a, b) }
      println(f"[bpair] rep=$i c$loC=${tLo}%.2fs (${nDocs / tLo}%.0f dps)  c$hiC=${tHi}%.2fs (${nDocs / tHi}%.0f dps)  eff=${tLo / (ratio * tHi)}%.3f")
    }
  }
}
