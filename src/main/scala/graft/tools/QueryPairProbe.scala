package graft.tools

import org.apache.spark.sql.SparkSession

/** Fast-iteration probe for the BM25 batch query scaling pair: builds the
  * 24-shard index ONCE (at full parallelism), then measures the HOT batch
  * at local[lo] and local[hi] in the same JVM (the ContribCache is
  * JVM-global, so both legs serve from the identical decoded shards —
  * this isolates scorer + driver-tail scaling from build noise).
  *
  * Usage: GRAFT_PROBE_DOCS=400000 GRAFT_PROBE_QUERIES=96000
  *        GRAFT_PROBE_REPS=3 sbt "runMain graft.tools.QueryPairProbe"
  * Legs default to the headline 2-vs-8 pair; GRAFT_PROBE_LO / GRAFT_PROBE_HI
  * select others (8/32 for the oversubscribed raw pair).
  */
object QueryPairProbe {

  private def parts: Int = sys.env.getOrElse("GRAFT_PROBE_PARTS", "24").toInt

  private def session(cpus: Int): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-qprobe-$cpus")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_SPARK_LOCAL_DIR", sys.props("java.io.tmpdir")))
      .config("spark.serializer",
        sys.env.getOrElse("GRAFT_SERIALIZER", "org.apache.spark.serializer.KryoSerializer"))
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_TIMING"))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val secs = (for (a <- i.completionTime; b <- i.submissionTime) yield (a - b) / 1e3).getOrElse(-1.0)
          val m = i.taskMetrics
          System.err.println(
            f"[qprobe-stg] ${i.stageId}%3d wall=$secs%6.2fs tasks=${i.numTasks}%3d cpu=${m.executorCpuTime / 1e9}%6.2fs run=${m.executorRunTime / 1e3}%6.2fs deser=${m.executorDeserializeTime / 1e3}%5.2fs resSer=${m.resultSerializationTime / 1e3}%5.2fs resBytes=${m.resultSize / 1e6}%6.1fMB ${i.name.take(50)}")
        }
      })
    s
  }

  // the bench's exact workload — reused, not copied, so a tweak to the
  // bench distribution can never silently desynchronize the probe
  private def queryBatch(n: Int): Seq[Seq[String]] = graft.Bench.queryBatch(n)

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "400000").toLong
    val nQueries = sys.env.getOrElse("GRAFT_PROBE_QUERIES", "96000").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val idxDir = s"${sys.props("java.io.tmpdir")}/graft-qprobe-idx-$nDocs-p$parts"
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
    val qs = queryBatch(nQueries)

    def leg(cpus: Int): Double = {
      val s = session(cpus)
      try {
        val searcher = new graft.spark.SparkSearcher(s, idxDir, graft.text.Analyzer())
        searcher.bm25TopKBatch(qs.take(8), 10)
        searcher.bm25TopKBatch(qs, 10) // populate / re-touch cache
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          searcher.bm25TopKBatch(qs, 10)
          (System.nanoTime() - t0) / 1e9
        }
        times.min
      } finally s.stop()
    }

    val loC = sys.env.getOrElse("GRAFT_PROBE_LO", "2").toInt
    val hiC = sys.env.getOrElse("GRAFT_PROBE_HI", "8").toInt
    val ratio = hiC.toDouble / loC
    (0 until sys.env.getOrElse("GRAFT_PROBE_PAIRS", "3").toInt).foreach { i =>
      val tLo = leg(loC)
      val tHi = leg(hiC)
      println(f"[qpair] rep=$i c$loC=${tLo}%.3fs (${nQueries / tLo}%.0f qps)  c$hiC=${tHi}%.3fs (${nQueries / tHi}%.0f qps)  eff=${tLo / (ratio * tHi)}%.3f")
    }
  }
}
