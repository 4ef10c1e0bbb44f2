package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark main for optimization-round evidence (guide §1.4) —
  * SEPARATE from the frozen graft.Bench harness: times every declared
  * query (SparkEntry.queries) individually, isolating computation from
  * the sink with the built-in noop writer, plus a `.count()` rep matching
  * the frozen bench's op-timing action. Prints one JSON line.
  *
  * Usage: runMain graft.BenchExtra [names...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, GRAFT_BENCHX_REPS (default 2).
  */
object BenchExtra {

  /** raw-thread tokenize throughput (docs/s) — same workload as the
    * frozen bench's hw probe, so `build_dps / hw_dps` is a
    * host-normalized build number (r5 VERDICT #2: driver records swung
    * 9.7–28.4k dps across windows on identical code; the QUOTIENT should
    * hold ±10% while raw dps swings with host supply). */
  private def hwTokenizeDps(threads: Int): Double = {
    val an = graft.text.Analyzer()
    val bodies = (0 until 64).map(i => graft.fixtures.PagesGen.bodyFor(i.toLong))
    val per = 300
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        val cache = new graft.core.DocTokenizer.CodeCache(an)
        var i = 0
        while (i < per) {
          graft.core.DocTokenizer.indexGrouped(an, "", Seq(("1", bodies((t + i) % bodies.length))), cache)
          i += 1
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    threads * per / ((System.nanoTime() - t0) / 1e9)
  }

  /** `--build-ab`: interleave N (build @c[cpus], hw probe) pairs on the
    * bench corpus and report per-window raw dps + normalized quotient. */
  private def buildAb(cpus: Int, rounds: Int): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "200000").toLong
    val corpusPath = s"${sys.props("java.io.tmpdir")}/graft-bench-corpus-$nDocs"
    val rows = (0 until rounds).map { r =>
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").appName(s"graft-benchx-build-$r")
        .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
        .config("spark.ui.enabled", "false")
        .config("spark.io.compression.codec", "zstd")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        if (!new java.io.File(corpusPath + "/_SUCCESS").exists()) {
          graft.fixtures.PagesGen.pages(spark, nDocs, parts = math.max(cpus * 2, 16))
            .write.mode("overwrite").parquet(corpusPath)
        }
        val idxDir = s"${sys.props("java.io.tmpdir")}/graft-benchx-idx"
        def rmrf(p: String): Unit = {
          def walk(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
            f.delete()
          }
          walk(new java.io.File(p))
        }
        rmrf(idxDir)
        val pages = spark.read.parquet(corpusPath)
        val t0 = System.nanoTime()
        graft.spark.IndexBuilder.build(spark, pages, idxDir,
          graft.spark.IndexBuilder.BuildConfig(bucketBits = 9))
        val dps = nDocs / ((System.nanoTime() - t0) / 1e9)
        hwTokenizeDps(2) // warm
        val hw = (0 until 2).map(_ => hwTokenizeDps(cpus)).max
        System.err.println(f"[benchextra] build r$r dps=$dps%.0f hw_dps=$hw%.0f norm=${dps / hw}%.4f")
        (dps, hw)
      } finally spark.stop()
    }
    val json = rows.zipWithIndex.map { case ((d, h), i) =>
      f""""r$i":{"build_dps":$d%.1f,"hw_tokenize_dps":$h%.1f,"build_dps_per_hw_dps":${d / h}%.4f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"graft benchextra build-ab","cpus":$cpus,"rounds":$json}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCHX_REPS", "2").toInt
    if (args.headOption.contains("--build-ab")) {
      buildAb(cpus, args.lift(1).map(_.toInt).getOrElse(2))
      return
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_SPARK_LOCAL_DIR", sys.props("java.io.tmpdir")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted: Set[String] = args.toSet
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    // codegen/classload warmup so the first timed op isn't charged for it
    spark.range(100).selectExpr("sum(id)").collect()
    val rows = qs.map { case (name, q) =>
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      // one count rep (frozen-bench parity), then noop reps (full
      // materialization of every column, no sink cost)
      val t0 = System.nanoTime()
      val ok = try { q(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[benchextra] $name FAILED: $e"); false
      }
      val countSec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      var noopSec = -1.0
      if (ok) {
        var r = 0
        noopSec = Double.MaxValue
        while (r < reps) {
          val t1 = System.nanoTime()
          q(spark, sfDir).write.format("noop").mode("overwrite").save()
          noopSec = math.min(noopSec, (System.nanoTime() - t1) / 1e9)
          r += 1
        }
      }
      spark.sparkContext.setJobDescription(null)
      System.err.println(f"[benchextra] $name%-20s count=$countSec%7.3f noop_best=$noopSec%7.3f")
      (name, countSec, noopSec)
    }
    val json = rows.map { case (n, c, p) =>
      f""""$n":{"count_sec":$c%.3f,"noop_best_sec":$p%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"graft benchextra per-op","unit":"sec","cpus":$cpus,"sf":"$sfDir","ops":$json}""")
    spark.stop()
  }
}
