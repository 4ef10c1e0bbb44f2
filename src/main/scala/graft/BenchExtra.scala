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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCHX_REPS", "2").toInt
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
