package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for declared queries (SparkEntry.queries)
  * to plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence
  * files (the judge reads these instead of running Spark).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [names...]
  *   outDir: e.g. plans/r06 ; suffix: before|after ; names: subset (default all)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r06"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val wanted: Set[String] = args.drop(2).toSet
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    qs.foreach { case (name, q) =>
      try {
        spark.sparkContext.setJobDescription(s"plandump:$name")
        val df = q(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
        java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $p (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
