package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: does a >10-literal isin (optimized to InSet) produce a
  * codegen source that is stable across different value sets — i.e. is the
  * Janino compile paid once per JVM or once per query batch? Prints the
  * wall time of the same count with three different 6k-term sets; a stable
  * source makes runs 2-3 as fast as run 1. */
object InSetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("inset-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 2000000).select(concat(lit("t"), $"id" % 50000).as("term"))
    df.cache(); df.count()
    def run(tag: String, off: Int): Unit = {
      val set = (0 until 6000).map(i => s"t${i + off}")
      val m0 = org.apache.spark.sql.execution.metric.SQLMetrics // touch
      val t0 = System.nanoTime()
      val n = df.filter($"term".isInCollection(set)).count()
      println(f"[inset-probe] $tag n=$n wall=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    run("warmup-small", 0)
    run("setA", 0)
    run("setB", 7000)
    run("setC", 14000)
    // compare: identical set again
    run("setA2", 0)
    spark.stop()
  }
}
