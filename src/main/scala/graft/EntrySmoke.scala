package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's flagship smoke: calls SparkEntry.entry and prints
  * the row count + first rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry-smoke] rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[entry-smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
