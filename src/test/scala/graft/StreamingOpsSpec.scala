package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{SessionEvent, SessionOut}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming pipeline-op shapes: watermarked windowed
  * aggregation and flatMapGroupsWithState sessionization with event-time
  * timeouts, driven through MemoryStream micro-batches.
  */
class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  test("watermarked hourly counts finalize once the watermark passes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.hourlyCounts(df, watermark = "0 seconds")
      .writeStream.format("memory").queryName("hourly").outputMode("append").start()
    try {
      // three events inside one hour, two types
      mem.addData((ts(1), "click", 1.5), (ts(20), "click", 2.0), (ts(40), "view", 3.25))
      q.processAllAvailable()
      // far-future event pushes the watermark past the first hour
      mem.addData((ts(600), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts(1200), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
        .toSet
      assert(rows.contains(("click", 2L, 3.5)), rows.toString)
      assert(rows.contains(("view", 1L, 3.25)), rows.toString)
    } finally q.stop()
  }

  test("watermarked streaming dedup drops re-ingested duplicates, keeps state bounded") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = StreamingOps.dedupByFingerprint(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      // in-batch duplicate + a distinct doc
      mem.addData((ts(0), "alpha body"), (ts(1), "alpha body"), (ts(2), "beta body"))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon → dropped
      mem.addData((ts(3), "alpha body"), (ts(4), "gamma body"))
      q.processAllAvailable()
      val texts = spark.table("deduped").collect()
        .map(_.getAs[String]("text")).groupBy(identity).view.mapValues(_.length).toMap
      assert(texts == Map("alpha body" -> 1, "beta body" -> 1, "gamma body" -> 1), texts.toString)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches batch gap semantics") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = StreamingOps.sessionize(mem.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session) …
      mem.addData(SessionEvent(1L, 1L, ts(0)), SessionEvent(1L, 2L, ts(10)))
      q.processAllAvailable()
      // … then an event 45 min after the last → gap > 30 min closes it
      mem.addData(SessionEvent(1L, 3L, ts(55)), SessionEvent(2L, 4L, ts(56)))
      q.processAllAvailable()
      def sessions: Set[(Long, Long, Long, Long)] = spark.table("sessions")
        .as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events)).toSet
      assert(sessions.contains((1L, ts(0).getTime, ts(10).getTime, 2L)), sessions.toString)
      // a far-future event advances the watermark; event-time timeouts then
      // close the remaining open sessions on the following trigger
      mem.addData(SessionEvent(3L, 5L, ts(600)))
      q.processAllAvailable()
      mem.addData(SessionEvent(3L, 6L, ts(1200)))
      q.processAllAvailable()
      assert(sessions.contains((1L, ts(55).getTime, ts(55).getTime, 1L)), sessions.toString)
      assert(sessions.contains((2L, ts(56).getTime, ts(56).getTime, 1L)), sessions.toString)
    } finally q.stop()
  }
}
