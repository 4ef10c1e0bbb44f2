package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits: the scale properties we claim must be visible in the
  * executed plans, not just intended — broadcast for small join sides,
  * filters reaching the parquet scan, column pruning, codegen coverage.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q3_join: small dimension side is broadcast, not shuffled") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("top_customers: broadcast join + partial aggregation before shuffle") {
    val p = plan("top_customers")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("HashAggregate"), "map-side partial agg expected")
  }

  test("tok_count: scan reads only the needed columns") {
    val p = plan("tok_count")
    // ReadSchema must not include the embedding-sized columns of documents
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("lang") && !read.contains("n_chars"), s"over-wide scan: $read")
  }

  test("dedup_exact: whole-stage codegen covers the aggregate") {
    // AQE finalizes the plan only on execution — run it, then inspect
    val df = SparkEntry.queries("dedup_exact")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" node prefixes mark whole-stage-codegen spans in the compact
    // rendering of the finalized adaptive plan
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(800))
  }

  test("ann brute force: native cosine expression in the plan, not a UDF") {
    val p = plan("ann_cosine_topk")
    assert(p.contains("graft_cosine") || p.contains("cosinesimilarity"),
      s"native expression missing: ${p.take(800)}")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      "UDF found in the ANN hot path")
  }

  test("dedup_embedding: LSH-bucket equi-join, never a cartesian product") {
    val df = SparkEntry.queries("dedup_embedding")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"O(N^2) join shape in the near-dup path: ${p.take(800)}")
    assert(p.contains("graft_cosine") || p.contains("cosinesimilarity"),
      "native cosine expression missing from the candidate scorer")
  }

  test("ann_ivf: list-id equi-join with broadcast probes, never a cartesian") {
    val df = SparkEntry.queries("ann_ivf_topk")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"O(N·Q) join shape in the IVF path: ${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"),
      s"probes/query-vector sides should broadcast: ${p.take(800)}")
    assert(p.contains("graft_cosine") || p.contains("cosinesimilarity"),
      "native cosine expression missing from the candidate scorer")
  }

  test("events_hourly: filter-free full agg still prunes to 3 columns") {
    val read = plan("events_hourly").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ts") && read.contains("event_type") && read.contains("value"), read)
    assert(!read.contains("user_id") && !read.contains("event_id"), s"over-wide scan: $read")
  }

  test("dedup_minhash_pairs: signature kernel materialized once, band join over ExistingRDD") {
    // r6 optimization: sig is eagerly checkpointed before the 4-band ×
    // 2-side fan-out — the band join's plan must reference the
    // materialized RDD, not re-embed the opaque md5 kernel (which would
    // execute it 4-8x over the corpus at scale)
    val df = SparkEntry.queries("dedup_minhash_pairs")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"band join should scan the checkpointed sig: ${p.take(800)}")
    assert(!p.contains("MapPartitions") && !p.contains("SerializeFromObject"),
      s"minhash kernel re-embedded in the band-join plan: ${p.take(800)}")
  }

  test("dedup_clusters: labels equal brute-force union-find over the candidate pairs") {
    // r6 optimization pinned: per-round eager checkpoints + single pairs
    // materialization must not change the fixpoint. Reference model:
    // textbook union-find over the same LSH candidate pairs, rep = min id.
    val pairs = SparkEntry.queries("dedup_minhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = SparkEntry.queries("dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty)
    got.foreach { case (doc, cluster, isRep) =>
      val expected = find(doc)
      assert(cluster == expected, s"doc $doc: cluster $cluster != union-find $expected")
      assert(isRep == (doc == cluster), s"doc $doc: is_rep flag wrong")
    }
    // ordered by doc_id, every doc exactly once
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    assert(got.map(_._1).distinct.length == got.length)
  }
}
