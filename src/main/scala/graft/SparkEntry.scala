package graft

import graft.ops.{FtOps, Ops}
import graft.query.SearchOptions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship end-to-end slice: generate a synthetic
  * Common-Crawl-style corpus, build the distributed inverted index
  * (extract → tokenize → salted posting blocks → snapshot commit), then
  * run a phrase search and BM25 top-k over it.
  *
  * `queries`/`oracleSql` register every operator with a DuckDB-verifiable
  * contract; engine-internal operators (positions, snippets, WAND) are
  * verified by `sbt -batch test` (rank-identity + golden query set).
  */
object SparkEntry {

  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val pages = graft.fixtures.PagesGen.pages(spark, 120, parts = 4)
    graft.spark.IndexBuilder.build(spark, pages.toDF(), dir,
      graft.spark.IndexBuilder.BuildConfig(bucketBits = 4))
    val searcher = new graft.spark.SparkSearcher(spark, dir, graft.text.Analyzer())
    val out = searcher.search("\"old lady\"", SearchOptions(dist = 40), withWordInfo = false)
    out.docs.map(d => (d.docId, d.name, d.rank, d.bm25, d.pages.length)).toSeq
      .toDF("doc_id", "name", "rank", "bm25", "n_pages")
  }

  private def allOps: Seq[graft.ops.Op] = FtOps.all ++ Ops.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.query).toMap

  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
