package graft.ops

import graft.query.SearchOptions
import graft.spark.{IndexBuilder, SparkSearcher}
import graft.text.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fulltext-engine operators over the `documents` table: these exercise the
  * REAL distributed index (build → posting blocks → BM25 / positional
  * search) and are cross-checked against DuckDB SQL oracles that recompute
  * the same quantities from raw text.
  *
  * Oracle-parity profile: headers off, stemming off (a SQL oracle cannot
  * Porter2-stem), empty stopwords — so engine terms are exactly the
  * `\p{L}+|\p{N}+` tokens with the 3..32 length gate. docIds equal doc_ids
  * because urls are zero-padded doc_ids (order-preserving).
  */
object FtOps {

  private val TOKEN_RE = "\\p{L}+|\\p{N}+"
  val plainAnalyzer: Analyzer = Analyzer(enableStemming = false)

  // one built index per (jvm, sfDir); stage markers make rebuilds no-ops
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, SparkSearcher]()

  def searcherFor(spark: SparkSession, sfDir: String): SparkSearcher =
    cache.computeIfAbsent(sfDir, { _ =>
      val indexDir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft-ftidx-v2-" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)).toString
      val pages = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(
          format_string("doc://%06d", col("doc_id")).as("url"),
          lit(null).cast("timestamp").as("warc_ts"),
          lit(null).cast("binary").as("html"),
          col("text"),
          col("lang"))
      IndexBuilder.build(spark, pages, indexDir,
        IndexBuilder.BuildConfig(bucketBits = 4, includeHeaders = false, stemming = false))
      new SparkSearcher(spark, indexDir, plainAnalyzer)
    })

  private val toksSql =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$TOKEN_RE')) AS term
       |  FROM documents
       |), f AS (SELECT * FROM toks WHERE length(term) BETWEEN 3 AND 32)""".stripMargin

  /** full term dictionary from the ENGINE's termstats table. */
  val termStats = Op("ft_termstats",
    (s, dir) => searcherFor(s, dir).termStats.toDF()
      .select(col("term"), col("df"), col("cf")).orderBy("term"),
    Some(s"""WITH $toksSql
            |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            |FROM f GROUP BY term ORDER BY term""".stripMargin))

  /** histogram head (≙ reference CalcHistogram, Index.cs:284-307). */
  val topTerms = Op("ft_top_terms",
    (s, dir) => searcherFor(s, dir).termStats.toDF()
      .select(col("term"), col("cf")).orderBy(desc("cf"), col("term")).limit(50),
    Some(s"""WITH $toksSql
            |SELECT term, count(*) AS cf FROM f GROUP BY term
            |ORDER BY cf DESC, term LIMIT 50""".stripMargin))

  val bm25Query: Seq[String] = Seq("customer", "stream", "vector")

  /** BM25 top-10 from the engine's block-compressed index vs SQL recompute. */
  val bm25TopK = Op("ft_bm25_topk",
    (s, dir) => {
      import s.implicits._
      val sr = searcherFor(s, dir)
      val top = sr.bm25TopKBatch(Seq(bm25Query), 10).head
      top.toDF("doc_id", "score")
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(desc("score"), col("doc_id"))
    },
    Some {
      val terms = bm25Query.map(t => s"'$t'").mkString(", ")
      s"""WITH $toksSql,
         |dl AS (SELECT doc_id, count(*) AS dl FROM f GROUP BY doc_id),
         |stats AS (SELECT (SELECT count(*) FROM documents) AS n,
         |                 (SELECT avg(dl) FROM dl) AS avgdl),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM f WHERE term IN ($terms) GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM f WHERE term IN ($terms) GROUP BY 1),
         |sc AS (
         |  SELECT tf.doc_id,
         |         sum(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1) *
         |             (tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))) AS raw
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         |  GROUP BY tf.doc_id)
         |SELECT doc_id, round(raw, 6) AS score FROM sc
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    })

  /** doc-level AND via the positional engine (dist large enough to span any
    * document, so proximity-AND ≡ co-occurrence). */
  val searchAnd = Op("ft_search_and",
    (s, dir) => {
      import s.implicits._
      val sr = searcherFor(s, dir)
      val out = sr.search("customer vector", SearchOptions(dist = 100000), withWordInfo = false)
      out.docs.map(_.docId).sorted.toDF("doc_id")
    },
    Some("""SELECT doc_id FROM documents
           |WHERE regexp_matches(lower(text), '\bcustomer\b')
           |  AND regexp_matches(lower(text), '\bvector\b')
           |ORDER BY doc_id LIMIT 500""".stripMargin))

  /** phrase search (exact, ordered) — doc level. The reference's exact-mode
    * radius is len+4, which admits up to 4 separator chars (short/unindexed
    * tokens included); the oracle regexp mirrors that contract. */
  val searchPhrase = Op("ft_search_phrase",
    (s, dir) => {
      import s.implicits._
      val sr = searcherFor(s, dir)
      val out = sr.search("\"customer vector\"", SearchOptions(dist = 40), withWordInfo = false)
      out.docs.map(_.docId).sorted.toDF("doc_id")
    },
    Some("""SELECT doc_id FROM documents
           |WHERE regexp_matches(lower(text), '\bcustomer\b.{1,4}\bvector')
           |ORDER BY doc_id LIMIT 500""".stripMargin))

  /** doc-level OR via the `(a|b)` union operator (PosSeq `+` merge). */
  val searchOr = Op("ft_search_or",
    (s, dir) => {
      import s.implicits._
      val sr = searcherFor(s, dir)
      val out = sr.search("(customer|vector)", SearchOptions(dist = 100000), withWordInfo = false)
      out.docs.map(_.docId).sorted.toDF("doc_id")
    },
    Some("""SELECT doc_id FROM documents
           |WHERE regexp_matches(lower(text), '\bcustomer\b')
           |   OR regexp_matches(lower(text), '\bvector\b')
           |ORDER BY doc_id LIMIT 500""".stripMargin))

  /** `-filter:` doc-name regex (Search.cs filters): matched docs must also
    * have a name matching the regex; names here are `web:doc://%06d`. */
  val searchFilter = Op("ft_search_filter",
    (s, dir) => {
      import s.implicits._
      val sr = searcherFor(s, dir)
      val out = sr.search("customer -filter:00004", SearchOptions(dist = 100000), withWordInfo = false)
      out.docs.map(_.docId).sorted.toDF("doc_id")
    },
    Some("""SELECT doc_id FROM documents
           |WHERE regexp_matches(lower(text), '\bcustomer\b')
           |  AND regexp_matches(format('web:doc://{:06d}', doc_id), '00004')
           |ORDER BY doc_id LIMIT 500""".stripMargin))

  /** engine suggestions (term dictionary prefix scan ordered by cf desc,
    * mirroring Search.cs:176-188): completions of "va" = suffixes of terms
    * starting with "va", most-frequent first. */
  val suggest = Op("ft_suggest",
    (s, dir) => {
      import s.implicits._
      searcherFor(s, dir).suggest("va", 10).toDF("completion")
    },
    Some(s"""WITH $toksSql,
            |ts AS (SELECT term, count(*) AS cf FROM f GROUP BY term)
            |SELECT substr(term, 3) AS completion
            |FROM ts WHERE term LIKE 'va%' AND length(term) > 2
            |ORDER BY cf DESC, term LIMIT 10""".stripMargin))

  /** engine close-words (levenshtein over the term dictionary, ≙
    * GetCloseWords Search.cs) vs DuckDB's levenshtein over the same
    * recomputed dictionary. */
  val closeWords = Op("ft_close_words",
    (s, dir) => {
      import s.implicits._
      searcherFor(s, dir).closeWords("vectr", 10).toDF("term")
    },
    Some(s"""WITH $toksSql,
            |ts AS (SELECT DISTINCT term FROM f)
            |SELECT term FROM ts
            |ORDER BY levenshtein(term, 'vectr'), term LIMIT 10""".stripMargin))

  /** engine wildcard expansion (GetLikeWords: letter-first dictionary keys
    * matching an unanchored regex, ordinal order, cap). */
  val wildcard = Op("ft_wildcard",
    (s, dir) => {
      import s.implicits._
      searcherFor(s, dir).likeWords("ve.*r", 100).toDF("term")
    },
    Some(s"""WITH $toksSql,
            |ts AS (SELECT DISTINCT term FROM f)
            |SELECT term FROM ts
            |WHERE regexp_matches(term, 've.*r') AND regexp_matches(term, '^[[:alpha:]]')
            |ORDER BY term LIMIT 100""".stripMargin))

  val all: Seq[Op] = Seq(termStats, topTerms, bm25TopK, searchAnd, searchPhrase,
    searchOr, searchFilter, suggest, closeWords, wildcard)
}
