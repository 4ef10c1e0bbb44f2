package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A registered operator: a Spark query plus (when SQL-expressible) an ANSI
  * SQL oracle that DuckDB runs over the same parquet tables. Column names
  * match exactly on both sides; every result carries a deterministic total
  * ORDER BY; floats are rounded identically.
  */
final case class Op(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Training-data-pipeline operators over the `documents` / `embeddings` /
  * `events` tables: text analysis, deduplication, similarity search,
  * sessionization. All are DataFrame/Dataset plans (codegen, pushdown;
  * typed mapPartitions where a per-row kernel beats exploded rows) — no
  * unbounded driver collects (the IVF quantizer pulls √N centroid rows,
  * the one bounded exception).
  */
object Ops {

  private val TOKEN_RE = "\\p{L}+|\\p{N}+"          // DuckDB literal
  private val TOKEN_RE_SQL = "\\\\p{L}+|\\\\p{N}+" // Spark SQL literal (escape processed)

  /** stopword set for quality/lang scoring (fixed, mirrored in SQL). */
  private val stopSet = Seq("the", "a", "of", "and", "to")
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val toksSql =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$TOKEN_RE')) AS term
       |  FROM documents
       |), f AS (SELECT * FROM toks WHERE length(term) BETWEEN 3 AND 32)""".stripMargin

  // ---------- text analysis ----------

  /** GPT-2-style pretokenizer pattern (RE2-safe: no lookahead), shared
    * verbatim by both engines: contraction tails, space+letter runs,
    * space+digit runs, space+punct runs. */
  private val BPE_RE = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"
  private val BPE_RE_SQL = BPE_RE.replace("'", "''")

  val tokenCount = Op("tok_count",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_ws"),
      size(expr(s"filter(regexp_extract_all(lower(text), '$TOKEN_RE_SQL', 0), t -> length(t) between 3 and 32)"))
        .cast("long").as("n_tok"),
      // BPE-ish count: what a GPT-2-style pretokenizer would emit — the
      // pattern literal bypasses Spark SQL string escaping via lit()
      size(regexp_extract_all(col("text"), lit(BPE_RE), lit(0))).cast("long").as("n_tok_bpe"))
      .orderBy("doc_id"),
    Some(s"""WITH $toksSql,
            |tk AS (SELECT doc_id, count(*) AS n_tok FROM f GROUP BY doc_id)
            |SELECT d.doc_id,
            |       len(regexp_extract_all(d.text, '\\S+')) AS n_ws,
            |       coalesce(tk.n_tok, 0) AS n_tok,
            |       len(regexp_extract_all(d.text, '$BPE_RE_SQL', 0)) AS n_tok_bpe
            |FROM documents d LEFT JOIN tk USING (doc_id) ORDER BY d.doc_id""".stripMargin))

  /** token-array expression shared by the scalar-form text ops: same
    * tokens as `toks` (regex + 3..32 length gate) but as a per-row array —
    * higher-order functions instead of explode+groupBy+join turn these
    * ops into ONE codegen'd projection with zero shuffles. */
  private def tokArr = expr(
    s"filter(regexp_extract_all(lower(text), '$TOKEN_RE_SQL', 0), t -> length(t) between 3 and 32)")

  /** Scale-adaptive parallelism for CPU-heavy per-row kernels (guide §2):
    * a small corpus arrives as ONE parquet split, so a mapPartitions
    * kernel (minhash/simhash md5, IVF assignment) runs single-threaded
    * while every other core idles. Spread it round-robin only when the
    * scan yields fewer partitions than cores; at real scale the input
    * already has ≫cores splits and this adds NO exchange. */
  private def spread(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val p = df.rdd.getNumPartitions
    if (p > 0 && p < cores) df.repartition(cores) else df
  }

  /** Strict-'>' argmax over per-language score columns (first language in
    * `langs` order wins ties) — ONE definition for both language-ID ops:
    * the tie-break is golden-pinned and a fix applied to a single copy
    * would silently desynchronize ops documented as identical. */
  private def argmaxLang(langs: Seq[String]): org.apache.spark.sql.Column =
    langs.foldLeft((lit(-1L), lit("und"))) { case ((bs, bl), l) =>
      val better = col(s"s_$l") > bs
      (when(better, col(s"s_$l")).otherwise(bs), when(better, lit(l)).otherwise(bl))
    }._2

  val qualityScore = Op("quality_score",
    (s, dir) => {
      val stopList = stopSet.map(w => s"'$w'").mkString(", ")
      // Tokenize ONCE: the single-projection form embedded the tokenize
      // regex in four sibling expressions (n_tok, avg_len numerator,
      // stop_ratio filter, each `when` guard) — a two-step projection
      // materializes the token array per row and every stat reads the
      // alias (Catalyst keeps the split: CollapseProject refuses to
      // duplicate non-cheap expressions). Same values bit-for-bit; noop
      // sink 1.13 s → see OPTIMIZATION_r06.md.
      val nt = size(col("toks"))
      // NULL stats for token-less docs, as the grouped form's LEFT JOIN gave
      docs(s, dir)
        .select(col("doc_id"), col("n_chars"), col("text"), tokArr.as("toks"))
        .select(col("doc_id"), col("n_chars"),
          // n_chars = 0 guard: Spark non-ANSI division yields NULL but
          // DuckDB's IEEE float ops yield inf/NaN — pin both engines to
          // NULL for an empty doc (see the matching CASE in the oracle)
          when(col("n_chars") > 0,
            round(size(regexp_extract_all(col("text"), lit("[^\\sa-zA-Z0-9]"), lit(0)))
              .cast("double") / col("n_chars"), 4)).as("punct_ratio"),
          when(nt > 0, nt.cast("long")).as("n_tok"),
          when(nt > 0, round(
            expr("aggregate(transform(toks, t -> length(t)), 0L, (acc, x) -> acc + x)")
              .cast("double") / nt, 4)).as("avg_len"),
          when(nt > 0, round(
            expr(s"size(filter(toks, t -> t IN ($stopList)))")
              .cast("double") / nt, 4)).as("stop_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $toksSql,
            |st AS (
            |  SELECT doc_id, count(*) AS n_tok, round(avg(length(term)), 4) AS avg_len,
            |         round(sum(CASE WHEN term IN ('the','a','of','and','to') THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS stop_ratio
            |  FROM f GROUP BY doc_id)
            |SELECT d.doc_id, d.n_chars,
            |       CASE WHEN d.n_chars > 0 THEN round(len(regexp_extract_all(d.text, '[^\\sa-zA-Z0-9]', 0))::DOUBLE / d.n_chars, 4) END AS punct_ratio,
            |       st.n_tok, st.avg_len, st.stop_ratio
            |FROM documents d LEFT JOIN st USING (doc_id) ORDER BY d.doc_id""".stripMargin))

  /** marker-word language heuristic (deterministic; verifies the operator,
    * not label accuracy — the synthetic corpus has no real language signal). */
  val langId = Op("lang_id",
    (s, dir) => {
      val markers = Map(
        "en" -> Seq("the", "and", "this", "that"),
        "de" -> Seq("der", "die", "das", "und"),
        "es" -> Seq("los", "las", "que", "con"),
        "fr" -> Seq("les", "des", "est", "avec"))
      // scalar form of the grouped marker sums: per-language count over the
      // per-row token array — one projection, zero shuffles. The grouped
      // form dropped token-less docs (no rows to group), so filter n>0.
      // Tokenize ONCE (same two-step-projection rationale as
      // quality_score): the old form re-ran the tokenize regex per
      // language column plus once more in the filter — 5× per row.
      val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
        val list = ws.map(w => s"'$w'").mkString(", ")
        expr(s"size(filter(toks, t -> t IN ($list)))")
          .cast("long").as(s"s_$lang")
      }
      val scored = docs(s, dir)
        .select(col("doc_id"), tokArr.as("toks"))
        .filter(size(col("toks")) > 0)
        .select((col("doc_id") +: scoreCols): _*)
      val withPred = scored.withColumn("pred", argmaxLang(markers.keys.toSeq.sorted))
      withPred.select(col("doc_id"), col("pred")).orderBy("doc_id")
    },
    Some(s"""WITH $toksSql,
            |sc AS (
            |  SELECT doc_id,
            |    sum(CASE WHEN term IN ('der','die','das','und') THEN 1 ELSE 0 END) AS s_de,
            |    sum(CASE WHEN term IN ('the','and','this','that') THEN 1 ELSE 0 END) AS s_en,
            |    sum(CASE WHEN term IN ('los','las','que','con') THEN 1 ELSE 0 END) AS s_es,
            |    sum(CASE WHEN term IN ('les','des','est','avec') THEN 1 ELSE 0 END) AS s_fr
            |  FROM f GROUP BY doc_id)
            |SELECT doc_id,
            |  CASE
            |    WHEN s_fr > s_es AND s_fr > s_en AND s_fr > s_de THEN 'fr'
            |    WHEN s_es > s_en AND s_es > s_de THEN 'es'
            |    WHEN s_en > s_de THEN 'en'
            |    WHEN s_de > -1 THEN 'de'
            |  END AS pred
            |FROM sc ORDER BY doc_id""".stripMargin))

  /** character n-gram profiles per language (common high-frequency char
    * n-grams, public knowledge; ASCII-only so char semantics agree across
    * engines). Shared verbatim by the Spark plan and the oracle. */
  private val ngramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " die ", " und ", " ein", "ich ", "sch", " zu "),
    "en" -> Seq(" the ", " and ", " of ", " to ", "ing ", "tion", " in "),
    "es" -> Seq(" que ", " los ", " las ", " con ", " por ", " una ", "cion"),
    "fr" -> Seq(" les ", " des ", " est ", " une ", " dans ", " qui ", " pas "))

  /** character-n-gram language ID: per-language score = total occurrence
    * count of its profile n-grams (substring count via the length-delta
    * trick — non-overlapping, identical in both engines). Pure scalar
    * expressions per row: NO tokenize explode, NO groupBy — one codegen'd
    * projection however wide the corpus. Like lang_id this verifies the
    * operator, not label accuracy (synthetic corpus has no real language
    * signal); the argmax tie order matches lang_id (de<en<es<fr). */
  val langIdNgram = Op("lang_id_ngram",
    (s, dir) => {
      // lower(text) materialized ONCE (28 gram expressions read the
      // alias), and literal substring deletion via `replace` instead of a
      // Pattern.quote'd regexp_replace — the pattern was literal anyway,
      // so the count is identical while skipping 28 regex-engine passes
      // per row (the DuckDB oracle already uses replace()).
      val lt = col("lt")
      def score(grams: Seq[String]) = grams.map { g =>
        val gq = g.replace("'", "''")
        ((length(lt) - length(expr(s"replace(lt, '$gq', '')"))) / lit(g.length)).cast("long")
      }.reduce(_ + _)
      val scored = docs(s, dir)
        .select(col("doc_id"), lower(col("text")).as("lt"))
        .select(
          (col("doc_id") +: ngramProfiles.map { case (l, gs) => score(gs).as(s"s_$l") }): _*)
      val pred = argmaxLang(ngramProfiles.map(_._1))
      scored.select(col("doc_id"), pred.as("pred")).orderBy("doc_id")
    },
    Some {
      val scores = ngramProfiles.map { case (l, gs) =>
        gs.map(g =>
          s"(length(lt) - length(replace(lt, '${g.replace("'", "''")}', ''))) // ${g.length}")
          .mkString("(", " + ", s") AS s_$l")
      }.mkString(",\n    ")
      s"""WITH lo AS (SELECT doc_id, lower(text) AS lt FROM documents),
         |sc AS (SELECT doc_id,
         |    $scores
         |  FROM lo)
         |SELECT doc_id,
         |  CASE
         |    WHEN s_fr > s_es AND s_fr > s_en AND s_fr > s_de THEN 'fr'
         |    WHEN s_es > s_en AND s_es > s_de THEN 'es'
         |    WHEN s_en > s_de THEN 'en'
         |    WHEN s_de > -1 THEN 'de'
         |  END AS pred
         |FROM sc ORDER BY doc_id""".stripMargin
    })

  /** document fingerprints: md5 of whitespace-normalized lowercase text,
    * plus a polynomial ROLLING hash (base 31 mod 1e9+7 over the raw byte
    * sequence) — the incremental-update form a streaming pipeline can
    * maintain per chunk. Identical fold order on both engines. */
  val fingerprint = Op("fingerprint",
    (s, dir) => docs(s, dir).select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, c) => (acc * 31 + c) % 1000000007L).as("fp_roll"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
           |  list_reduce(
           |    list_prepend(0::BIGINT, list_transform(string_split(text, ''), x -> ord(x)::BIGINT)),
           |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp_roll
           |FROM documents ORDER BY doc_id""".stripMargin))

  // ---------- deduplication ----------

  val dedupExact = Op("dedup_exact",
    (s, dir) => docs(s, dir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes")),
    Some("""SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct,
           |count(*) - count(DISTINCT md5(text)) AS n_dupes FROM documents""".stripMargin))

  /** word 3-gram shingles (Spark side). `only` (when given) is
    * broadcast-semi-joined BEFORE tokenize+explode, so just those docs pay
    * the shingle explode + distinct — the exact-jaccard verifier needs
    * shingles for candidate docs only, never the corpus. */
  private def shingles(s: SparkSession, dir: String,
                       only: Option[DataFrame] = None): DataFrame = {
    val base = only.fold(docs(s, dir))(f =>
      docs(s, dir).join(broadcast(f), Seq("doc_id"), "left_semi"))
    base.select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$TOKEN_RE_SQL', 0)").as("t"))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t)-3), i -> concat_ws(' ', slice(t, i+1, 3))) ELSE array() END")).as("sh"))
      .distinct()
  }

  private val shinglesSql =
    s"""sh0 AS (SELECT doc_id, regexp_extract_all(lower(text), '$TOKEN_RE') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
       |  FROM sh0 CROSS JOIN LATERAL (SELECT unnest(range(1, greatest(len(t)-1, 1))) AS i) g
       |)""".stripMargin

  /** first 15 hex chars of md5 as an unsigned 60-bit value — identical to
    * Spark `conv(substring(md5(s),1,15),16,10)::long` and DuckDB
    * `('0x' || substr(md5(s),1,15))::BIGINT` (first 8 digest bytes as a
    * big-endian u64, low nibble dropped). */
  private[graft] def md5Prefix15(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
  }

  /** MinHash signatures: 8 seeded md5-derived min-hashes over 3-gram word
    * shingles (shingle→minhash; the LSH band join is dedup_minhash_pairs).
    * Computed per-doc MAP-SIDE in one pass — the explode+distinct+groupBy
    * formulation shuffles ~10× the corpus TWICE, and min over a doc's
    * shingle multiset equals min over its distinct set, so neither shuffle
    * buys anything. Values are bit-identical to the SQL formulation
    * (md5Prefix15); docs with <3 tokens have no shingles and no row, as in
    * the grouped form. */
  /** Unordered per-doc minhash signatures — the kernel shared by
    * dedup_minhash_sig (which adds the declared ORDER BY) and
    * dedup_minhash_pairs/clusters/jaccard (which materialize it once and
    * must NOT pay the declared sort's range partitioning). */
  private def minhashSigRaw(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      // NOT spread (A/B'd both ways): spreading the md5 kernel means
      // round-robin-shuffling the TEXT column — at sf scale that exchange
      // plus its codegen unit costs about what the parallelized kernel
      // saves, with high window variance (count 0.27–1.33 s vs 0.48–0.80
      // unspread). The embedding-side ops keep spread(): their payload is
      // ~1 MB of vectors against a far heavier dot-product kernel.
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val m = java.util.regex.Pattern.compile(TOKEN_RE).matcher("")
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val toks = scala.collection.mutable.ArrayBuffer.empty[String]
            m.reset(text.toLowerCase(java.util.Locale.ROOT))
            while (m.find()) toks += m.group()
            if (toks.length < 3) None
            else {
              val mins = Array.fill(8)(Long.MaxValue)
              var i = 0
              while (i + 2 < toks.length) {
                val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
                var seed = 0
                while (seed < 8) {
                  val h = md5Prefix15(md, "s" + seed + "|" + sh)
                  if (h < mins(seed)) mins(seed) = h
                  seed += 1
                }
                i += 1
              }
              Some((id, mins(0), mins(1), mins(2), mins(3),
                mins(4), mins(5), mins(6), mins(7)))
            }
          }
        }.toDF("doc_id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5", "mh6", "mh7")
  }

  val minhashSig = Op("dedup_minhash_sig",
    (s, dir) => minhashSigRaw(s, dir).orderBy("doc_id"),
    Some {
      val cols = (0 until 8).map(seed =>
        s"min(('0x' || substr(md5('s$seed|' || sh), 1, 15))::BIGINT) AS mh$seed").mkString(",\n    ")
      s"""WITH $shinglesSql
         |SELECT doc_id,
         |    $cols
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin
    })

  /** LSH band join: 4 bands × 2 rows; candidate pairs sharing any band. */
  val minhashPairs = Op("dedup_minhash_pairs",
    (s, dir) => {
      // materialize the signatures ONCE: the minhash kernel is an opaque
      // mapPartitions (no Exchange for ReuseExchange to dedup), and sig is
      // referenced by 4 band branches × 2 self-join sides — without the
      // eager checkpoint the 8-md5-per-shingle kernel executes 4–8x over
      // the full corpus. The checkpointed frame is doc_id + 8 longs (≪
      // text), so the barrier is cheap at any scale. Uses the UNORDERED
      // sig — the declared op's ORDER BY would otherwise add a range sort
      // to the materialization (the band join doesn't need it).
      val sig = minhashSigRaw(s, dir).localCheckpoint(true)
      val bands = (0 until 4).map(b =>
        sig.select(col("doc_id"), lit(b).as("band"),
          md5(concat_ws("_", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("bh")))
        .reduce(_ unionAll _)
      bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
        .orderBy("a", "b")
    },
    Some {
      val cols = (0 until 8).map(seed =>
        s"min(('0x' || substr(md5('s$seed|' || sh), 1, 15))::BIGINT) AS mh$seed").mkString(", ")
      val bandSel = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '_' || mh${2 * b + 1}) AS bh FROM sig").mkString("\n  UNION ALL\n  ")
      s"""WITH $shinglesSql,
         |sig AS (SELECT doc_id, $cols FROM sh GROUP BY doc_id),
         |bands AS (
         |  $bandSel
         |)
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
         |ORDER BY a, b""".stripMargin
    })

  /** 32-bit SimHash over md5-derived token hashes. Computed per-doc
    * MAP-SIDE (a doc's bit sums need only its own tokens — the exploded
    * groupBy form shuffles every token of the corpus for nothing). Values
    * bit-identical to the SQL formulation; docs with no 3..32-length
    * tokens have no row, as in the grouped form. */
  val simhash = Op("dedup_simhash",
    (s, dir) => {
      import s.implicits._
      // NOT spread: simhash is ONE md5 per token (vs minhash's 8 per
      // shingle) — measured A/B, the round-robin text shuffle cost more
      // than the kernel saved (0.27 → 0.51 s noop at sf0.1)
      docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { it =>
          val m = java.util.regex.Pattern.compile(TOKEN_RE).matcher("")
          val md = java.security.MessageDigest.getInstance("MD5")
          it.flatMap { case (id, text) =>
            val bitSums = new Array[Int](32)
            var any = false
            m.reset(text.toLowerCase(java.util.Locale.ROOT))
            while (m.find()) {
              val t = m.group()
              if (t.length >= 3 && t.length <= 32) {
                any = true
                val h = md5Prefix15(md, t)
                var i = 0
                while (i < 32) {
                  bitSums(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
                  i += 1
                }
              }
            }
            if (!any) None
            else {
              var sh = 0L
              var i = 0
              while (i < 32) { if (bitSums(i) > 0) sh |= (1L << i); i += 1 }
              Some((id, sh))
            }
          }
        }.toDF("doc_id", "simhash").orderBy("doc_id")
    },
    Some {
      val bitSums = (0 until 32).map(i =>
        s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(",\n    ")
      val recompose = (0 until 32).map(i =>
        s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH $toksSql,
         |h AS (SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM f),
         |bits AS (SELECT doc_id,
         |    $bitSums
         |  FROM h GROUP BY doc_id)
         |SELECT doc_id, $recompose AS simhash FROM bits ORDER BY doc_id""".stripMargin
    })

  /** LSH band-join candidate CTE shared by the exact-jaccard and cluster
    * oracles (identical to dedup_minhash_pairs). */
  private val candPairsSql = {
    val cols = (0 until 8).map(seed =>
      s"min(('0x' || substr(md5('s$seed|' || sh), 1, 15))::BIGINT) AS mh$seed").mkString(", ")
    val bandSel = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '_' || mh${2 * b + 1}) AS bh FROM sig").mkString("\n  UNION ALL\n  ")
    s"""sig AS (SELECT doc_id, $cols FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSel
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** top-20 candidate pairs by exact 3-gram shingle Jaccard. Exact jaccard
    * runs ONLY over the LSH candidate pairs (a raw shingle self-join is k²
    * per shared shingle — brute force at 100 TB); per-pair cost is linear
    * in the pair's shingle lists. */
  val ngramJaccard = Op("dedup_jaccard_top",
    (s, dir) => {
      // materialize the LSH candidate pairs ONCE (localCheckpoint truncates
      // the lineage): cand is referenced three times below and each
      // reference would otherwise embed — and possibly re-run — the whole
      // corpus-wide minhash kernel, leaving the dedup cost optimizer-
      // dependent (ReuseExchange) instead of structurally bounded
      val cand = minhashPairs.query(s, dir).select(col("a"), col("b"))
        .localCheckpoint(true)
      // only candidate docs' shingles matter; the candidate set is the
      // LSH dedup output (≪ corpus — buckets bound pair counts), so it
      // broadcasts and the corpus never pays the shingle explode
      val candDocs = cand.select(col("a").as("doc_id"))
        .union(cand.select(col("b").as("doc_id"))).distinct()
      // sh is read three times (sizes + both sides of the intersection
      // join); each read is a corpus scan filtered by the candidate
      // semi-join — materialize the (candidate-bounded) shingle set once
      val sh = shingles(s, dir, Some(candDocs)).localCheckpoint(true)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.select(col("doc_id").as("a"), col("sh")), Seq("a"))
        .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .select(col("a"), col("b"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6).as("jaccard"))
        .orderBy(desc("jaccard"), col("a"), col("b"))
        .limit(20)
    },
    Some(s"""WITH $shinglesSql,
            |$candPairsSql,
            |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            |inter AS (
            |  SELECT c.a, c.b, count(*) AS i
            |  FROM cand c JOIN sh x ON x.doc_id = c.a JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
            |  GROUP BY 1, 2)
            |SELECT a, b, round(i::DOUBLE / (za.n + zb.n - i), 6) AS jaccard
            |FROM inter JOIN sz za ON za.doc_id = a JOIN sz zb ON zb.doc_id = b
            |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin))

  /** duplicate-cluster resolution ("keep one"): connected components over
    * the LSH candidate pairs, representative = min doc_id per component.
    * Spark side: iterative min-label propagation (converges in
    * O(component diameter) rounds — dup clusters are shallow; each round
    * is one shuffle join, no driver-side graph). Only EDGE ENDPOINTS
    * iterate (per-round frames are O(docs-with-a-dup-candidate), not
    * O(corpus)); docs in no pair join back as their own singleton cluster
    * once, at the end. */
  val dedupClusters = Op("dedup_clusters",
    (s, dir) => {
      val verts = docs(s, dir).select(col("doc_id"))
      // materialize the LSH candidate pairs ONCE before the symmetric
      // union: `pairs` is referenced twice below, and each reference would
      // otherwise embed — and re-run — the corpus-wide minhash band-join
      // pipeline (measured: round 1 paid the kernel 2x through the old
      // edges.cache() fill). After the eager checkpoint the union doubles
      // ~candidate-count rows, so edges needs no cache of its own.
      val pairs = minhashPairs.query(s, dir).select(col("a"), col("b"))
        .localCheckpoint(true)
      val edges = pairs.union(pairs.select(col("b"), col("a"))).toDF("src", "dst")
      // edges are symmetric, so src alone covers every endpoint
      val endpoints = edges.select(col("src").as("doc_id")).distinct()
      var labels = endpoints.select(col("doc_id"), col("doc_id").as("cluster"))
      val timing = sys.env.contains("GRAFT_TIMING")
      var changed = true
      var iter = 0
      while (changed && iter < 32) {
        val tr = if (timing) System.nanoTime() else 0L
        val prop = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
          .groupBy(col("dst").as("doc_id")).agg(min("cluster").as("nc"))
        // carry the changed flag on each row: convergence is then one
        // filter+limit over the materialized next frame, not an extra
        // next⋈labels join job per round
        val step = labels.join(prop, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster"), coalesce(col("nc"), col("cluster"))).as("cluster"),
            (coalesce(col("nc"), col("cluster")) < col("cluster")).as("chg"))
          // eager localCheckpoint, NOT cache(): cache() only short-circuits
          // compute — the logical plan still grows by one join round per
          // iteration, and the analyzer/optimizer re-walk the whole history
          // each round (planning cost compounds; guide §3.3 "materialise an
          // intermediate to truncate the plan"). The checkpoint flattens
          // round k's lineage to a LogicalRDD so round k+1 plans O(1) work.
          .localCheckpoint(true)
        changed = step.filter(col("chg")).limit(1).count() > 0
        labels = step.select(col("doc_id"), col("cluster"))
        iter += 1
        if (timing) System.err.println(
          f"[graft-timing] dedup_clusters round $iter ${(System.nanoTime() - tr) / 1e9}%.3fs changed=$changed")
      }
      // a dup chain with diameter > the cap would silently yield split
      // clusters; fail loudly rather than return non-converged labels
      if (changed)
        throw new IllegalStateException(
          s"dedup_clusters: min-label propagation did not converge in $iter rounds " +
            "(duplicate-chain diameter exceeds the iteration cap)")
      // labels is already backed by the last round's eager checkpoint (a
      // projection over its LogicalRDD — no recompute on consumption);
      // per-round checkpoint RDDs are tiny — endpoint-bounded — and are
      // reclaimed by the ContextCleaner when their round's frame goes out
      // of scope
      verts.join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .select(col("doc_id"), col("cluster"),
          (col("doc_id") === col("cluster")).as("is_rep"))
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |$candPairsSql,
            |edges AS (SELECT a, b FROM cand UNION ALL SELECT b, a FROM cand),
            |reach(s, t) AS (
            |  SELECT doc_id, doc_id FROM documents
            |  UNION
            |  SELECT r.s, e.b FROM reach r JOIN edges e ON e.a = r.t
            |)
            |SELECT s AS doc_id, min(t) AS cluster, (s = min(t)) AS is_rep
            |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin))

  // ---------- similarity search (embeddings) ----------

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** DuckDB-side cosine matching the engine's zero-norm→0 convention (see
    * graft.functions.CosineSimilarity): a zero-norm operand yields 0, not
    * NaN — NaN sorts GREATEST under ORDER BY cos DESC in both engines, so
    * an empty/zero embedding would otherwise rank first for every query.
    * ONE generator for every oracle, so the convention cannot drift. */
  private def sqlCos(va: String, vb: String): String =
    s"CASE WHEN list_dot_product($va, $va) = 0 OR list_dot_product($vb, $vb) = 0 THEN 0 " +
      s"ELSE list_dot_product($va, $vb) / " +
      s"(sqrt(list_dot_product($va, $va)) * sqrt(list_dot_product($vb, $vb))) END"

  /** exact cosine between columns `qv` and `embedding` (doubles, 5 dp) —
    * the native codegen expression (graft.functions.CosineSimilarity), one
    * fused loop instead of interpreted higher-order-function lambdas;
    * bit-identical to the HOF formulation (same op order). */
  private def cosCol(s: SparkSession) = {
    graft.functions.CosineSimilarity.register(s)
    round(expr("graft_cosine(qv, embedding)"), 5).as("cos")
  }

  /** rank a (qid, vec_id, cos) frame to top-k per query. */
  private def rankTopK(cos: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(desc("cos"), col("vec_id"))
    cos.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("rk").cast("long").as("rk"), col("vec_id"), col("cos"))
      .orderBy("qid", "rk")
  }

  /** brute-force cosine top-k neighbors for vec_id < 5 (the ANN baseline —
    * exact, O(Q·N), what the LSH path's recall is measured against). */
  def annBruteTopK(e0: DataFrame, k: Int): DataFrame = {
    val cos5 = cosCol(e0.sparkSession)
    val e = e0.select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    // stream the CORPUS side and broadcast the Q query rows (§3.1
    // "broadcast the side that fits"): written q.join(e, ...), Spark built
    // the NLJ with the WHOLE embeddings table as the broadcast side
    // (IdentityBroadcastMode over N rows — an OOM at real corpus sizes and
    // a pointless multi-MB broadcast locally) while the 5-row side
    // streamed on one split. Inner-join rows are identical either way;
    // the cosine kernel now parallelizes over the corpus scan's splits.
    val cos = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), cos5)
    rankTopK(cos, k)
  }

  val annBrute = Op("ann_cosine_topk",
    (s, dir) => annBruteTopK(emb(s, dir), 5),
    Some(s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
           |cos AS (
           |  SELECT q.qid, e.vec_id,
           |         round(${sqlCos("q.qv::DOUBLE[]", "e.embedding::DOUBLE[]")}, 5) AS cos
           |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
           |rk AS (SELECT qid, vec_id, cos,
           |       row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
           |       FROM cos)
           |SELECT qid, rk, vec_id, cos FROM rk WHERE rk <= 5 ORDER BY qid, rk""".stripMargin))

  // ---- LSH ANN: the scale path ----

  /** deterministic ±1 hyperplane component for (table t, plane p, dim j) —
    * shared by the Spark plan and the generated DuckDB oracle so both
    * bucket identically. */
  private[ops] def lshSign(t: Int, p: Int, j: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.stringHash(s"t$t|p$p|$j", 42)
    if ((h & 1) == 0) 1.0 else -1.0
  }
  private[ops] val LshTables = 8
  private[ops] val LshTargetBucket = 64

  /** bits per table scale with corpus size: 2^bits buckets ≈ N/target, so
    * a bucket stays ~LshTargetBucket vectors no matter the corpus — at
    * 10^12 vectors that's ~34 bits, NOT a constant (a constant would make
    * candidates ≈ N and degenerate to brute force). */
  private[graft] def lshBits(n: Long): Int =
    math.max(3, math.ceil(math.log(n.toDouble / LshTargetBucket) / math.log(2.0)).toInt)

  /** One table's bucket for a vector: bit p = sign of the dot product with
    * hyperplane p. The bucket is a Long — lshBits(N) exceeds 31 past
    * ~1.4e11 vectors (10^12 docs → ~34 bits), where an Int `1 << p` would
    * wrap and alias planes, collapsing candidate sets toward brute force. */
  private[graft] def lshBucket(v: Seq[Float], tablePlanes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < tablePlanes.length) {
      var dot = 0.0
      var j = 0
      while (j < v.length) { dot += tablePlanes(p)(j) * v(j); j += 1 }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Shared LSH bucketing pipeline: (vec_id, table, bucket) rows for
    * every vector under `LshTables` tables of `lshBits(count)` planes —
    * ONE definition for annLshTopK and dedupEmbeddingPairs (plane
    * derivation or bucket width changed in a single copy would silently
    * break Spark/oracle agreement on the other op). Returns the bucketed
    * frame plus the bit width (callers derive multiprobe masks from it). */
  private def withLshBuckets(s: SparkSession, e: DataFrame): (DataFrame, Int) = {
    import s.implicits._
    val n = e.count()
    val bits = lshBits(n)
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(LshTables, bits, dim)((t, p, j) => lshSign(t, p, j))
    val planesB = s.sparkContext.broadcast(planes)
    // spread: the bucketing kernel is L·bits·dim mults per vector and a
    // small corpus is one parquet split — see `spread` (no-op at scale)
    val withBucket = spread(e).as[(Long, Seq[Float])].flatMap { case (id, v) =>
      val ts = planesB.value
      ts.indices.map(t => (id, t, lshBucket(v, ts(t))))
    }.toDF("vec_id", "table", "bucket")
    (withBucket, bits)
  }

  /** LSH-bucketed ANN: L tables of `lshBits(N)` deterministic hyperplanes;
    * candidates = vectors sharing a bucket with the query in any table
    * under MULTIPROBE (the query probes its bucket plus all Hamming-1
    * neighbors, recovering recall lost to narrow buckets). Exact cosine +
    * top-k only over candidates. */
  def annLshTopK(s: SparkSession, e0: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val e = e0.select(col("vec_id"), col("embedding"))
    val (withBucket, bits) = withLshBuckets(s, e)
    // multiprobe: bucket ⊕ {0, each single bit}
    val masks = (0L +: (0 until bits).map(1L << _)).toArray
    val qb = withBucket.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("table"), col("bucket"))
      .withColumn("m", explode(lit(masks)))
      .select(col("qid"), col("table"), col("bucket").bitwiseXOR(col("m")).as("bucket"))
    val cand = qb.join(withBucket, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id")).distinct()
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cos = cand
      .join(broadcast(qv), Seq("qid"))
      .join(e, Seq("vec_id"))
      .select(col("qid"), col("vec_id"), cosCol(s))
    rankTopK(cos, k)
  }

  /** DuckDB mirror of annLshTopK for a FIXED (bits, dim): bucket per table
    * from baked ±1 plane literals (same lshSign), multiprobe via XOR masks,
    * exact cosine + rank. The driver gate runs at sf0.01 (N=500 → bits=3,
    * dim=64). */
  private[ops] def lshOracleSql(bits: Int, dim: Int): String = {
    def planeLit(t: Int, p: Int): String =
      (0 until dim).map(j => if (lshSign(t, p, j) > 0) "1" else "-1").mkString("[", ",", "]")
    val tableSelects = (0 until LshTables).map { t =>
      val bucket = (0 until bits).map { p =>
        s"(CASE WHEN list_dot_product(${planeLit(t, p)}::DOUBLE[], v) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM e"
    }.mkString("\n  UNION ALL\n  ")
    val masks = (0 +: (0 until bits).map(1 << _).toList).map(m => s"($m)").mkString(",")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (
       |  $tableSelects
       |),
       |probes AS (
       |  SELECT q.vec_id AS qid, q.tbl, xor(q.bucket::BIGINT, m.m::BIGINT) AS bucket
       |  FROM b q CROSS JOIN (VALUES $masks) m(m) WHERE q.vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT p.qid, c.vec_id
       |  FROM probes p JOIN b c ON c.tbl = p.tbl AND c.bucket = p.bucket
       |  WHERE c.vec_id <> p.qid),
       |cos AS (
       |  SELECT cd.qid, cd.vec_id,
       |         round(${sqlCos("eq.v", "ev.v")}, 5) AS cos
       |  FROM cand cd JOIN e eq ON eq.vec_id = cd.qid JOIN e ev ON ev.vec_id = cd.vec_id),
       |rk AS (SELECT qid, vec_id, cos,
       |       row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM cos)
       |SELECT qid, rk, vec_id, cos FROM rk WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  }

  val annLsh = Op("ann_lsh_topk",
    (s, dir) => annLshTopK(s, emb(s, dir), 5),
    Some(lshOracleSql(bits = 3, dim = 64)))

  // ---- IVF ANN: the second scale path (inverted-file coarse quantizer) ----

  /** nlist ≈ √N (the standard IVF sizing: √N lists of √N vectors balances
    * quantizer-scan cost against list-scan cost), CAPPED at 65,536: an
    * uncapped √N makes assignment N·√N = N^1.5 total dot products (10^18
    * at 10^12 vectors). With the cap, assignment is N·nlist ≤ N·65,536 —
    * linear in N with a bounded constant — the broadcast quantizer stays
    * ≤ 65,536·dim doubles (~32 MB at dim=64), and the driver-side
    * takeOrdered(nlist) centroid pull is bounded the same way. Lists
    * grow to N/65,536 vectors past the cap's knee (N > 2^32), which
    * nprobe/4 scanning still bounds at ~nprobe·N/nlist per query. */
  private[graft] def ivfNlist(n: Long): Int =
    math.min(65536, math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** probe a quarter of the lists (min 3) — recall/latency knob. */
  private[graft] def ivfNprobe(nlist: Int): Int =
    math.max(3, math.ceil(nlist / 4.0).toInt)

  /** deterministic pseudo-random sample key, pure integer arithmetic so
    * the DuckDB oracle derives the SAME centroid set from the data (the
    * inner mod keeps the product within Int64 for any vec_id). */
  private[graft] def ivfKey(id: Long): Long =
    ((id % 1000003L) * 2654435761L) % 4294967296L

  /** sequential-order cosine between a double centroid and a float vector —
    * term-for-term the oracle's `list_dot_product(c,v) / (sqrt(..)*sqrt(..))`
    * over `embedding::DOUBLE[]` operands, so assignment argmax agrees. */
  private def cosD(c: Array[Double], v: Seq[Float]): Double = {
    var dot = 0.0; var nc = 0.0; var nv = 0.0; var j = 0
    while (j < c.length) {
      val vj = v(j).toDouble
      dot += c(j) * vj; nc += c(j) * c(j); nv += vj * vj; j += 1
    }
    // zero-norm → 0, never NaN (same convention as sqlCos and the native
    // expression): NaN's all-comparisons-false would leave the IVF
    // assignment loop at cid=Long.MaxValue — a list no probe reaches, so
    // zero-norm vectors would silently become unretrievable
    val denom = math.sqrt(nc) * math.sqrt(nv)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** IVF ANN: the coarse quantizer is nlist deterministic hash-sampled
    * data points (k-means-init-style — training the quantizer on a sample
    * is standard; the structure is what matters here). Every vector is
    * assigned to its nearest centroid with a per-row loop over the
    * broadcast centroid table (N·nlist dot products with nlist capped at
    * 65,536 — see ivfNlist — so assignment stays LINEAR in N, and the
    * broadcast quantizer is at most ~65,536·dim doubles). Queries probe their nprobe
    * nearest lists; exact cosine + top-k runs only over probed lists, so
    * work per query is ~nprobe·√N instead of N. */
  def annIvfTopK(s: SparkSession, e0: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val e = e0.select(col("vec_id"), col("embedding"))
    val n = e.count()
    val nlist = ivfNlist(n)
    val nprobe = ivfNprobe(nlist)
    val cents: Array[(Long, Array[Double])] = e.as[(Long, Seq[Float])].rdd
      .map { case (id, v) => ((ivfKey(id), id), v.toArray.map(_.toDouble)) }
      .takeOrdered(nlist)(Ordering.by(_._1))
      .map { case ((_, id), cv) => (id, cv) }
    val centB = s.sparkContext.broadcast(cents)
    // spread: assignment is N·nlist dot products and a small corpus is one
    // parquet split — see `spread` (no-op at scale)
    val asg = spread(e).as[(Long, Seq[Float])].mapPartitions { it =>
      val cs = centB.value
      it.map { case (id, v) =>
        var bestCid = Long.MaxValue; var bestCos = Double.NegativeInfinity
        var i = 0
        while (i < cs.length) {
          val c = cosD(cs(i)._2, v)
          if (c > bestCos || (c == bestCos && cs(i)._1 < bestCid)) {
            bestCos = c; bestCid = cs(i)._1
          }
          i += 1
        }
        (id, bestCid)
      }
    }.toDF("vec_id", "cid")
    val probes = e.filter(col("vec_id") < 5).as[(Long, Seq[Float])]
      .flatMap { case (qid, v) =>
        centB.value
          .map { case (cid, cv) => (cid, cosD(cv, v)) }
          .sortBy { case (cid, c) => (-c, cid) }
          .take(nprobe).map { case (cid, _) => (qid, cid) }
      }.toDF("qid", "cid")
    // assignment is unique per vec and probes are distinct cids per query,
    // so the join yields unique (qid, vec_id) — no distinct needed
    val cand = asg.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cos = cand
      .join(broadcast(qv), Seq("qid"))
      .join(e, Seq("vec_id"))
      .select(col("qid"), col("vec_id"), cosCol(s))
    rankTopK(cos, k)
  }

  /** DuckDB mirror of annIvfTopK for a FIXED (nlist, nprobe): unlike the
    * LSH planes nothing is baked — the oracle re-derives the SAME sampled
    * centroids from the data via the shared integer key. */
  private[ops] def ivfOracleSql(nlist: Int, nprobe: Int): String = {
    val cosExpr = sqlCos("c.cv", "e.v")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cent AS (
       |  SELECT vec_id AS cid, v AS cv FROM e
       |  ORDER BY (vec_id % 1000003) * 2654435761 % 4294967296, vec_id LIMIT $nlist),
       |asg AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $cosExpr DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |probes AS (
       |  SELECT qid, cid FROM (
       |    SELECT e.vec_id AS qid, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY $cosExpr DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cent c WHERE e.vec_id < 5) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id FROM probes p JOIN asg a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.qid),
       |cos AS (
       |  SELECT cd.qid, cd.vec_id,
       |         round(${sqlCos("eq.v", "ev.v")}, 5) AS cos
       |  FROM cand cd JOIN e eq ON eq.vec_id = cd.qid JOIN e ev ON ev.vec_id = cd.vec_id),
       |rk AS (SELECT qid, vec_id, cos,
       |       row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk FROM cos)
       |SELECT qid, rk, vec_id, cos FROM rk WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  }

  /** sf0.01 embeddings: N=500 → nlist=⌈√500⌉=23, nprobe=⌈23/4⌉=6. */
  val annIvf = Op("ann_ivf_topk",
    (s, dir) => annIvfTopK(s, emb(s, dir), 5),
    Some(ivfOracleSql(nlist = 23, nprobe = 6)))

  /** Embedding-cosine near-duplicate pairs, the scale path: candidates =
    * vector pairs sharing an LSH bucket in ANY table (never the O(N²)
    * cross join), exact cosine only over candidates, threshold + top-50.
    * The same hyperplane machinery as annLshTopK keeps bucket population
    * ~constant at any corpus size. On this synthetic corpus no true dups
    * exist, so the threshold (0.35) exercises the machinery on the
    * closest-pair tail; with real near-dups (cos → 1) LSH recall only
    * improves. */
  def dedupEmbeddingPairs(s: SparkSession, e0: DataFrame, tau: Double, k: Int): DataFrame = {
    import s.implicits._
    val e = e0.select(col("vec_id"), col("embedding"))
    val (withBucket, _) = withLshBuckets(s, e)
    val cand = withBucket.as("x").join(withBucket.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
    graft.functions.CosineSimilarity.register(s)
    cand
      .join(e.select(col("vec_id").as("a"), col("embedding").as("qv")), Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("embedding")), Seq("b"))
      .select(col("a"), col("b"), round(expr("graft_cosine(qv, embedding)"), 5).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy(desc("cos"), col("a"), col("b")).limit(k)
  }

  private[ops] def embDedupOracleSql(bits: Int, dim: Int, tau: Double, k: Int): String = {
    def planeLit(t: Int, p: Int): String =
      (0 until dim).map(j => if (lshSign(t, p, j) > 0) "1" else "-1").mkString("[", ",", "]")
    val tableSelects = (0 until LshTables).map { t =>
      val bucket = (0 until bits).map { p =>
        s"(CASE WHEN list_dot_product(${planeLit(t, p)}::DOUBLE[], v) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM e"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (
       |  $tableSelects
       |),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM b x JOIN b y ON y.tbl = x.tbl AND y.bucket = x.bucket AND x.vec_id < y.vec_id),
       |cos AS (
       |  SELECT c.a, c.b,
       |         round(${sqlCos("ea.v", "eb.v")}, 5) AS cos
       |  FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b)
       |SELECT a, b, cos FROM cos WHERE cos >= $tau ORDER BY cos DESC, a, b LIMIT $k""".stripMargin
  }

  val dedupEmbedding = Op("dedup_embedding",
    (s, dir) => dedupEmbeddingPairs(s, emb(s, dir), tau = 0.35, k = 50),
    Some(embDedupOracleSql(bits = 3, dim = 64, tau = 0.35, k = 50)))

  // ---------- events: windows + sessionization ----------

  val eventsHourly = Op("events_hourly",
    (s, dir) => s.read.parquet(s"$dir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("hour", "event_type"),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
           |count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin))

  val sessionize = Op("sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || unix_timestamp(col("ts")) - unix_timestamp(col("prev")) > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },
    // sum(int) in DuckDB returns HUGEINT (int128) while Spark returns BIGINT
    // — the driver's hasher distinguishes them, so cast explicitly.
    Some("""WITH x AS (
           |  SELECT user_id, ts,
           |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           |  FROM events),
           |y AS (SELECT user_id,
           |        CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
           |      FROM x)
           |SELECT user_id, sum(new_sess)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
           |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin))

  // ---------- TPC-H-ish relational sanity ----------

  val q1Agg = Op("q1_agg",
    (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
           |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
           |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val q3Join = Op("q3_join",
    (s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 1).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue, count(*) AS n
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin))

  val topCustomers = Op("top_customers",
    (s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      o.groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("total"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("total"))
        .orderBy(desc("total"), col("c_custkey")).limit(10)
    },
    Some("""SELECT c_custkey, c_name, total FROM (
           |  SELECT o_custkey, round(sum(o_totalprice), 2) AS total FROM orders GROUP BY 1) t
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY total DESC, c_custkey LIMIT 10""".stripMargin))

  // ---------- multimodal (opaque binary; REAL image decode + fallback) ----------

  /** Media dims: REAL decode through the JDK's ImageIO for actual image
    * payloads (PNG/JPEG/GIF/BMP, magic-byte prescreened), deterministic
    * hash-derived fallback dims for everything else — one pipeline over
    * mixed corpora. The sf tables carry text bytes, so the driver oracle
    * exercises the fallback branch; MediaSpec feeds real generated PNGs
    * through the same functions and checks true dimensions and pixels. */
  private[ops] def mediaDims(bytes: Array[Byte]): (Int, Int) =
    mediaDims(bytes, java.security.MessageDigest.getInstance("MD5"))

  /** md is hoisted per PARTITION by the dataset kernels below — a JCA
    * provider lookup per row is measurable at corpus scale (the in-file
    * precedent is minhashSig/simhash); digest() resets the instance. */
  private[ops] def mediaDims(bytes: Array[Byte], md: java.security.MessageDigest): (Int, Int) =
    graft.media.ImageCodec.decodeDims(bytes).getOrElse {
      val h = md.digest(bytes)
      (1 + ((h(0) & 0xFF) % 64), 1 + ((h(1) & 0xFF) % 64))
    }

  /** (doc_id, payload) → (doc_id, n_bytes, width, height, magic). */
  def binaryMeta(payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, bytes) =>
        val (w, h) = mediaDims(bytes, md)
        val fp = md.digest(bytes).take(4).map("%02x".format(_)).mkString
        (id, bytes.length.toLong, w, h, fp)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "magic")
  }

  /** (doc_id, payload) → dims + aspect-fit-into-32 dims. */
  def resizeDims(payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, bytes) =>
        val (w, h) = mediaDims(bytes, md)
        val (nw, nh) = graft.media.ImageCodec.fitBox(w, h, 32)
        (id, w, h, nw, nh)
      }
    }.toDF("doc_id", "width", "height", "new_w", "new_h")
  }

  val mmBinaryMeta = Op("mm_binary_meta",
    (s, dir) => {
      import s.implicits._
      binaryMeta(docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])])
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  octet_length(text::BLOB) AS n_bytes,
           |  1 + (('0x' || substr(md5(text), 1, 2))::INT % 64) AS width,
           |  1 + (('0x' || substr(md5(text), 3, 2))::INT % 64) AS height,
           |  substr(md5(text), 1, 8) AS magic
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Multimodal resize: aspect-preserving fit into 32×32 over the decoded
    * dims (real ImageIO decode for image payloads, fallback otherwise);
    * `ImageCodec.resizePng` does the actual pixel resize for pipelines
    * that keep the content (MediaSpec covers it). */
  val mmResize = Op("mm_resize",
    (s, dir) => {
      import s.implicits._
      resizeDims(docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])])
        .orderBy("doc_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id,
           |    1 + (('0x' || substr(md5(text), 1, 2))::INT % 64) AS width,
           |    1 + (('0x' || substr(md5(text), 3, 2))::INT % 64) AS height
           |  FROM documents)
           |SELECT doc_id, width, height,
           |  greatest(1, floor(width  * least(1.0, least(32.0/width, 32.0/height))))::INT AS new_w,
           |  greatest(1, floor(height * least(1.0, least(32.0/width, 32.0/height))))::INT AS new_h
           |FROM dims ORDER BY doc_id""".stripMargin))

  /** Audio metadata: REAL javax.sound decode (WAV/AIFF/AU, magic
    * prescreened) with a deterministic hash fallback so one pipeline
    * covers mixed corpora — the audio sibling of mediaDims. The sf corpus
    * is text, so the driver oracle exercises the fallback; MediaSpec runs
    * a generated WAV through the same kernel. */
  def audioMetaOf(bytes: Array[Byte]): (Int, Int, Long) =
    audioMetaOf(bytes, java.security.MessageDigest.getInstance("MD5"))

  def audioMetaOf(bytes: Array[Byte], md: java.security.MessageDigest): (Int, Int, Long) =
    graft.media.AudioCodec.decodeMeta(bytes) match {
      case Some(m) => (m.sampleRate.toInt, m.channels, m.frames)
      case None =>
        val h = md.digest(bytes)
        (8000 * (1 + ((h(0) & 0xFF) % 6)), 1 + ((h(1) & 0xFF) % 2), bytes.length.toLong / 4)
    }

  def audioMeta(payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])]): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { case (id, bytes) =>
        val (rate, ch, frames) = audioMetaOf(bytes, md)
        (id, rate, ch, frames)
      }
    }.toDF("doc_id", "sample_rate", "channels", "frames")
  }

  val mmAudioMeta = Op("mm_audio_meta",
    (s, dir) => {
      import s.implicits._
      audioMeta(docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])])
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  8000 * (1 + (('0x' || substr(md5(text), 1, 2))::INT % 6)) AS sample_rate,
           |  1 + (('0x' || substr(md5(text), 3, 2))::INT % 2) AS channels,
           |  (octet_length(text::BLOB)::BIGINT // 4) AS frames
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** k evenly spaced frame samples of one payload: REAL composited frames
    * for multi-frame (animated) GIFs — the one video-ish container the
    * JDK decodes without codec jars — with `off` = the sampled frame
    * index and the fingerprint over composited pixels; byte-slice
    * fallback frames for everything else (the sf corpus is text, so the
    * driver oracle exercises the fallback; MediaSpec feeds a real
    * animated GIF through the same kernel). */
  def frameSamples(bytes: Array[Byte], k: Int): Seq[(Long, Long, String)] =
    frameSamples(bytes, k, java.security.MessageDigest.getInstance("MD5"))

  def frameSamples(bytes: Array[Byte], k: Int,
                   md: java.security.MessageDigest): Seq[(Long, Long, String)] = {
    val gif = graft.media.ImageCodec.gifFrames(bytes)
    if (gif.nonEmpty)
      (0 until k).flatMap { f =>
        val idx = (gif.length.toLong * f / k).toInt
        if (idx >= gif.length) None
        else Some((f.toLong, idx.toLong,
          graft.media.ImageCodec.framePixelFingerprint(gif(idx))))
      }
    else {
      val n = bytes.length
      (0 until k).flatMap { f =>
        val off = (n.toLong * f / k).toInt
        if (off >= n) None
        else {
          val end = math.min(n, off + 16)
          md.reset()
          md.update(bytes, off, end - off)
          Some((f.toLong, off.toLong,
            md.digest().take(4).map("%02x".format(_)).mkString))
        }
      }
    }
  }

  /** Multimodal frame sampling: k evenly spaced frames with per-frame
    * fingerprints — real frame decode where the JDK has a codec
    * (animated GIF), deterministic byte-slice frames elsewhere, one
    * pipeline over mixed corpora. */
  val mmFrameSample = Op("mm_frame_sample",
    (s, dir) => {
      import s.implicits._
      val k = 4
      val payloads = docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      val frames = payloads.mapPartitions { batch =>
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.flatMap { case (id, bytes) =>
          frameSamples(bytes, k, md).map { case (f, off, fp) => (id, f, off, fp) }
        }
      }
      frames.toDF("doc_id", "frame", "off", "frame_fp").orderBy("doc_id", "frame")
    },
    // oracle slices VARCHAR (DuckDB has no BLOB substring/md5): valid
    // because the test corpus is pure ASCII (chars == bytes, verified);
    // the Spark side slices raw bytes and handles any payload
    Some("""WITH f AS (SELECT unnest(range(0, 4)) AS frame),
           |x AS (
           |  SELECT d.doc_id, f.frame, d.text,
           |         (octet_length(d.text::BLOB)::BIGINT * f.frame // 4) AS off,
           |         octet_length(d.text::BLOB) AS n
           |  FROM documents d CROSS JOIN f)
           |SELECT doc_id, frame, off,
           |  substr(md5(substring(text, (off + 1)::BIGINT, least(16, n - off::INT)::BIGINT)), 1, 8) AS frame_fp
           |FROM x WHERE off < n ORDER BY doc_id, frame""".stripMargin))

  val all: Seq[Op] = Seq(
    tokenCount, qualityScore, langId, langIdNgram, fingerprint,
    dedupExact, minhashSig, minhashPairs, simhash, ngramJaccard, dedupClusters,
    dedupEmbedding, annBrute, annLsh, annIvf,
    eventsHourly, sessionize,
    q1Agg, q3Join, topCustomers, mmBinaryMeta, mmResize, mmFrameSample, mmAudioMeta)
}
