package graft.core

/** Engine constants, kept numerically identical to the reference
  * (alexarchen/Docodo) so query semantics and test counts transfer.
  *
  * Reference: /root/reference/Docodo.NET/Index.cs:95-115,
  * /root/reference/Docodo.NET/Search.cs:158,472.
  */
object Consts {
  /** Index.cs:112 `MIN_WORD_LENGTH` */
  val MinWordLength = 3
  /** Index.cs:96 `MAX_WORD_LENGTH` */
  val MaxWordLength = 32
  /** Test hook: shrinks [[MaxFoundPages]] so the per-partition page-cap
    * cut and the eval early-exit fire on small fixtures. BOTH engines
    * (MemIndex and SparkSearcher share ResultAssembler) read it, so
    * reference parity is preserved under the override. */
  @volatile var MaxFoundPagesOverride: Option[Int] = None
  /** Index.cs:101 maximum output found pages */
  def MaxFoundPages: Int = {
    val o = MaxFoundPagesOverride
    if (o.isDefined) o.get else 30000
  }
  /** Index.cs:102 maximum output found docs */
  val MaxFoundDocs = 500
  /** Index.cs:103 found page display text length */
  val MaxFoundPageText = 320
  /** Index.cs:115 rank multiplier when first hit is the header page */
  val DocRankMultiply = 10.0f
  /** Index.cs:110 `KNOWN_WORD_CHAR` — vocab group code prefix */
  val KnownWordChar = '#'
  /** Index.cs:105 `WORD_STEM_CHAR` — stemmed-form term prefix */
  val WordStemChar = '$'
  /** Index.cs:111 `FIELD_NAME_CHAR` — header field term prefix */
  val FieldNameChar = '&'
  /** Index.cs:108 `DOC_SEP` — source:doc separator in document names */
  val DocSep = ':'
  /** Search.cs:158 `MAX_LIKE_WORDS` — wildcard expansion cap */
  val MaxLikeWords = 100
  /** Search.cs:472 default proximity distance (letters) */
  val DefaultDist = 255
  /** Search.cs:26-27 snippet match markers */
  val BeginMatch = 'ˋ'
  val EndMatch = 'ˊ'

  // --- BM25 (our headline scorer; not in the reference) ---
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** docId-range bucket width (log2). salt = docId >> DocBucketBits; postings
    * of one term are split into per-bucket blocks with disjoint, ascending
    * docId ranges, so hot terms shard across tasks and query-side
    * concatenation needs no re-sort (SURVEY §7.4.2).
    */
  val DocBucketBits = 16
}
