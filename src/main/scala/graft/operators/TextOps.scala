package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline,
  * over the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All operators are pure codegen'd expression trees (functions._ +
  * higher-order array functions) — no UDFs, no driver loops — so they
  * stay inside WholeStageCodegen and scale linearly with input splits:
  * per-row work only, zero shuffles except where a group-by is the
  * semantics (exact dedup).
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Canonical tokenizer shared by every text operator (and mirrored in
    * each DuckDB oracle): lowercase, split on non-alphanumeric runs,
    * drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), tk => tk =!= "")

  /** SQL form of [[tokens]] for the DuckDB oracles. */
  val tokensSql: String =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), tk -> tk <> '')"

  // ---------------------------------------------------------------------
  // d01 — exact deduplication: hash-groupBy on a content digest; keeper =
  // min doc_id per group. md5 is identical across engines. Scale: the
  // shuffle carries (digest, doc_id) pairs only — 48 bytes/row no matter
  // how wide the documents are; partial agg collapses per-map duplicates.
  // ---------------------------------------------------------------------
  private def d01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keeper_doc_id"))
  private val d01Sql =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
      |  COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY keeper_doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d02 — per-document text statistics: token counting (whitespace-class
  // split), distinct-token counts, character/punctuation ratios — the
  // quality-scoring raw features. Everything per-row → embarrassingly
  // parallel at 100 TB.
  // ---------------------------------------------------------------------
  private def d02(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = tokens(col("text"))
    d.select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars_actual"),
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct_tokens"),
        aggregate(toks, lit(0L), (acc, tk) => acc + length(tk))
          .as("sum_token_len"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.!?,;:]", "")))
          .cast(LongType).as("n_punct"))
      .orderBy(col("doc_id"))
  }
  private val d02Sql =
    s"""SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual,
      |  CAST(len($tokensSql) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct($tokensSql)) AS BIGINT) AS n_distinct_tokens,
      |  CAST(coalesce(list_sum(list_transform($tokensSql, tk -> CAST(length(tk) AS BIGINT))), 0) AS BIGINT) AS sum_token_len,
      |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d03 — quality scoring: a composite 0..1-ish quality signal from the
  // d02 raw features (length band, type-token ratio, mean token length
  // band) — the classic pre-training corpus filter shape. Ratios are
  // exact integer arithmetic divided once at the end in DOUBLE, so both
  // engines agree bitwise.
  // ---------------------------------------------------------------------
  private def d03(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val toks = tokens(col("text"))
    val base = d.select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("nc"),
      size(toks).cast(LongType).as("nt"),
      size(array_distinct(toks)).cast(LongType).as("ndt"),
      aggregate(toks, lit(0L), (acc, tk) => acc + length(tk)).as("stl"))
    base.select(
        col("doc_id"),
        (col("ndt").cast(DoubleType) / greatest(col("nt"), lit(1L)))
          .as("type_token_ratio"),
        (col("stl").cast(DoubleType) / greatest(col("nt"), lit(1L)))
          .as("mean_token_len"),
        when(col("nc").between(100L, 400L), 1L).otherwise(0L)
          .as("len_ok"),
        when(col("nt") >= 20L, 1L).otherwise(0L).as("tokens_ok"))
      .withColumn("quality_score",
        (col("len_ok") + col("tokens_ok")
          + when(col("type_token_ratio") >= 0.3, 1L).otherwise(0L))
          .cast(DoubleType) / 3.0)
      .orderBy(col("doc_id"))
  }
  private val d03Sql =
    s"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS nc,
      |    CAST(len($tokensSql) AS BIGINT) AS nt,
      |    CAST(len(list_distinct($tokensSql)) AS BIGINT) AS ndt,
      |    CAST(coalesce(list_sum(list_transform($tokensSql, tk -> CAST(length(tk) AS BIGINT))), 0) AS BIGINT) AS stl
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id,
      |    CAST(ndt AS DOUBLE) / greatest(nt, 1) AS type_token_ratio,
      |    CAST(stl AS DOUBLE) / greatest(nt, 1) AS mean_token_len,
      |    CASE WHEN nc BETWEEN 100 AND 400 THEN 1 ELSE 0 END AS len_ok,
      |    CASE WHEN nt >= 20 THEN 1 ELSE 0 END AS tokens_ok
      |  FROM base)
      |SELECT doc_id, type_token_ratio, mean_token_len,
      |  CAST(len_ok AS BIGINT) AS len_ok, CAST(tokens_ok AS BIGINT) AS tokens_ok,
      |  CAST(len_ok + tokens_ok + (CASE WHEN type_token_ratio >= 0.3 THEN 1 ELSE 0 END) AS DOUBLE) / 3.0 AS quality_score
      |FROM feat
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d04 — language identification: marker-word n-gram heuristic. Votes =
  // occurrences of per-language function words; argmax with a fixed
  // precedence (en > de > fr > es > zh) for determinism. regexp_count is
  // codegen'd; per-row only.
  // ---------------------------------------------------------------------
  private def d04(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    def score(pat: String): Column =
      regexp_count(padded, lit(pat)).cast(LongType)
    val sEn = score(" (the|and|of|is) ")
    val sDe = score(" (der|die|und|ist) ")
    val sFr = score(" (le|la|et|est) ")
    val sEs = score(" (el|los|y|es) ")
    val sZh = length(regexp_replace(col("text"), "[^\\u4e00-\\u9fff]", ""))
      .cast(LongType)
    d.select(col("doc_id"), col("lang"),
        sEn.as("score_en"), sDe.as("score_de"), sFr.as("score_fr"),
        sEs.as("score_es"), sZh.as("score_zh"))
      .withColumn("predicted_lang",
        when(col("score_zh") > greatest(col("score_en"), col("score_de"),
          col("score_fr"), col("score_es")), "zh")
        .when(col("score_en") >= greatest(col("score_de"), col("score_fr"),
          col("score_es")), "en")
        .when(col("score_de") >= greatest(col("score_fr"), col("score_es")), "de")
        .when(col("score_fr") >= col("score_es"), "fr")
        .otherwise("es"))
      .withColumn("is_match",
        (col("predicted_lang") === col("lang")).cast(IntegerType))
      .orderBy(col("doc_id"))
  }
  private val d04Sql =
    """WITH scored AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(concat(' ', lower(text), ' '), ' (the|and|of|is) ')) AS BIGINT) AS score_en,
      |    CAST(len(regexp_extract_all(concat(' ', lower(text), ' '), ' (der|die|und|ist) ')) AS BIGINT) AS score_de,
      |    CAST(len(regexp_extract_all(concat(' ', lower(text), ' '), ' (le|la|et|est) ')) AS BIGINT) AS score_fr,
      |    CAST(len(regexp_extract_all(concat(' ', lower(text), ' '), ' (el|los|y|es) ')) AS BIGINT) AS score_es,
      |    CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS BIGINT) AS score_zh
      |  FROM documents)
      |SELECT doc_id, lang, score_en, score_de, score_fr, score_es, score_zh,
      |  CASE
      |    WHEN score_zh > greatest(score_en, score_de, score_fr, score_es) THEN 'zh'
      |    WHEN score_en >= greatest(score_de, score_fr, score_es) THEN 'en'
      |    WHEN score_de >= greatest(score_fr, score_es) THEN 'de'
      |    WHEN score_fr >= score_es THEN 'fr'
      |    ELSE 'es' END AS predicted_lang,
      |  CAST(CASE
      |    WHEN score_zh > greatest(score_en, score_de, score_fr, score_es) THEN 'zh'
      |    WHEN score_en >= greatest(score_de, score_fr, score_es) THEN 'en'
      |    WHEN score_de >= greatest(score_fr, score_es) THEN 'de'
      |    WHEN score_fr >= score_es THEN 'fr'
      |    ELSE 'es' END = lang AS INT) AS is_match
      |FROM scored
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d05 — document fingerprinting: position-weighted rolling hash over
  // the token stream, folded entirely inside array expressions (no
  // explode → no row blow-up). Pure 64-bit integer math, identical in
  // both engines.
  // ---------------------------------------------------------------------
  private def d05(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val terms = transform(tokens(col("text")), (tk, i) =>
      (ascii(tk).cast(LongType) * 31L + length(tk).cast(LongType))
        * (pmod(i.cast(LongType), lit(13L)) + 1L))
    d.select(
        col("doc_id"),
        pmod(aggregate(terms, lit(0L), (acc, x) => acc + x), lit(1000000007L))
          .as("fingerprint"))
      .orderBy(col("doc_id"))
  }
  private val d05Sql =
    s"""SELECT doc_id,
      |  CAST(coalesce(list_sum(list_transform($tokensSql,
      |    (tk, i) -> (CAST(ascii(tk) AS BIGINT) * 31 + CAST(length(tk) AS BIGINT))
      |               * (((i - 1) % 13) + 1))), 0) % 1000000007 AS BIGINT) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d06 — BPE-style token counting: a GPT-2-shaped pre-tokenizer regex
  // (contractions, letter runs, digit runs, punctuation runs, each with
  // optional leading space) — the "how many tokens is this corpus"
  // pipeline primitive. Pattern avoids lookaheads so Java regex (Spark)
  // and RE2 (DuckDB) agree. Per-row regex scan → embarrassingly
  // parallel; codegen'd regexp_extract_all/regexp_count.
  // ---------------------------------------------------------------------
  private val bpePattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"
  private def d06(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val pieces = regexp_extract_all(lower(col("text")), lit(bpePattern), lit(0))
    d.select(col("doc_id"), pieces.as("pieces"))
      .select(
        col("doc_id"),
        size(col("pieces")).cast(LongType).as("n_bpe_tokens"),
        size(array_distinct(col("pieces"))).cast(LongType).as("n_distinct_pieces"),
        aggregate(col("pieces"), lit(0L), (acc, p) => acc + length(p))
          .as("sum_piece_len"))
      .orderBy(col("doc_id"))
  }
  private val d06Sql =
    s"""WITH pieced AS (
      |  SELECT doc_id,
      |    regexp_extract_all(lower(text), '${bpePattern.replace("'", "''")}') AS pieces
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(pieces) AS BIGINT) AS n_bpe_tokens,
      |  CAST(len(list_distinct(pieces)) AS BIGINT) AS n_distinct_pieces,
      |  CAST(coalesce(list_sum(list_transform(pieces, p -> CAST(length(p) AS BIGINT))), 0) AS BIGINT) AS sum_piece_len
      |FROM pieced
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d07 — stopword ratio: the third leg of classic quality scoring
  // (length/punctuation covered by d02, type-token by d03). Exact
  // integer counts divided once in DOUBLE; per-row work only.
  // ---------------------------------------------------------------------
  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "it", "for", "on", "with", "as", "at", "by", "that", "this")
  private def d07(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sw = stopwords.map(lit): Seq[Column]
    val base = d.select(col("doc_id"), tokens(col("text")).as("toks"))
    base.select(
        col("doc_id"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(filter(col("toks"), tk => tk.isin(sw: _*))).cast(LongType)
          .as("n_stopwords"))
      // exact ppm, not a raw double ratio (the round-1 q08 lesson)
      .withColumn("stopword_ppm",
        expr("(n_stopwords * 1000000) div greatest(n_tokens, 1)"))
      .orderBy(col("doc_id"))
  }
  private val d07Sql = {
    val inList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
      |  SELECT doc_id, $tokensSql AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(toks, tk -> tk IN ($inList))) AS BIGINT) AS n_stopwords,
      |  (CAST(len(list_filter(toks, tk -> tk IN ($inList))) AS BIGINT) * 1000000)
      |    // greatest(len(toks), 1) AS stopword_ppm
      |FROM base
      |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // d08 — deterministic hash sampling + train/val/test split: content
  // hashing (md5 mod 100) instead of rand(seed), because rand is
  // partition-dependent — re-partitioning or re-running on a different
  // cluster silently changes the sample, which is unacceptable for
  // training-data reproducibility. Hash-splitting is stable under any
  // layout, engine, or scale, and keys on doc_id so revised text
  // doesn't migrate documents between splits.
  // ---------------------------------------------------------------------
  /** d08's deterministic content-hash bucket (0..99) of a doc_id column —
    * THE single Spark-side source of the split derivation (mirror of
    * [[splitCaseSql]]); d08, d32, and CurationPipeline.withSplit all
    * compose these, so the split rule cannot fork. */
  def splitBucket(docId: Column): Column =
    pmod(conv(substring(md5(concat(lit("split:"), docId)), 1, 15), 16, 10)
      .cast(LongType), lit(100L))

  /** Bucket → train/val/test (80/10/10). */
  def splitOf(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** The full doc_id → split column. */
  def splitFor(docId: Column): Column = splitOf(splitBucket(docId))

  private def d08(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"), col("lang"))
      .withColumn("bucket", splitBucket(col("doc_id")))
      .withColumn("split", splitOf(col("bucket")))
      .orderBy(col("doc_id"))
  }
  /** d08's train/val/test CASE over a column named `doc_id` (DuckDB
    * oracle side) — THE single source for every oracle that re-states
    * the split (c01/c04/c05 interpolate this), so a change to the split
    * derivation cannot silently desynchronize one of them. */
  val splitCaseSql: String =
    "CASE WHEN CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train' " +
    "WHEN CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val' " +
    "ELSE 'test' END"

  private val d08Sql =
    s"""SELECT doc_id, lang,
      |  CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 15)) AS BIGINT) % 100 AS bucket,
      |  $splitCaseSql AS split
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d09 — repetition-based quality signals (the Gopher-report style
  // filters): duplicate-sentence and duplicate-token fractions per
  // document, as exact integer ppm. Highly repetitive documents are the
  // classic low-quality class that length/punctuation heuristics (d03)
  // miss. Per-row array math only — the sentence and token arrays are
  // materialized as their own projection step before being referenced
  // twice (size + array_distinct), per the HOF re-evaluation trap.
  // ---------------------------------------------------------------------
  private def d09(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= "")
    d.select(col("doc_id"), sents.as("sents"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("sents")).cast(LongType).as("n_sentences"),
        size(array_distinct(col("sents"))).cast(LongType).as("n_distinct_sentences"),
        size(col("toks")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("toks"))).cast(LongType).as("n_distinct_tokens"))
      .withColumn("dup_sentence_ppm",
        expr("(n_sentences - n_distinct_sentences) * 1000000 div greatest(n_sentences, 1)"))
      .withColumn("dup_token_ppm",
        expr("(n_tokens - n_distinct_tokens) * 1000000 div greatest(n_tokens, 1)"))
      .orderBy(col("doc_id"))
  }
  private val d09Sql =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(string_split_regex(text, '[.!?]+'), x -> trim(x)), x -> x <> '') AS sents,
       |    $tokensSql AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(sents) AS BIGINT) AS n_sentences,
       |  CAST(len(list_distinct(sents)) AS BIGINT) AS n_distinct_sentences,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       |  CAST((len(sents) - len(list_distinct(sents))) * 1000000 // greatest(len(sents), 1) AS BIGINT) AS dup_sentence_ppm,
       |  CAST((len(toks) - len(list_distinct(toks))) * 1000000 // greatest(len(toks), 1) AS BIGINT) AS dup_token_ppm
       |FROM t
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d10 — per-document top terms: the tf-idf surface of keyword
  // extraction, kept in exact integer space. Each document's terms are
  // ranked by (tf DESC, df ASC, term ASC) — term frequency first, rarer-
  // in-corpus wins ties — instead of a float tf·idf score, so both
  // engines agree bit-for-bit and the ranking is a total order (term is
  // unique within a doc).
  //
  // Scale shape: this IS the inverted-index build. The token explode
  // shuffles (doc_id, term) once for tf (map-side partial counts first);
  // corpus document frequency is a window count on the term partition —
  // tf is already one row per (doc, term), so the df partition carries
  // posting-list-sized groups, and a stopword-class term concentrates
  // its posting list on one key exactly as in n04. The same DF-cap
  // escape hatch applies upstream if a corpus needs it; counting alone
  // (unlike n04's pair explode) is linear in the posting list, so no cap
  // is applied here. Final top-k is a per-doc window over ≤ |terms per
  // doc| rows.
  // ---------------------------------------------------------------------
  private def d10(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    withDf.withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= 3)
      .orderBy(col("doc_id"), col("rk"))
  }
  private val d10Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks GROUP BY 1, 2),
       |wdf AS (
       |  SELECT doc_id, term, tf,
       |    CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
       |  FROM tf)
       |SELECT doc_id, term, tf, df, rk FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tf DESC, df ASC, term ASC) AS BIGINT) AS rk
       |  FROM wdf)
       |WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // d11 — token-window chunking: split every document into fixed-size
  // token windows with overlap (stride < size), the step that turns a
  // curated corpus into training sequences. Chunk boundaries are token
  // offsets — deterministic under any partitioning — and each chunk row
  // carries its token count and content digest so downstream exact-dedup
  // can run at CHUNK grain (near-dup boilerplate often repeats across
  // documents that are not near-dups as wholes).
  //
  // Scale: per-row explode only — fan-out is ~nt/stride rows per doc,
  // no shuffle introduced by the operator itself (the contract ORDER BY
  // aside). The token array is materialized as its own projection step
  // before the explode references it (the HOF re-evaluation trap).
  // ---------------------------------------------------------------------
  /** Chunk geometry shared with the m03 oracle — keep in sync there. */
  val ChunkSize = 50
  val ChunkStride = 40

  /** The chunk-row build shared by d11 (chunk listing), d14 (cross-
    * document boilerplate), d15 (packing), and the multimodal pairing
    * (m03): one row per (doc_id, chunk_idx) with the window's token
    * count and content digest. Input must expose `doc_id` and `text`;
    * every OTHER input column passes through unchanged (m03 carries its
    * media features alongside, so media+text pair in ONE pass — no
    * self-join of the table against itself). */
  def chunkRowsOf(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("nt", size(col("toks")).cast(LongType))
    // n_chunks = 1 for nt <= size, else 1 + ceil((nt - size) / stride)
    val withN = base.withColumn("n_chunks",
      when(col("nt") <= ChunkSize, 1L)
        .otherwise(lit(1L) + expr(
          s"(nt - $ChunkSize + $ChunkStride - 1) div $ChunkStride")))
    withN
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("n_chunks") - 1L)))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("chunk_idx") * ChunkStride + 1L).cast("int"),
          lit(ChunkSize)))
      .withColumn("chunk_n_tokens", size(col("chunk_toks")).cast(LongType))
      .withColumn("chunk_digest", md5(concat_ws(" ", col("chunk_toks"))))
      .drop("text", "toks", "nt", "n_chunks", "chunk_toks")
  }

  private def chunkRows(s: SparkSession, dir: String): DataFrame =
    chunkRowsOf(t(s, dir, "documents").select(col("doc_id"), col("text")))

  private def d11(s: SparkSession, dir: String): DataFrame =
    chunkRows(s, dir)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_n_tokens"),
        col("chunk_digest"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  private val d11Sql =
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks,
       |    CAST(len($tokensSql) AS BIGINT) AS nt
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, toks, nt,
       |    CASE WHEN nt <= $ChunkSize THEN 1
       |         ELSE 1 + (nt - $ChunkSize + $ChunkStride - 1) // $ChunkStride
       |    END AS n_chunks
       |  FROM base),
       |idx AS (
       |  SELECT doc_id, toks,
       |    CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM n),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    list_slice(toks, CAST(chunk_idx * $ChunkStride + 1 AS BIGINT),
       |      CAST(chunk_idx * $ChunkStride + $ChunkSize AS BIGINT)) AS chunk_toks
       |  FROM idx)
       |SELECT doc_id, chunk_idx,
       |  CAST(len(chunk_toks) AS BIGINT) AS chunk_n_tokens,
       |  md5(array_to_string(chunk_toks, ' ')) AS chunk_digest
       |FROM chunks
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // d12 — PII scrubbing: detect-and-redact emails, IPv4 addresses, and
  // phone numbers, the compliance pass every web-scale training corpus
  // runs before anything else sees the text. Patterns avoid lookaround
  // and anchors so Java regex (Spark) and RE2 (DuckDB) match the same
  // spans; replacement runs in a fixed order (email → ip → phone) so the
  // scrubbed text is deterministic. Per-row regex work only — zero
  // shuffle, embarrassingly parallel at 100 TB.
  //
  // The synthetic corpus contains no PII, so the query first AUGMENTS
  // each document with deterministic doc_id-derived PII spans (mirrored
  // exactly in the oracle) — a harness choice to make the scrub
  // observable, not part of the operator semantics: `scrub` itself takes
  // any text column.
  // ---------------------------------------------------------------------
  private val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipv4Pat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val phonePat = "555-[0-9]{4}"

  /** Total PII spans detected in a text column (emails + IPv4s +
    * phones). Detection signal for audits — a LENGTH DELTA after
    * scrubbing is not one, because a replacement token can be exactly as
    * long as the span it replaces. */
  def piiMatchCount(text: Column): Column =
    (regexp_count(text, lit(emailPat)) + regexp_count(text, lit(ipv4Pat))
      + regexp_count(text, lit(phonePat))).cast(LongType)

  /** Redact the three PII classes from a text column, fixed order. The
    * IP pattern would also match dotted spans inside an already-matched
    * email domain — replacing emails first resolves the overlap the same
    * way in both engines. */
  def scrub(text: Column): Column = {
    val noEmail = regexp_replace(text, emailPat, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Pat, "<IP>")
    regexp_replace(noIp, phonePat, "<PHONE>")
  }

  private def d12(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val aug = concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(""),
      when(pmod(col("doc_id"), lit(5L)) === 0L,
        concat(lit(" from 10."), pmod(col("doc_id"), lit(256L)), lit(".0.42")))
        .otherwise(""),
      when(pmod(col("doc_id"), lit(7L)) === 0L,
        concat(lit(" call 555-"), pmod(col("doc_id"), lit(9000L)) + 1000L))
        .otherwise(""))
    // materialize aug once: it is referenced by three counts + the scrub
    // chain, and CollapseProject would otherwise inline the concat tree
    // into every reference (the HOF re-evaluation trap, regex edition).
    d.select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        regexp_count(col("aug"), lit(emailPat)).cast(LongType).as("n_emails"),
        regexp_count(col("aug"), lit(ipv4Pat)).cast(LongType).as("n_ips"),
        regexp_count(col("aug"), lit(phonePat)).cast(LongType).as("n_phones"),
        md5(scrub(col("aug"))).as("scrubbed_digest"),
        (length(col("aug")) - length(scrub(col("aug")))).cast(LongType)
          .as("n_chars_delta"))
      .orderBy(col("doc_id"))
  }
  private val d12Sql = {
    // single-quoted SQL literals: only ' would need escaping (none
    // present) — RE2 gets the identical pattern source as Java regex.
    val (e, i, p) = (emailPat, ipv4Pat, phonePat)
    s"""WITH augd AS (
       |  SELECT doc_id,
       |    concat(text,
       |      CASE WHEN doc_id % 3 = 0
       |           THEN concat(' contact user', doc_id, '@example.com now') ELSE '' END,
       |      CASE WHEN doc_id % 5 = 0
       |           THEN concat(' from 10.', doc_id % 256, '.0.42') ELSE '' END,
       |      CASE WHEN doc_id % 7 = 0
       |           THEN concat(' call 555-', doc_id % 9000 + 1000) ELSE '' END) AS aug
       |  FROM documents),
       |scrubbed AS (
       |  SELECT doc_id, aug,
       |    regexp_replace(regexp_replace(regexp_replace(aug,
       |      '$e', '<EMAIL>', 'g'),
       |      '$i', '<IP>', 'g'),
       |      '$p', '<PHONE>', 'g') AS clean
       |  FROM augd)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '$e')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(aug, '$i')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(aug, '$p')) AS BIGINT) AS n_phones,
       |  md5(clean) AS scrubbed_digest,
       |  CAST(length(aug) - length(clean) AS BIGINT) AS n_chars_delta
       |FROM scrubbed
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // d13 — incremental dedup of a new crawl batch against an existing
  // corpus, Bloom-prefiltered: the steady-state shape of production
  // dedup, where the corpus is petabytes and each day's batch must not
  // re-shuffle it. A Bloom filter over the corpus digests (built once,
  // a few hundred MB at 10^10 docs) is broadcast to the batch; rows the
  // filter rejects are DEFINITELY new and pass with zero shuffle, and
  // only the "maybe duplicate" sliver (true dups + false positives) pays
  // an exact anti-join against the corpus digest column. The filter is
  // deliberately sized small here (1k items / 2k bits ⇒ high FP rate at
  // sf0.01) so the exact-confirm path is genuinely exercised; the final
  // result is EXACT regardless of FP rate — Bloom filters have no false
  // negatives — which is why the oracle is a plain anti-join.
  //
  // Batch construction (mirrored in the oracle): odd doc_ids are the new
  // crawl, plus every doc_id % 10 == 0 document re-crawled under a new
  // crawl_id — re-fetches of pages already in the corpus (all % 10 == 0
  // ids are even = existing), which is exactly what incremental dedup
  // must drop. crawl_id = doc_id*10 + branch keeps the two branches
  // disjoint at EVERY doc_id (an additive offset collides past 10^6,
  // silently breaking the ORDER BY's totality at larger SFs).
  // ---------------------------------------------------------------------
  private def d13(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("digest"))
    val existing = docs.where(pmod(col("doc_id"), lit(2L)) === 0L)
    val batch = docs.where(pmod(col("doc_id"), lit(2L)) === 1L)
      .withColumn("crawl_id", col("doc_id") * 10L + 1L)
      .unionByName(docs.where(pmod(col("doc_id"), lit(10L)) === 0L)
        .withColumn("crawl_id", col("doc_id") * 10L + 2L))
    // bloom_filter_agg / might_contain exist only as internal Catalyst
    // nodes (Spark uses them for its own runtime-filter injection, the
    // exact pattern replicated here), so both are constructed through
    // the Bridge: the corpus-side aggregate becomes a scalar subquery —
    // MightContain requires a constant or subquery filter input — and
    // ReuseSubquery collapses the two branch references to one run.
    val bloomPlan = existing.select(Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("digest"))),
        Literal(1000L), Literal(2000L)).toAggregateExpression()).as("bf"))
    val maybeDup: Column = Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan.queryExecution.analyzed, Seq.empty),
      Bridge.expression(xxhash64(col("digest")))))
    // The batch is scanned twice (definitely-new pass + candidate pass)
    // — two cheap columnar scans pruned to (doc_id, digest), rather than
    // one persisted batch-sized cache.
    val definiteNew = batch.where(!maybeDup)
    val confirmedNew = batch.where(maybeDup)
      .join(existing.select(col("digest")), Seq("digest"), "left_anti")
    definiteNew.select(col("crawl_id"), col("doc_id"), col("digest"))
      .unionByName(
        confirmedNew.select(col("crawl_id"), col("doc_id"), col("digest")))
      .orderBy(col("crawl_id"))
  }
  private val d13Sql =
    """WITH docs AS (
      |  SELECT doc_id, md5(text) AS digest FROM documents),
      |existing AS (
      |  SELECT digest FROM docs WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT CAST(doc_id * 10 + 1 AS BIGINT) AS crawl_id, doc_id, digest
      |  FROM docs WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT CAST(doc_id * 10 + 2 AS BIGINT) AS crawl_id, doc_id, digest
      |  FROM docs WHERE doc_id % 10 = 0)
      |SELECT crawl_id, doc_id, digest
      |FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.digest = b.digest)
      |ORDER BY crawl_id""".stripMargin

  // ---------------------------------------------------------------------
  // d14 — cross-document repeated-chunk detection (boilerplate at chunk
  // grain): the d11 windows whose exact content recurs — within one
  // document (internal repetition) or across documents (shared headers,
  // licenses, navigation chrome — the near-dup mass that document-level
  // exact dedup cannot see because the SURROUNDING text differs). The
  // digests here are exactly what a production pipeline feeds back as a
  // chunk-level suppression list.
  //
  // Scale: one shuffle on chunk_digest with map-side partial counts —
  // the d01 exact-dedup shape one grain finer; the output is only the
  // recurring digests (tiny), never the chunk texts.
  // ---------------------------------------------------------------------
  private def d14(s: SparkSession, dir: String): DataFrame =
    chunkRows(s, dir)
      .groupBy(col("chunk_digest"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"))
      .where(col("n_occurrences") > 1L)
      .orderBy(col("chunk_digest"))
  private val d14Sql =
    s"""WITH base AS (
       |  SELECT doc_id, ${tokensSql} AS toks,
       |    CAST(len(${tokensSql}) AS BIGINT) AS nt
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, toks, nt,
       |    CASE WHEN nt <= $ChunkSize THEN 1
       |         ELSE 1 + (nt - $ChunkSize + $ChunkStride - 1) // $ChunkStride
       |    END AS n_chunks
       |  FROM base),
       |idx AS (
       |  SELECT doc_id, toks,
       |    CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM n),
       |chunks AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_slice(toks,
       |      CAST(chunk_idx * $ChunkStride + 1 AS BIGINT),
       |      CAST(chunk_idx * $ChunkStride + $ChunkSize AS BIGINT)), ' ')) AS chunk_digest
       |  FROM idx)
       |SELECT chunk_digest,
       |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS min_doc_id
       |FROM chunks
       |GROUP BY 1
       |HAVING COUNT(*) > 1
       |ORDER BY chunk_digest""".stripMargin

  // ---------------------------------------------------------------------
  // d15 — sequence packing: assemble d11's chunks into fixed-token-
  // budget training sequences — the "pack to 2048" step between
  // curation and the trainer. Packing rule is OFFSET BINNING: walking
  // the chunks in deterministic order, a chunk belongs to the sequence
  // covering its start offset (seq = cum_tokens_before div budget), so
  // a boundary chunk may spill past the budget by at most one chunk
  // (≤ 50 ≪ 512) — the trainer truncates or reserves that headroom.
  // Chosen over exact cut-on-overflow fill because the bin is then a
  // pure function of the running sum (one window), whereas cut-on-
  // overflow needs a sequential carry that no parallel window
  // expresses.
  //
  // Scale shape: packing is a running-sum WINDOW, and a single global
  // window is the classic single-partition scale-killer — so chunks are
  // first sharded by a DOC_ID hash (md5 of doc_id, mod 32; any shard
  // count works) — doc-grain, NOT chunk-grain, so one document's chunks
  // stay contiguous in a single shard's packing stream — and packed
  // WITHIN shards: one shuffle on shard,
  // every window partition is a shard, all 32 (or 32k) run in parallel,
  // and each shard's packed output feeds one downstream writer. Cross-
  // shard sequence ids never collide because the shard id is part of
  // the key. Fill loss vs a global pack is negligible (≤ one partial
  // sequence per shard).
  //
  // ---------------------------------------------------------------------
  private val SeqBudget = graft.Config.SeqBudget
  private val PackShards = 32
  private def packedChunks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = chunkRows(s, dir)
      .withColumn("shard",
        pmod(conv(substring(md5(concat(lit("pack:"), col("doc_id"))), 1, 15), 16, 10)
          .cast(LongType), lit(PackShards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("cum_tokens", sum(col("chunk_n_tokens")).over(w))
      .withColumn("seq_in_shard",
        expr(s"(cum_tokens - chunk_n_tokens) div $SeqBudget"))
      .select(col("shard"), col("seq_in_shard"), col("doc_id"), col("chunk_idx"),
        col("chunk_n_tokens"), col("cum_tokens"))
  }

  private def d15(s: SparkSession, dir: String): DataFrame =
    packedChunks(s, dir)
      .orderBy(col("shard"), col("doc_id"), col("chunk_idx"))
  /** The chunk-geometry + offset-binning packing CTEs shared by d15's
    * and d24's oracles (the SQL mirror of [[packedChunks]]) — one
    * definition of "a packed sequence", so the two oracles cannot
    * silently diverge. */
  private val packedCtesSql: String =
    s"""base AS (
       |  SELECT doc_id, ${tokensSql} AS toks,
       |    CAST(len(${tokensSql}) AS BIGINT) AS nt
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, toks, nt,
       |    CASE WHEN nt <= $ChunkSize THEN 1
       |         ELSE 1 + (nt - $ChunkSize + $ChunkStride - 1) // $ChunkStride
       |    END AS n_chunks
       |  FROM base),
       |idx AS (
       |  SELECT doc_id, toks,
       |    CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM n),
       |chunks AS (
       |  SELECT doc_id, chunk_idx,
       |    CAST(len(list_slice(toks,
       |      CAST(chunk_idx * $ChunkStride + 1 AS BIGINT),
       |      CAST(chunk_idx * $ChunkStride + $ChunkSize AS BIGINT))) AS BIGINT) AS chunk_n_tokens,
       |    CAST(concat('0x', substr(md5(concat('pack:', doc_id)), 1, 15)) AS BIGINT) % $PackShards AS shard
       |  FROM idx),
       |packed AS (
       |  SELECT shard, doc_id, chunk_idx, chunk_n_tokens,
       |    CAST(SUM(chunk_n_tokens) OVER (PARTITION BY shard
       |      ORDER BY doc_id, chunk_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM chunks)""".stripMargin

  private val d15Sql =
    s"""WITH $packedCtesSql
       |SELECT shard,
       |  CAST((cum_tokens - chunk_n_tokens) // $SeqBudget AS BIGINT) AS seq_in_shard,
       |  doc_id, chunk_idx, chunk_n_tokens, cum_tokens
       |FROM packed
       |ORDER BY shard, doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // d33 — packed-sequence attention manifest: the per-sequence sidecar a
  // trainer consumes next to d15's packed corpus — chunk/doc counts,
  // token fill (ppm of the budget; >10⁶ marks the deliberate boundary
  // spill), and the sorted WITHIN-SEQUENCE start offsets where a new
  // document begins. Those offsets are the segment boundaries of
  // block-diagonal attention masking (tokens must not attend across the
  // document seam packing introduced) and of per-doc loss masking; a
  // doc continuing from the previous sequence starts at its first chunk
  // here, exactly where its mask segment resumes.
  //
  // Offsets ship as one canonical comma-joined string: the manifest is
  // read row-at-a-time by a data loader, and a string column hash-gates
  // across engines without depending on nested-list comparator
  // behavior.
  //
  // Scale shape: rides [[packedChunks]] (one shard shuffle, already
  // paid by d15) + two seq-grain aggregates; sequences are ≤ budget
  // tokens ≈ a dozen chunks, so per-group state is bounded and the
  // manifest is ~1/10 the chunk table's rows. Single source both
  // sides: the Spark frame IS packedChunks, the oracle rides
  // `packedCtesSql` — "a packed sequence" is defined once.
  // ---------------------------------------------------------------------
  private def d33(s: SparkSession, dir: String): DataFrame = {
    val local = packedChunks(s, dir)
      .withColumn("start_local", col("cum_tokens") - col("chunk_n_tokens")
        - col("seq_in_shard") * lit(SeqBudget.toLong))
    val starts = local
      .groupBy(col("shard"), col("seq_in_shard"), col("doc_id"))
      .agg(min(col("start_local")).as("doc_start"))
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(sort_array(collect_list(col("doc_start"))), ",")
          .as("doc_starts_csv"))
    local.groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_n_tokens")).as("n_tokens"))
      .join(starts, Seq("shard", "seq_in_shard"))
      .select(col("shard"), col("seq_in_shard"), col("n_chunks"), col("n_docs"),
        col("n_tokens"),
        expr(s"n_tokens * 1000000 div $SeqBudget").as("fill_ppm"),
        col("doc_starts_csv"))
      .orderBy(col("shard"), col("seq_in_shard"))
  }
  private val d33Sql =
    s"""WITH $packedCtesSql,
       |seqs AS (
       |  SELECT shard,
       |    CAST((cum_tokens - chunk_n_tokens) // $SeqBudget AS BIGINT) AS seq_in_shard,
       |    doc_id, chunk_n_tokens,
       |    cum_tokens - chunk_n_tokens
       |      - ((cum_tokens - chunk_n_tokens) // $SeqBudget) * $SeqBudget
       |      AS start_local
       |  FROM packed),
       |ds AS (
       |  SELECT shard, seq_in_shard, doc_id, MIN(start_local) AS doc_start
       |  FROM seqs GROUP BY 1, 2, 3),
       |starts AS (
       |  SELECT shard, seq_in_shard,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    array_to_string(list_sort(list(doc_start)), ',') AS doc_starts_csv
       |  FROM ds GROUP BY 1, 2)
       |SELECT q.shard, q.seq_in_shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunks, s.n_docs,
       |  CAST(SUM(q.chunk_n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(q.chunk_n_tokens) * 1000000 // $SeqBudget AS BIGINT) AS fill_ppm,
       |  s.doc_starts_csv
       |FROM seqs q
       |JOIN starts s ON q.shard = s.shard AND q.seq_in_shard = s.seq_in_shard
       |GROUP BY q.shard, q.seq_in_shard, s.n_docs, s.doc_starts_csv
       |ORDER BY q.shard, q.seq_in_shard""".stripMargin


  // ---------------------------------------------------------------------
  // d16 — corpus vocabulary heavy hitters: the exact top-50 tokens by
  // corpus term frequency, each with its document frequency — the
  // vocabulary census behind tokenizer design, stopword selection, and
  // the DF caps used by n04/n06 (MaxTokenDf is chosen by looking at
  // exactly this distribution).
  //
  // Scale shape: tf and df come from a TWO-LEVEL aggregate — first
  // (token, doc_id) then token — because a single groupBy mixing
  // COUNT(*) with COUNT(DISTINCT doc_id) plans an Expand that doubles
  // the exploded token stream (the q06 lesson). Both levels partial-
  // aggregate map-side; the final top-50 lowers to TakeOrderedAndProject
  // and the rank window runs on 50 rows, bounded at any corpus size.
  // ---------------------------------------------------------------------
  private def d16(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf_doc"))
    val vocab = perDoc.groupBy(col("token"))
      .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
    val top = vocab.orderBy(col("tf").desc, col("token")).limit(50)
    top.withColumn("rk",
        row_number().over(Window.orderBy(col("tf").desc, col("token")))
          .cast(LongType))
      .orderBy(col("rk"))
  }
  private val d16Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS token FROM documents),
       |per_doc AS (
       |  SELECT token, doc_id, COUNT(*) AS tf_doc FROM toks GROUP BY 1, 2),
       |vocab AS (
       |  SELECT token, CAST(SUM(tf_doc) AS BIGINT) AS tf,
       |    CAST(COUNT(*) AS BIGINT) AS df
       |  FROM per_doc GROUP BY 1),
       |top AS (
       |  SELECT token, tf, df FROM vocab ORDER BY tf DESC, token LIMIT 50)
       |SELECT token, tf, df,
       |  CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT) AS rk
       |FROM top
       |ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------------
  // d17 — normalization-aware exact dedup: the dedup grain between d01
  // (byte-exact) and n01/n02 (near-dup). Documents are canonicalized
  // through the shared tokenizer (casefold, punctuation/whitespace
  // collapse) and grouped by the digest of the rejoined token stream, so
  // trivially-reformatted copies — different casing, spacing, or
  // punctuation around identical words — collapse into one group that
  // byte-exact dedup cannot see. n_raw_forms counts how many DISTINCT
  // byte-level variants each normalized group absorbs (1 = d01 would
  // have found it too; >1 = normalization's added value).
  //
  // Scale shape: per-row normalize + digest, then a TWO-LEVEL aggregate
  // — (norm, raw) before norm — so COUNT(*) and the distinct-raw count
  // never share a groupBy (the Expand that doubles the stream, the
  // d16/q06 lesson). Both levels partial-aggregate map-side; the
  // shuffle carries two 32-char digests + two longs per row no matter
  // how wide the documents are.
  // ---------------------------------------------------------------------
  private def d17(s: SparkSession, dir: String): DataFrame = {
    val perRaw = t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(col("text")).as("raw_digest"),
        md5(array_join(tokens(col("text")), " ")).as("norm_digest"))
      .groupBy(col("norm_digest"), col("raw_digest"))
      .agg(min(col("doc_id")).as("min_doc"), count(lit(1)).as("n"))
    perRaw.groupBy(col("norm_digest"))
      .agg(
        min(col("min_doc")).as("keeper_doc_id"),
        sum(col("n")).as("n_copies"),
        count(lit(1)).as("n_raw_forms"))
      .orderBy(col("keeper_doc_id"))
  }
  private val d17Sql =
    s"""WITH per_raw AS (
       |  SELECT md5(array_to_string($tokensSql, ' ')) AS norm_digest,
       |    md5(text) AS raw_digest,
       |    MIN(doc_id) AS min_doc, COUNT(*) AS n
       |  FROM documents GROUP BY 1, 2)
       |SELECT norm_digest,
       |  CAST(MIN(min_doc) AS BIGINT) AS keeper_doc_id,
       |  CAST(SUM(n) AS BIGINT) AS n_copies,
       |  CAST(COUNT(*) AS BIGINT) AS n_raw_forms
       |FROM per_raw
       |GROUP BY 1
       |ORDER BY keeper_doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d18 — per-source document cap (the "domain cap" of web-corpus
  // assembly: no single site may contribute more than K documents):
  // every document gets a deterministic hash rank (the d08/c03 idiom, so
  // reruns and resamples are reproducible), and the K smallest ranks per
  // source survive.
  //
  // Scale shape: per-key top-k at RAW-ROW grain — q30's window form
  // would sort each source's full row set on one task, inheriting the
  // domain skew this operator exists to police (the hot domain IS the
  // biggest group). [[graft.functions.TopKSmallest]] instead bounds
  // aggregation state at K pairs per source per mapper, so the shuffle
  // carries ≤ mappers·K rows per source no matter how hot the domain;
  // see the aggregate's scaladoc. The oracle is the plain rank window —
  // DuckDB proves the bounded plan ≡ the textbook semantics.
  // ---------------------------------------------------------------------
  private val SourceCap = 10
  private def d18(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        pmod(conv(substring(md5(concat(lit("dcap:"), col("doc_id"))), 1, 15), 16, 10)
          .cast(LongType), lit(1000000L)).as("h_ppm"))
    scored.groupBy(col("source"))
      .agg(graft.functions.TopKSmallest
        .of(col("h_ppm"), col("doc_id"), SourceCap).as("kept"))
      .select(col("source"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("source"),
        (col("pos") + 1).cast(LongType).as("rk"),
        col("kv.payload").as("doc_id"),
        col("kv.key").as("h_ppm"))
      .orderBy(col("source"), col("rk"))
  }
  private val d18Sql =
    s"""WITH scored AS (
       |  SELECT source, doc_id,
       |    CAST(concat('0x', substr(md5(concat('dcap:', doc_id)), 1, 15)) AS BIGINT) % 1000000 AS h_ppm
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, h_ppm,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY h_ppm, doc_id) AS BIGINT) AS rk
       |  FROM scored)
       |SELECT source, rk, doc_id, h_ppm
       |FROM ranked
       |WHERE rk <= $SourceCap
       |ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------------------------
  // d19 — cross-snapshot corpus delta: what changed between two crawls
  // of the same corpus (docs added, removed, or edited), the primitive
  // behind incremental re-training and crawl QA ("did the refresh drop
  // 30% of a domain?"). Both snapshots are synthesized deterministically
  // from `documents` (the d13 pattern, mirrored in the oracle):
  //   old = doc_id % 7 != 3        (the % 7 == 3 docs arrive later)
  //   new = doc_id % 11 != 4       (the % 11 == 4 docs got dropped)
  //   and the new crawl re-edited every % 5 == 1 doc (text || ' rev2').
  //
  // Scale shape: each side is pruned to (doc_id, md5(text)) at the scan
  // — 48 bytes/row moves, never the text — then ONE co-partitioned
  // full-outer shuffle join on doc_id classifies every doc, and the
  // unchanged bulk (the overwhelming majority of a real refresh) is
  // filtered before anything widens: output is only the delta. With both
  // snapshots stored bucketed by doc_id (Sink.saveBucketedTable) the
  // join needs zero Exchange; digests can also come precomputed from the
  // d01 dedup pass instead of being recomputed here.
  // ---------------------------------------------------------------------
  /** Delta between two (doc_id, text) snapshots — d19's core, public
    * for crafted-corpus specs. Emits one row per added/removed/changed
    * doc; unchanged docs (the bulk) never leave the join. */
  def snapshotDelta(old: DataFrame, nw: DataFrame): DataFrame = {
    val o = old.select(col("doc_id"), md5(col("text")).as("old_digest"))
    val n = nw.select(col("doc_id"), md5(col("text")).as("new_digest"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("old_digest"),
        col("new_digest"))
      .orderBy(col("doc_id"))
  }

  private def d19(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    snapshotDelta(
      docs.where(pmod(col("doc_id"), lit(7L)) =!= 3L)
        .select(col("doc_id"), col("text")),
      docs.where(pmod(col("doc_id"), lit(11L)) =!= 4L)
        .select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(5L)) === 1L, lit(" rev2"))
              .otherwise(lit(""))).as("text")))
  }
  private val d19Sql =
    """WITH old AS (
      |  SELECT doc_id, md5(text) AS old_digest
      |  FROM documents WHERE doc_id % 7 != 3),
      |nw AS (
      |  SELECT doc_id,
      |    md5(text || CASE WHEN doc_id % 5 = 1 THEN ' rev2' ELSE '' END)
      |      AS new_digest
      |  FROM documents WHERE doc_id % 11 != 4)
      |SELECT COALESCE(old.doc_id, nw.doc_id) AS doc_id,
      |  CASE WHEN old.doc_id IS NULL THEN 'added'
      |       WHEN nw.doc_id IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  old_digest, new_digest
      |FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id
      |WHERE old.doc_id IS NULL OR nw.doc_id IS NULL
      |   OR old_digest != new_digest
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d22 — per-source distribution drift between two crawl snapshots:
  // d19 tells you WHICH docs changed; this tells you whether a source's
  // SHAPE changed — the crawl-QA question "did src7's length profile
  // shift?" that catches silently-truncated fetches or a template
  // change even when doc counts look fine. Membership reuses d19's
  // deterministic snapshot rules (old: doc_id % 7 != 3, new: doc_id %
  // 11 != 4), so both snapshots come out of ONE scan as conditional
  // sums — no union, no second pass. Length histogram at
  // LenBucketChars-char grain; drift = total variation distance between
  // the two per-source histograms, in exact integer ppm (shares are
  // integer-divided per bucket, then |Δ| summed — associative,
  // bit-identical across engines).
  //
  // Scale shape: first aggregate lands on (source, bucket) keys with
  // map-side partials — the corpus collapses before anything source-
  // grain happens; the second aggregate runs on ~sources·buckets rows.
  // ---------------------------------------------------------------------
  /** Histogram bucket width (chars) for the drift report. */
  val LenBucketChars = 200L

  private def d22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        expr(s"n_chars div $LenBucketChars").as("bucket"),
        when(pmod(col("doc_id"), lit(7L)) =!= 3L, 1L).otherwise(0L).as("in_old"),
        when(pmod(col("doc_id"), lit(11L)) =!= 4L, 1L).otherwise(0L).as("in_new"))
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("in_old")).as("o"), sum(col("in_new")).as("n"))
      .withColumn("old_docs",
        sum(col("o")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))))
      .withColumn("new_docs",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(
        min(col("old_docs")).as("old_docs"),
        min(col("new_docs")).as("new_docs"),
        sum(abs(expr("o * 1000000 div greatest(old_docs, 1)") -
          expr("n * 1000000 div greatest(new_docs, 1)"))).as("tv_ppm"))
      .orderBy(col("source"))
  private val d22Sql =
    s"""WITH hist AS (
       |  SELECT source, n_chars // $LenBucketChars AS bucket,
       |    CAST(sum(CASE WHEN doc_id % 7 != 3 THEN 1 ELSE 0 END) AS BIGINT) AS o,
       |    CAST(sum(CASE WHEN doc_id % 11 != 4 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |tot AS (
       |  SELECT *, sum(o) OVER (PARTITION BY source) AS old_docs,
       |    sum(n) OVER (PARTITION BY source) AS new_docs
       |  FROM hist)
       |SELECT source, CAST(min(old_docs) AS BIGINT) AS old_docs,
       |  CAST(min(new_docs) AS BIGINT) AS new_docs,
       |  CAST(sum(abs(o * 1000000 // greatest(old_docs, 1)
       |    - n * 1000000 // greatest(new_docs, 1))) AS BIGINT) AS tv_ppm
       |FROM tot GROUP BY source
       |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // d21 — sub-document dedup with reconstruction: documents are cut into
  // fixed NON-overlapping token segments (d11's chunker with stride ==
  // size), every segment whose exact content already occurred earlier in
  // the corpus — in ANY document — is dropped, and each document is
  // reassembled from its surviving segments. This is the remove-side
  // counterpart of d14's boilerplate DETECTION: shared headers, license
  // blocks, and navigation chrome vanish from every copy but the first,
  // while document-level dedup (d01) would have kept them all because
  // the surrounding text differs.
  //
  // Scale shape: keeper election is a min(struct(doc_id, seg_idx))
  // AGGREGATE per segment digest — the shuffle carries (digest, two
  // longs) regardless of how hot a segment is, where the rank-window
  // form would sort the hottest digest's full occurrence list on one
  // task (the d18 lesson at segment grain). Kept-ness comes back as one
  // co-keyed equi-join of that tiny keeper table against the segment
  // stream, and reconstruction is doc-grain: collect_list gathers at
  // most one document's own segments — bounded by document size, never
  // by corpus size. Rebuilt text is token-normalized (single spaces),
  // the same canonical form every other text operator keys on.
  // ---------------------------------------------------------------------
  /** Non-overlapping segment size (tokens). */
  val SegSize = 25

  private def segRows(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("nt", size(col("toks")).cast(LongType))
      .withColumn("n_segs",
        greatest(expr(s"(nt + ${SegSize - 1}) div $SegSize"), lit(1L)))
    base
      .withColumn("seg_idx", explode(sequence(lit(0L), col("n_segs") - 1L)))
      .withColumn("seg_text", concat_ws(" ",
        slice(col("toks"), (col("seg_idx") * SegSize + 1L).cast("int"),
          lit(SegSize))))
      .select(col("doc_id"), col("seg_idx"), col("seg_text"),
        md5(col("seg_text")).as("seg_digest"))
  }

  /** Sub-document dedup over any (doc_id, text) frame — d21's core,
    * public for crafted-corpus and fuzz specs. */
  def subdocDedup(docs: DataFrame): DataFrame = {
    val segs = segRows(docs.select(col("doc_id"), col("text")))
    val keepers = segs
      .groupBy(col("seg_digest"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("k"))
      .select(col("seg_digest"), col("k.doc_id").as("k_doc"),
        col("k.seg_idx").as("k_seg"))
    segs
      .join(keepers, "seg_digest")
      .withColumn("kept",
        col("doc_id") === col("k_doc") && col("seg_idx") === col("k_seg"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("seg_idx"), col("seg_text"))))),
          e => e.getField("seg_text")))).as("rebuilt_digest"))
      .orderBy(col("doc_id"))
  }

  private def d21(s: SparkSession, dir: String): DataFrame =
    subdocDedup(t(s, dir, "documents"))
  private val d21Sql =
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks,
       |    CAST(len($tokensSql) AS BIGINT) AS nt
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, toks,
       |    greatest((nt + ${SegSize - 1}) // $SegSize, 1) AS n_segs
       |  FROM base),
       |segs AS (
       |  SELECT doc_id,
       |    CAST(unnest(range(0, n_segs)) AS BIGINT) AS seg_idx, toks
       |  FROM n),
       |seg AS (
       |  SELECT doc_id, seg_idx,
       |    array_to_string(list_slice(toks,
       |      CAST(seg_idx * $SegSize + 1 AS BIGINT),
       |      CAST((seg_idx + 1) * $SegSize AS BIGINT)), ' ') AS seg_text
       |  FROM segs),
       |marked AS (
       |  SELECT doc_id, seg_idx, seg_text,
       |    row_number() OVER (PARTITION BY md5(seg_text)
       |      ORDER BY doc_id, seg_idx) = 1 AS kept
       |  FROM seg)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN kept THEN seg_text END, ' '
       |    ORDER BY seg_idx), '')) AS rebuilt_digest
       |FROM marked GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d23 — n-gram novelty scoring: per document, the fraction of its
  // DISTINCT 3-gram shingles that occur in no other document — the
  // diversity/memorization signal dedup QA watches (a doc scoring near
  // 0 is assembled entirely from corpus-common text even if no single
  // document near-dups it; a corpus whose novelty mass collapses after
  // a crawl merge was over-harvested). Counting df on within-doc
  // DISTINCT shingles makes self-repetition irrelevant: df == 1 means
  // globally unique.
  //
  // Scale shape: the (doc_id, shingle-digest) stream is distinct within
  // doc by construction and persisted — it feeds both the df aggregate
  // and the join back (Spark would otherwise re-tokenize the corpus per
  // branch, the c05 lesson). Both the df groupBy and the join key on
  // the digest, so the second pass reuses the first's partitioning;
  // shuffles carry (16-byte digest, doc_id) rows, never shingle text.
  // ---------------------------------------------------------------------
  private def d23(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shingles(col("toks")).as("sh"))
      .select(col("doc_id"),
        explode(array_distinct(col("sh"))).as("sg"))
      .select(col("doc_id"), md5(col("sg")).as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfs = sh.groupBy(col("dg")).agg(count(lit(1)).as("df"))
    sh.join(dfs, "dg")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_ppm",
        expr("n_unique * 1000000 div greatest(n_shingles, 1)"))
      .orderBy(col("doc_id"))
  }
  private val d23Sql =
    s"""WITH sh AS (
       |  SELECT doc_id, md5(unnest(list_distinct(${Dedup.shinglesSql}))) AS dg
       |  FROM documents),
       |dfs AS (
       |  SELECT dg, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000
       |    // greatest(count(*), 1) AS BIGINT) AS novelty_ppm
       |FROM sh JOIN dfs USING (dg)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d24 — packing utilization report: per shard, how well d15's packed
  // training sequences fill the token budget — the QA readout that
  // decides whether the chunk geometry (d11) and the budget (d15) are
  // matched, because every sub-budget sequence is padding the trainer
  // pays for at full FLOP price. fill_ppm can exceed 10⁶: d15's offset
  // binning lets a boundary chunk spill past the budget (the documented
  // headroom contract), and the report makes that spill visible per
  // shard. All integer arithmetic; the aggregate runs on (shard, seq)
  // keys — thousands of rows after the packing window already did the
  // heavy lifting.
  // ---------------------------------------------------------------------
  private def d24(s: SparkSession, dir: String): DataFrame =
    packedChunks(s, dir)
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(sum(col("chunk_n_tokens")).as("seq_tokens"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("seq_tokens")).as("total_tokens"),
        sum(when(col("seq_tokens") >= SeqBudget, 1L).otherwise(0L))
          .as("full_seqs"),
        min(col("seq_tokens")).as("min_seq_tokens"),
        max(col("seq_tokens")).as("max_seq_tokens"))
      .withColumn("fill_ppm",
        expr(s"total_tokens * 1000000 div (n_seqs * $SeqBudget)"))
      .orderBy(col("shard"))
  private val d24Sql =
    s"""WITH $packedCtesSql,
       |seqs AS (
       |  SELECT shard,
       |    CAST((cum_tokens - chunk_n_tokens) // $SeqBudget AS BIGINT) AS seq_in_shard,
       |    CAST(SUM(chunk_n_tokens) AS BIGINT) AS seq_tokens
       |  FROM packed GROUP BY 1, 2)
       |SELECT shard, CAST(count(*) AS BIGINT) AS n_seqs,
       |  CAST(sum(seq_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN seq_tokens >= $SeqBudget THEN 1 ELSE 0 END)
       |    AS BIGINT) AS full_seqs,
       |  CAST(min(seq_tokens) AS BIGINT) AS min_seq_tokens,
       |  CAST(max(seq_tokens) AS BIGINT) AS max_seq_tokens,
       |  CAST(sum(seq_tokens) * 1000000 // (count(*) * $SeqBudget)
       |    AS BIGINT) AS fill_ppm
       |FROM seqs GROUP BY shard
       |ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // d27 — exact substring deduplication at token-window grain (the shape
  // of Lee et al. 2022, "Deduplicating Training Data Makes Language
  // Models Better", without the suffix array): every stride-1 window of
  // 8 tokens is keyed by the md5 of its joined tokens; a window is a
  // cross-document duplicate when its key occurs in ≥ 2 distinct
  // documents (min(doc_id) < max(doc_id) — two aggregates, no
  // count-distinct); per document the report is the duplicated-window
  // count and the number of token POSITIONS covered by any duplicated
  // window (the span a substring-dedup pass would excise), as exact
  // integer ppm of the document's tokens.
  //
  // Scale: the explode is |tokens| rows per doc but each row is
  // (doc_id, pos, 32-byte key) — the window TEXT never shuffles; the
  // dup-key census is one token-grain groupBy with map-side partials,
  // same shape as d16's vocab census. Coverage re-explodes only the
  // duplicated windows (the small survivor set) to 8 positions each
  // before a distinct-count — bounded by 8× the dup windows, not by
  // the corpus. A true suffix-array pass (arbitrary-length maximal
  // repeats) needs the distributed SA-IS construction the reference
  // also lacks; fixed-W windows are the standard streaming-friendly
  // approximation (any repeat ≥ W tokens is detected; shorter ones are
  // below the excision threshold anyway).
  // ---------------------------------------------------------------------
  private val SubW = 8

  private def d27(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("nt"))
    val wins = base
      .select(col("doc_id"), col("toks"),
        explode(when(col("nt") >= SubW, sequence(lit(0L), col("nt") - SubW))
          .otherwise(array().cast(ArrayType(LongType)))).as("p"))
      .select(col("doc_id"), col("p"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("p") + 1).cast(IntegerType), lit(SubW)))).as("wkey"))
    val dupKeys = wins.groupBy(col("wkey"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .where(col("mn") < col("mx"))
      .select(col("wkey"))
    val dupWins = wins.join(dupKeys, Seq("wkey"))
    val perDoc = dupWins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ndw"))
    val covered = dupWins
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (SubW - 1))).as("pos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("cv"))
    base.select(col("doc_id"), col("nt"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt").as("n_tokens"),
        coalesce(col("ndw"), lit(0L)).as("n_dup_windows"),
        coalesce(col("cv"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_ppm",
        expr("covered_tokens * 1000000 div greatest(n_tokens, 1)"))
      .orderBy(col("doc_id"))
  }
  private val d27Sql =
    s"""WITH base AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nt
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)),
       |wins AS (
       |  SELECT doc_id, p,
       |    md5(array_to_string(
       |      toks[CAST(p + 1 AS BIGINT):CAST(p + $SubW AS BIGINT)], ' ')) AS wkey
       |  FROM (SELECT doc_id, toks, unnest(range(0, nt - $SubW + 1)) AS p
       |        FROM base)),
       |dupkeys AS (
       |  SELECT wkey FROM wins GROUP BY wkey HAVING MIN(doc_id) < MAX(doc_id)),
       |dupwins AS (SELECT doc_id, p FROM wins JOIN dupkeys USING (wkey)),
       |perdoc AS (SELECT doc_id, COUNT(*) AS ndw FROM dupwins GROUP BY doc_id),
       |cov AS (
       |  SELECT doc_id, COUNT(*) AS cv FROM (
       |    SELECT DISTINCT doc_id, pos FROM (
       |      SELECT doc_id, unnest(range(p, p + $SubW)) AS pos FROM dupwins))
       |  GROUP BY doc_id)
       |SELECT b.doc_id, b.nt AS n_tokens,
       |  CAST(COALESCE(p.ndw, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(COALESCE(c.cv, 0) AS BIGINT) AS covered_tokens,
       |  CAST(COALESCE(c.cv, 0) * 1000000 // greatest(b.nt, 1) AS BIGINT) AS dup_ppm
       |FROM base b LEFT JOIN perdoc p USING (doc_id) LEFT JOIN cov c USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // d31 — n-gram repetition filters (the Gopher/MassiveText rule family,
  // Rae et al. 2021 Table A1): per document, the fraction of characters
  // covered by the heaviest word {2,3,4}-gram and by all DUPLICATED
  // 2-grams, as exact integer ppm of the document's characters, plus the
  // per-rule flags and the admission verdict. "Coverage" is
  // occurrences × n-gram string length, so the top gram is the
  // max-coverage one — a total order without a tie-break (the published
  // "most frequent n-gram" is tie-ambiguous across engines). The
  // duplicate-gram leg is instantiated at n=2 rather than Gopher's n≥5:
  // this corpus has ZERO repeated 5-grams at every graded SF (measured
  // at sf0.001 and sf0.01), so the n≥5 legs would be vacuously-green
  // columns, while duplicated bigrams split the corpus cleanly. The
  // thresholds are calibrated on the sf0.001 AND sf0.01 distributions
  // so every rule fires on a real slice and both verdicts stay
  // populated (spec-pinned in TextDedupSpec).
  //
  // Scale shape: ONE explode over the concatenated (n, gram) arrays →
  // one gram-grain groupBy with map-side partials (the d16 census
  // shape) → one doc-grain conditional aggregate; the doc-grain left
  // join back to `documents` only restores gram-less (< 2 token) docs.
  // Nothing is all-pairs and nothing is per-doc quadratic.
  // ---------------------------------------------------------------------
  private val Top2Max = 90000L   // max-2-gram coverage ppm admission bound
  private val Top3Max = 100000L
  private val Top4Max = 130000L
  private val Dup2Max = 200000L  // duplicated-2-gram total coverage bound

  private def d31(s: SparkSession, dir: String): DataFrame = {
    def grams(toks: Column, n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          struct(lit(n).as("n"), concat_ws(" ", slice(toks, i, lit(n))).as("gram"))))
        .otherwise(array().cast(ArrayType(new StructType()
          .add("n", IntegerType, nullable = false).add("gram", StringType))))
    val base = t(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("nc"),
        tokens(col("text")).as("toks"))
    val counted = base
      .select(col("doc_id"),
        explode(concat(grams(col("toks"), 2), grams(col("toks"), 3),
          grams(col("toks"), 4))).as("g"))
      .groupBy(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cov", col("cnt") * length(col("gram")).cast(LongType))
    val perDoc = counted.groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, col("cov"))).as("c2"),
        max(when(col("n") === 3, col("cov"))).as("c3"),
        max(when(col("n") === 4, col("cov"))).as("c4"),
        sum(when(col("n") === 2 && col("cnt") >= 2L, col("cov"))
          .otherwise(0L)).as("cd"))
    base.select(col("doc_id"), col("nc"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("coalesce(c2, 0) * 1000000 div greatest(nc, 1)").as("top2_ppm"),
        expr("coalesce(c3, 0) * 1000000 div greatest(nc, 1)").as("top3_ppm"),
        expr("coalesce(c4, 0) * 1000000 div greatest(nc, 1)").as("top4_ppm"),
        expr("coalesce(cd, 0) * 1000000 div greatest(nc, 1)").as("dup2_ppm"))
      .withColumn("top2_ok", when(col("top2_ppm") <= Top2Max, 1L).otherwise(0L))
      .withColumn("top3_ok", when(col("top3_ppm") <= Top3Max, 1L).otherwise(0L))
      .withColumn("top4_ok", when(col("top4_ppm") <= Top4Max, 1L).otherwise(0L))
      .withColumn("dup2_ok", when(col("dup2_ppm") <= Dup2Max, 1L).otherwise(0L))
      .withColumn("verdict",
        when(col("top2_ok") + col("top3_ok") + col("top4_ok")
          + col("dup2_ok") === 4L, "keep").otherwise("drop"))
      .orderBy(col("doc_id"))
  }
  private val d31Sql = {
    def gramCte(n: Int): String =
      s"""SELECT doc_id, $n AS n,
         |    unnest(CASE WHEN len(toks) >= $n
         |      THEN list_transform(range(1, len(toks) - ${n - 2}), i ->
         |        array_to_string(toks[i:i + ${n - 1}], ' '))
         |      ELSE [] END) AS gram
         |  FROM toks""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS nc,
       |    $tokensSql AS toks
       |  FROM documents),
       |grams AS (
       |  ${gramCte(2)}
       |  UNION ALL
       |  ${gramCte(3)}
       |  UNION ALL
       |  ${gramCte(4)}),
       |counted AS (
       |  SELECT doc_id, n, gram, COUNT(*) AS cnt,
       |    COUNT(*) * length(gram) AS cov
       |  FROM grams GROUP BY 1, 2, 3),
       |perdoc AS (
       |  SELECT doc_id,
       |    max(CASE WHEN n = 2 THEN cov END) AS c2,
       |    max(CASE WHEN n = 3 THEN cov END) AS c3,
       |    max(CASE WHEN n = 4 THEN cov END) AS c4,
       |    sum(CASE WHEN n = 2 AND cnt >= 2 THEN cov ELSE 0 END) AS cd
       |  FROM counted GROUP BY 1),
       |ppm AS (
       |  SELECT t.doc_id,
       |    CAST(coalesce(p.c2, 0) * 1000000 // greatest(t.nc, 1) AS BIGINT) AS top2_ppm,
       |    CAST(coalesce(p.c3, 0) * 1000000 // greatest(t.nc, 1) AS BIGINT) AS top3_ppm,
       |    CAST(coalesce(p.c4, 0) * 1000000 // greatest(t.nc, 1) AS BIGINT) AS top4_ppm,
       |    CAST(coalesce(p.cd, 0) * 1000000 // greatest(t.nc, 1) AS BIGINT) AS dup2_ppm
       |  FROM toks t LEFT JOIN perdoc p USING (doc_id))
       |SELECT doc_id, top2_ppm, top3_ppm, top4_ppm, dup2_ppm,
       |  CAST(CASE WHEN top2_ppm <= $Top2Max THEN 1 ELSE 0 END AS BIGINT) AS top2_ok,
       |  CAST(CASE WHEN top3_ppm <= $Top3Max THEN 1 ELSE 0 END AS BIGINT) AS top3_ok,
       |  CAST(CASE WHEN top4_ppm <= $Top4Max THEN 1 ELSE 0 END AS BIGINT) AS top4_ok,
       |  CAST(CASE WHEN dup2_ppm <= $Dup2Max THEN 1 ELSE 0 END AS BIGINT) AS dup2_ok,
       |  CASE WHEN top2_ppm <= $Top2Max AND top3_ppm <= $Top3Max
       |    AND top4_ppm <= $Top4Max AND dup2_ppm <= $Dup2Max
       |    THEN 'keep' ELSE 'drop' END AS verdict
       |FROM ppm
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // d32 — span-level eval decontamination: every stride-1 SubW-token
  // window of a TRAIN document that also occurs in any val/test
  // document is excised (its token positions removed) and the document
  // is rebuilt from the surviving tokens — the surgical counterpart of
  // c05, which drops whole documents on n-gram overlap. Span excision
  // is what production decontamination actually does (the GPT-3/PaLM
  // reports excise contaminated windows, not documents) because a long
  // document with one quoted benchmark line is still 99% good training
  // text. Same window geometry as d27 (SubW=8, md5 keys), same split
  // rule as d08 (splitFor — one source), same rebuild idiom as d21.
  //
  // Scale shape: window keys shuffle as 32-byte digests; the eval key
  // set is ~20% of corpus windows and joins hash-to-hash — only TRAIN
  // windows that MATCH an eval key (the tainted sliver) re-explode to
  // positions; the position anti-join and the rebuild are co-keyed on
  // doc_id, and collect_list gathers at most one document's own tokens
  // (bounded by doc size, never corpus size — the d21 argument).
  // ---------------------------------------------------------------------
  private def d32(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast(LongType).as("nt"),
        splitFor(col("doc_id")).as("split"))
    val wins = base
      .select(col("doc_id"), col("split"), col("toks"),
        explode(when(col("nt") >= SubW, sequence(lit(0L), col("nt") - SubW))
          .otherwise(array().cast(ArrayType(LongType)))).as("p"))
      .select(col("doc_id"), col("split"), col("p"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("p") + 1).cast(IntegerType), lit(SubW)))).as("wkey"))
    val evalKeys = wins.where(col("split") =!= "train")
      .select(col("wkey")).distinct()
    val tainted = wins.where(col("split") === "train")
      .join(evalKeys, Seq("wkey"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (SubW - 1))).as("pos"))
      .distinct()
    val trainToks = base.where(col("split") === "train")
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("tok"))
    val rebuilt = trainToks
      .join(tainted, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          e => e.getField("tok")))).as("clean_digest"))
    base.where(col("split") === "train").select(col("doc_id"), col("nt"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("nt").as("n_tokens"),
        (col("nt") - coalesce(col("n_kept"), lit(0L))).as("n_excised"),
        coalesce(col("clean_digest"), md5(lit(""))).as("clean_digest"))
      .orderBy(col("doc_id"))
  }
  private val d32Sql =
    s"""WITH base AS (
       |  SELECT doc_id, $tokensSql AS toks,
       |    CAST(len($tokensSql) AS BIGINT) AS nt,
       |    $splitCaseSql AS split
       |  FROM documents),
       |wins AS (
       |  SELECT doc_id, split, p,
       |    md5(array_to_string(
       |      toks[CAST(p + 1 AS BIGINT):CAST(p + $SubW AS BIGINT)], ' ')) AS wkey
       |  FROM (SELECT doc_id, split, toks,
       |          CAST(unnest(range(0, nt - ${SubW - 1})) AS BIGINT) AS p
       |        FROM base WHERE nt >= $SubW)),
       |evalkeys AS (SELECT DISTINCT wkey FROM wins WHERE split <> 'train'),
       |tainted AS (
       |  SELECT DISTINCT doc_id, pos FROM (
       |    SELECT w.doc_id, CAST(unnest(range(w.p, w.p + $SubW)) AS BIGINT) AS pos
       |    FROM wins w JOIN evalkeys USING (wkey) WHERE w.split = 'train')),
       |ttoks AS (
       |  SELECT doc_id, pos, toks[pos + 1] AS tok FROM (
       |    SELECT doc_id, toks, CAST(unnest(range(0, nt)) AS BIGINT) AS pos
       |    FROM base WHERE split = 'train')),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.tok
       |  FROM ttoks t LEFT JOIN tainted x
       |    ON t.doc_id = x.doc_id AND t.pos = x.pos
       |  WHERE x.doc_id IS NULL),
       |rebuilt AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_digest
       |  FROM kept GROUP BY 1)
       |SELECT b.doc_id, b.nt AS n_tokens,
       |  CAST(b.nt - coalesce(r.n_kept, 0) AS BIGINT) AS n_excised,
       |  coalesce(r.clean_digest, md5('')) AS clean_digest
       |FROM base b LEFT JOIN rebuilt r USING (doc_id)
       |WHERE b.split = 'train'
       |ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("d01_dedup_exact", d01, Some(d01Sql), headline = true),
    QueryDef("d02_text_stats", d02, Some(d02Sql), headline = true),
    QueryDef("d03_quality_score", d03, Some(d03Sql)),
    QueryDef("d04_lang_id", d04, Some(d04Sql)),
    QueryDef("d05_fingerprint", d05, Some(d05Sql)),
    QueryDef("d06_bpe_token_count", d06, Some(d06Sql)),
    QueryDef("d07_stopword_ratio", d07, Some(d07Sql)),
    QueryDef("d08_hash_split", d08, Some(d08Sql)),
    QueryDef("d09_repetition_quality", d09, Some(d09Sql)),
    QueryDef("d10_top_terms", d10, Some(d10Sql)),
    QueryDef("d11_chunking", d11, Some(d11Sql)),
    QueryDef("d12_pii_scrub", d12, Some(d12Sql)),
    QueryDef("d13_bloom_incremental_dedup", d13, Some(d13Sql), headline = true),
    QueryDef("d14_chunk_boilerplate", d14, Some(d14Sql)),
    QueryDef("d15_sequence_pack", d15, Some(d15Sql), headline = true),
    QueryDef("d33_pack_manifest", d33, Some(d33Sql)),
    QueryDef("d16_vocab_heavy_hitters", d16, Some(d16Sql)),
    QueryDef("d17_normalized_dedup", d17, Some(d17Sql)),
    QueryDef("d18_source_cap", d18, Some(d18Sql), headline = true),
    QueryDef("d19_snapshot_delta", d19, Some(d19Sql)),
    QueryDef("d21_subdoc_dedup", d21, Some(d21Sql), headline = true),
    QueryDef("d22_source_drift", d22, Some(d22Sql)),
    QueryDef("d23_ngram_novelty", d23, Some(d23Sql)),
    QueryDef("d24_pack_utilization", d24, Some(d24Sql)),
    QueryDef("d27_substring_dedup", d27, Some(d27Sql), headline = true),
    QueryDef("d31_ngram_repetition", d31, Some(d31Sql)),
    QueryDef("d32_span_decontamination", d32, Some(d32Sql)))
}
