package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyword retrieval over `documents`: the inverted-index query shapes a
  * corpus-curation stack needs for targeted inspection and filtering
  * (pull every doc matching a term set, find exact phrases) — expressed
  * as relational plans over an exploded postings view rather than a
  * served index.
  *
  * Scale design: the term filter lands IMMEDIATELY after the explode, on
  * the map side — only postings for the query terms (a tiny fraction of
  * the token stream) ever reach a shuffle. Document frequency and the
  * doc-count scalar are aggregates over that filtered sliver, broadcast
  * back; nothing materializes the full inverted index.
  *
  * Scoring is tf·idf in INTEGER ppm (idf_ppm = N·10⁶ div df) — exact,
  * associative, bit-identical across engines — rather than float log-idf,
  * whose transcendental rounding differs between JVM and DuckDB (the c06
  * sqrt-vs-pow lesson).
  */
object Retrieval {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** r01's query term set: two common terms plus the corpus's one rare
    * term, so the idf weighting visibly reorders the tf ranking. */
  private val QueryTerms = Seq("hash", "merge", "dup")
  private val TopK = 20

  // ---------------------------------------------------------------------
  // r01 — keyword search, tf·idf-scored top-k: postings are built by
  // exploding the shared tokenizer and filtering to the query terms
  // before any shuffle; tf aggregates per (doc, term), df per term (a
  // handful of rows, broadcast back by AQE), and the integer score
  // sum(tf · idf_ppm) ranks documents. The global top-k lowers to
  // TakeOrderedAndProject (the q11 shape), never a full sort; the rank
  // window then runs on TopK rows, bounded at any corpus size.
  // ---------------------------------------------------------------------
  /** tf·idf top-k over any (doc_id, text) frame — r01's core, public so
    * specs can drive crafted corpora through the exact graded plan. */
  def keywordTopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val postings = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_ppm", expr("n_docs * 1000000 div df"))
      .select(col("term"), col("idf_ppm"))
    val scored = postings.join(broadcast(idf), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf") * col("idf_ppm")).as("score"),
        count(lit(1)).as("n_terms_matched"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast(LongType))
      .orderBy(col("rk"))
  }

  private def r01(s: SparkSession, dir: String): DataFrame =
    keywordTopK(t(s, dir, "documents"), QueryTerms, TopK)
  private val r01Sql = {
    val terms = QueryTerms.map(q => s"'$q'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${TextOps.tokensSql}) AS term FROM documents),
       |postings AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE term IN ($terms) GROUP BY 1, 2),
       |idf AS (
       |  SELECT term,
       |    CAST((SELECT COUNT(*) FROM documents) * 1000000 // COUNT(*) AS BIGINT) AS idf_ppm
       |  FROM postings GROUP BY 1),
       |scored AS (
       |  SELECT doc_id, CAST(SUM(tf * idf_ppm) AS BIGINT) AS score,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms_matched
       |  FROM postings JOIN idf USING (term) GROUP BY 1),
       |top AS (
       |  SELECT doc_id, score, n_terms_matched
       |  FROM scored ORDER BY score DESC, doc_id LIMIT $TopK)
       |SELECT doc_id, score, n_terms_matched,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |FROM top
       |ORDER BY rk""".stripMargin
  }

  /** r02's phrase, matched as consecutive tokens of the shared
    * tokenizer — so punctuation between the words does not break the
    * phrase, exactly like a positional inverted index after analysis. */
  private val Phrase = Seq("hash", "join")

  // ---------------------------------------------------------------------
  // r02 — exact phrase search via positional postings: each phrase term
  // contributes (doc_id, pos - term_offset) rows, and a phrase occurrence
  // is one (doc_id, start) key present in EVERY term's stream — the
  // positional-intersection plan of a search engine, as equi-joins.
  //
  // Scale shape: the filter to phrase terms runs before any shuffle, and
  // the joins key on (doc_id, start) — co-partitioned after the first
  // shuffle, so k-term phrases cost one shuffle plus (k-1) local joins.
  // A stopword-only phrase would carry whole-corpus postings; caps would
  // come from the d16 vocabulary census, the same knob as n04's
  // MaxTokenDf.
  // ---------------------------------------------------------------------
  /** Positional phrase match over any (doc_id, text) frame — r02's core,
    * public for crafted-corpus specs. */
  def phraseMatches(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val postings = docs
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
    val matches = phrase.zipWithIndex.map { case (term, i) =>
      postings.where(col("term") === term)
        .select(col("doc_id"), (col("pos") - i).cast(LongType).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    matches.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        min(col("start")).as("first_pos"))
      .orderBy(col("doc_id"))
  }

  private def r02(s: SparkSession, dir: String): DataFrame =
    phraseMatches(t(s, dir, "documents"), Phrase)

  /** r02's positional-phrase CTE chain (`<p>tk`, `<p>postings`, `<p>m`),
    * name-prefixed so it can coexist with other CTE families inside one
    * oracle (the splitCaseSql discipline — r02 and r07 share ONE
    * source for the phrase-match SQL). */
  private def phraseCtesSql(phrase: Seq[String], p: String): String = {
    val joins = phrase.zipWithIndex.tail.map { case (_, i) =>
      s"JOIN ${p}postings ${p}p$i ON ${p}p0.doc_id = ${p}p$i.doc_id AND ${p}p$i.pos = ${p}p0.pos + $i"
    }.mkString("\n  ")
    val preds = phrase.zipWithIndex
      .map { case (term, i) => s"${p}p$i.term = '$term'" }.mkString(" AND ")
    s"""${p}tk AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |${p}postings AS (
       |  SELECT doc_id, pos, toks[pos + 1] AS term FROM (
       |    SELECT doc_id, toks,
       |      CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos
       |    FROM ${p}tk)),
       |${p}m AS (
       |  SELECT ${p}p0.doc_id, ${p}p0.pos AS start
       |  FROM ${p}postings ${p}p0
       |  $joins
       |  WHERE $preds)""".stripMargin
  }

  private val r02Sql =
    s"""WITH ${phraseCtesSql(Phrase, "")}
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       |  CAST(MIN(start) AS BIGINT) AS first_pos
       |FROM m
       |GROUP BY 1
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // r03 — BM25-ranked search: r01's postings plan plus the BM25
  // saturation term, which caps a term's contribution as tf grows and
  // normalizes by document length (a long doc repeating "hash" stops
  // outranking a short doc that is ABOUT hashing). Plan shape is r01's —
  // the only additions are per-row `size(tokens)` (dl travels with each
  // posting, no extra shuffle) and one broadcast row carrying the corpus
  // totals (N docs, T tokens).
  //
  // Arithmetic is integer-ppm throughout (k1 = 1.2, b = 0.75 become the
  // exact rationals 2200000/1000000, 300000, 900000 ppm):
  //   denom_ppm = 10⁶·tf + 300000 + (900000·dl·N div T)
  //   term      = (idf_ppm · 2200000 · tf) div denom_ppm
  // — exact and associative, so Spark and DuckDB agree bit-for-bit (the
  // c06 transcendental lesson; float BM25 differs in the last ulp across
  // engines). Exactness holds while 900000·dl·N and idf_ppm·2200000·tf
  // fit in signed 64-bit — true far beyond the graded scales; a corpus
  // where dl·N approaches 10¹³ would switch the score to DECIMAL(38,0)
  // or plain doubles (ranking does not need cross-engine bit equality in
  // production, only the correctness gate does).
  // ---------------------------------------------------------------------
  /** BM25 top-k over any (doc_id, text) frame — r03's core, public for
    * crafted-corpus specs (saturation/length-normalization behavior).
    * `exclude` drops a doc from the CANDIDATE list only (corpus stats —
    * idf, dl totals — still cover it): r05 uses this to keep the query's
    * own document out of both fusion legs symmetrically. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      exclude: Option[Long] = None): DataFrame = {
    val withDl = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("term"))
    val postings = withDl
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val totals = docs
      .select(size(TextOps.tokens(col("text"))).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))
    val idf = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals.select(col("n_docs"))))
      .withColumn("idf_ppm", expr("n_docs * 1000000 div df"))
      .select(col("term"), col("idf_ppm"))
    val scored = postings
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("denom_ppm",
        expr("1000000 * tf + 300000 + (900000 * dl * n_docs div n_tokens)"))
      .withColumn("term_score", expr("idf_ppm * 2200000 * tf div denom_ppm"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"),
        count(lit(1)).as("n_terms_matched"))
    exclude.foldLeft(scored)((df, id) => df.where(col("doc_id") =!= id))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast(LongType))
      .orderBy(col("rk"))
  }

  private def r03(s: SparkSession, dir: String): DataFrame =
    bm25TopK(t(s, dir, "documents"), QueryTerms, TopK)

  /** The BM25 pipeline CTEs shared by r03's, r05's, and r07's oracles
    * (the splitCaseSql discipline — one source, so the scoring
    * rationals cannot silently desynchronize between graded queries).
    * Parameterized by the query term set: r03/r05 rank QueryTerms,
    * r07 ranks the phrase's bag of words. */
  private def bm25CtesSqlFor(queryTerms: Seq[String]): String = {
    val terms = queryTerms.map(q => s"'$q'").mkString(", ")
    s"""dls AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |toks AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |    unnest(toks) AS term FROM dls),
       |totals AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(toks)) AS BIGINT) AS n_tokens FROM dls),
       |postings AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |idf AS (
       |  SELECT term,
       |    CAST((SELECT n_docs FROM totals) * 1000000 // COUNT(*) AS BIGINT) AS idf_ppm
       |  FROM postings GROUP BY 1),
       |bm25_scored AS (
       |  SELECT doc_id,
       |    CAST(SUM(idf_ppm * 2200000 * tf //
       |      (1000000 * tf + 300000 +
       |       (900000 * dl * n_docs // n_tokens))) AS BIGINT) AS score,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms_matched
       |  FROM postings JOIN idf USING (term) CROSS JOIN totals GROUP BY 1)""".stripMargin
  }
  private val bm25CtesSql: String = bm25CtesSqlFor(QueryTerms)

  private val r03Sql =
    s"""WITH $bm25CtesSql,
       |top AS (
       |  SELECT doc_id, score, n_terms_matched
       |  FROM bm25_scored ORDER BY score DESC, doc_id LIMIT $TopK)
       |SELECT doc_id, score, n_terms_matched,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |FROM top
       |ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------------
  // r04 — proximity-ranked search: documents where the two query terms
  // occur CLOSE to each other outrank documents that merely contain
  // both ("sort ... merge" on opposite ends of a page is a weaker hit
  // than "sort merge join"). The naive min-distance is a per-document
  // cross join of the two position lists — tf_a·tf_b pairs, quadratic
  // for a term-spamming doc. Instead the two postings streams merge
  // into one position-sorted stream per doc and the true minimum gap is
  // the min over ADJACENT entries with different terms (two-pointer
  // argument: any closer pair would be adjacent after the merge) — a
  // lag() window over (doc, pos), linear in postings, one shuffle.
  // Proximity score is exact integer ppm: 10⁶ div min_gap.
  // ---------------------------------------------------------------------
  private val ProxTerms = ("sort", "merge")

  /** Min-gap proximity match over any (doc_id, text) frame — r04's
    * core, public for crafted-corpus specs. */
  def proximityTopK(docs: DataFrame, a: String, b: String, k: Int): DataFrame = {
    val postings = docs
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "term")))
      .where(col("term").isin(a, b))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("term"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val gaps = postings
      .withColumn("prev_term", lag(col("term"), 1).over(w))
      .withColumn("prev_pos", lag(col("pos"), 1).over(w))
      .where(col("term") =!= col("prev_term"))
      .groupBy(col("doc_id"))
      .agg(min(col("pos") - col("prev_pos")).as("min_gap"))
    val counts = postings.groupBy(col("doc_id"))
      .agg(
        sum(when(col("term") === a, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("term") === b, 1L).otherwise(0L)).as("n_b"))
    gaps.join(counts, "doc_id")
      .withColumn("prox_ppm", expr("1000000 div min_gap"))
      .orderBy(col("prox_ppm").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("prox_ppm").desc, col("doc_id")))
          .cast(LongType))
      .select(col("rk"), col("doc_id"), col("min_gap"),
        col("n_a"), col("n_b"), col("prox_ppm"))
      .orderBy(col("rk"))
  }

  private def r04(s: SparkSession, dir: String): DataFrame =
    proximityTopK(t(s, dir, "documents"), ProxTerms._1, ProxTerms._2, TopK)
  private val r04Sql = {
    val (a, b) = ProxTerms
    s"""WITH tk AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |postings AS (
       |  SELECT doc_id, pos, term FROM (
       |    SELECT doc_id, pos, toks[pos + 1] AS term FROM (
       |      SELECT doc_id, toks,
       |        CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos
       |      FROM tk))
       |  WHERE term IN ('$a', '$b')),
       |g AS (
       |  SELECT doc_id, pos, term,
       |    lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_term,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
       |  FROM postings),
       |gaps AS (
       |  SELECT doc_id, CAST(min(pos - prev_pos) AS BIGINT) AS min_gap
       |  FROM g WHERE term != prev_term GROUP BY 1),
       |counts AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN term = '$a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN term = '$b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM postings GROUP BY 1),
       |sc AS (
       |  SELECT doc_id, min_gap, n_a, n_b,
       |    1000000 // min_gap AS prox_ppm
       |  FROM gaps JOIN counts USING (doc_id)),
       |top AS (
       |  SELECT * FROM sc ORDER BY prox_ppm DESC, doc_id LIMIT $TopK)
       |SELECT CAST(row_number() OVER (ORDER BY prox_ppm DESC, doc_id) AS BIGINT)
       |    AS rk, doc_id, min_gap, n_a, n_b, prox_ppm
       |FROM top
       |ORDER BY rk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // r05 — reciprocal rank fusion (Cormack et al. 2009), the standard
  // combiner behind every production hybrid-search stack: the lexical
  // ranking (r03's BM25 top-N) and the semantic ranking (cosine top-N
  // against one query embedding, v01's plan with a single query) fuse by
  //   rrf(d) = Σ_lists 1/(60 + rank_list(d))
  // — rank-only fusion, so the two scoring scales never need calibrating
  // against each other (the reason RRF beats score interpolation in
  // practice). Arithmetic is integer ppm (10⁶ div (60+rk)) — exact.
  //
  // Scale shape: each list is corpus-scale work ending in a bounded
  // TakeOrderedAndProject top-N (BM25's postings plan; one broadcast-
  // query cosine scan). The fusion itself joins two ≤N-row frames —
  // result-grain, not corpus-grain — so the full-outer join and the
  // final rank window are bounded regardless of corpus size. Documents
  // and embeddings share ids (the v07 contract), so ranks key on doc_id.
  // ---------------------------------------------------------------------
  private val RrfN = 50     // per-list depth
  private val RrfK = 60L    // the standard RRF damping constant
  private val RrfOut = 20   // fused result size
  private val RrfQueryVec = 0L

  private def r05(s: SparkSession, dir: String): DataFrame = {
    // the query's own document is excluded from BOTH candidate lists
    // (corpus stats still cover it) — an asymmetric exclusion would let
    // it surface lexically while denying it its semantic RRF mass
    val lex = bm25TopK(t(s, dir, "documents"), QueryTerms, RrfN,
        exclude = Some(RrfQueryVec))
      .select(col("doc_id"), col("rk").as("lex_rk"))
    val e = t(s, dir, "embeddings")
    val qv = e.where(col("vec_id") === RrfQueryVec)
      .select(col("embedding").as("q_emb"))
    val semTop = e.where(col("vec_id") =!= RrfQueryVec)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        (Similarity.dot(col("embedding"), col("q_emb"))
          / (Similarity.norm(col("embedding")) * Similarity.norm(col("q_emb"))))
          .as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(RrfN)
    val sem = semTop
      .withColumn("sem_rk",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id")))
          .cast(LongType))
      .select(col("doc_id"), col("sem_rk"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rk"), col("sem_rk"),
        (coalesce(expr(s"1000000 div ($RrfK + lex_rk)"), lit(0L))
          + coalesce(expr(s"1000000 div ($RrfK + sem_rk)"), lit(0L)))
          .as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(RrfOut)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rrf_ppm").desc, col("doc_id")))
          .cast(LongType))
      .select(col("rk"), col("doc_id"), col("lex_rk"), col("sem_rk"),
        col("rrf_ppm"))
      .orderBy(col("rk"))
  }

  private val r05Sql = {
    val dot = Similarity.dotS("embedding", "q_emb")
    val nrmC = Similarity.normS("embedding")
    val nrmQ = Similarity.normS("q_emb")
    s"""WITH $bm25CtesSql,
       |lextop AS (
       |  SELECT doc_id, score FROM bm25_scored
       |  WHERE doc_id <> $RrfQueryVec
       |  ORDER BY score DESC, doc_id LIMIT $RrfN),
       |lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rk
       |  FROM lextop),
       |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $RrfQueryVec),
       |sem0 AS (
       |  SELECT vec_id AS doc_id, $dot / ($nrmC * $nrmQ) AS cos
       |  FROM embeddings CROSS JOIN q WHERE vec_id <> $RrfQueryVec),
       |semtop AS (
       |  SELECT doc_id, cos FROM sem0 ORDER BY cos DESC, doc_id LIMIT $RrfN),
       |sem AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS sem_rk
       |  FROM semtop),
       |fused AS (
       |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rk, s.sem_rk,
       |    COALESCE(1000000 // ($RrfK + l.lex_rk), 0)
       |      + COALESCE(1000000 // ($RrfK + s.sem_rk), 0) AS rrf_ppm
       |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id),
       |top AS (
       |  SELECT * FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT $RrfOut)
       |SELECT CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id) AS BIGINT)
       |    AS rk, doc_id, lex_rk, sem_rk, rrf_ppm
       |FROM top
       |ORDER BY rk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // r06 — query-likelihood retrieval (the language-modeling family,
  // Ponte & Croft 1998): each document is a smoothed unigram LM and
  // documents rank by the likelihood of generating the query,
  //   score(d) = Σ_{t∈Q} log p(t|d),  p(t|d) = (tf+1)/(dl+V+1)
  // — add-one smoothing against the corpus vocabulary, in the same
  // exact-integer half-bit log domain as d26/d29 (Classifier's ilog ∘
  // pratio), so the ranking is bit-reproducible cross-engine. The
  // smoothing term for a query word ABSENT from the doc depends only on
  // dl, so missing terms cost arithmetic, not joins: score =
  // Σ_present w(tf) + (|Q| − n_present)·w(0). Candidates are docs
  // matching ≥1 query term (the r01 discipline — pure-smoothing scores
  // only rank by shortness).
  //
  // Scale shape: r01/r03's postings plan — the term filter lands before
  // any shuffle, one (doc, term) groupBy, one doc-grain groupBy, the
  // vocab size V is a single broadcast scalar, and the global top-k
  // lowers to TakeOrderedAndProject.
  // ---------------------------------------------------------------------
  /** Exact floor(2·log2(x)) — the d26/d29 integer half-bit log. */
  private def ilog(x: Column): Column =
    (length(bin(x * x)) - 1).cast(LongType)
  private def ilogS(x: String): String =
    s"CAST(length(bin(CAST($x AS BIGINT) * CAST($x AS BIGINT))) - 1 AS BIGINT)"
  private def pratio(cnt: Column, denom: Column): Column =
    floor(cnt.cast("double") * lit(1048576.0) / denom.cast("double"))
      .cast(LongType)
  private def pratioS(cnt: String, denom: String): String =
    s"CAST(FLOOR(CAST($cnt AS DOUBLE) * 1048576 / CAST($denom AS DOUBLE)) AS BIGINT)"

  private def r06(s: SparkSession, dir: String): DataFrame = {
    val nq = QueryTerms.length.toLong
    val withDl = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("term"))
    val vocab = withDl.agg(count_distinct(col("term")).as("v"))
    val postings = withDl
      .where(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = ilog(pratio(col("tf") + 1L, col("dl") + col("v") + 1L) + 1L)
    val w0 = ilog(pratio(lit(1L), col("dl") + col("v") + 1L) + 1L)
    postings.crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"), col("dl"), col("v"))
      .agg(sum(w).as("present_w"), count(lit(1)).as("n_terms_matched"))
      .select(col("doc_id"), col("dl"), col("n_terms_matched"),
        (col("present_w") + (lit(nq) - col("n_terms_matched")) * w0)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(TopK)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast(LongType))
      .orderBy(col("rk"))
  }
  private val r06Sql = {
    val terms = QueryTerms.map(q => s"'$q'").mkString(", ")
    val nq = QueryTerms.length
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len(${TextOps.tokensSql}) AS BIGINT) AS dl,
       |    unnest(${TextOps.tokensSql}) AS term
       |  FROM documents),
       |vv AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM toks),
       |postings AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE term IN ($terms) GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT doc_id, dl,
       |    CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
       |    CAST(SUM(${ilogS(pratioS("tf + 1", "dl + v + 1") + " + 1")})
       |      + ($nq - COUNT(*))
       |        * min(${ilogS(pratioS("1", "dl + v + 1") + " + 1")}) AS BIGINT)
       |      AS score
       |  FROM postings CROSS JOIN vv
       |  GROUP BY doc_id, dl),
       |top AS (
       |  SELECT doc_id, dl, n_terms_matched, score
       |  FROM scored ORDER BY score DESC, doc_id LIMIT $TopK)
       |SELECT doc_id, dl, n_terms_matched, score,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |FROM top
       |ORDER BY rk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // r07 — ranking-quality audit (the v08/v12 recall-audit discipline for
  // the lexical rankers): BM25 ranks the bag of words of r02's phrase,
  // and the audit grades that ranking against phrase-EXACT relevance —
  // a deterministic in-engine label set (a doc is relevant iff the
  // phrase occurs verbatim), so precision@k / recall@k / reciprocal
  // rank need no human judgments yet measure the real question "does
  // the bag-of-words ranker surface the phrase-exact documents". All
  // metrics are exact integer ppm.
  //
  // Scale shape: both legs are already-audited bounded plans (r03's
  // postings + TakeOrderedAndProject top-k; r02's positional
  // intersection); the audit itself joins a ≤ TopK-row ranked list
  // against the relevance set and aggregates over the fixed k
  // enumeration — driver-scale work after the heavy lifting, the same
  // shape as v08.
  // ---------------------------------------------------------------------
  private val AuditKs = Seq(1, 5, 10, 20)

  /** Ranking audit over any (doc_id, text) frame — r07's core, public
    * for crafted-corpus specs: BM25-rank `query`, label docs containing
    * `phrase` verbatim as relevant, report hits/precision/recall/RR at
    * each cutoff in `ks`. */
  def rankingAudit(docs: DataFrame, query: Seq[String], phrase: Seq[String],
      ks: Seq[Int], k: Int): DataFrame = {
    val ranked = bm25TopK(docs, query, k).select(col("doc_id"), col("rk"))
    val rel = phraseMatches(docs, phrase).select(col("doc_id"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    val hits = ranked.join(rel, Seq("doc_id"), "left_semi")
    val ksDf = docs.sparkSession
      .range(1).select(explode(array(ks.map(x => lit(x.toLong)): _*)).as("k"))
    ksDf.join(broadcast(hits), col("rk") <= col("k"), "left")
      .groupBy(col("k"))
      .agg(count(col("rk")).as("hits_at_k"), min(col("rk")).as("mn"))
      .crossJoin(broadcast(nRel))
      .select(col("k"), col("n_relevant"), col("hits_at_k"),
        expr("hits_at_k * 1000000 div k").as("precision_ppm"),
        expr("hits_at_k * 1000000 div greatest(n_relevant, 1)").as("recall_ppm"),
        coalesce(col("mn"), lit(0L)).as("first_rel_rank"),
        expr("coalesce(1000000 div mn, 0)").as("rr_ppm"))
      .orderBy(col("k"))
  }

  private def r07(s: SparkSession, dir: String): DataFrame =
    rankingAudit(t(s, dir, "documents"), Phrase, Phrase, AuditKs, TopK)
  private val r07Sql = {
    val ksList = AuditKs.mkString(", ")
    s"""WITH ${bm25CtesSqlFor(Phrase)},
       |top AS (
       |  SELECT doc_id, score FROM bm25_scored
       |  ORDER BY score DESC, doc_id LIMIT $TopK),
       |ranked AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
       |  FROM top),
       |${phraseCtesSql(Phrase, "ph_")},
       |relset AS (SELECT DISTINCT doc_id FROM ph_m),
       |nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant FROM relset),
       |hits AS (SELECT rk FROM ranked JOIN relset USING (doc_id)),
       |ks AS (SELECT CAST(unnest([$ksList]) AS BIGINT) AS k),
       |per_k AS (
       |  SELECT k, CAST(count(h.rk) AS BIGINT) AS hits_at_k, min(h.rk) AS mn
       |  FROM ks LEFT JOIN hits h ON h.rk <= ks.k GROUP BY k)
       |SELECT k, n_relevant, hits_at_k,
       |  CAST(hits_at_k * 1000000 // k AS BIGINT) AS precision_ppm,
       |  CAST(hits_at_k * 1000000 // greatest(n_relevant, 1) AS BIGINT) AS recall_ppm,
       |  CAST(coalesce(mn, 0) AS BIGINT) AS first_rel_rank,
       |  CAST(coalesce(1000000 // mn, 0) AS BIGINT) AS rr_ppm
       |FROM per_k CROSS JOIN nrel
       |ORDER BY k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // r08 — BM25 behind a SERVED inverted index: the serving-parity
  // discipline (n09 → LSH, v19 → BQ, v26 → PQ, v27 → IVF) applied to the
  // lexical ranker, which until now re-tokenized the corpus per query.
  // The index is two fingerprinted artifacts: the full postings table
  // (term, doc_id, dl, tf) — corpus-scale, range-clustered + sorted on
  // term so a term probe skips row groups by footer min/max exactly like
  // q42 skips time slices — and a 1-row stats table (N docs, T tokens),
  // the segment metadata every BM25 implementation carries. A query then
  // reads ONLY its terms' postings rows: zero tokenization, zero explode,
  // zero corpus scan on the probe path (PlanSpec pins all three). Graded
  // against r03's oracle VERBATIM, so the hash gate is the served ≡
  // inline proof; RetrievalSpec additionally pins row equality with r03.
  // ---------------------------------------------------------------------
  /** Postings of any (doc_id, text, …) frame — the index build unit. */
  def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Segment stats of any (doc_id, text, …) frame. Algebraic (two
    * sums), so stats of index segments MERGE — the property r09's
    * growth path rides. */
  def indexStatsOf(docs: DataFrame): DataFrame =
    docs
      .select(size(TextOps.tokens(col("text"))).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))

  /** The served index: full postings, term-clustered. At 100 TB this is
    * THE retrieval artifact — built once per corpus fingerprint, every
    * query pays |query terms| row-group reads instead of a corpus pass. */
  def servedPostings(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/bm25_postings/$tag",
      s"$dir/documents.parquet") {
      postingsOf(t(s, dir, "documents"))
        // term-clustered layout: a probe's isin(term) prunes row groups
        .repartitionByRange(graft.Config.ClusterFiles, col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }
  }

  /** Corpus totals the scorer needs (the index segment's metadata). */
  def servedIndexStats(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/bm25_stats/$tag",
      s"$dir/documents.parquet") {
      indexStatsOf(t(s, dir, "documents"))
    }
  }

  /** BM25 over pre-built postings + stats — the serve-time half shared
    * by r08 (one segment) and r09 (base segment ∪ delta segment). IDF
    * and the length norm are computed from whatever segments are given,
    * so segment union IS index merge (df/idf re-derive per query; tf/dl
    * rows are segment-local facts that never change). */
  def bm25OverPostings(postings: DataFrame, stats: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    val probe = postings.where(col("term").isin(terms: _*))
    val idf = probe.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats.select(col("n_docs"))))
      .withColumn("idf_ppm", expr("n_docs * 1000000 div df"))
      .select(col("term"), col("idf_ppm"))
    probe
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("denom_ppm",
        expr("1000000 * tf + 300000 + (900000 * dl * n_docs div n_tokens)"))
      .withColumn("term_score", expr("idf_ppm * 2200000 * tf div denom_ppm"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast(LongType))
      .orderBy(col("rk"))
  }

  private def r08(s: SparkSession, dir: String): DataFrame =
    bm25OverPostings(
      servedPostings(s, dir), servedIndexStats(s, dir), QueryTerms, TopK)

  // ---------------------------------------------------------------------
  // r09 — corpus growth under the served lexical index (the v24/v25/d34
  // lifecycle discipline applied to BM25): the base index segment is
  // frozen once (postings + stats of the pre-growth cohort, doc_id % 4
  // <> 3, as their own fingerprinted artifacts), and arrivals contribute
  // ONLY their own segment — postings rows are segment-local facts
  // (tf, dl never change as the corpus grows), so segment UNION is index
  // merge, and the corpus-dependent quantities (df → idf, N, T → length
  // norm) re-derive per query from the merged view. Unlike the trained
  // artifacts (IVF/PQ/BPE), the lexical index has NO staleness gap to
  // audit: merged-segment BM25 is EXACTLY full-rebuild BM25, which is
  // what grading against r03's oracle verbatim proves (and the spec pins
  // segment-stats merge ≡ whole-corpus stats). This is why Lucene-style
  // engines serve segmented indexes without retrain triggers.
  // ---------------------------------------------------------------------
  private def r09(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val docs = t(s, dir, "documents")
    val baseCohort = docs.where(pmod(col("doc_id"), lit(4)) =!= 3)
    val basePost = graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/bm25_postings_base/$tag",
      s"$dir/documents.parquet") {
      postingsOf(baseCohort)
        .repartitionByRange(graft.Config.ClusterFiles, col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }
    val baseStats = graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/bm25_stats_base/$tag",
      s"$dir/documents.parquet") {
      indexStatsOf(baseCohort)
    }
    val delta = docs.where(pmod(col("doc_id"), lit(4)) === 3)
    val mergedPost = basePost.unionByName(postingsOf(delta))
    val mergedStats = baseStats.unionByName(indexStatsOf(delta))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    bm25OverPostings(mergedPost, mergedStats, QueryTerms, TopK)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("r01_keyword_search", r01, Some(r01Sql)),
    QueryDef("r02_phrase_search", r02, Some(r02Sql)),
    QueryDef("r03_bm25_search", r03, Some(r03Sql)),
    QueryDef("r04_proximity_search", r04, Some(r04Sql)),
    QueryDef("r05_rrf_fusion", r05, Some(r05Sql)),
    QueryDef("r06_query_likelihood", r06, Some(r06Sql)),
    QueryDef("r07_ranking_audit", r07, Some(r07Sql)),
    // r03's oracle verbatim: the hash gate proves served ≡ inline
    QueryDef("r08_served_bm25_probe", r08, Some(r03Sql), headline = true),
    // r03's oracle verbatim again: base-segment ∪ delta-segment ≡ rebuild
    QueryDef("r09_segmented_index_growth", r09, Some(r03Sql)))
}
