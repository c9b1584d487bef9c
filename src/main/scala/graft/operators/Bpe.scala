package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING primitives — the inner loop that
  * turns a curated corpus into a merge table (d06 consumes a trained
  * tokenizer; this is where one comes from).
  *
  * Scale design: the only corpus-scale operation is the word-frequency
  * reduction (`wordFreq`) — one shuffle whose keys are DISTINCT words,
  * with map-side partial counts, so the shuffle carries the vocabulary
  * (millions of rows) rather than the corpus (billions). Every merge
  * iteration after that runs on the vocab table: pair statistics are a
  * per-row explode of adjacent symbol pairs weighted by word frequency,
  * re-aggregated on at most |alphabet|² + merges keys. This is exactly
  * how production BPE trainers stay tractable — 100 TB of text funnels
  * into a vocab that fits one executor, and the iterative part never
  * rescans the corpus.
  *
  * Reference scope: the reference pipeline tokenizes nothing (it is a
  * logistics ETL); this family exists for the LLM-training-data surface
  * the engine adds on top.
  */
object Bpe {

  /** Pairs reported by the graded query (total order: count desc, then
    * pair lexically — ties cannot desync the LIMIT across engines). */
  val TopPairs = 50

  /** Corpus → (word, frequency): the one corpus-scale shuffle. */
  def wordFreq(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Adjacent symbol-pair counts over a (syms array, f) vocab — one BPE
    * iteration's statistics, vocab-grain (no corpus rescan). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS sym_a, syms[i] AS sym_b))")).as("p"))
      .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
      .agg(sum(col("f")).as("pair_count"))

  /** Initial symbol alphabet of a word: one symbol per Unicode
    * CODEPOINT, not per UTF-16 char — `w.map(_.toString)` would split
    * surrogate pairs (emoji, astral CJK) into invalid lone surrogates,
    * disagreeing with the codepoint-based substring semantics the
    * graded d20 path uses. */
  private[graft] def codepointSyms(w: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  /** Standard greedy left-to-right merge application. */
  private[graft] def applyMerge(
      syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** `nMerges` BPE training iterations over the corpus. Returns the
    * merge table in order: (sym_a, sym_b, pair_count at merge time).
    * Each iteration is one small job on the persisted vocab; only the
    * single winning pair crosses the driver per iteration. */
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = wordFreq(docs).as[(String, Long)]
      .map { case (w, f) => (codepointSyms(w), f) }
      .toDF("syms", "f")
    vocab.persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val top = pairCounts(vocab)
        .orderBy(desc("pair_count"), col("sym_a"), col("sym_b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b, top(0).getLong(2)))
        val next = vocab.as[(Seq[String], Long)]
          .map { case (s, f) => (applyMerge(s, a, b), f) }
          .toDF("syms", "f")
        next.persist()
        // Materialize before dropping the parent so the lineage never
        // recomputes through an unpersisted step.
        next.count()
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  // ---------------------------------------------------------------------
  // d20 — BPE first-iteration pair statistics, graded end-to-end: the
  // corpus-scale word-frequency reduction followed by character-pair
  // counting on the vocab, top-TopPairs by count. The oracle replays
  // both stages in SQL, so the hash compare proves the vocab funnel and
  // the frequency-weighted pair explode, not just the final sort. The
  // iterative merge loop (train) is locked by BpeSpec against the
  // classic hand-computed corpus instead — DuckDB cannot express the
  // driver-side iteration.
  // ---------------------------------------------------------------------
  private def d20(s: SparkSession, dir: String): DataFrame =
    wordFreq(Tables.load(s, dir, "documents"))
      .where(length(col("w")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), " +
          "i -> struct(substring(w, i, 1) AS sym_a, " +
          "substring(w, i + 1, 1) AS sym_b))")).as("p"))
      .groupBy(col("p.sym_a").as("sym_a"), col("p.sym_b").as("sym_b"))
      .agg(sum(col("f")).as("pair_count"))
      .orderBy(desc("pair_count"), col("sym_a"), col("sym_b"))
      .limit(TopPairs)

  private val d20Sql =
    s"""WITH words AS (
       |  SELECT unnest(${TextOps.tokensSql}) AS w FROM documents),
       |wf AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY w),
       |idx AS (
       |  SELECT w, f, CAST(unnest(range(1, length(w))) AS BIGINT) AS i
       |  FROM wf WHERE length(w) >= 2),
       |pairs AS (
       |  SELECT substring(w, CAST(i AS INT), 1) AS sym_a,
       |         substring(w, CAST(i + 1 AS INT), 1) AS sym_b, f
       |  FROM idx)
       |SELECT sym_a, sym_b, CAST(sum(f) AS BIGINT) AS pair_count
       |FROM pairs GROUP BY 1, 2
       |ORDER BY pair_count DESC, sym_a, sym_b
       |LIMIT $TopPairs""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("d20_bpe_pair_counts", d20, Some(d20Sql), headline = true))
}
