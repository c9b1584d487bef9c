package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Counts-trained text classification and importance weighting — the
  * "distill an expensive labeler into a cheap in-engine scorer" stage of
  * a training-data pipeline (the FineWeb-Edu / DSIR shape): a rule-based
  * quality gate labels the corpus, a multinomial Naive Bayes classifier
  * is TRAINED inside the engine on the hash-split train partition, and
  * the held-out partition is scored and graded against the oracle.
  *
  * Cross-engine determinism: log-domain NB scores are sums of logs, and
  * floating `log2` is not bit-identical across libm implementations
  * (`floor(16*log2(8))` can come out 47 or 48 depending on whether the
  * division-based log lands a hair under 3.0). All log-domain math here
  * therefore uses an EXACT integer half-bit logarithm:
  *
  *   ilog(x) = floor(2·log2(x)) = length(bin(x·x)) - 1
  *
  * — pure integer multiply + binary-string length, identical in Spark
  * and DuckDB for every x ≥ 1 (and overflow-safe to x < 2^31, i.e.
  * per-class token totals of two billion; beyond that re-scale the
  * counts before logging).
  *
  * Half-bit resolution is coarse, so WHERE the floor lands matters:
  * flooring log(count) and log(normalizer) separately puts a ±¼-bit
  * systematic error on the normalizer that scoring multiplies by
  * n_tokens (measured: 67% held-out accuracy vs float-NB's 94%).
  * Flooring the smoothed probability RATIO once per token —
  * ilog(⌊(cnt+1)·2²⁰/(tot+V+1)⌋+1) — keeps the per-token error
  * idiosyncratic instead of systematic and recovers float-NB accuracy
  * (95.0% vs 94.1% on the sf0.01 corpus) while staying bit-exact on
  * any engine, layout, or scale — the property a production corpus
  * pipeline actually needs (a classifier that drifts when the cluster
  * re-shuffles is a silent re-curation of the corpus). The ·2²⁰ scale
  * and the ÷ are exact in DOUBLE (31-significant-bit operands; IEEE
  * division is correctly rounded in both engines), so the floor is
  * deterministic too.
  */
object Classifier {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact floor(2·log2(x)) for integer x ≥ 0 (x = 0 → 0). */
  private def ilog(x: Column): Column =
    (length(bin(x * x)) - 1).cast(LongType)

  /** DuckDB mirror of [[ilog]]. */
  private def ilogS(x: String): String =
    s"CAST(length(bin(CAST($x AS BIGINT) * CAST($x AS BIGINT))) - 1 AS BIGINT)"

  /** Smoothed probability ratio scaled to 2^20, floored to an exact
    * integer: ⌊(cnt+1)·2²⁰ / denom⌋. Both operands carry ≤ 31
    * significant bits, so the multiply is exact in DOUBLE and the
    * division is IEEE-correctly-rounded — bit-identical cross-engine. */
  private def pratio(cnt: Column, denom: Column): Column =
    floor(cnt.cast(DoubleType) * lit(1048576.0) / denom.cast(DoubleType))
      .cast(LongType)

  private def pratioS(cnt: String, denom: String): String =
    s"CAST(FLOOR(CAST($cnt AS DOUBLE) * 1048576 / CAST($denom AS DOUBLE)) AS BIGINT)"

  // ---------------------------------------------------------------------
  // d26 — quality-classifier distillation (weak supervision). The
  // integer re-derivation of the d03 quality gate (length band, token
  // floor, type-token ratio as the cross-multiplied integer test
  // ndt·10 ≥ nt·3) labels every document; the d08 content-hash split
  // partitions the corpus; multinomial NB with add-one smoothing is
  // trained on `train` and scored on the held-out 20%.
  //
  // Scale shape: training is ONE corpus-scale shuffle (explode tokens →
  // groupBy token), producing a vocab-grain weight table; class totals
  // and vocab size are driver-scale aggregates crossed back in as a
  // broadcast single row. Scoring is explode → join on the vocab-grain
  // weights (AQE broadcasts it when the vocab fits, the common case
  // after vocabulary capping) → one doc-grain groupBy. No driver loop,
  // no collect: the "model" never leaves the cluster.
  // ---------------------------------------------------------------------
  private def d26(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), toks.as("toks"),
        length(col("text")).cast(LongType).as("nc"))
      .select(col("doc_id"), col("toks"), col("nc"),
        size(col("toks")).cast(LongType).as("nt"),
        size(array_distinct(col("toks"))).cast(LongType).as("ndt"))
      .select(col("doc_id"), col("toks"), col("nt"),
        when(
          when(col("nc").between(100L, 400L), 1L).otherwise(0L)
            + when(col("nt") >= 20L, 1L).otherwise(0L)
            + when(col("ndt") * 10L >= col("nt") * 3L, 1L).otherwise(0L)
            >= 2L, 1L).otherwise(0L).as("label"),
        TextOps.splitBucket(col("doc_id")).as("bucket"))
    val train = docs.where(col("bucket") < 80L)
    val held  = docs.where(col("bucket") >= 80L)

    // Vocab-grain class-conditional counts — the single corpus shuffle.
    val tokCnt = train
      .select(col("label"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(
        sum(when(col("label") === 1L, 1L).otherwise(0L)).as("cnt1"),
        sum(when(col("label") === 0L, 1L).otherwise(0L)).as("cnt0"))

    // Class totals / priors / vocab size: driver-scale single row,
    // broadcast-crossed into the vocab-grain weight derivation.
    val consts = train
      .agg(
        sum(when(col("label") === 1L, 1L).otherwise(0L)).as("nd1"),
        sum(when(col("label") === 0L, 1L).otherwise(0L)).as("nd0"),
        sum(when(col("label") === 1L, col("nt")).otherwise(0L)).as("tt1"),
        sum(when(col("label") === 0L, col("nt")).otherwise(0L)).as("tt0"))
      .crossJoin(tokCnt.agg(count(lit(1)).as("vocab")))

    // w = ilog of the scaled smoothed ratio — ONE floor per token+class.
    val weights = tokCnt.crossJoin(broadcast(consts)).select(col("tok"),
      ilog(pratio(col("cnt1") + 1L, col("tt1") + col("vocab") + 1L) + 1L).as("w1"),
      ilog(pratio(col("cnt0") + 1L, col("tt0") + col("vocab") + 1L) + 1L).as("w0"))

    val priors = consts.select(
      ilog(col("nd1") + 1L).as("prior1"), ilog(col("nd0") + 1L).as("prior0"))

    val sums = held.select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(weights, Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w1"), lit(0L))).as("s1"),
        sum(coalesce(col("w0"), lit(0L))).as("s0"))

    held.select(col("doc_id"), col("label"))
      .join(sums, Seq("doc_id"), "left")
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("label"),
        (col("prior1") + coalesce(col("s1"), lit(0L))).as("score1"),
        (col("prior0") + coalesce(col("s0"), lit(0L))).as("score0"))
      .select(col("doc_id"), col("label"),
        when(col("score1") > col("score0"), 1L).otherwise(0L).as("pred"),
        (col("score1") - col("score0")).as("margin"))
      .orderBy(col("doc_id"))
  }

  private val d26Sql = {
    val toks = TextOps.tokensSql
    s"""WITH base AS (
       |  SELECT doc_id, $toks AS toks, CAST(length(text) AS BIGINT) AS nc
       |  FROM documents),
       |docs AS (
       |  SELECT doc_id, toks, nt,
       |    CASE WHEN (CASE WHEN nc BETWEEN 100 AND 400 THEN 1 ELSE 0 END
       |             + CASE WHEN nt >= 20 THEN 1 ELSE 0 END
       |             + CASE WHEN ndt * 10 >= nt * 3 THEN 1 ELSE 0 END) >= 2
       |         THEN 1 ELSE 0 END AS label,
       |    CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 15)) AS BIGINT) % 100 AS bucket
       |  FROM (SELECT doc_id, toks, nc,
       |          CAST(len(toks) AS BIGINT) AS nt,
       |          CAST(len(list_distinct(toks)) AS BIGINT) AS ndt
       |        FROM base)),
       |train AS (SELECT * FROM docs WHERE bucket < 80),
       |held  AS (SELECT * FROM docs WHERE bucket >= 80),
       |tokcnt AS (
       |  SELECT tok,
       |    SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS cnt1,
       |    SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS cnt0
       |  FROM (SELECT label, unnest(toks) AS tok FROM train)
       |  GROUP BY tok),
       |cs AS (
       |  SELECT
       |    COALESCE(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END), 0) AS nd1,
       |    COALESCE(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END), 0) AS nd0,
       |    COALESCE(SUM(CASE WHEN label = 1 THEN nt ELSE 0 END), 0) AS tt1,
       |    COALESCE(SUM(CASE WHEN label = 0 THEN nt ELSE 0 END), 0) AS tt0
       |  FROM train),
       |vv AS (SELECT COUNT(*) AS vocab FROM tokcnt),
       |weights AS (
       |  SELECT tok,
       |    ${ilogS(pratioS("cnt1 + 1", "tt1 + vocab + 1") + " + 1")} AS w1,
       |    ${ilogS(pratioS("cnt0 + 1", "tt0 + vocab + 1") + " + 1")} AS w0
       |  FROM tokcnt CROSS JOIN cs CROSS JOIN vv),
       |priors AS (
       |  SELECT ${ilogS("nd1 + 1")} AS prior1, ${ilogS("nd0 + 1")} AS prior0
       |  FROM cs),
       |sums AS (
       |  SELECT doc_id,
       |    SUM(COALESCE(w1, 0)) AS s1, SUM(COALESCE(w0, 0)) AS s0
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM held) h
       |  LEFT JOIN weights USING (tok)
       |  GROUP BY doc_id),
       |scored AS (
       |  SELECT h.doc_id, h.label,
       |    p.prior1 + COALESCE(s.s1, 0) AS score1,
       |    p.prior0 + COALESCE(s.s0, 0) AS score0
       |  FROM held h LEFT JOIN sums s USING (doc_id) CROSS JOIN priors p)
       |SELECT doc_id, CAST(label AS BIGINT) AS label,
       |  CAST(CASE WHEN score1 > score0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       |  CAST(score1 - score0 AS BIGINT) AS margin
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // c10 — DSIR-style importance weighting (the shape of Xie et al. 2023,
  // "Data Selection for Language Models via Importance Resampling"): a
  // small curated target set defines a unigram LM; every raw-pool
  // document is scored by the log-likelihood RATIO of target vs raw
  // LMs (Σ per-token [log p_target − log p_raw], add-one smoothed),
  // and the top-K raw documents — the ones that look most like the
  // target domain — are selected. Same exact-integer log machinery as
  // d26, so the selection is bit-reproducible on any engine.
  //
  // Scale shape: both LMs train in the SAME single token-grain shuffle
  // (conditional sums per token); the weight table is vocab-grain;
  // scoring is explode → vocab join → doc-grain sum; the final top-K
  // is TakeOrderedAndProject (per-partition heaps, no global sort).
  // ---------------------------------------------------------------------
  private val DsirTargetSources = Seq("src0", "src1")
  private val DsirTopK = 100

  private def c10(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), toks.as("toks"))
      .withColumn("is_target", col("source").isin(DsirTargetSources: _*))

    val tokCnt = docs
      .select(col("is_target"), explode(col("toks")).as("tok"))
      .groupBy(col("tok"))
      .agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("cnt_r"))
    val consts = docs
      .select(col("is_target"), size(col("toks")).cast(LongType).as("nt"))
      .agg(
        sum(when(col("is_target"), col("nt")).otherwise(0L)).as("tot_t"),
        sum(when(!col("is_target"), col("nt")).otherwise(0L)).as("tot_r"))
      .crossJoin(tokCnt.agg(count(lit(1)).as("vocab")))

    val weights = tokCnt.crossJoin(broadcast(consts)).select(col("tok"),
      (ilog(pratio(col("cnt_t") + 1L, col("tot_t") + col("vocab") + 1L) + 1L)
        - ilog(pratio(col("cnt_r") + 1L, col("tot_r") + col("vocab") + 1L) + 1L))
        .as("w"))

    // Every raw-pool token is in the vocab by construction (the LMs
    // train on the full corpus), so the join is inner without loss.
    docs.where(!col("is_target"))
      .select(col("doc_id"), col("source"), explode(col("toks")).as("tok"))
      .join(weights, Seq("tok"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("w")).as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  private val c10Sql = {
    val srcs = DsirTargetSources.map(x => s"'$x'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, source, ${TextOps.tokensSql} AS toks,
       |    CASE WHEN source IN ($srcs) THEN 1 ELSE 0 END AS is_t
       |  FROM documents),
       |tokcnt AS (
       |  SELECT tok,
       |    SUM(CASE WHEN is_t = 1 THEN 1 ELSE 0 END) AS cnt_t,
       |    SUM(CASE WHEN is_t = 0 THEN 1 ELSE 0 END) AS cnt_r
       |  FROM (SELECT is_t, unnest(toks) AS tok FROM docs)
       |  GROUP BY tok),
       |cs AS (
       |  SELECT
       |    COALESCE(SUM(CASE WHEN is_t = 1 THEN len(toks) ELSE 0 END), 0) AS tot_t,
       |    COALESCE(SUM(CASE WHEN is_t = 0 THEN len(toks) ELSE 0 END), 0) AS tot_r
       |  FROM docs),
       |vv AS (SELECT COUNT(*) AS vocab FROM tokcnt),
       |weights AS (
       |  SELECT tok,
       |    ${ilogS(pratioS("cnt_t + 1", "tot_t + vocab + 1") + " + 1")}
       |      - ${ilogS(pratioS("cnt_r + 1", "tot_r + vocab + 1") + " + 1")} AS w
       |  FROM tokcnt CROSS JOIN cs CROSS JOIN vv),
       |scored AS (
       |  SELECT d.doc_id, d.source, SUM(w.w) AS weight
       |  FROM (SELECT doc_id, source, unnest(toks) AS tok FROM docs WHERE is_t = 0) d
       |  JOIN weights w USING (tok)
       |  GROUP BY d.doc_id, d.source)
       |SELECT doc_id, source, CAST(weight AS BIGINT) AS weight
       |FROM scored
       |ORDER BY weight DESC, doc_id
       |LIMIT $DsirTopK""".stripMargin
  }

  // ---------------------------------------------------------------------
  // d29 — bigram-LM perplexity filtering (the CCNet shape, Wenzek et al.
  // 2020): a bigram language model with add-one smoothing is trained on
  // the curated target-domain slice (the same sources c10 treats as the
  // DSIR target), every raw-pool document is scored by its average
  // per-bigram log-probability, and fixed cutoffs split the pool into
  // head / middle / tail — the buckets CCNet keeps, reweighs, or drops.
  // Same exact-integer half-bit log machinery as d26/c10, so the bucket
  // assignment is bit-reproducible on any engine or layout.
  //
  //   p(tok|prev) = (cnt(prev,tok)+1) / (ctx(prev)+V+1)
  //   w           = ilog(pratio(cnt+1, ctx+V+1) + 1)   — higher = more likely
  //   OOV bigram  = the same formula at cnt 0 (unseen prev ⇒ ctx 0)
  //
  // Scale shape: the target corpus funnels to bigram grain in ONE
  // shuffle (groupBy(prev, tok)); context totals derive from that
  // bigram table (vocab grain), never from a second corpus pass.
  // Scoring is explode → one (prev, tok)-keyed join against the
  // bigram-grain LM + one prev-keyed join against the vocab-grain
  // context table (AQE broadcasts it when it fits) → one doc-grain
  // groupBy. No windows, no per-doc recursion, no driver loop. The
  // per-doc average is floor(sum·1000/n) on exact-integer operands
  // (IEEE division is correctly rounded in both engines), and the
  // head/middle/tail cutoffs are fixed milli-half-bit constants —
  // rank-based terciles would need a global sort; fixed cutoffs are
  // the shape CCNet itself uses (precomputed per-language cutoffs).
  // ---------------------------------------------------------------------
  // Calibrated to the synthetic corpus the way CCNet calibrates per-
  // language cutoffs to Wikipedia: ~p80 / ~p10 of the raw pool's
  // avg_w_milli band (28.4k-30.6k at every SF), so all three buckets
  // are populated — a cutoff outside the band would make the CASE
  // vacuous and the gate would never exercise it.
  private[graft] val PplHeadMilli = 29500L
  private[graft] val PplTailMilli = 29100L

  /** The trained bigram LM: bigram-grain weights, vocab-grain context
    * totals, and the single-row vocab constant. */
  final case class BigramLm(weights: DataFrame, ctx: DataFrame,
      consts: DataFrame)

  /** Per-row bigram explode of a frame carrying a `toks` array — an
    * array-local zip of the two shifted slices (no positional self-join,
    * no shuffle); every other column rides along. Docs with fewer than
    * two tokens vanish (they hold no bigram). */
  def explodeBigrams(df: DataFrame): DataFrame =
    df.where(size(col("toks")) >= 2)
      .withColumn("pv", slice(col("toks"), lit(1), size(col("toks")) - 1))
      .withColumn("tk", slice(col("toks"), lit(2), size(col("toks")) - 1))
      .withColumn("bg", explode(arrays_zip(col("pv"), col("tk"))))
      .withColumn("prev", col("bg.pv"))
      .withColumn("tok", col("bg.tk"))
      .drop("pv", "tk", "bg", "toks")

  /** Train the add-one-smoothed bigram LM on a (…, toks) target frame:
    * one bigram-grain shuffle; context totals derive from the bigram
    * table, never a second corpus pass. */
  def trainBigramLm(target: DataFrame): BigramLm = {
    val cntB = explodeBigrams(target.select(col("toks")))
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cnt_b"))
    val ctx = cntB.groupBy(col("prev")).agg(sum(col("cnt_b")).as("cnt_c"))
    val consts = target
      .select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("vocab"))
    val weights = cntB.join(ctx, Seq("prev")).crossJoin(broadcast(consts))
      .select(col("prev"), col("tok"),
        ilog(pratio(col("cnt_b") + 1L, col("cnt_c") + col("vocab") + 1L) + 1L)
          .as("w"))
    BigramLm(weights, ctx, consts)
  }

  /** Per-bigram LM weight for a (…, prev, tok) frame: the seen-bigram
    * weight, or the OOV formula at count 0 (unseen prev ⇒ context 0).
    * Stateless joins only, so it runs identically on a stream
    * (stream-static) and on a batch frame. Adds column `we`. */
  def scoreBigrams(bigr: DataFrame, lm: BigramLm): DataFrame =
    bigr
      .join(lm.weights, Seq("prev", "tok"), "left")
      .join(lm.ctx, Seq("prev"), "left")
      .crossJoin(broadcast(lm.consts))
      .withColumn("we",
        coalesce(col("w"),
          ilog(pratio(lit(1L), coalesce(col("cnt_c"), lit(0L)) + col("vocab") + 1L) + 1L)))
      .drop("w", "cnt_c", "vocab")

  /** The CCNet head/middle/tail CASE over an avg_w_milli column. */
  def pplBucket(avg: Column): Column =
    when(avg >= PplHeadMilli, "head")
      .when(avg >= PplTailMilli, "middle")
      .otherwise("tail")

  private def d29(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"),
        col("source").isin(DsirTargetSources: _*).as("is_t"))
    val lm = trainBigramLm(docs.where(col("is_t")))
    val scored = scoreBigrams(
      explodeBigrams(docs.where(!col("is_t"))), lm)
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("we")).as("sum_w"))
      .select(col("doc_id"), col("n_bigrams"),
        col("sum_w").cast(LongType).as("sum_w"),
        floor(col("sum_w").cast(DoubleType) * lit(1000.0)
          / col("n_bigrams").cast(DoubleType)).cast(LongType).as("avg_w_milli"))
      .withColumn("ppl_bucket", pplBucket(col("avg_w_milli")))
      .orderBy(col("doc_id"))
  }

  private val d29Sql = {
    val srcs = DsirTargetSources.map(x => s"'$x'").mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, ${TextOps.tokensSql} AS toks,
       |    CASE WHEN source IN ($srcs) THEN 1 ELSE 0 END AS is_t
       |  FROM documents),
       |bigr AS (
       |  SELECT doc_id, is_t, toks[pos + 1] AS prev, toks[pos + 2] AS tok
       |  FROM (SELECT doc_id, is_t, toks,
       |          CAST(unnest(range(0, len(toks) - 1)) AS BIGINT) AS pos
       |        FROM docs WHERE len(toks) >= 2)),
       |cntb AS (
       |  SELECT prev, tok, COUNT(*) AS cnt_b
       |  FROM bigr WHERE is_t = 1 GROUP BY prev, tok),
       |ctx AS (SELECT prev, SUM(cnt_b) AS cnt_c FROM cntb GROUP BY prev),
       |vv AS (
       |  SELECT COUNT(DISTINCT tok) AS vocab
       |  FROM (SELECT unnest(toks) AS tok FROM docs WHERE is_t = 1)),
       |weights AS (
       |  SELECT c.prev, c.tok,
       |    ${ilogS(pratioS("cnt_b + 1", "cnt_c + vocab + 1") + " + 1")} AS w
       |  FROM cntb c JOIN ctx USING (prev) CROSS JOIN vv),
       |scored AS (
       |  SELECT b.doc_id,
       |    COALESCE(w.w,
       |      ${ilogS(pratioS("1", "COALESCE(ctx.cnt_c, 0) + vocab + 1") + " + 1")}) AS we
       |  FROM bigr b
       |  LEFT JOIN weights w ON b.prev = w.prev AND b.tok = w.tok
       |  LEFT JOIN ctx ON b.prev = ctx.prev
       |  CROSS JOIN vv
       |  WHERE b.is_t = 0),
       |agg AS (
       |  SELECT doc_id, COUNT(*) AS n_bigrams, SUM(we) AS sum_w
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, CAST(sum_w AS BIGINT) AS sum_w,
       |  CAST(FLOOR(CAST(sum_w AS DOUBLE) * 1000 / CAST(n_bigrams AS DOUBLE)) AS BIGINT) AS avg_w_milli,
       |  CASE
       |    WHEN CAST(FLOOR(CAST(sum_w AS DOUBLE) * 1000 / CAST(n_bigrams AS DOUBLE)) AS BIGINT) >= $PplHeadMilli THEN 'head'
       |    WHEN CAST(FLOOR(CAST(sum_w AS DOUBLE) * 1000 / CAST(n_bigrams AS DOUBLE)) AS BIGINT) >= $PplTailMilli THEN 'middle'
       |    ELSE 'tail'
       |  END AS ppl_bucket
       |FROM agg
       |ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("d26_quality_classifier", d26, Some(d26Sql), headline = true),
    QueryDef("c10_dsir_importance", c10, Some(c10Sql)),
    QueryDef("d29_perplexity_filter", d29, Some(d29Sql), headline = true))
}
