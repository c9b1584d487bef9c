package graft.operators

import graft.QueryDef
import graft.functions.MinHashSig
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Near-duplicate detection for a training-data pipeline: MinHash + LSH,
  * SimHash, and n-gram Jaccard — all over `documents`.
  *
  * Scale design: nothing here ever materializes the O(n²) pair space.
  * - MinHash signatures are per-row array math (codegen'd, no shuffle).
  * - LSH candidate generation shuffles on (band_id, band_key) only, so
  *   cost is O(n·bands) and candidate pairs are confined to buckets.
  * - Jaccard runs behind a blocking key (`source`) — the standard way to
  *   keep pairwise comparison tractable at 100 TB.
  *
  * Hash functions are built from md5 (identical across engines) reduced
  * to 60-bit ints, then universal-hash families (a·x + b) mod p — so the
  * DuckDB oracle can reproduce every signature bit-for-bit.
  */
object Dedup {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val P = 1000000007L
  /** Universal-hash coefficients for the k=8 MinHash family. */
  private val As = Array(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val Bs = Array(1L, 12346L, 24691L, 37036L, 49381L, 61726L, 74071L, 86416L)

  /** 60-bit integer from the md5 of a string — the cross-engine shingle
    * hash primitive mirrored by [[graft.functions.MinHashSig]].
    * DuckDB side: '0x…'::BIGINT of the first 15 md5 hex chars. */
  private def hex60Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Word 3-gram shingles (DuckDB oracle side). Public so the curation
    * pipeline's oracle can re-state the identical shingling. */
  val shinglesSql: String =
    s"""CASE WHEN len(${TextOps.tokensSql}) >= 3
       | THEN list_transform(range(1, len(${TextOps.tokensSql}) - 1), i ->
       |   concat_ws(' ', ${TextOps.tokensSql}[i], ${TextOps.tokensSql}[i+1], ${TextOps.tokensSql}[i+2]))
       | ELSE ${TextOps.tokensSql} END""".stripMargin.replace("\n", "")

  /** doc_id + the 8 MinHash values, as columns mh0..mh7.
    *
    * Evaluation shape matters here: tokens and shingles are materialized
    * as their own projection steps so each array is built once per row —
    * inlining them would make every `element_at(toks, i)` inside the
    * (interpreted, CodegenFallback) shingle lambda re-run the regex
    * tokenizer, turning the row cost quadratic in token count (the
    * round-1 20s-at-sf0.1 pathology). The signature itself is one pass
    * via the custom [[graft.functions.MinHashSig]] expression. */
  private def minhashDf(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(t(s, dir, "documents"))

  /** Word 3-gram shingles from a token-array column (Spark mirror of
    * [[shinglesSql]]); degenerate short docs fall back to unigram
    * shingles. The caller must have MATERIALIZED the token array as its
    * own projection step first — inlining the tokenizer here re-runs it
    * per element reference (the HOF re-evaluation trap). */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(toks)

  /** Signatures over any (doc_id, text, ...) frame — public so the
    * curation pipeline can run LSH over its quality-filtered survivors. */
  def minhashSignatures(d: DataFrame): DataFrame = {
    val toksDf = d.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val shDf = toksDf.select(col("doc_id"), shingles(col("toks")).as("sh"))
    val sigDf = shDf.select(col("doc_id"),
      Bridge.column(MinHashSig(Bridge.expression(col("sh")),
        As.toIndexedSeq, Bs.toIndexedSeq, P)).as("sig"))
    val mhCols = As.indices.map(k => element_at(col("sig"), k + 1).as(s"mh$k"))
    sigDf.select(col("doc_id") +: mhCols: _*)
  }
  private def minhashSqlCols: String =
    As.indices.map { k =>
      s"coalesce(list_min(list_transform(hs, h -> (h * ${As(k)} + ${Bs(k)}) % $P)), -1) AS mh$k"
    }.mkString(",\n  ")

  /** The hashed→sigs CTE bodies over relation `from` (must expose
    * doc_id + text). Public/parametric so the curation oracle can run
    * the identical signature SQL over its own surviving-docs CTE. */
  def minhashCtesSql(from: String): String =
    s"""hashed AS (
       |  SELECT doc_id,
       |    list_transform($shinglesSql, sh -> ${hex60Sql("sh")} % $P) AS hs
       |  FROM $from),
       |sigs AS (
       |  SELECT doc_id,
       |  $minhashSqlCols
       |  FROM hashed)""".stripMargin

  private val minhashBaseSql = "WITH " + minhashCtesSql("documents")

  /** bands + capped-buckets CTE bodies following [[minhashCtesSql]] —
    * the SQL mirror of [[bandRows]] + the bucket cap in
    * [[cappedLshPairs]]. */
  def lshBandsCtesSql(maxBucket: Int = MaxBucket, bands: Int = 4,
      rows: Int = 2, suffix: String = ""): String = {
    val bandSelects = (0 until bands).map { b =>
      val keyCols = (0 until rows).map(j => s"mh${b * rows + j}").mkString(", ")
      s"SELECT doc_id, $b AS band_id, concat_ws(':', $keyCols) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""bands$suffix AS (
       |  $bandSelects),
       |kept_buckets$suffix AS (
       |  SELECT band_id, band_key FROM bands$suffix
       |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $maxBucket)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // n01 — MinHash signatures (k=8): per-row array math only.
  // ---------------------------------------------------------------------
  private def n01(s: SparkSession, dir: String): DataFrame =
    minhashDf(s, dir).orderBy(col("doc_id"))
  private val n01Sql =
    s"""$minhashBaseSql
       |SELECT * FROM sigs ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // n02 — LSH candidate pairs: 4 bands × 2 rows. Docs sharing any full
  // band collide. One signature computation feeds everything: bands are
  // EXPLODED from the signature row (not 4 union branches — a union of
  // selects over the sig plan re-computes the signatures per branch, and
  // a self-join doubles that again: 8× at round 1). Pairs are generated
  // inside each bucket from a sorted collect_list — a single shuffle on
  // (band_id, band_key), no self-join, no O(n²) pair space. Candidate
  // pairs are inherently quadratic in bucket size, so buckets past
  // `maxBucket` members are DROPPED before the pair explode (a
  // degenerate band key — e.g. the empty-document signature — would
  // otherwise make one task materialize ~size²/2 pairs); members of a
  // >10⁴ bucket are near-certain duplicates and belong to exact-dedup
  // (d01), not pairwise scoring. The oracle states the same cap.
  // ---------------------------------------------------------------------

  /** Default per-bucket cap: far above anything the test corpora hit
    * (sf0.01 max bucket ≈ corpus dup cluster size), binding only on
    * pathological band keys at scale. */
  val MaxBucket: Int = graft.Config.MaxBucket

  /** Candidate pairs from (doc_id, band_id, band_key) rows; one shuffle,
    * per-bucket capped pair explode. */
  def cappedLshPairs(bands: DataFrame, maxBucket: Int = MaxBucket): DataFrame = {
    val buckets = bands
      .groupBy(col("band_id"), col("band_key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
  }

  /** Signature rows → exploded (doc_id, band_id, band_key) rows — the
    * production 4×2 instantiation of [[bandRowsCfg]], so the two can
    * never drift apart structurally. */
  def bandRows(sig: DataFrame): DataFrame = bandRowsCfg(sig, 4, 2)

  private def n02(s: SparkSession, dir: String): DataFrame =
    cappedLshPairs(bandRows(minhashDf(s, dir)))
      .orderBy(col("doc_a"), col("doc_b"))

  private val n02Sql =
    s"""$minhashBaseSql,
       |${lshBandsCtesSql()}
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band_id = b.band_id AND a.band_key = b.band_key
       | AND a.doc_id < b.doc_id
       |JOIN kept_buckets k ON a.band_id = k.band_id AND a.band_key = k.band_key
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // n03 — SimHash (16-bit): per-token 16-bit hashes; signed bit votes;
  // sign vector → fingerprint. Folded entirely in array expressions —
  // per-row work, no explode, no shuffle.
  // ---------------------------------------------------------------------
  /** 16-bit SimHash rows (doc_id, simhash, n_tokens) of any
    * (doc_id, text) frame — n03's core, shared with n08's pairing. */
  def simhashOf(d: DataFrame): DataFrame = {
    val hs = transform(TextOps.tokens(col("text")), tk =>
      conv(substring(md5(tk), 1, 4), 16, 10).cast(LongType))
    val withH = d.select(col("doc_id"), hs.as("hs"))
    val fp = aggregate(
      transform(sequence(lit(0), lit(15)), i =>
        when(
          aggregate(col("hs"), lit(0L), (acc, h) =>
            acc + when(
              call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1L)
              .otherwise(-1L))
            > 0L,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    withH.select(col("doc_id"), fp.as("simhash"),
        size(col("hs")).cast(LongType).as("n_tokens"))
  }

  private def n03(s: SparkSession, dir: String): DataFrame =
    simhashOf(t(s, dir, "documents")).orderBy(col("doc_id"))
  private val n03Sql =
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(${TextOps.tokensSql}, tk ->
       |      CAST(concat('0x', substr(md5(tk), 1, 4)) AS BIGINT)) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(coalesce(list_sum(list_transform(range(0, 16), i ->
       |    CASE WHEN coalesce(list_sum(list_transform(hs, h ->
       |           CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
       |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)), 0) AS BIGINT) AS simhash,
       |  CAST(len(hs) AS BIGINT) AS n_tokens
       |FROM hashed
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // n04 — n-gram Jaccard similarity under blocking: distinct-token sets,
  // intersection via equi-join inside the `source` block, |A∪B| by
  // inclusion-exclusion. Blocking bounds the pair space; the join
  // shuffles on (source, token) — no cross join anywhere.
  //
  // Hot-token guard (n02's MaxBucket applied to posting lists): a
  // stopword-class token present in n docs of one source puts O(n²)
  // intersection rows on a single (source, token) key — the exact
  // single-key explosion the blocking was meant to prevent. Standard
  // practice is DF-capped posting lists: tokens with document frequency
  // > `maxDf` inside their block are dropped BEFORE the self-join, from
  // both the intersection AND the per-doc token counts, so Jaccard is
  // computed consistently over the capped vocabulary. High-DF tokens
  // carry no similarity signal (they match everything), so the capped
  // score is the standard estimator, not an approximation of the naive
  // one. The oracle applies the identical filter.
  // ---------------------------------------------------------------------

  /** Default document-frequency cap per (source, token): far above any
    * posting list in the test corpora (sf0.01 has 500 docs total, so
    * nothing is dropped there), binding only on stopword-class tokens
    * at scale where a single key would otherwise hold O(n²) pairs. */
  val MaxTokenDf = 1000

  /** Pairwise token-set Jaccard over (doc_id, source, text) rows,
    * blocked on `source`, posting lists DF-capped at `maxDf`. Output:
    * (doc_a, doc_b, n_common, jaccard) for pairs with jaccard >=
    * `threshold`. Public so TextDedupSpec can drive it with a small cap
    * on a crafted stopword-heavy corpus. */
  def jaccardPairs(docs: DataFrame, threshold: Double, maxDf: Int): DataFrame = {
    val toks0 = docs.select(col("doc_id"), col("source"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
    // One window count on the same (source, token) key the join shuffles
    // on — the partitioning is reused, not an extra pass over the data.
    val toks = toks0
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("token"))))
      .where(col("df") <= maxDf)
      .drop("df")
    val counts = toks.groupBy(col("doc_id").as("cnt_doc"))
      .agg(count(lit(1)).as("n_toks"))
    val a = toks.as("a"); val b = toks.as("b")
    val inter = a.join(b,
        col("a.source") === col("b.source") &&
        col("a.token") === col("b.token") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(counts.as("ca"), col("doc_a") === col("ca.cnt_doc"))
      .join(counts.as("cb"), col("doc_b") === col("cb.cnt_doc"))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_common").cast(DoubleType) /
          (col("ca.n_toks") + col("cb.n_toks") - col("n_common")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  private def n04(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(t(s, dir, "documents"), 0.5, MaxTokenDf)
      .orderBy(col("doc_a"), col("doc_b"))
  private val n04Sql =
    s"""WITH toks0 AS (
       |  SELECT doc_id, source, unnest(list_distinct(${TextOps.tokensSql})) AS token
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, source, token FROM (
       |    SELECT doc_id, source, token,
       |      COUNT(*) OVER (PARTITION BY source, token) AS df
       |    FROM toks0)
       |  WHERE df <= $MaxTokenDf),
       |counts AS (
       |  SELECT doc_id AS cnt_doc, COUNT(*) AS n_toks FROM toks GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
       |  FROM toks a JOIN toks b
       |    ON a.source = b.source AND a.token = b.token AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(n_common AS DOUBLE) / (ca.n_toks + cb.n_toks - n_common) AS jaccard
       |FROM inter
       |JOIN counts ca ON doc_a = ca.cnt_doc
       |JOIN counts cb ON doc_b = cb.cnt_doc
       |WHERE CAST(n_common AS DOUBLE) / (ca.n_toks + cb.n_toks - n_common) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // n05 — near-dup clustering: connected components over the LSH
  // candidate pairs, each doc assigned its component's min doc_id as
  // canonical. Pairwise candidate lists (n02) over-/under-drop when used
  // greedily — A~B and B~C should collapse to ONE cluster {A,B,C} even
  // though (A,C) never shared a bucket. Components are the principled
  // canonicalization every production dedup pipeline ends with.
  //
  // Algorithm: iterative min-label propagation — each round every node
  // takes the min label among itself and its neighbors; fixpoint = every
  // node carries its component's min id. Each round is one equi-join
  // shuffle on node id + one partial-aggregating groupBy; rounds needed =
  // graph diameter, and LSH components are unions of bucket-cliques, so
  // the diameter is tiny (2-3) in practice. Lineage is truncated per
  // round with localCheckpoint (on a cluster: checkpoint to durable
  // storage) — without it the plan doubles every iteration. The edge
  // list is persisted once and reused each round. Convergence is checked
  // with an exact changed-label count on the already-materialized round
  // result; a graph that hasn't converged by `maxIters` throws rather
  // than silently emitting non-fixpoint labels.
  // ---------------------------------------------------------------------

  /** Connected components over (doc_a, doc_b) pair rows. Output: one row
    * per node — (doc_id, canonical_id = component min id, comp_size).
    * Deterministic regardless of partitioning: the fixpoint of min-label
    * propagation depends only on the graph.
    *
    * EAGER: unlike every other builder here, this one runs the full
    * iterative job during DataFrame CONSTRUCTION (each round's
    * convergence check is a driver-side count on the checkpointed step),
    * so plan-only callers — Explain, PlanSpec — pay for the whole
    * computation, and the returned frame reads the final round's
    * localCheckpoint rather than re-deriving anything. Superseded
    * per-round checkpoints are unpersisted as soon as the next round is
    * materialized (safe: nothing re-reads a superseded round), so a long
    * Verify/Bench session holds at most one round of label blocks, not
    * `iters` of them. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // The block-release handle for a localCheckpoint'd frame: the
    // checkpointed InternalRow RDD sits behind the frame's LogicalRDD
    // leaf (df.rdd would be a NEW deserializing RDD, not the persisted
    // one). Public API, but execution-internal — hence quarantined here.
    def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    // RDD.unpersist on a locally-checkpointed RDD warns that the lineage
    // cannot be recomputed afterwards — the exact property this loop
    // relies on (a superseded round is never re-read), so the warning is
    // pure noise here: silence that one logger while we unpersist.
    // Scope caveats, deliberate: (a) log4j2 levels are process-global, so
    // concurrent jobs in this JVM also lose MapPartitionsRDD WARNs for
    // the few ms each unpersist takes; (b) if the logger had no explicit
    // config beforehand, the LoggerConfig that setLevel creates is
    // REMOVED afterwards rather than pinned to the old effective level —
    // no permanent config drift. guard() catches Throwable, not NonFatal:
    // on a non-log4j2 backend the core classes are absent and the first
    // reference raises NoClassDefFoundError (a LinkageError), which the
    // backend-agnostic best-effort intent must also swallow.
    def quietly[T](body: => T): T = {
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      def guard(f: => Unit): Unit = try f catch { case _: Throwable => }
      var restore: () => Unit = () => ()
      guard {
        import org.apache.logging.log4j.LogManager
        import org.apache.logging.log4j.core.LoggerContext
        import org.apache.logging.log4j.core.config.Configurator
        val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
        val cfg = ctx.getConfiguration
        val hadExplicit = cfg.getLoggers.containsKey(name)
        val prev = LogManager.getLogger(name).getLevel
        Configurator.setLevel(name, org.apache.logging.log4j.Level.ERROR)
        restore =
          if (hadExplicit) () => Configurator.setLevel(name, prev)
          else () => { cfg.removeLogger(name); ctx.updateLoggers() }
      }
      try body
      finally guard(restore())
    }
    val edges = pairs
      .select(col("doc_a").as("e_src"), col("doc_b").as("e_dst"))
      .union(pairs.select(col("doc_b").as("e_src"), col("doc_a").as("e_dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("e_src").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .localCheckpoint()
      var changed = 1L
      var iters = 0
      while (changed > 0 && iters < maxIters) {
        val nbrMin = edges.join(labels, col("e_dst") === col("id"))
          .groupBy(col("e_src"))
          .agg(min(col("comp")).as("nbr"))
        val step = labels.join(nbrMin, labels("id") === nbrMin("e_src"), "left")
          .select(labels("id").as("id"), labels("comp").as("prev"),
            least(labels("comp"), coalesce(col("nbr"), labels("comp"))).as("comp"))
          .localCheckpoint()
        changed = step.where(col("comp") =!= col("prev")).count()
        // step is eagerly materialized above; the previous round's blocks
        // can no longer be read by anything downstream.
        quietly(checkpointRdd(labels).foreach(_.unpersist(false)))
        labels = step.select(col("id"), col("comp"))
        iters += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIters iterations")
      val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("comp_size"))
      labels.join(sizes, Seq("comp"))
        .select(col("id").as("doc_id"), col("comp").as("canonical_id"),
          col("comp_size"))
    } finally {
      // safe even though the returned plan no longer needs edges: the
      // final frame reads the CHECKPOINTED labels, and the unpersist must
      // also run on the throw paths (non-convergence, mid-loop failure)
      edges.unpersist()
    }
  }

  private def n05(s: SparkSession, dir: String): DataFrame =
    connectedComponents(cappedLshPairs(bandRows(minhashDf(s, dir))))
      .orderBy(col("doc_id"))

  // The oracle re-derives the same fixpoint with a recursive CTE: `reach`
  // is the closure {(node, id that reaches it)}; MIN per node = the
  // component min. UNION (not UNION ALL) dedups the closure, which is
  // what terminates the recursion.
  /** pairs→edges→reach→canon CTE bodies over the LSH `bands`/
    * `kept_buckets` CTEs ([[lshBandsCtesSql]]); `canon` is
    * (doc_id, canonical_id) for every doc in ≥1 candidate pair. Needs a
    * `WITH RECURSIVE` header. Shared by n05's oracle and c07's. */
  val componentsCtesSql: String =
    """pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_key = b.band_key
      |   AND a.doc_id < b.doc_id
      |  JOIN kept_buckets k ON a.band_id = k.band_id AND a.band_key = k.band_key),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
      |reach AS (
      |  SELECT DISTINCT src AS id, src AS comp FROM edges
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      |canon AS (
      |  SELECT id AS doc_id, MIN(comp) AS canonical_id FROM reach GROUP BY 1)""".stripMargin

  private val n05Sql =
    s"""WITH RECURSIVE ${minhashCtesSql("documents")},
       |${lshBandsCtesSql()},
       |$componentsCtesSql
       |SELECT doc_id, canonical_id,
       |  CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS comp_size
       |FROM canon
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // n06 — incremental LSH near-dup: a new crawl batch probed against the
  // EXISTING corpus's band index — the near-dup complement of d13's
  // exact-digest path, and together the full steady-state dedup story
  // (a production corpus is indexed once; each day's batch probes it,
  // never re-pairs the corpus against itself). Corpus = even doc_ids,
  // batch = odd (mirroring d13); signatures are computed once over the
  // union and split into index and probe sides afterwards.
  //
  // Scale: one shuffle on (band_id, band_key); batch×corpus candidates
  // only — no corpus self-pairs. The per-bucket cap applies to the
  // CORPUS index side (a degenerate band key would otherwise fan every
  // probe out by the corpus bucket size); capped buckets are the
  // exact-dedup-or-more-bands regime, as in n02.
  // ---------------------------------------------------------------------
  private def n06(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = bandRows(minhashDf(s, dir))
    val corpus = bands.where(pmod(col("doc_id"), lit(2L)) === 0L)
      .select(col("band_id"), col("band_key"), col("doc_id").as("corpus_doc"))
    val keptCorpus = corpus
      .withColumn("bn", count(lit(1)).over(
        Window.partitionBy(col("band_id"), col("band_key"))))
      .where(col("bn") <= MaxBucket)
      .drop("bn")
    val probes = bands.where(pmod(col("doc_id"), lit(2L)) === 1L)
      .select(col("band_id"), col("band_key"), col("doc_id").as("batch_doc"))
    probes.join(keptCorpus, Seq("band_id", "band_key"))
      .groupBy(col("batch_doc"))
      .agg(
        count_distinct(col("corpus_doc")).as("n_corpus_neardups"),
        min(col("corpus_doc")).as("min_corpus_doc"))
      .orderBy(col("batch_doc"))
  }
  private val n06Sql =
    s"""$minhashBaseSql,
       |bands AS (
       |  ${(0 until 4).map { b =>
            s"SELECT doc_id, $b AS band_id, concat_ws(':', mh${2 * b}, mh${2 * b + 1}) AS band_key FROM sigs"
          }.mkString("\n  UNION ALL\n  ")}),
       |corpus AS (
       |  SELECT band_id, band_key, doc_id AS corpus_doc
       |  FROM bands WHERE doc_id % 2 = 0),
       |kept_corpus AS (
       |  SELECT band_id, band_key, corpus_doc FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band_id, band_key) AS bn
       |    FROM corpus)
       |  WHERE bn <= $MaxBucket),
       |probes AS (
       |  SELECT band_id, band_key, doc_id AS batch_doc
       |  FROM bands WHERE doc_id % 2 = 1)
       |SELECT batch_doc,
       |  CAST(COUNT(DISTINCT corpus_doc) AS BIGINT) AS n_corpus_neardups,
       |  MIN(corpus_doc) AS min_corpus_doc
       |FROM probes
       |JOIN kept_corpus USING (band_id, band_key)
       |GROUP BY 1
       |ORDER BY batch_doc""".stripMargin

  // ---------------------------------------------------------------------
  // n07 — MinHash estimator audit: for every n02 LSH candidate pair,
  // the signature-estimated Jaccard (matching components / k) next to
  // the EXACT shingle-set Jaccard, with the signed error — v08's
  // recall-audit idea applied to the text-dedup stack. This answers the
  // question a production near-dup pipeline must re-ask whenever the
  // corpus shifts: "are k=8 hashes still tight enough for our drop
  // threshold, or are we shedding non-duplicates?" — measured on the
  // REAL candidates the pipeline would drop, not a synthetic sample.
  //
  // Scale shape: signatures are computed once and persisted (the v04
  // index pattern — three consumers would otherwise re-run the one-pass
  // sketch per branch); exact Jaccard runs per-PAIR on the LSH
  // candidate sliver only (bucket-capped upstream), never on the
  // corpus-quadratic pair space. All scores integer ppm.
  // ---------------------------------------------------------------------
  private def n07(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sig = minhashSignatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cappedLshPairs(bandRows(sig))
    val shsets = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks")).as("sh"))
      .select(col("doc_id"), array_distinct(col("sh")).as("shset"))
    val sigA = sig.toDF(sig.columns.toIndexedSeq.map(c =>
      if (c == "doc_id") "doc_a" else s"a_$c"): _*)
    val sigB = sig.toDF(sig.columns.toIndexedSeq.map(c =>
      if (c == "doc_id") "doc_b" else s"b_$c"): _*)
    val nMatch = As.indices
      .map(k => when(col(s"a_mh$k") === col(s"b_mh$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs
      .join(sigA, "doc_a").join(sigB, "doc_b")
      .withColumn("n_sig_match", nMatch)
      .join(shsets.toDF("doc_a", "sa"), "doc_a")
      .join(shsets.toDF("doc_b", "sb"), "doc_b")
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("n_union",
        size(array_union(col("sa"), col("sb"))).cast(LongType))
      .withColumn("est_ppm", col("n_sig_match") * (1000000L / As.length))
      .withColumn("exact_ppm",
        expr("n_inter * 1000000 div greatest(n_union, 1)"))
      .withColumn("err_ppm", col("est_ppm") - col("exact_ppm"))
      .select(col("doc_a"), col("doc_b"), col("n_sig_match"), col("est_ppm"),
        col("n_inter"), col("n_union"), col("exact_ppm"), col("err_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
  private val n07Sql = {
    val matchSum = As.indices
      .map(k => s"CASE WHEN sa.mh$k = sb.mh$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    val perHash = 1000000L / As.length
    s"""$minhashBaseSql,
       |${lshBandsCtesSql()},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  JOIN kept_buckets k ON a.band_id = k.band_id AND a.band_key = k.band_key),
       |shs AS (
       |  SELECT doc_id, list_distinct($shinglesSql) AS shset FROM documents),
       |j AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST($matchSum AS BIGINT) AS n_sig_match,
       |    CAST(len(list_filter(a.shset, x -> list_contains(b.shset, x)))
       |      AS BIGINT) AS n_inter,
       |    CAST(len(a.shset) AS BIGINT) AS len_a,
       |    CAST(len(b.shset) AS BIGINT) AS len_b
       |  FROM pairs p
       |  JOIN sigs sa ON sa.doc_id = p.doc_a
       |  JOIN sigs sb ON sb.doc_id = p.doc_b
       |  JOIN shs a ON a.doc_id = p.doc_a
       |  JOIN shs b ON b.doc_id = p.doc_b),
       |scored AS (
       |  SELECT doc_a, doc_b, n_sig_match,
       |    n_sig_match * $perHash AS est_ppm,
       |    n_inter, len_a + len_b - n_inter AS n_union,
       |    n_inter * 1000000 // greatest(len_a + len_b - n_inter, 1)
       |      AS exact_ppm
       |  FROM j)
       |SELECT doc_a, doc_b, n_sig_match, est_ppm, n_inter, n_union,
       |  exact_ppm, est_ppm - exact_ppm AS err_ppm
       |FROM scored
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // n08 — SimHash near-dup pairs by Hamming distance: documents whose
  // 16-bit fingerprints differ in at most MaxHamming bits. Candidate
  // generation is pigeonhole banding — the fingerprint splits into 4
  // nibbles, and any pair within Hamming ≤ 3 must agree on at least one
  // whole nibble (4 bands, ≤ 3 flipped bits cannot touch all of them).
  // The pigeonhole guarantee is exact only for pairs whose agreeing
  // nibble lands in a KEPT bucket: this reuses n02's capped-bucket pair
  // machinery, and a pair whose every agreeing band falls in a bucket
  // larger than MaxBucket is dropped with it — a deliberate recall
  // trade-off at saturation, not an exactness claim. The final filter
  // is bit_count(xor) on the pair sliver.
  //
  // Scale note: 16 bits means 4-bit bands (16 values), which saturates
  // — buckets grow as n/16 and the MaxBucket cap starts binding. The
  // production setting is the SAME plan over a 64-bit fingerprint
  // (4 × 16-bit bands, 65536 values each); nothing in the plan shape
  // changes, only the band arithmetic constants.
  // ---------------------------------------------------------------------
  /** Max fingerprint Hamming distance for an n08 pair. */
  val MaxHamming = 3

  private def n08(s: SparkSession, dir: String): DataFrame = {
    val fps = simhashOf(t(s, dir, "documents"))
      .select(col("doc_id"), col("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band_id"),
        expr(s"CAST((simhash >> ${4 * b}) & 15 AS STRING)").as("band_key"))
    }: _*)
    val bands = fps.select(col("doc_id"), explode(bandStructs).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
    cappedLshPairs(bands)
      .join(fps.toDF("doc_a", "fp_a"), "doc_a")
      .join(fps.toDF("doc_b", "fp_b"), "doc_b")
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast(LongType))
      .where(col("hamming") <= MaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
  private val n08Sql =
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    list_transform(${TextOps.tokensSql}, tk ->
       |      CAST(concat('0x', substr(md5(tk), 1, 4)) AS BIGINT)) AS hs
       |  FROM documents),
       |fps AS (
       |  SELECT doc_id,
       |    CAST(coalesce(list_sum(list_transform(range(0, 16), i ->
       |      CASE WHEN coalesce(list_sum(list_transform(hs, h ->
       |             CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
       |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)), 0) AS BIGINT)
       |      AS simhash
       |  FROM hashed),
       |bands AS (
       |  SELECT doc_id, b AS band_id,
       |    CAST((simhash >> (4 * b)) & 15 AS VARCHAR) AS band_key
       |  FROM fps, range(0, 4) r(b)),
       |kept_b AS (
       |  SELECT band_id, band_key FROM bands
       |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND $MaxBucket),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  JOIN kept_b k ON a.band_id = k.band_id AND a.band_key = k.band_key)
       |SELECT doc_a, doc_b,
       |  CAST(bit_count(xor(fa.simhash, fb.simhash)) AS BIGINT) AS hamming
       |FROM pairs
       |JOIN fps fa ON fa.doc_id = doc_a
       |JOIN fps fb ON fb.doc_id = doc_b
       |WHERE bit_count(xor(fa.simhash, fb.simhash)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------------
  // n09 — the PERSISTED-index serving path: n06's incremental probe run
  // against a band index that was SAVED first. n06 shows the steady-state
  // query shape (batch probes corpus, no corpus self-pairs); n09 shows
  // the steady-state STORAGE shape — the corpus index is built once,
  // written as a bucketed+sorted table on the band key, and every later
  // probe batch joins it with ZERO shuffle on either side (both sides
  // land pre-bucketed on the same key; PlanSpec pins the no-Exchange
  // join). At 100 TB this is the difference between re-banding the
  // corpus per batch (n06, fine for a one-off) and paying the corpus
  // shuffle ONCE at index-build time, then serving every daily batch
  // against it for free.
  //
  // The band key is a single concat'd column because the bucketed-join
  // no-shuffle guarantee needs the join key to BE the bucket key;
  // (band_id, band_key) joins on a two-column subset would re-shuffle.
  // The per-bucket cap moves to index-BUILD time (same window-count rule
  // as n06) — capping at write time is what a real index would do, and
  // it makes the saved table itself the contract. Output ≡ n06 modulo
  // the corpus/probe split being identical, so the oracle is n06's: the
  // hash match proves the served path returns exactly what the inline
  // path returns.
  // ---------------------------------------------------------------------

  /** Bucket count for the served band index. Sized for the test corpora;
    * at 100 TB this scales with cluster width (buckets ≈ 2-4× executor
    * count) — the plan shape is bucket-count-independent. */
  val ServeBuckets = 8

  // Per-process serving dir + catalog names (PID suffix via Sink.procTag:
  // a concurrent test JVM and a driver Verify must not write the same
  // files, and — metastores being per-process in-memory Derby here, but
  // not necessarily elsewhere — must not race DROP TABLE/saveAsTable on
  // shared catalog names either). Files are deleted on JVM exit.
  private def serveRoot: String = graft.sources.Sink.artifactRoot
  private val indexTableBase = s"graft_lsh_index_${graft.sources.Sink.procTag}"
  private val probeTableBase = s"graft_lsh_probe_${graft.sources.Sink.procTag}"

  /** Build + SAVE the corpus band index and the probe batch's bands as
    * co-bucketed tables (corpus = even doc_ids, batch = odd, mirroring
    * n06/d13), returning the (index, probe) table names to join. Both
    * names and paths are keyed by the CORPUS FINGERPRINT (the BPE/IVF/PQ
    * /BQ artifact discipline): a documents corpus regenerated in place
    * gets a new print → a fresh build, while an unchanged corpus reuses
    * the saved tables — the second and later consumers in a process pay
    * zero build cost. Public so PlanSpec can build once and pin the join
    * plan. */
  def buildServedLshIndex(s: SparkSession, dir: String): (String, String) = synchronized {
    import org.apache.spark.sql.expressions.Window
    val fp = graft.sources.Sink.corpusFingerprint(s, s"$dir/documents.parquet")
    val indexTable = s"${indexTableBase}_$fp"
    val probeTable = s"${probeTableBase}_$fp"
    if (!s.catalog.tableExists(indexTable) || !s.catalog.tableExists(probeTable)) {
      // Two write actions consume the one corpus-scale sketch — persist it
      // (the nearDupDrop/n07 rule) so the probe-side write does not re-run
      // MinHash over the documents.
      val bands = bandRows(minhashDf(s, dir))
        .withColumn("bkey", concat_ws("|", col("band_id"), col("band_key")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val corpus = bands.where(pmod(col("doc_id"), lit(2L)) === 0L)
          .select(col("bkey"), col("doc_id").as("corpus_doc"))
        val keptCorpus = corpus
          .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("bkey"))))
          .where(col("bn") <= MaxBucket)
          .drop("bn")
        val probes = bands.where(pmod(col("doc_id"), lit(2L)) === 1L)
          .select(col("bkey"), col("doc_id").as("batch_doc"))
        graft.sources.Sink.saveBucketedTableAt(
          keptCorpus, indexTable, s"$serveRoot/lsh_index_$fp", "bkey", ServeBuckets)
        graft.sources.Sink.saveBucketedTableAt(
          probes, probeTable, s"$serveRoot/lsh_probe_$fp", "bkey", ServeBuckets)
      } finally bands.unpersist()
    }
    (indexTable, probeTable)
  }

  /** The serving-time join over the SAVED tables — no Exchange on either
    * side (PlanSpec). `tables` is [[buildServedLshIndex]]'s return. */
  def servedLshJoin(s: SparkSession, tables: (String, String)): DataFrame =
    s.table(tables._2)
      .join(s.table(tables._1), Seq("bkey"))

  private def n09(s: SparkSession, dir: String): DataFrame = {
    servedLshJoin(s, buildServedLshIndex(s, dir))
      .groupBy(col("batch_doc"))
      .agg(
        count_distinct(col("corpus_doc")).as("n_corpus_neardups"),
        min(col("corpus_doc")).as("min_corpus_doc"))
      .orderBy(col("batch_doc"))
  }

  // ---------------------------------------------------------------------
  // n10 — LSH banding S-curve audit: the tuning report behind every
  // MinHash dedup deployment. With k=8 signatures, the three bandings
  // (8×1, 4×2, 2×4) trade recall against precision along the standard
  // S-curve P(candidate) = 1-(1-J^r)^b: more bands/shorter rows collide
  // earlier (high recall, low precision), fewer bands/longer rows later.
  // Per config the audit reports candidate volume, the candidates whose
  // signature-estimated Jaccard clears 0.5 (≥4 of 8 sigs agree — the
  // n07 estimator), and integer-ppm precision. Config (4,2) IS n02's
  // production banding, so its row doubles as a cross-check (spec-pinned
  // equal to n02's pair count).
  //
  // Scale: each config is the n02 plan (one shuffle on (band_id,
  // band_key), per-bucket capped pair explode) plus two narrow
  // signature-row joins on the candidate sliver; the signature frame is
  // computed once and persisted across the three configs. Report is
  // 3 rows.
  // ---------------------------------------------------------------------
  private val SweepConfigs = Seq((8, 1), (4, 2), (2, 4))

  /** [[bandRows]] generalized to b bands × r rows over the k=8 sigs. */
  def bandRowsCfg(sig: DataFrame, b: Int, r: Int): DataFrame = {
    val bandStructs = array((0 until b).map { i =>
      struct(lit(i).as("band_id"),
        concat_ws(":", (0 until r).map(j => col(s"mh${i * r + j}")): _*)
          .as("band_key"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
  }

  private def n10(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashDf(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aSide = sig.select(col("doc_id").as("doc_a") +:
      As.indices.map(k => col(s"mh$k").as(s"a$k")): _*)
    val bSide = sig.select(col("doc_id").as("doc_b") +:
      As.indices.map(k => col(s"mh$k").as(s"b$k")): _*)
    val perCfg = SweepConfigs.map { case (b, r) =>
      val agree = As.indices
        .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
        .reduce(_ + _)
      cappedLshPairs(bandRowsCfg(sig, b, r))
        .join(aSide, Seq("doc_a")).join(bSide, Seq("doc_b"))
        .select(agree.as("n_agree"))
        .agg(count(lit(1)).as("n_cand_pairs"),
          coalesce(sum(when(col("n_agree") * 2L >= 8L, 1L).otherwise(0L)),
            lit(0L)).as("n_est_ge_50"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("n_cand_pairs"), col("n_est_ge_50"),
          expr("n_est_ge_50 * 1000000 div greatest(n_cand_pairs, 1)")
            .as("precision_ppm"))
    }
    perCfg.reduce(_ unionAll _).orderBy(col("bands").desc)
  }
  private val n10Sql = {
    val agreeSum = As.indices
      .map(k => s"(CASE WHEN sa.mh$k = sb.mh$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val blocks = SweepConfigs.map { case (b, r) =>
      s"""${lshBandsCtesSql(MaxBucket, b, r, s"$b")},
         |pairs$b AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands$b a JOIN bands$b b
         |    ON a.band_id = b.band_id AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |  JOIN kept_buckets$b k
         |    ON a.band_id = k.band_id AND a.band_key = k.band_key),
         |stat$b AS (
         |  SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
         |    CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
         |    CAST(COALESCE(SUM(CASE WHEN 2 * ($agreeSum) >= 8
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_est_ge_50
         |  FROM pairs$b
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b)""".stripMargin
    }.mkString(",\n")
    val union = SweepConfigs.map { case (b, _) => s"SELECT * FROM stat$b" }
      .mkString(" UNION ALL ")
    s"""$minhashBaseSql,
       |$blocks
       |SELECT bands, rows_per_band, n_cand_pairs, n_est_ge_50,
       |  CAST(n_est_ge_50 * 1000000 // greatest(n_cand_pairs, 1) AS BIGINT)
       |    AS precision_ppm
       |FROM ($union)
       |ORDER BY bands DESC""".stripMargin
  }

  // ---------------------------------------------------------------------
  // n11 — near-dup SOURCE attribution census: n02's candidate pairs
  // rolled up by the (source, source) pair that produced them — the
  // table a data team reads to learn WHICH scrapes overlap (two crawls
  // of the same sites, a mirror ingested twice, boilerplate shared
  // across a domain family) before deciding what to stop ingesting.
  // Pairs are CONSUMED from the graded n02 (fn Spark-side, its SQL as a
  // nested CTE oracle-side — the c15 discipline); this census adds only
  // two narrow id-joins to attach sources and one aggregate to
  // |sources|² rows. The (least, greatest) normalization makes the pair
  // class orientation-free, so (web, wiki) and (wiki, web) land on one
  // row. CurationSpec-style tie: Σ n_pairs equals n02's pair count.
  // ---------------------------------------------------------------------
  private def n11(s: SparkSession, dir: String): DataFrame = {
    val pairs = n02(s, dir).select(col("doc_a"), col("doc_b"))
    val src = t(s, dir, "documents").select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .groupBy(
        least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }
  private val n11Sql =
    s"""WITH pairs AS ($n02Sql),
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT least(a.source, b.source) AS src_a,
       |  greatest(a.source, b.source) AS src_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM pairs p
       |JOIN src a ON p.doc_a = a.doc_id
       |JOIN src b ON p.doc_b = b.doc_id
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // n12 — planted near-dup RECALL audit (audit-the-detector): every doc
  // gets a deterministic mutated twin (every 10th token dropped — ~70%
  // shingle Jaccard, squarely in the band the detector is tuned for),
  // the production LSH pipeline runs over the augmented corpus, and the
  // report grades how many planted (doc, twin) pairs it caught, in
  // integer ppm. n07/n10 audit the ESTIMATOR against candidates the
  // detector already surfaced; this is the complement — labeled ground
  // truth the detector never saw, measuring end-to-end recall including
  // what banding MISSES (1−(1−J²)⁴ leaves a deterministic tail at this
  // mutation strength; the number is the detector's operating point, not
  // 10⁶). Twin ids ride at +PLANT_OFF where PLANT_OFF = max(doc_id)+1,
  // derived from the corpus itself (ADVICE r14: a fixed 100000 collides
  // with organic ids on any corpus above 100k docs): every twin id then
  // exceeds every organic id, so twins can never collide with organic
  // rows, and no organic pair can sit exactly PLANT_OFF apart (doc_a ≥ 0
  // ⇒ doc_a + PLANT_OFF > max organic id) — caught pairs are
  // recognizable by id arithmetic at any corpus size.
  // Single-source: Spark side runs the REAL minhashSignatures → bandRows
  // → cappedLshPairs; oracle side reuses minhashCtesSql/lshBandsCtesSql
  // over the same augmented CTE (index semantics aligned: Spark lambda i
  // is 0-based, DuckDB's is 1-based — both drop tokens 1, 11, 21, …).
  // ---------------------------------------------------------------------
  private def n12(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    // one 1-row scalar, broadcast to both the plant and the label check —
    // never a driver constant, so the scheme holds at any corpus size
    val off = broadcast(docs.agg((max(col("doc_id")) + 1L).as("plant_off")))
    val mutated = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .crossJoin(off)
      .select((col("doc_id") + col("plant_off")).as("doc_id"),
        array_join(filter(col("toks"), (_, i) => i % 10 =!= 0), " ").as("text"))
    val pairs = cappedLshPairs(bandRows(minhashSignatures(
      docs.unionByName(mutated))))
    val caught = pairs
      .crossJoin(off)
      .where(col("doc_b") === col("doc_a") + col("plant_off"))
      .agg(count(lit(1)).as("n_caught"))
    docs.agg(count(lit(1)).as("n_planted"))
      .crossJoin(caught)
      .select(col("n_planted"), col("n_caught"),
        expr("n_caught * 1000000 div n_planted").as("recall_ppm"))
  }
  private val n12Sql =
    s"""WITH off AS (
       |  SELECT MAX(doc_id) + 1 AS plant_off FROM documents),
       |aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + (SELECT plant_off FROM off) AS doc_id,
       |    array_to_string(
       |      list_filter(${TextOps.tokensSql}, (t, i) -> i % 10 != 1),
       |      ' ') AS text
       |  FROM documents),
       |${minhashCtesSql("aug")},
       |${lshBandsCtesSql()},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  JOIN kept_buckets k ON a.band_id = k.band_id AND a.band_key = k.band_key),
       |caught AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_caught
       |  FROM pairs WHERE doc_b = doc_a + (SELECT plant_off FROM off)),
       |planted AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_planted FROM documents)
       |SELECT n_planted, n_caught,
       |  CAST(n_caught * 1000000 // n_planted AS BIGINT) AS recall_ppm
       |FROM planted CROSS JOIN caught""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("n01_minhash_signatures", n01, Some(n01Sql), headline = true),
    QueryDef("n02_minhash_lsh_pairs", n02, Some(n02Sql), headline = true),
    QueryDef("n03_simhash", n03, Some(n03Sql)),
    QueryDef("n04_ngram_jaccard", n04, Some(n04Sql)),
    QueryDef("n05_neardup_components", n05, Some(n05Sql), headline = true),
    QueryDef("n06_incremental_lsh_neardup", n06, Some(n06Sql), headline = true),
    QueryDef("n07_minhash_audit", n07, Some(n07Sql)),
    QueryDef("n08_simhash_neardup", n08, Some(n08Sql)),
    // n09's oracle IS n06's SQL: the served path must return exactly
    // what the inline incremental probe returns.
    QueryDef("n09_served_lsh_probe", n09, Some(n06Sql), headline = true),
    QueryDef("n10_lsh_banding_audit", n10, Some(n10Sql)),
    QueryDef("n11_neardup_source_census", n11, Some(n11Sql)),
    QueryDef("n12_planted_recall_audit", n12, Some(n12Sql)))
}
