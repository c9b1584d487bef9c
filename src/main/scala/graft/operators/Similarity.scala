package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Determinism across engines: every dot product is an explicit
  * left-to-right fold over DOUBLE-cast elements (zip_with + aggregate in
  * Spark, list_transform + list_sum in DuckDB), so both engines run the
  * same IEEE-754 operations in the same order → bit-identical results.
  *
  * Scale design: brute-force top-k broadcasts the (tiny) query set and
  * keeps per-partition top-k before the final merge (window over a
  * shuffle on query id). The near-dup variant blocks on `label` (an
  * IVF-style coarse partition) so the pair space is bounded per bucket
  * rather than O(n²), with hot blocks dropped past [[MaxLabelBlock]].
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Explicit l2r fold dot product of two float-array columns, in DOUBLE.
    * Backed by the custom [[graft.functions.VecDot]] expression — same
    * fold order/ops as the zip_with+aggregate tree, ~10× faster than the
    * interpreted HOF evaluation on the pairwise-scoring hot path. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(graft.functions.VecDot(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the same fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  private val dotSql =
    "list_sum(list_transform(range(1, len(%s) + 1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"
  private[operators] def dotS(a: String, b: String): String = dotSql.format(a, a, b)
  private[operators] def normS(a: String): String = s"sqrt(${dotS(a, a)})"

  // ---------------------------------------------------------------------
  // v01 — brute-force cosine top-k: queries = vec_id < 5, candidates =
  // everything else. The query side is broadcast; per-candidate work is
  // one fused codegen'd array fold; ranking is the BOUNDED
  // [[graft.functions.TopKSmallest]] aggregate keyed on −cosine (the
  // double sort key rides the order-preserving IEEE-754→long transform,
  // so −key on the way out is the exact cosine). A rank window here
  // would hash-shuffle |corpus| scored rows per query onto ONE task and
  // fully sort them to keep 10 — at 100 TB each query is a single-task
  // corpus sort. The aggregate instead caps map-side state at k pairs
  // per query, so the q_id shuffle carries ≤ mappers·k rows; ties break
  // on ascending c_id exactly like the oracle's rank-window ORDER BY
  // (DuckDB proves the bounded plan ≡ the textbook semantics, the d18
  // pattern). This is the correctness baseline ANN; v02/n-LSH is the
  // scale path.
  // ---------------------------------------------------------------------
  private def v01(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val sim = (dot(col("q_emb"), col("c_emb"))
      / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine")
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), sim)
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("cosine"), col("c_id"), 10).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        round(-col("kv.key"), 6).as("cosine_r"),
        (col("pos") + 1).cast(LongType).as("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v01Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
       |scored AS (
       |  SELECT q_id, c_id,
       |    ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")}) AS cosine
       |  FROM q JOIN c ON q_id <> c_id),
       |ranked AS (
       |  SELECT q_id, c_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, round(cosine, 6) AS cosine_r, rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v02 — embedding near-duplicate pairs with label blocking (IVF-style
  // coarse quantization: `label` plays the role of the cluster id): pairs
  // are generated inside blocks only → shuffle on label, never cross
  // join. Pair count is quadratic in BLOCK size, so a skewed label (the
  // n04 hot-token hazard transposed to embeddings) is guarded: blocks
  // past `maxBlock` vectors are dropped before the self-join — a block
  // that hot needs sub-blocking (v03's hyperplane bits as a secondary
  // key), not pairwise scoring. The oracle states the same cap.
  // ---------------------------------------------------------------------

  /** Default per-label block cap: far above any block in the test
    * corpora (sf0.1 max block = 218), binding only on degenerate labels
    * at scale where one key would otherwise hold O(size²) pairs. */
  val MaxLabelBlock = 10000

  /** Near-dup pairs inside label blocks, block size capped at
    * `maxBlock`. The block count is a window on the same `label` key
    * the self-join shuffles on — partitioning reused, no extra pass.
    * Public so SimilaritySpec can drive it with a small cap on a
    * degenerate single-label corpus. */
  def neardupPairs(emb: DataFrame, threshold: Double,
      maxBlock: Int = MaxLabelBlock): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .withColumn("blk", count(lit(1)).over(
        Window.partitionBy(col("label"))))
      .where(col("blk") <= maxBlock)
      .drop("blk")
    val a = e.as("a"); val b = e.as("b")
    a.join(b,
        col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"),
        (dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .where(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  private def v02(s: SparkSession, dir: String): DataFrame =
    neardupPairs(t(s, dir, "embeddings"), 0.25)
      .orderBy(col("vec_a"), col("vec_b"))
  private val v02Sql =
    s"""WITH e0 AS (
       |  SELECT vec_id, label, embedding, ${normS("embedding")} AS nrm
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, label, embedding, nrm FROM (
       |    SELECT vec_id, label, embedding, nrm,
       |      COUNT(*) OVER (PARTITION BY label) AS blk
       |    FROM e0)
       |  WHERE blk <= $MaxLabelBlock)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       |  round(${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine_r
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.25
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------
  // v03 — random-hyperplane LSH bucketing (the ANN scale path): 8 sign
  // bits from pseudo-random hyperplanes derived from md5 of the dimension
  // index (deterministic, engine-agnostic), giving a 256-bucket index.
  // Output: bucket histogram — the index-build step of LSH-ANN. Probing a
  // query = compute its 8 bits and scan only that bucket (see v01 for the
  // in-bucket scoring shape).
  // ---------------------------------------------------------------------
  /** 8-bit random-hyperplane bucket id of an embedding column — the LSH
    * index key shared by v03 (histogram) and v05 (bucket-blocked near-dup).
    * Hyperplane h (0..7), dim d (0..dim-1): weight = ±1 from md5("h:d").
    * Iterates the vector's ACTUAL size — a hardcoded dim would turn any
    * shorter embedding into element_at NULLs that poison Spark's fold to
    * NULL while DuckDB's list_sum skips NULLs (silent bucket skew). */
  def lshBucket(emb: Column): Column = {
    def planeSign(h: Int): Column = {
      val prods = transform(sequence(lit(0), size(emb) - 1), d =>
        when(
          pmod(conv(substring(md5(concat_ws(":", lit(h), d)), 1, 4), 16, 10)
            .cast(LongType), lit(2L)) === 1L,
          element_at(emb, d + 1).cast(DoubleType))
        .otherwise(-element_at(emb, d + 1).cast(DoubleType)))
      when(aggregate(prods, lit(0.0), (acc, x) => acc + x) > 0.0, 1L)
        .otherwise(0L)
    }
    (0 until 8).map(h => planeSign(h) * (1L << h)).reduce(_ + _)
  }

  private def v03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), lshBucket(col("embedding")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("bucket"))
  /** SQL mirror of [[lshBucket]] over a column literally named
    * `embedding` — shared by the v03 and v05 oracles. */
  private val lshBucketSqlExpr: String = {
    def planeSignSql(h: Int): String =
      s"""CASE WHEN coalesce(list_sum(list_transform(range(0, len(embedding)), d ->
         |  CASE WHEN CAST(concat('0x', substr(md5(concat_ws(':', '$h', d)), 1, 4)) AS BIGINT) % 2 = 1
         |       THEN CAST(embedding[d + 1] AS DOUBLE)
         |       ELSE -CAST(embedding[d + 1] AS DOUBLE) END)), 0) > 0
         | THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END""".stripMargin.replace("\n", "")
    (0 until 8).map(h => s"(${planeSignSql(h)} * ${1L << h})").mkString(" + ")
  }

  private val v03Sql =
    s"""WITH bucketed AS (
       |  SELECT vec_id, $lshBucketSqlExpr AS bucket FROM embeddings)
       |SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
       |FROM bucketed
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // v05 — LSH-bucket-blocked near-dup pairs: v02's pairwise scoring with
  // the blocking key DERIVED FROM THE VECTORS (v03's 8-bit hyperplane
  // bucket) instead of an external label — the shape that works when no
  // curated label exists, which is the normal case for a raw embedding
  // corpus. Same quadratic-guard as v02: buckets past the cap are
  // dropped before the self-join (a bucket that hot needs more
  // hyperplane bits, not pairwise scoring). Trade-off vs v02: recall is
  // bounded by LSH collision probability (near-identical vectors land in
  // the same bucket with high probability; merely-similar ones may
  // split), which is exactly the ANN contract.
  // ---------------------------------------------------------------------
  private def v05(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        lshBucket(col("embedding")).as("bucket"))
    val e = e0
      .withColumn("blk", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .where(col("blk") <= MaxLabelBlock)
      .drop("blk")
    val a = e.as("a"); val b = e.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bucket").as("bucket"),
        (dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .where(col("cosine") >= 0.25)
      .select(col("vec_a"), col("vec_b"), col("bucket"),
        round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
  private val v05Sql =
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding, ${normS("embedding")} AS nrm,
       |    $lshBucketSqlExpr AS bucket
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, embedding, nrm, bucket FROM (
       |    SELECT vec_id, embedding, nrm, bucket,
       |      COUNT(*) OVER (PARTITION BY bucket) AS blk
       |    FROM e0)
       |  WHERE blk <= $MaxLabelBlock)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       |  round(${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine_r
       |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.25
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------
  // v04 — IVF-style ANN: the scale path for similarity search. A coarse
  // codebook (k = 8 centroids TRAINED with deterministic Lloyd
  // iterations, seeded from vec_id < 8) partitions the corpus by
  // nearest centroid — O(n·k) broadcast work, one shuffle on cluster
  // id — then each query probes ONLY its own cluster (~n/k candidates
  // instead of n). At 100 TB this is the difference between a
  // full-corpus scan per query and a pruned-partition scan; the
  // assignment doubles as the physical partitioning key for the table.
  //
  // Cross-engine-deterministic k-means: float means are never
  // bit-reproducible across engines (sum order is unspecified), so
  // training runs in INTEGER space. Each embedding quantizes once to
  // q_d = floor(x_d·1024 + 0.5) — exact small integers carried as
  // DOUBLEs (the v06 trick: ·1024 is a power of two, so the only
  // rounding is the floor itself, identical in both engines). A Lloyd
  // update is then an elementwise SUM of member vectors — integer
  // addition, exact and order-independent — and because cosine is
  // scale-invariant the un-divided sum IS the new centroid direction:
  // no mean, no division, no float-accumulation hazard. Assignment
  // ranks cos(q, c) through the shared l2r fold (ties to the smaller
  // cent_id), so every arithmetic op is identical in Spark and DuckDB.
  // Magnitude audit: |q_d| ≤ 1024, so per-dim sums stay ≪ 2^53 exact
  // up to ~2^42 members per cluster; a 100 TB deployment re-scales the
  // quantization (or splits the sum hierarchically) long before that.
  // ---------------------------------------------------------------------
  /** IVF codebook size / Lloyd iterations / quantization scale. */
  private val IvfK = 8
  private val IvfIters = 2
  private val QuantScale = 1024.0

  /** floor(x·1024 + 0.5) per element — exact integers as DOUBLEs. */
  private def quant(c: Column): Column =
    transform(c, x =>
      floor(x.cast(DoubleType) * lit(QuantScale) + lit(0.5)).cast(DoubleType))

  /** `IvfIters` deterministic Lloyd iterations over the quantized
    * corpus; returns (cent_id, c) where c is the (un-normalized)
    * integer centroid direction. An empty cluster keeps its previous
    * centroid. Scale shape per iteration: one broadcast cross with k
    * centroids + one shuffle keyed (cent_id, pos) with map-side partial
    * sums — the textbook distributed Lloyd step. */
  private def trainCentroids(s: SparkSession, dir: String): DataFrame = {
    val qe = t(s, dir, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("q"))
    lloyd(s, qe,
      qe.where(col("vec_id") < IvfK)
        .select(col("vec_id").as("cent_id"), col("q").as("c")))
  }

  /** [[trainCentroids]] over a SUBSET of the corpus (the pre-growth
    * snapshot of the incremental-index story, v24): the training corpus
    * is `pred`-filtered and — because the subset's smallest ids are no
    * longer 0..k−1 — seeded from the k SMALLEST surviving vec_ids with
    * dense cent_ids 0..k−1 (rank-based, mirrored in
    * [[ivfCtesSql]]'s seedByRank variant). For the full corpus the rank
    * rule degenerates to the `vec_id < k` rule, but the graded full-
    * corpus path keeps its original seeds untouched. */
  private def trainCentroidsOn(s: SparkSession, dir: String, pred: Column): DataFrame = {
    import s.implicits._
    val qe = t(s, dir, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("q"))
      .where(pred)
    // k-row driver step (same training-loop boundary as lloyd's local()):
    // take the IvfK smallest vec_ids, re-key densely as cent_id 0..k-1.
    val seedRows = qe.orderBy(col("vec_id")).limit(IvfK).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).zipWithIndex
      .map { case ((_, q), i) => (i.toLong, q) }.toSeq
    lloyd(s, qe, s.createDataset(seedRows).toDF("cent_id", "c"))
  }

  /** The shared deterministic Lloyd loop: `qe` is the TRAINING corpus
    * (vec_id, q), `seed` the initial (cent_id, c) table. */
  private def lloyd(s: SparkSession, qe: DataFrame, seed: DataFrame): DataFrame = {
    import s.implicits._
    // Each Lloyd generation is COLLECTED to the driver and rebuilt as a
    // local literal relation: k rows × dims integers, driver-scale by
    // construction. Without this the iterations chain lazily — cent_k's
    // plan references cent_{k-1} in two places (the assign cross and the
    // empty-cluster fallback join), so corpus-scale passes grow
    // ~2^IvfIters and every CONSUMER of the trained table re-runs the
    // whole training from scratch. The collect is the same one-row-ish
    // driver step as Bpe.train's argmax: a deliberate training-loop
    // boundary, not a hot-path collect.
    def local(df: DataFrame): DataFrame = {
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
      s.createDataset(rows).toDF("cent_id", "c")
    }
    var cent = local(seed)
    for (_ <- 0 until IvfIters) {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id"))
      val assign = qe.crossJoin(broadcast(cent))
        .withColumn("ccos",
          dot(col("q"), col("c")) / (norm(col("q")) * norm(col("c"))))
        .withColumn("arn", row_number().over(w))
        .where(col("arn") === 1)
      val sums = assign
        .select(col("cent_id"), posexplode(col("q")))
        .groupBy(col("cent_id"), col("pos")).agg(sum(col("col")).as("sx"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
          st => st.getField("sx")).as("cs"))
      cent = local(cent.join(sums, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("cs"), col("c")).as("c")))
    }
    cent
  }

  /** Build-once/serve-many for the trained coarse codebook (the n09/BPE
    * artifact discipline): the first consumer of a corpus in this
    * process runs the Lloyd loop and publishes the k-row centroid table
    * under the per-process artifact root; every later consumer — v04,
    * v09, v10, v13, v16, and in production every index build and every
    * query batch — reads k rows instead of re-running IvfIters corpus
    * passes. The table is driver-scale (k × dims integers) so the
    * read-back stays a broadcast-friendly local relation. */
  private def ivfCentroids(s: SparkSession, dir: String): DataFrame = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${graft.sources.Sink.artifactRoot}/ivf_centroids/$tag"
    // content-keyed (not just path-keyed): a regenerated embeddings
    // corpus must retrain, never serve the previous corpus' centroids
    graft.sources.Sink.fingerprintedArtifact(s, path, s"$dir/embeddings.parquet")(
      trainCentroids(s, dir).coalesce(1))
  }

  /** Test seam: the served full-corpus codebook ([[ivfCentroids]]). */
  private[graft] def servedCentroids(s: SparkSession, dir: String): DataFrame =
    ivfCentroids(s, dir)

  /** Test seam: the served full-corpus PQ codebook ([[pqCodebook]]). */
  private[graft] def servedPqCodebook(s: SparkSession, dir: String): DataFrame =
    pqCodebook(s, dir)

  /** Delta membership for the incremental-index scenario (v24): vectors
    * with vec_id ≡ 3 (mod 4) are the POST-TRAINING arrivals — 25% of the
    * corpus, deterministic and SF-proportional. Mirrored verbatim in the
    * v24 oracle. */
  private val DeltaMod = 4
  private[graft] def isDelta(vecId: Column): Column =
    pmod(vecId, lit(DeltaMod)) === lit(DeltaMod - 1)

  /** Cluster assignment of the `pred`-selected corpus slice under an
    * explicit (frozen) centroid table — the incremental-index append
    * primitive: new arrivals are assigned against the served quantizer
    * and appended to the inverted lists; no retrain, no touch of the
    * already-assigned base. SimilaritySpec proves
    * assign(base) ∪ assign(delta) ≡ assign(full) row-for-row. */
  private[graft] def assignWithCentroids(s: SparkSession, dir: String,
                                         cents: DataFrame, pred: Column,
                                         maxArn: Int = 1): DataFrame =
    rankedAssignmentWith(s, dir, maxArn, cents, pred)

  /** Coarse codebook trained ONLY on the pre-growth base corpus
    * (¬[[isDelta]]), published as its own fingerprinted artifact: the
    * "stale quantizer" of the incremental-index lifecycle — at 100 TB a
    * grown corpus keeps serving centroids trained before the delta
    * arrived, and v24 measures what that staleness costs in recall. */
  private[graft] def staleCentroids(s: SparkSession, dir: String): DataFrame = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${graft.sources.Sink.artifactRoot}/ivf_centroids_base/$tag"
    graft.sources.Sink.fingerprintedArtifact(s, path, s"$dir/embeddings.parquet")(
      trainCentroidsOn(s, dir, !isDelta(col("vec_id"))).coalesce(1))
  }

  /** [[trainPqCodebook]] behind the same published-artifact seam:
    * m·k rows of PqDim doubles, trained once per corpus per process. */
  private def pqCodebook(s: SparkSession, dir: String): DataFrame = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${graft.sources.Sink.artifactRoot}/pq_codebook/$tag"
    graft.sources.Sink.fingerprintedArtifact(s, path, s"$dir/embeddings.parquet")(
      trainPqCodebook(s, dir).coalesce(1))
  }

  /** PQ codebook trained ONLY on the pre-growth base corpus — the
    * stale fine quantizer of the v25 audit ([[staleCentroids]]' PQ
    * sibling), its own fingerprinted artifact family. */
  private[graft] def stalePqCodebook(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"${graft.sources.Sink.artifactRoot}/pq_codebook_base/$tag"
      graft.sources.Sink.fingerprintedArtifact(s, path, s"$dir/embeddings.parquet")(
        trainPqCodebookOn(s, dir, !isDelta(col("vec_id"))).coalesce(1))
    }

  /** The IVF ranked centroid assignment shared by v04/v09/v10: every
    * vector crossed with the broadcast TRAINED codebook
    * ([[trainCentroids]]), quantized cosine per pair, ranked per vector
    * (ties to the smaller cent_id). Rows with arn = 1 are the cluster
    * assignment; arn <= n is the probe/margin ranking. Callers persist
    * the result when they consume it more than once (it IS the index —
    * the v04 pattern); candidate scoring inside clusters stays on the
    * original float embeddings. */
  private def rankedAssignment(s: SparkSession, dir: String, maxArn: Int): DataFrame =
    rankedAssignmentWith(s, dir, maxArn, ivfCentroids(s, dir))

  /** [[rankedAssignment]] against an EXPLICIT centroid table — the seam
    * the incremental-index path (v24 / [[assignWithCentroids]]) uses to
    * assign any corpus slice under a FROZEN quantizer. Assignment is
    * per-row against the broadcast k-row codebook, so assigning base
    * and delta separately and unioning is literally the same plan as
    * assigning the full corpus — the property SimilaritySpec pins. */
  private def rankedAssignmentWith(s: SparkSession, dir: String, maxArn: Int,
                                   cents: DataFrame,
                                   pred: Column = lit(true)): DataFrame = {
    val e = t(s, dir, "embeddings")
      .where(pred)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
        quant(col("embedding")).as("q"))
    val cent = cents
      .select(col("cent_id"), col("c"), norm(col("c")).as("cent_nrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    e.crossJoin(broadcast(cent))
      .withColumn("cent_cos",
        dot(col("q"), col("c")) / (norm(col("q")) * col("cent_nrm")))
      .withColumn("arn", row_number().over(wAssign))
      .where(col("arn") <= maxArn)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        col("cent_cos"), col("arn"))
  }

  /** Oracle CTEs mirroring [[trainCentroids]] + the trained ranked
    * assignment: quantize, seed, then `IvfIters` unrolled
    * assign→sum→coalesce rounds. Exposes `cent` (cent_id, c, cent_nrm)
    * and `ranked_assign` (vec_id, embedding, nrm, cent_id, cent_cos,
    * arn). */
  private def ivfCtesSql(dims: Int = 64, trainPred: String = ""): String = {
    // trainPred restricts the TRAINING corpus (the v24 base snapshot);
    // the final assignment always covers the full corpus. With a
    // predicate, seeds come from the k smallest surviving vec_ids
    // re-keyed densely (mirroring trainCentroidsOn); without one, the
    // original `vec_id < k` seeds — same SQL as ever.
    val trainSrc = if (trainPred.isEmpty) "qe" else "qet"
    val trainCte =
      if (trainPred.isEmpty) ""
      else s"""qet AS (
              |  SELECT vec_id, q FROM qe WHERE $trainPred),
              |""".stripMargin
    val seedCte =
      if (trainPred.isEmpty)
        s"""c0 AS (
           |  SELECT vec_id AS cent_id, q AS c FROM qe WHERE vec_id < $IvfK)""".stripMargin
      else
        s"""c0 AS (
           |  SELECT cent_id, c FROM (
           |    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cent_id,
           |      q AS c
           |    FROM $trainSrc)
           |  WHERE cent_id < $IvfK)""".stripMargin
    def assignCte(centCte: String): String =
      s"""  SELECT vec_id, q, cent_id FROM (
         |    SELECT $trainSrc.vec_id, $trainSrc.q, $centCte.cent_id,
         |      row_number() OVER (PARTITION BY $trainSrc.vec_id
         |        ORDER BY ${dotS(s"$trainSrc.q", s"$centCte.c")}
         |                   / (${normS(s"$trainSrc.q")} * ${normS(s"$centCte.c")}) DESC,
         |                 $centCte.cent_id) AS arn
         |    FROM $trainSrc CROSS JOIN $centCte)
         |  WHERE arn = 1""".stripMargin
    def sumCte(assignCte: String): String =
      s"""  SELECT cent_id, list(sx ORDER BY i) AS cs FROM (
         |    SELECT cent_id, r.i, SUM(q[CAST(r.i AS BIGINT)]) AS sx
         |    FROM $assignCte CROSS JOIN range(1, ${dims + 1}) r(i)
         |    GROUP BY cent_id, r.i)
         |  GROUP BY cent_id""".stripMargin
    val rounds = (1 to IvfIters).map { it =>
      val prev = if (it == 1) "c0" else s"c${it - 1}"
      s"""a$it AS (
         |${assignCte(prev)}),
         |s$it AS (
         |${sumCte(s"a$it")}),
         |c$it AS (
         |  SELECT $prev.cent_id, COALESCE(s$it.cs, $prev.c) AS c
         |  FROM $prev LEFT JOIN s$it USING (cent_id))""".stripMargin
    }.mkString(",\n")
    s"""qe AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      floor(CAST(x AS DOUBLE) * $QuantScale + 0.5)) AS q
       |  FROM embeddings),
       |$trainCte$seedCte,
       |$rounds,
       |cent AS (
       |  SELECT cent_id, c, ${normS("c")} AS cent_nrm FROM c$IvfIters),
       |e AS (
       |  SELECT vec_id, embedding, ${normS("embedding")} AS nrm, q
       |  FROM embeddings JOIN qe USING (vec_id)),
       |ranked_assign AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, cent.cent_id,
       |    ${dotS("e.q", "cent.c")} / (${normS("e.q")} * cent.cent_nrm)
       |      AS cent_cos,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${dotS("e.q", "cent.c")}
       |                 / (${normS("e.q")} * cent.cent_nrm) DESC,
       |               cent.cent_id) AS arn
       |  FROM e CROSS JOIN cent)""".stripMargin
  }

  private def v04(s: SparkSession, dir: String): DataFrame = {
    // The assignment is referenced twice below (query side + candidate
    // side) and Spark duplicates non-identical subtrees, which would run
    // the O(n·k) assign twice. persist() materializes it once — exactly
    // what a production IVF build does: the index IS a materialized
    // cluster assignment (spill-safe: MEMORY_AND_DISK). Lifecycle: the
    // terminal action happens in the caller (Verify/Bench), which frees
    // this entry via spark.catalog.clearCache() after each query.
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = assigned.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id").as("q_cent"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    broadcast(q)
      .join(assigned.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"), col("cent_id")),
        col("q_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(wTop).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("cent_id").as("cluster_id"),
        round(col("cosine"), 6).as("cosine_r"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v04Sql =
    s"""WITH ${ivfCtesSql()},
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
       |    cent_id AS q_cent
       |  FROM assigned WHERE vec_id BETWEEN 100 AND 104),
       |scored AS (
       |  SELECT q_id, a.vec_id AS c_id, a.cent_id AS cluster_id,
       |    ${dotS("q_emb", "a.embedding")} / (q_nrm * a.nrm) AS cosine
       |  FROM q JOIN assigned a
       |    ON q.q_cent = a.cent_id AND q.q_id <> a.vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, cluster_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, cluster_id, round(cosine, 6) AS cosine_r,
       |  CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v14 — SemDeDup-style semantic deduplication (the shape of Abbas et
  // al. 2023): cluster the corpus with the TRAINED IVF codebook, then
  // prune, within each cluster, every vector that has a smaller-id
  // neighbor at cosine ≥ τ — "keep one representative per semantic
  // ε-ball", with min-id as the deterministic keeper rule (the paper
  // keeps a random member; an id-priority scan is the reproducible
  // equivalent). Pruning is greedy by id, not transitive-closure: a
  // vector is pruned iff SOME kept-or-pruned smaller id is within τ,
  // which upper-bounds the paper's per-ball pruning and needs no
  // iterative components.
  //
  // Scale: the pair space is bounded per cluster (n/k members each; the
  // k-means balance is itself audited by v10), so nothing materializes
  // O(n²); at 100 TB the codebook size k scales with n (k ≈ √n is the
  // usual IVF rule) and hot clusters shard by the n02/v05 block-cap
  // pattern. The within-cluster join shuffles once on cent_id.
  // ---------------------------------------------------------------------
  private val SemDedupTau = 0.3

  private def v14(s: SparkSession, dir: String): DataFrame = {
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pruned = assigned
      .select(col("cent_id"), col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      .join(assigned.select(col("cent_id"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm")), Seq("cent_id"))
      .where(col("a_id") < col("b_id")
        && dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))
             >= SemDedupTau)
      .select(col("b_id").as("vec_id")).distinct()
      .withColumn("pruned", lit(1L))
    assigned.select(col("vec_id"), col("cent_id"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("pruned"), lit(0L)).as("pruned"))
      .orderBy(col("vec_id"))
  }
  private val v14Sql =
    s"""WITH ${ivfCtesSql()},
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |pruned AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM assigned a JOIN assigned b
       |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       |  WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm)
       |          >= $SemDedupTau)
       |SELECT a.vec_id, CAST(a.cent_id AS BIGINT) AS cent_id,
       |  CAST(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS pruned
       |FROM assigned a LEFT JOIN pruned p USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // c11 — SEMANTIC split-contamination audit: c04 catches eval docs whose
  // exact digest appears in train; c05 catches shared n-grams; this
  // catches the class both miss — an eval doc that is a paraphrase of a
  // train doc (same meaning, different words), which silently inflates
  // eval scores exactly like verbatim leakage. Every val/test vector is
  // checked against the train vectors of ITS OWN trained-IVF cluster
  // (v14's bounded pair space), and the best train match at cosine ≥ τ
  // is reported per contaminated eval doc (row_number over (cosine desc,
  // train id) — double ranking is cross-engine safe here because both
  // engines run the identical l2r fold).
  //
  // Scale: identical bounds to v14 — pairs are per-cluster, the split is
  // the d08 content-hash (layout-stable), the best-match window
  // partitions by eval doc with cluster-bounded cardinality. The train
  // side is ~80% of the corpus but never self-joins: only eval×train
  // within a cluster.
  // ---------------------------------------------------------------------
  private val ContamTau = 0.3

  private def c11(s: SparkSession, dir: String): DataFrame = {
    // d08's split rule keyed on vec_id (documents and embeddings share
    // ids — the v07 contract): composed from TextOps.splitBucket/splitOf
    // so the Spark-side split derivation has ONE source; only the SQL
    // mirror restates it under the doc_id→vec_id rename
    val split = TextOps.splitOf(TextOps.splitBucket(col("vec_id")))
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        split.as("split"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = assigned.where(col("split") =!= "train")
      .select(col("cent_id"), col("vec_id"), col("split"),
        col("embedding").as("e_emb"), col("nrm").as("e_nrm"))
      .join(assigned.where(col("split") === "train")
        .select(col("cent_id"), col("vec_id").as("train_id"),
          col("embedding").as("t_emb"), col("nrm").as("t_nrm")), Seq("cent_id"))
      .withColumn("cosine",
        dot(col("e_emb"), col("t_emb")) / (col("e_nrm") * col("t_nrm")))
      .where(col("cosine") >= ContamTau)
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("train_id"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("split"), col("train_id"),
        col("cent_id").cast(LongType).as("cent_id"),
        round(col("cosine"), 6).as("cosine_r"))
      .orderBy(col("vec_id"))
  }
  private val c11Sql = {
    val splitCase = graft.operators.TextOps.splitCaseSql
      .replace("doc_id", "vec_id")
    s"""WITH ${ivfCtesSql()},
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |sp AS (
       |  SELECT vec_id, embedding, nrm, cent_id, $splitCase AS split
       |  FROM assigned),
       |prs AS (
       |  SELECT e.vec_id, e.split, t.vec_id AS train_id, e.cent_id,
       |    ${dotS("e.embedding", "t.embedding")} / (e.nrm * t.nrm) AS cosine
       |  FROM sp e JOIN sp t ON e.cent_id = t.cent_id
       |  WHERE e.split <> 'train' AND t.split = 'train'),
       |best AS (
       |  SELECT vec_id, split, train_id, cent_id, cosine,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosine DESC, train_id) AS rn
       |  FROM prs)
       |SELECT vec_id, split, train_id, CAST(cent_id AS BIGINT) AS cent_id,
       |  round(cosine, 6) AS cosine_r
       |FROM best WHERE rn = 1 AND cosine >= $ContamTau
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v06 — int8-quantized cosine top-k: v01's brute-force search run on
  // symmetric per-vector int8 quantization (q_d = round(x_d·127/amax)),
  // the standard 4× memory/bandwidth compression for billion-vector
  // stores — at 100 TB of embeddings the quantized corpus is what fits
  // in cluster RAM, and int8 dot products are what the hardware SIMDs.
  // Determinism: round() ties break differently across engines, so
  // quantization uses floor(x+0.5) explicitly; quantized values are
  // exact small integers carried as DOUBLEs (every product ≤ 127²·dim ≪
  // 2^53 is exactly representable), so the same VecDot fold both
  // engines run in float space is bit-exact integer math here — the
  // top-k agrees with the oracle by hash, not approximately.
  // ---------------------------------------------------------------------
  /** max |x_d| of a float/double array column, in DOUBLE — callers must
    * materialize this as its own projection step before [[int8]]
    * references it (the HOF re-evaluation trap). */
  def absMax(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast(DoubleType))))

  /** Symmetric int8 quantization q_d = floor(x_d·127/amax + 0.5), as
    * integer-valued DOUBLEs (exactly representable; explicit floor
    * because round() ties break differently across engines). All-zero
    * vectors (amax = 0) quantize to zeros. */
  def int8(emb: Column, amax: Column): Column =
    when(amax > 0.0,
      transform(emb, x =>
        floor(x.cast(DoubleType) * 127.0 / amax + 0.5).cast(DoubleType)))
      .otherwise(transform(emb, _ => lit(0.0)))

  private def v06(s: SparkSession, dir: String): DataFrame = {
    val e0 = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        absMax(col("embedding")).as("amax"))
    val e = e0.select(col("vec_id"), int8(col("embedding"), col("amax")).as("qv"))
      .select(col("vec_id"), col("qv"), sqrt(dot(col("qv"), col("qv"))).as("qn"))
      .where(col("qn") > 0.0)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("qn").as("q_qn"))
    val c = e.select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
      col("qn").as("c_qn"))
    // Bounded top-k on −cosine_q (the v01 shape); dot_q rides along as a
    // trailing struct-payload field — carried through the aggregation,
    // never part of the (key, c_id) ordering, so no second corpus scan
    // to recover it and the q_id shuffle stays ≤ mappers·k rows.
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        dot(col("q_qv"), col("c_qv")).cast(LongType).as("dot_q"),
        (dot(col("q_qv"), col("c_qv")) / (col("q_qn") * col("c_qn")))
          .as("cosine_q"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("cosine_q"), struct(col("c_id"), col("dot_q")), 10).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload.c_id").as("c_id"),
        col("kv.payload.dot_q").as("dot_q"),
        round(-col("kv.key"), 6).as("cosine_q_r"),
        (col("pos") + 1).cast(LongType).as("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v06Sql =
    s"""WITH e0 AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
       |  FROM embeddings),
       |quant AS (
       |  SELECT vec_id,
       |    CASE WHEN amax > 0
       |         THEN list_transform(embedding, x ->
       |           floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5))
       |         ELSE list_transform(embedding, x -> 0.0) END AS qv
       |  FROM e0),
       |e AS (
       |  SELECT vec_id, qv, ${normS("qv")} AS qn FROM quant
       |  WHERE ${normS("qv")} > 0),
       |q AS (
       |  SELECT vec_id AS q_id, qv AS q_qv, qn AS q_qn FROM e WHERE vec_id < 5),
       |scored AS (
       |  SELECT q_id, vec_id AS c_id,
       |    CAST(${dotS("q_qv", "qv")} AS BIGINT) AS dot_q,
       |    ${dotS("q_qv", "qv")} / (q_qn * qn) AS cosine_q
       |  FROM q JOIN e ON q_id <> vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, dot_q, cosine_q,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine_q DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, dot_q, round(cosine_q, 6) AS cosine_q_r,
       |  CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v07 — hybrid semantic + lexical near-dup rescoring: the two-stage
  // pipeline every production semantic dedup ends with. Stage 1 (v02's
  // label-blocked embedding pairs) recalls candidates by meaning; stage
  // 2 joins each pair back to its TEXTS (embeddings and documents share
  // ids here) and scores exact token-set Jaccard, so downstream policy
  // can separate "same words" (true dup → drop) from "same meaning,
  // different words" (paraphrase → keep for training diversity).
  //
  // Scale: the candidate pair list is tiny relative to the corpus (the
  // blocked+capped stage-1 contract), so the two id-joins shuffle
  // narrow (id, tokset) rows only and the Jaccard is per-pair array
  // math — never a second pair explosion.
  // ---------------------------------------------------------------------
  private def v07(s: SparkSession, dir: String): DataFrame = {
    val pairs = neardupPairs(t(s, dir, "embeddings"), 0.25)
    // tokset is referenced twice (a-side + b-side joins) and Spark
    // duplicates non-identical subtrees — without persist() the corpus
    // is scanned and tokenized twice (the round-6 v04/nearDupDrop
    // lesson). Lifecycle: freed by Verify/Bench's per-query clearCache.
    val tokset = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(graft.operators.TextOps.tokens(col("text"))).as("tokset"))
      .select(col("doc_id"), col("tokset"),
        size(col("tokset")).cast(LongType).as("n_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs
      .join(tokset.select(col("doc_id").as("vec_a"), col("tokset").as("ts_a"),
        col("n_toks").as("na")), Seq("vec_a"))
      .join(tokset.select(col("doc_id").as("vec_b"), col("tokset").as("ts_b"),
        col("n_toks").as("nb")), Seq("vec_b"))
      .withColumn("n_common",
        size(array_intersect(col("ts_a"), col("ts_b"))).cast(LongType))
      .select(col("vec_a"), col("vec_b"), col("cosine_r"), col("n_common"),
        (col("na") + col("nb") - col("n_common")).as("n_union"),
        (col("n_common").cast(DoubleType)
          / (col("na") + col("nb") - col("n_common"))).as("jaccard"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
  private val v07Sql =
    s"""WITH e0 AS (
       |  SELECT vec_id, label, embedding, ${normS("embedding")} AS nrm
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id, label, embedding, nrm FROM (
       |    SELECT vec_id, label, embedding, nrm,
       |      COUNT(*) OVER (PARTITION BY label) AS blk
       |    FROM e0)
       |  WHERE blk <= $MaxLabelBlock),
       |prs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    round(${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cosine_r
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |  WHERE ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.25),
       |ts AS (
       |  SELECT doc_id, list_distinct(${graft.operators.TextOps.tokensSql}) AS tokset,
       |    CAST(len(list_distinct(${graft.operators.TextOps.tokensSql})) AS BIGINT) AS n_toks
       |  FROM documents)
       |SELECT vec_a, vec_b, cosine_r,
       |  CAST(len(list_intersect(a.tokset, b.tokset)) AS BIGINT) AS n_common,
       |  CAST(a.n_toks + b.n_toks - len(list_intersect(a.tokset, b.tokset)) AS BIGINT) AS n_union,
       |  CAST(len(list_intersect(a.tokset, b.tokset)) AS DOUBLE)
       |    / (a.n_toks + b.n_toks - len(list_intersect(a.tokset, b.tokset))) AS jaccard
       |FROM prs
       |JOIN ts a ON vec_a = a.doc_id
       |JOIN ts b ON vec_b = b.doc_id
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------------
  // v08 — ANN recall audit: recall@10 of the int8-quantized search (the
  // v06 plan) against exact float cosine (the v01 plan), per query. The
  // measurement every approximate index must ship with — compression and
  // bucketing decisions are only safe to roll out with a recall number
  // attached, and at 100 TB the audit is exactly this: both searches run
  // over a SMALL query sample (here vec_id < 5; production: a few
  // hundred), cost = sample × corpus — a sliver of one full search —
  // then a narrow (q_id, c_id) set intersection. Recall is integer ppm
  // (overlap·10⁶ div k) for cross-engine exactness; the top-k sets
  // themselves are deterministic because both rankings tie-break on
  // c_id.
  // ---------------------------------------------------------------------
  private def v08(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // exact side — v01's plan pruned to (q_id, c_id)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 10)
      .select(col("q_id"), col("c_id"))
    // quantized side — v06's plan pruned the same way
    val eq = e
      .select(col("vec_id"), col("embedding"),
        absMax(col("embedding")).as("amax"))
      .select(col("vec_id"), int8(col("embedding"), col("amax")).as("qv"))
      .select(col("vec_id"), col("qv"),
        sqrt(dot(col("qv"), col("qv"))).as("qn"))
      .where(col("qn") > 0.0)
    val qq = eq.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("qn").as("q_qn"))
    val cq = eq.select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
      col("qn").as("c_qn"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine_q").desc, col("c_id"))
    val approx = broadcast(qq).join(cq, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_qv"), col("c_qv")) / (col("q_qn") * col("c_qn")))
          .as("cosine_q"))
      .withColumn("rk", row_number().over(wq)).where(col("rk") <= 10)
      .select(col("q_id"), col("c_id"))
    val overlap = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(overlap, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v08Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")})
       |          DESC, c_id) AS rk
       |    FROM q JOIN c ON q_id <> c_id)
       |  WHERE rk <= 10),
       |e0 AS (
       |  SELECT vec_id, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
       |  FROM embeddings),
       |quant AS (
       |  SELECT vec_id,
       |    CASE WHEN amax > 0
       |         THEN list_transform(embedding, x ->
       |           floor(CAST(x AS DOUBLE) * 127.0 / amax + 0.5))
       |         ELSE list_transform(embedding, x -> 0.0) END AS qv
       |  FROM e0),
       |eq AS (
       |  SELECT vec_id, qv, ${normS("qv")} AS qn FROM quant
       |  WHERE ${normS("qv")} > 0),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
       |        ${dotS("a.qv", "b.qv")} / (a.qn * b.qn) DESC, b.vec_id) AS rk
       |    FROM eq a JOIN eq b ON a.vec_id <> b.vec_id
       |    WHERE a.vec_id < 5)
       |  WHERE rk <= 10),
       |ov AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1),
       |ex AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact
       |  FROM exact GROUP BY 1)
       |SELECT q_id, n_exact, COALESCE(n_overlap, 0) AS n_overlap,
       |  CAST(COALESCE(n_overlap, 0) * 1000000 // n_exact AS BIGINT) AS recall_ppm
       |FROM ex LEFT JOIN ov USING (q_id)
       |ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v09 — multi-probe IVF ANN: v04 probes only the query's own cluster,
  // which misses true neighbors sitting just across a centroid boundary
  // — the canonical IVF failure mode that v08's recall audit measures.
  // The standard fix is nprobe > 1: each query searches its NProbe
  // nearest clusters. The centroid ranking v04 already computes for the
  // assignment is reused as the probe list (arn <= NProbe instead of
  // arn = 1), so the index build costs nothing extra; the candidate
  // join fans each query out to ~NProbe·n/k candidates, still a pruned
  // sliver of the corpus. Clusters are disjoint, so the probe union
  // needs no dedup. Recall can only improve over v04 — SimilaritySpec
  // pins that dominance — while the scan cost scales linearly in
  // NProbe: the knob a 100 TB deployment tunes against its recall SLO.
  // ---------------------------------------------------------------------
  /** Clusters each query probes (v04 ≡ nprobe 1). */
  val NProbe = 2

  private def v09(s: SparkSession, dir: String): DataFrame = {
    // Same persisted-assignment rationale as v04 (it is the index);
    // kept through arn <= NProbe so the probe list rides along free.
    val ranked = rankedAssignment(s, dir, maxArn = NProbe)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        col("arn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = ranked.where(col("arn") === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"), col("cent_id"))
    val probes = ranked.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id").as("probe_cent"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    broadcast(probes)
      .join(corpus,
        col("probe_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(wTop).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("cent_id").as("cluster_id"),
        round(col("cosine"), 6).as("cosine_r"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v09Sql =
    s"""WITH ${ivfCtesSql()},
       |corpus AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
       |    cent_id AS probe_cent
       |  FROM ranked_assign
       |  WHERE arn <= $NProbe AND vec_id BETWEEN 100 AND 104),
       |scored AS (
       |  SELECT q_id, c_id, cent_id AS cluster_id,
       |    ${dotS("q_emb", "c_emb")} / (q_nrm * c_nrm) AS cosine
       |  FROM probes JOIN corpus
       |    ON probe_cent = cent_id AND q_id <> c_id),
       |rk AS (
       |  SELECT q_id, c_id, cluster_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, cluster_id, round(cosine, 6) AS cosine_r,
       |  CAST(rk AS BIGINT) AS rk
       |FROM rk WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v10 — IVF index balance + boundary-margin audit: per cluster, the
  // member count and the min/max assignment margin (cosine to own
  // centroid minus cosine to the runner-up). The two numbers an IVF
  // deployment watches: size skew (a hot cluster is the probe-latency
  // tail — at 100 TB one oversized cluster serializes every query that
  // probes it) and thin margins (vectors all but on a boundary — the
  // population v09's nprobe exists to recover; a cluster full of thin
  // margins means the codebook needs retraining). Only min/max
  // aggregate the float margins — order-insensitive and exactly
  // reproducible cross-engine, unlike a float sum/avg.
  // ---------------------------------------------------------------------
  private def v10(s: SparkSession, dir: String): DataFrame =
    rankedAssignment(s, dir, maxArn = 2)
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("arn") === 1, col("cent_id"))).as("cluster_id"),
        (max(when(col("arn") === 1, col("cent_cos")))
          - max(when(col("arn") === 2, col("cent_cos")))).as("margin"))
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        round(min(col("margin")), 6).as("min_margin_r"),
        round(max(col("margin")), 6).as("max_margin_r"))
      .orderBy(col("cluster_id"))
  private val v10Sql =
    s"""WITH ${ivfCtesSql()},
       |ranked AS (
       |  SELECT vec_id, cent_id, cent_cos, arn FROM ranked_assign),
       |margins AS (
       |  SELECT vec_id,
       |    max(CASE WHEN arn = 1 THEN cent_id END) AS cluster_id,
       |    max(CASE WHEN arn = 1 THEN cent_cos END)
       |      - max(CASE WHEN arn = 2 THEN cent_cos END) AS margin
       |  FROM ranked WHERE arn <= 2 GROUP BY vec_id)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |  round(min(margin), 6) AS min_margin_r,
       |  round(max(margin), 6) AS max_margin_r
       |FROM margins GROUP BY cluster_id
       |ORDER BY cluster_id""".stripMargin

  // ---------------------------------------------------------------------
  // v11 — product-quantization ANN (the third leg of the ANN triad with
  // IVF and LSH): each 64-dim vector encodes as 4 one-byte codes — the
  // nearest of 8 codebook centroids per 16-dim subspace (codebook
  // TRAINED per subspace by [[trainPqCodebook]]'s deterministic integer
  // Lloyd iterations, seeded from vec_id < 8's subvectors) — and
  // queries score candidates by ADC: distance(query, candidate) ≈
  // Σ_m lut[m][code_m], where the lookup table is the query's exact
  // distance to every centroid. At 100 TB this is the memory story —
  // 4 bytes/vector instead of 256 — and the scan is 4 table lookups
  // per candidate instead of a 64-dim fold.
  //
  // Determinism: every subspace distance is the shared l2r fold (bit-
  // identical cross-engine); code election is argmin with cent_id
  // tiebreak; ADC sums exactly 4 doubles in fixed expression order
  // (d0+d1+d2+d3 — never a float GROUP BY sum, whose order is
  // unspecified); codes pivot through integer max() aggregates. The
  // subspace-distance table is computed once and persisted — it feeds
  // both the corpus encoding and the query LUT.
  // ---------------------------------------------------------------------
  private val PqM = 4      // subspaces
  private val PqDim = 16   // dims per subspace
  private val PqK = 8      // centroids per subspace

  /** Exact squared-L2 between two float-array columns, same l2r fold
    * discipline as [[dot]]. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType))
          * (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, x) => acc + x)

  /** ||n·x − s||² / n² — squared L2 between x and the rational centroid
    * s/n without ever materializing the mean: the numerator is exact
    * integer arithmetic (x, s integer-valued, magnitudes ≪ 2^53), the
    * single division is the only rounding op and is identical in both
    * engines. This is how L2 Lloyd stays bit-reproducible: the update
    * keeps the exact pair (sum, count) instead of a float mean. */
  private def scaledSqDist(n: Column, x: Column, s: Column): Column =
    aggregate(
      zip_with(x, s, (xi, si) =>
        (n.cast(DoubleType) * xi - si) * (n.cast(DoubleType) * xi - si)),
      lit(0.0), (acc, v) => acc + v) / (n * n).cast(DoubleType)

  private def scaledSqDistS(n: String, x: String, s: String): String =
    s"list_sum(list_transform(range(1, len($x) + 1), i -> " +
      s"(CAST($n AS DOUBLE) * CAST($x[i] AS DOUBLE) - CAST($s[i] AS DOUBLE)) * " +
      s"(CAST($n AS DOUBLE) * CAST($x[i] AS DOUBLE) - CAST($s[i] AS DOUBLE)))) " +
      s"/ CAST($n * $n AS DOUBLE)"

  /** Per-subspace PQ codebook after `IvfIters` deterministic Lloyd
    * iterations (seeded from vec_id < PqK's quantized subvectors).
    * Returns (m, cent_id, csub) where csub = s/n is the true mean
    * centroid (elementwise double division — one op, cross-engine
    * identical). Unlike the cosine IVF, L2 k-means is NOT
    * scale-invariant, so the state is the exact integer pair
    * (sum vector, count) and assignment uses [[scaledSqDist]]. */
  private def trainPqCodebook(s: SparkSession, dir: String): DataFrame = {
    val qsubs = pqQuantSubs(s, dir)
    pqLloyd(s, qsubs,
      qsubs.where(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("cent_id"), col("qsub").as("cs"),
          lit(1L).as("n")))
  }

  /** (vec_id, m, quantized subvector) over the full corpus. */
  private def pqQuantSubs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        quant(expr(s"slice(embedding, m * $PqDim + 1, $PqDim)")).as("qsub"))

  /** [[trainPqCodebook]] over a `pred`-restricted training corpus (the
    * v25 pre-growth snapshot), seeded — like [[trainCentroidsOn]] — from
    * the PqK smallest surviving vec_ids' subvectors, densely re-keyed as
    * cent_id 0..k−1 (the same vec_ids seed every subspace, so one k-row
    * driver mapping covers all m). The graded full-corpus path keeps its
    * original `vec_id < k` seeds untouched. */
  private def trainPqCodebookOn(s: SparkSession, dir: String,
                                pred: Column): DataFrame = {
    val qsubs = pqQuantSubs(s, dir).where(pred)
    val seedIds = qsubs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(PqK).collect().map(_.getLong(0))
      .sorted.zipWithIndex
    val denseKey = seedIds.foldLeft(lit(-1L)) { case (acc, (v, i)) =>
      when(col("vec_id") === v, lit(i.toLong)).otherwise(acc)
    }
    pqLloyd(s, qsubs,
      qsubs.where(col("vec_id").isin(seedIds.map(_._1).toSeq: _*))
        .select(col("m"), denseKey.as("cent_id"), col("qsub").as("cs"),
          lit(1L).as("n")))
  }

  /** The shared deterministic per-subspace Lloyd loop: `qsubs` is the
    * TRAINING corpus, `seed` the initial (m, cent_id, cs, n) table. */
  private def pqLloyd(s: SparkSession, qsubs: DataFrame,
                      seed: DataFrame): DataFrame = {
    import s.implicits._
    // Same driver-local generation boundary as trainCentroids: m·k rows
    // of PqDim integers + a count — collected and rebuilt per iteration
    // so lineage never chains corpus passes across Lloyd rounds.
    def local(df: DataFrame): DataFrame = {
      val rows = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      s.createDataset(rows).toDF("m", "cent_id", "cs", "n")
    }
    var cb = local(seed)
    for (_ <- 0 until IvfIters) {
      val w = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("d"), col("cent_id"))
      val assign = qsubs.join(broadcast(cb), Seq("m"))
        .withColumn("d", scaledSqDist(col("n"), col("qsub"), col("cs")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      val sums = assign
        .select(col("m"), col("cent_id"), posexplode(col("qsub")))
        .groupBy(col("m"), col("cent_id"), col("pos"))
        .agg(sum(col("col")).as("sx"), count(lit(1)).as("nn"))
        .groupBy(col("m"), col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
          st => st.getField("sx")).as("cs2"),
          min(col("nn")).as("n2"))
      cb = local(cb.join(sums, Seq("m", "cent_id"), "left")
        .select(col("m"), col("cent_id"),
          coalesce(col("cs2"), col("cs")).as("cs"),
          coalesce(col("n2"), col("n")).as("n")))
    }
    // De-quantize back to embedding units: csub = s / (n·1024). The
    // denominator is an exact integer, so this is one double division
    // per component — identical cross-engine. (Leaving the codebook in
    // quantized units collapses the encode: ||csub||² ≈ 512² dwarfs the
    // float subvectors and every code degenerates to the smallest-norm
    // centroid — caught by simulation, worth the comment.)
    cb.select(col("m"), col("cent_id"),
      transform(col("cs"), x =>
        x / (col("n").cast(DoubleType) * lit(QuantScale))).as("csub"))
  }

  /** Oracle CTEs mirroring [[trainPqCodebook]]; exposes `cbt`
    * (m, cent_id, csub). `trainPred` restricts the TRAINING corpus
    * (v25's base snapshot) with rank-re-keyed seeds, mirroring
    * [[trainPqCodebookOn]]; the default is the graded full-corpus
    * training, byte-identical to before. */
  private def pqTrainCtes(trainPred: String = ""): String = {
    val trainSrc = if (trainPred.isEmpty) "qsubs" else "qsubst"
    val trainCte =
      if (trainPred.isEmpty) ""
      else s"""qsubst AS (
              |  SELECT vec_id, m, qsub FROM qsubs WHERE $trainPred),
              |""".stripMargin
    val seedCte =
      if (trainPred.isEmpty)
        s"""pc0 AS (
           |  SELECT m, vec_id AS cent_id, qsub AS cs, CAST(1 AS BIGINT) AS n
           |  FROM qsubs WHERE vec_id < $PqK)""".stripMargin
      else
        s"""seed_ids AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cent_id
           |    FROM (SELECT DISTINCT vec_id FROM $trainSrc))
           |  WHERE cent_id < $PqK),
           |pc0 AS (
           |  SELECT q.m, s.cent_id, q.qsub AS cs, CAST(1 AS BIGINT) AS n
           |  FROM $trainSrc q JOIN seed_ids s USING (vec_id))""".stripMargin
    def assignCte(cbCte: String): String =
      s"""  SELECT vec_id, m, cent_id, qsub FROM (
         |    SELECT q.vec_id, q.m, c.cent_id, q.qsub,
         |      row_number() OVER (PARTITION BY q.vec_id, q.m
         |        ORDER BY ${scaledSqDistS("c.n", "q.qsub", "c.cs")}, c.cent_id)
         |        AS rn
         |    FROM $trainSrc q JOIN $cbCte c ON q.m = c.m)
         |  WHERE rn = 1""".stripMargin
    def sumCte(aCte: String): String =
      s"""  SELECT m, cent_id, list(sx ORDER BY i) AS cs2,
         |    min(nn) AS n2 FROM (
         |    SELECT m, cent_id, r.i, SUM(qsub[CAST(r.i AS BIGINT)]) AS sx,
         |      CAST(COUNT(*) AS BIGINT) AS nn
         |    FROM $aCte CROSS JOIN range(1, ${PqDim + 1}) r(i)
         |    GROUP BY m, cent_id, r.i)
         |  GROUP BY m, cent_id""".stripMargin
    val rounds = (1 to IvfIters).map { it =>
      val prev = if (it == 1) "pc0" else s"pc${it - 1}"
      s"""pa$it AS (
         |${assignCte(prev)}),
         |ps$it AS (
         |${sumCte(s"pa$it")}),
         |pc$it AS (
         |  SELECT $prev.m, $prev.cent_id,
         |    COALESCE(ps$it.cs2, $prev.cs) AS cs,
         |    COALESCE(ps$it.n2, $prev.n) AS n
         |  FROM $prev LEFT JOIN ps$it USING (m, cent_id))""".stripMargin
    }.mkString(",\n")
    s"""qsubs AS (
       |  SELECT vec_id, CAST(r.m AS INT) AS m,
       |    list_transform(
       |      list_slice(embedding, CAST(r.m * $PqDim + 1 AS BIGINT),
       |        CAST((r.m + 1) * $PqDim AS BIGINT)),
       |      x -> floor(CAST(x AS DOUBLE) * $QuantScale + 0.5)) AS qsub
       |  FROM embeddings, range(0, $PqM) r(m)),
       |$trainCte$seedCte,
       |$rounds,
       |cbt AS (
       |  SELECT m, cent_id,
       |    list_transform(cs, x -> x / (CAST(n AS DOUBLE) * $QuantScale)) AS csub
       |  FROM pc$IvfIters)""".stripMargin
  }

  /** The PQ index artifacts shared by v11/v15/v16: per-vector codes
    * (vec_id, c0..c3) and the per-query LUTs (q_id, m, cent_id, d). */
  private def pqIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    pqIndexWith(s, dir, pqCodebook(s, dir))

  /** [[pqIndex]] against an EXPLICIT codebook — the frozen-quantizer
    * seam of the v25 staleness audit. */
  private def pqIndexWith(s: SparkSession, dir: String,
                          cb: DataFrame): (DataFrame, DataFrame) = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val subs = e.select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        expr(s"slice(embedding, m * $PqDim + 1, $PqDim)").as("sub"))
    val wCode = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("d"), col("cent_id"))
    val dists = subs.join(broadcast(cb), Seq("m"))
      .select(col("vec_id"), col("m"), col("cent_id"),
        sqDist(col("sub"), col("csub")).as("d"))
      .withColumn("rn", row_number().over(wCode))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def codeCol(m: Int) =
      max(when(col("m") === m, col("cent_id"))).as(s"c$m")
    val codes = dists.where(col("rn") === 1)
      .groupBy(col("vec_id"))
      .agg(codeCol(0), codeCol(1), codeCol(2), codeCol(3))
    val lut = dists.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("m"), col("cent_id"), col("d"))
    (codes, lut)
  }

  /** ADC-score a (q_id, …codes) frame against the LUTs: four broadcast
    * joins + the summed approximate distance column. */
  private def adcScore(base: DataFrame, lut: DataFrame): DataFrame = {
    def lutJoin(df: DataFrame, m: Int) =
      df.join(broadcast(lut.where(col("m") === m)
          .select(col("q_id"), col("cent_id").as(s"c$m"), col("d").as(s"d$m"))),
        Seq("q_id", s"c$m"))
    Seq(0, 1, 2, 3).foldLeft(base)(lutJoin)
      .withColumn("adist", col("d0") + col("d1") + col("d2") + col("d3"))
  }

  /** The full ADC ranking (q_id, c_id, adist, rk) shared by v11 (top-5
    * report) and v15 (top-[[RerankShortlist]] shortlist). */
  private def pqRanked(s: SparkSession, dir: String): DataFrame =
    pqRankedWith(s, dir, pqIndex(s, dir))

  private def pqRankedWith(s: SparkSession, dir: String,
                           index: (DataFrame, DataFrame)): DataFrame = {
    val (codes, lut) = index
    val base = codes.select(col("vec_id").as("c_id"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .crossJoin(broadcast(lut.select(col("q_id")).distinct()))
      .where(col("q_id") =!= col("c_id"))
    val scored = adcScore(base, lut)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("c_id"))
    scored.withColumn("rk", row_number().over(wTop).cast(LongType))
  }

  private def v11(s: SparkSession, dir: String): DataFrame =
    pqRanked(s, dir).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), round(col("adist"), 6).as("adist_r"),
        col("rk"))
      .orderBy(col("q_id"), col("rk"))
  /** Cross-engine squared-L2 SQL (same l2r fold as [[sqDist]]). */
  private def distSqS(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  /** The four per-subvector LUT joins of the ADC scoring contract — one
    * builder shared by pq_scored (alias q) and v16's ivfadc_scored
    * (alias el), so the join keys cannot drift between the oracles. */
  private def lutJoinsSql(qAlias: String): String =
    (0 until PqM).map(m =>
      s"JOIN lut l$m ON l$m.q_id = $qAlias.q_id AND l$m.m = $m AND l$m.cent_id = c.c$m")
      .mkString("\n  ")

  /** The PQ pipeline CTEs shared by v11's and v12's oracles: encode the
    * corpus, build the query LUTs, ADC-score, rank. `trainPred`
    * restricts only the TRAINING corpus (v25); encode/LUT/rank always
    * cover every vector. */
  private def pqCtes(trainPred: String = ""): String = {
    val dSubCsub = distSqS("sub", "csub")
    val codeCols = (0 until PqM).map(m =>
      s"CAST(max(CASE WHEN m = $m THEN cent_id END) AS BIGINT) AS c$m")
      .mkString(", ")
    val lutJoins = lutJoinsSql("q")
    s"""subs AS (
       |  SELECT vec_id, CAST(r.m AS INT) AS m,
       |    list_slice(embedding, CAST(r.m * $PqDim + 1 AS BIGINT),
       |      CAST((r.m + 1) * $PqDim AS BIGINT)) AS sub
       |  FROM embeddings, range(0, $PqM) r(m)),
       |${pqTrainCtes(trainPred)},
       |cb AS (
       |  SELECT m, cent_id, csub FROM cbt),
       |dists AS (
       |  SELECT s.vec_id, s.m, cb.cent_id, $dSubCsub AS d,
       |    row_number() OVER (PARTITION BY s.vec_id, s.m
       |      ORDER BY $dSubCsub, cb.cent_id) AS rn
       |  FROM subs s JOIN cb ON s.m = cb.m),
       |codes AS (
       |  SELECT vec_id, $codeCols
       |  FROM dists WHERE rn = 1 GROUP BY vec_id),
       |lut AS (
       |  SELECT vec_id AS q_id, m, cent_id, d FROM dists
       |  WHERE vec_id BETWEEN 100 AND 104),
       |pq_scored AS (
       |  SELECT q.q_id, c.vec_id AS c_id,
       |    l0.d + l1.d + l2.d + l3.d AS adist
       |  FROM codes c
       |  CROSS JOIN (SELECT DISTINCT q_id FROM lut) q
       |  $lutJoins
       |  WHERE q.q_id <> c.vec_id),
       |pq_ranked AS (
       |  SELECT q_id, c_id, adist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rk
       |  FROM pq_scored)""".stripMargin
  }

  private val pqCtesSql: String = pqCtes()

  private val v11Sql =
    s"""WITH $pqCtesSql
       |SELECT q_id, c_id, round(adist, 6) AS adist_r, CAST(rk AS BIGINT) AS rk
       |FROM pq_ranked WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v15 — two-stage ANN serving: ADC shortlist → exact rerank, the way
  // every production PQ index actually answers queries (Jégou et al.'s
  // IVFADC + re-ranking): the compressed codes do the corpus-scale scan
  // cheaply but lossily (v12 measures how lossily), then full-precision
  // vectors are fetched for ONLY the shortlist and re-scored exactly.
  // Top-5-of-shortlist-25 recovers most of the recall PQ alone loses,
  // at 25 exact distance evaluations per query instead of |corpus|.
  //
  // Scale: stage 1 is v11's plan (LUT broadcast, codes-grain scan);
  // stage 2 is a bounded id-lookup join — shortlist×query rows gather
  // their full vectors by key, never a second corpus scan. This is THE
  // pattern that lets a 100 TB embedding store serve from RAM-resident
  // codes with disk-resident full vectors.
  // ---------------------------------------------------------------------
  private val RerankShortlist = 25

  private def v15(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val short = pqRanked(s, dir).where(col("rk") <= RerankShortlist)
      .select(col("q_id"), col("c_id"))
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d"), col("c_id"))
    short
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")),
        Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("c_id"),
        sqDist(col("q_emb"), col("c_emb")).as("d"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), round(col("d"), 6).as("dist_r"),
        col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v15Sql =
    s"""WITH $pqCtesSql,
       |short AS (
       |  SELECT q_id, c_id FROM pq_ranked WHERE rk <= $RerankShortlist),
       |rer AS (
       |  SELECT s.q_id, s.c_id,
       |    ${distSqS("q.embedding", "c.embedding")} AS d
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.q_id
       |  JOIN embeddings c ON c.vec_id = s.c_id),
       |rr AS (
       |  SELECT q_id, c_id, d,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d, c_id) AS rk
       |  FROM rer)
       |SELECT q_id, c_id, round(d, 6) AS dist_r, CAST(rk AS BIGINT) AS rk
       |FROM rr WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v16 — IVFADC: the full FAISS billion-scale index shape, composing
  // the two trained quantizers this module already grades separately.
  // The coarse quantizer (trained IVF, v04's assignment) prunes the
  // candidate set to the query's own inverted list; the fine quantizer
  // (trained PQ codebook, v11's codes) ADC-scores ONLY those members.
  // v11 scans every code per query; v16 scans |corpus|/k per query —
  // the factor that turns a RAM-resident code scan into a per-list
  // lookup at 100 TB (k grows ~√n, so the scanned fraction shrinks as
  // the corpus grows). Recall loss vs v11 is the coarse-pruning cost
  // the v13 audit measures on the IVF side; multi-probe (v09's knob)
  // buys it back.
  //
  // Scale: the inverted-list lookup is one join keyed on cent_id with
  // the (tiny) query-assignment side broadcast; ADC then runs its four
  // broadcast LUT joins on the pruned candidate rows. No corpus-scale
  // cross remains anywhere in the plan.
  // ---------------------------------------------------------------------
  private def v16(s: SparkSession, dir: String): DataFrame = {
    val (codes, lut) = pqIndex(s, dir)
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qCent = lut.select(col("q_id")).distinct()
      .join(assigned.withColumnRenamed("vec_id", "q_id"), Seq("q_id"))
    val eligible = broadcast(qCent)
      .join(assigned.withColumnRenamed("vec_id", "c_id"), Seq("cent_id"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("cent_id"))
    val base = eligible.join(codes.select(col("vec_id").as("c_id"),
      col("c0"), col("c1"), col("c2"), col("c3")), Seq("c_id"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("c_id"))
    adcScore(base, lut)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("cent_id").cast(LongType).as("cent_id"),
        round(col("adist"), 6).as("adist_r"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v16Sql = {
    val lutJoins = lutJoinsSql("el")
    s"""WITH ${ivfCtesSql()},
       |$pqCtesSql,
       |ivf_assigned AS (
       |  SELECT vec_id, cent_id FROM ranked_assign WHERE arn = 1),
       |qc AS (
       |  SELECT q.q_id, a.cent_id
       |  FROM (SELECT DISTINCT q_id FROM lut) q
       |  JOIN ivf_assigned a ON a.vec_id = q.q_id),
       |elig AS (
       |  SELECT qc.q_id, a.vec_id AS c_id, qc.cent_id
       |  FROM qc JOIN ivf_assigned a
       |    ON a.cent_id = qc.cent_id AND a.vec_id <> qc.q_id),
       |ivfadc_scored AS (
       |  SELECT el.q_id, el.c_id, el.cent_id,
       |    l0.d + l1.d + l2.d + l3.d AS adist
       |  FROM elig el
       |  JOIN codes c ON c.vec_id = el.c_id
       |  $lutJoins),
       |ivfadc_ranked AS (
       |  SELECT q_id, c_id, cent_id, adist,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rk
       |  FROM ivfadc_scored)
       |SELECT q_id, c_id, CAST(cent_id AS BIGINT) AS cent_id,
       |  round(adist, 6) AS adist_r, CAST(rk AS BIGINT) AS rk
       |FROM ivfadc_ranked WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v12 — PQ recall audit: recall@5 of v11's ADC ranking against exact
  // full-precision squared-L2, per query — v08's discipline applied to
  // the PQ index (no compression ships without a recall number). Same
  // shape: both searches over the small query sample, then a narrow
  // (q_id, c_id) set intersection; recall in exact integer ppm.
  // ---------------------------------------------------------------------
  private def v12(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d"), col("c_id"))
    val exact = broadcast(q)
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        sqDist(col("q_emb"), col("c_emb")).as("d"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
    val approx = v11(s, dir).select(col("q_id"), col("c_id"))
    val overlap = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(overlap, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v12Sql =
    s"""WITH $pqCtesSql,
       |approx AS (
       |  SELECT q_id, c_id FROM pq_ranked WHERE rk <= 5),
       |exact0 AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ${distSqS("q.embedding", "c.embedding")} AS d
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id BETWEEN 100 AND 104),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY d, c_id) AS rk
       |    FROM exact0)
       |  WHERE rk <= 5),
       |ov AS (
       |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1)
       |SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(coalesce(min(ov.n_overlap), 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(min(ov.n_overlap), 0) * 1000000 // count(*) AS BIGINT)
       |    AS recall_ppm
       |FROM exact e LEFT JOIN ov ON e.q_id = ov.q_id
       |GROUP BY e.q_id
       |ORDER BY e.q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v13 — IVF recall audit: recall@5 of the trained multi-probe IVF
  // search (the v09 plan) against exact full-corpus cosine, per query —
  // closing the audit triangle (v08 audits int8, v12 audits PQ, this
  // audits the coarse index). This is the number centroid training
  // exists to move: probing NProbe of k clusters scans ~NProbe/k of the
  // corpus, and recall measures how much of the true top-5 that sliver
  // captures. Same scale shape as v08/v12: both searches over the small
  // query sample, then a narrow (q_id, c_id) intersection, integer-ppm
  // recall.
  // ---------------------------------------------------------------------
  private def v13(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
    val approx = v09(s, dir).select(col("q_id"), col("c_id"))
    val overlap = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(overlap, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v13Sql =
    s"""WITH ${ivfCtesSql()},
       |corpus AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
       |    cent_id AS probe_cent
       |  FROM ranked_assign
       |  WHERE arn <= $NProbe AND vec_id BETWEEN 100 AND 104),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_emb", "c_emb")} / (q_nrm * c_nrm) DESC, c_id) AS rk
       |    FROM probes JOIN corpus
       |      ON probe_cent = cent_id AND q_id <> c_id)
       |  WHERE rk <= 5),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dotS("q.embedding", "c.embedding")}
       |          / (${normS("q.embedding")} * ${normS("c.embedding")}) DESC,
       |        c.vec_id) AS rk
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id BETWEEN 100 AND 104)
       |  WHERE rk <= 5),
       |ov AS (
       |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1)
       |SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(coalesce(min(ov.n_overlap), 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(min(ov.n_overlap), 0) * 1000000 // count(*) AS BIGINT)
       |    AS recall_ppm
       |FROM exact e LEFT JOIN ov ON e.q_id = ov.q_id
       |GROUP BY e.q_id
       |ORDER BY e.q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v17 — truncated-dimension two-stage retrieval (the Matryoshka /
  // progressive-dims serving pattern): stage 1 scans the corpus with
  // cosine over only the FIRST MrlPrefixDims of the embedding — at
  // scale a 4× narrower index that fits 4× more vectors per executor
  // page — keeping a per-query shortlist; stage 2 re-scores just the
  // shortlist with full-dimension cosine. v15 reranks along the
  // CODEBOOK axis (PQ → exact); this is the same two-stage discipline
  // along the DIMENSION axis. The audit is baked into the graded
  // output: in_exact flags whether each served row is in the exact
  // full-dim top-10 (both 0s and 1s at every graded SF — the prefix
  // deliberately loses enough to make the rerank visible).
  //
  // Scale shape: stage 1 is the v01 broadcast-probe scan on a 4×
  // narrower vector; stage 2 and the audit intersection run on
  // ≤ MrlShortlist rows per query. Ranking ties break on c_id, and the
  // fold order of the prefix dot matches the full dot, so both engines
  // agree bit-for-bit before the rounded display column.
  // ---------------------------------------------------------------------
  private val MrlPrefixDims = 16
  private val MrlShortlist = 50

  /** Audit sampling modulus: the exact full-dim audit is a second corpus
    * scan per query, so at scale it rides a deterministic hash-sample of
    * the query set (1/MrlAuditMod of queries, md5-keyed like d08's split
    * so the sample is stable under any partitioning). Served rows carry
    * `audited` + the sample rate; `in_exact` is NULL for unaudited
    * queries — unknown, not "missed". */
  private val MrlAuditMod = graft.Config.MrlAuditMod

  /** The audit-sample predicate (d08's md5 bucket discipline, mirrored
    * verbatim in [[v17Sql]]'s `auditedSql`). */
  private def auditSampled(qId: Column): Column =
    pmod(conv(substring(md5(concat(lit("audit:"),
      qId.cast(StringType))), 1, 15), 16, 10)
      .cast(LongType), lit(MrlAuditMod)) === 0

  private def v17(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        slice(col("embedding"), 1, MrlPrefixDims).as("q_pre"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      slice(col("embedding"), 1, MrlPrefixDims).as("c_pre"))
    // Stage 1 keeps only (q_id, c_id, pre_rk) through the bounded
    // TopKSmallest aggregate (the v01 shape — a rank window here would
    // sort the full scored corpus per query on one task); the
    // ≤ MrlShortlist·|q| id list is then broadcast back against the
    // corpus to refetch c_emb (arrays can't ride the long-payload
    // aggregate), and q is broadcast for q_emb — both joins are
    // broadcast-hash over narrow scans, zero added shuffle.
    val shortIds = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_pre"), col("c_pre"))
          / (norm(col("q_pre")) * norm(col("c_pre")))).as("pre_cos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("pre_cos"), col("c_id"), MrlShortlist).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        (col("pos") + 1).cast(LongType).as("pre_rk"))
    val short = c.select(col("c_id"), col("c_emb"))
      .join(broadcast(shortIds), Seq("c_id"))
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), Seq("q_id"))
    val wFull = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val reranked = short
      .select(col("q_id"), col("c_id"), col("pre_rk"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(wFull).cast(LongType))
      .where(col("rk") <= 10)
    // The audit's exact top-10 rides the same bounded aggregate — the
    // audit scan is deliberate (see header) but it must not reintroduce
    // the corpus-grain rank window the stage-1 rewrite removed. The
    // query set is hash-sampled BEFORE the scan, so at scale the second
    // corpus pass costs 1/MrlAuditMod of the serving scan, not 1×.
    val exact = broadcast(q.select(col("q_id"), col("q_emb"))
        .where(auditSampled(col("q_id"))))
      .join(c.select(col("c_id"), col("c_emb")), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("xcos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("xcos"), col("c_id"), 10).as("kept"))
      .select(col("q_id"), explode(col("kept")).as("kv"))
      .select(col("q_id"), col("kv.payload").as("c_id"), lit(1L).as("in_exact"))
    reranked.join(exact, Seq("q_id", "c_id"), "left")
      .withColumn("audited", auditSampled(col("q_id")).cast(LongType))
      .select(col("q_id"), col("c_id"), round(col("cosine"), 6).as("cosine_r"),
        col("rk"), col("pre_rk"),
        when(col("audited") === 1L, coalesce(col("in_exact"), lit(0L)))
          .as("in_exact"),
        col("audited"),
        lit(1000000L / MrlAuditMod).as("audit_sample_ppm"))
      .orderBy(col("q_id"), col("rk"))
  }
  /** DuckDB mirror of [[auditSampled]] over a column ref (1 = audited). */
  private def auditedSqlOn(ref: String): String =
    s"CASE WHEN CAST(concat('0x', substr(md5(concat('audit:', $ref)), 1, 15)) " +
      s"AS BIGINT) % $MrlAuditMod = 0 THEN 1 ELSE 0 END"
  private val auditedSql = auditedSqlOn("q_id")
  private val auditedSqlR = auditedSqlOn("r.q_id")

  private val v17Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb,
       |    embedding[1:$MrlPrefixDims] AS q_pre
       |  FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb,
       |    embedding[1:$MrlPrefixDims] AS c_pre
       |  FROM embeddings),
       |short AS (
       |  SELECT q_id, c_id, q_emb, c_emb, pre_rk FROM (
       |    SELECT q_id, c_id, q_emb, c_emb,
       |      CAST(row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_pre", "c_pre")} / (${normS("q_pre")} * ${normS("c_pre")})
       |          DESC, c_id) AS BIGINT) AS pre_rk
       |    FROM q JOIN c ON q_id <> c_id)
       |  WHERE pre_rk <= $MrlShortlist),
       |reranked AS (
       |  SELECT q_id, c_id, pre_rk, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id)
       |      AS BIGINT) AS rk
       |  FROM (
       |    SELECT q_id, c_id, pre_rk,
       |      ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")}) AS cosine
       |    FROM short)),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")})
       |          DESC, c_id) AS xrk
       |    FROM q JOIN c ON q_id <> c_id
       |    WHERE $auditedSql = 1)
       |  WHERE xrk <= 10)
       |SELECT r.q_id, r.c_id, round(r.cosine, 6) AS cosine_r, r.rk, r.pre_rk,
       |  CASE WHEN $auditedSqlR = 1
       |    THEN CAST(CASE WHEN e.c_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
       |    ELSE NULL END AS in_exact,
       |  CAST($auditedSqlR AS BIGINT) AS audited,
       |  CAST(${1000000L / MrlAuditMod} AS BIGINT) AS audit_sample_ppm
       |FROM reranked r LEFT JOIN exact e ON r.q_id = e.q_id AND r.c_id = e.c_id
       |WHERE r.rk <= 10
       |ORDER BY r.q_id, r.rk""".stripMargin

  // ---------------------------------------------------------------------
  // v18 — binary sign-quantization + Hamming prefilter + exact rerank
  // (the modern binary-quantization serving path: 64 float dims → one
  // 64-bit sign sketch, a 32× compression that makes the stage-1 scan
  // pure register arithmetic — XOR + POPCNT per candidate — with the
  // fidelity recovered by an exact rerank over the shortlist). v06
  // compresses magnitude (int8); this compresses to 1 bit/dim, the
  // densest index tier a vector store serves.
  //
  // Engine-exactness: the sketch is two BIGINT words (dims 1-32 and
  // 33-64 — one word would need bit 63, whose 2^63 term overflows the
  // sum-of-powers construction both engines share), each the sum of
  // 2^(i-1) over dims with x > 0; sums of distinct powers of two ARE
  // the bitwise OR, exactly representable. Hamming = bit_count(xor) per
  // word, integers end-to-end, so stage 1 is hash-exact across engines.
  //
  // Scale shape: here the sketch is computed inline from the embedding
  // scan (one pass, no extra shuffle — everything after the scan carries
  // 16-byte sketch rows); at production the sketch rides a precomputed
  // index column (the n09 build-once discipline), making stage 1 a scan
  // of 16 bytes per candidate instead of 256. Ranking is the bounded
  // TopKSmallest aggregate on (hamming, c_id); stage 2 re-scores
  // ≤ BqShortlist·|q| rows with full-precision cosine — the v15/v17
  // two-stage discipline along the PRECISION axis.
  // ---------------------------------------------------------------------
  private val BqShortlist = 50

  /** One 32-dim sign word: Σ 2^i over i where embedding[offset+i+1] > 0
    * (exact OR via distinct powers of two — see the v18 header). */
  private def signWord(embCol: String, offset: Int): Column =
    expr(s"""aggregate(sequence(0, 31), CAST(0 AS BIGINT),
      (acc, i) -> acc + IF(element_at($embCol, i + ${offset + 1}) > 0,
        shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""")

  private def v18(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        signWord("embedding", 0).as("q_lo"), signWord("embedding", 32).as("q_hi"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      signWord("embedding", 0).as("c_lo"), signWord("embedding", 32).as("c_hi"))
    // stage 1: Hamming scan over the sketches only (c_emb pruned), the
    // shortlist refetched by id afterwards — the v17 narrow-scan shape
    val shortIds = broadcast(q.select(col("q_id"), col("q_lo"), col("q_hi")))
      .join(c.select(col("c_id"), col("c_lo"), col("c_hi")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"))
          .cast(LongType).as("ham"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(col("ham"), col("c_id"), BqShortlist).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        col("kv.key").as("ham"),
        (col("pos") + 1).cast(LongType).as("ham_rk"))
    val wFull = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    c.select(col("c_id"), col("c_emb"))
      .join(broadcast(shortIds), Seq("c_id"))
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), Seq("q_id"))
      .select(col("q_id"), col("c_id"), col("ham"), col("ham_rk"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(wFull).cast(LongType))
      .where(col("rk") <= 10)
      .select(col("q_id"), col("c_id"), round(col("cosine"), 6).as("cosine_r"),
        col("rk"), col("ham"), col("ham_rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** DuckDB sign-word mirror over a 1-based dim slice (lo = 1..32,
    * hi = 33..64); list_transform's index i is 1-based within the slice. */
  private def signWordSql(embRef: String, lo: Int, hi: Int): String =
    s"CAST(list_sum(list_transform($embRef[$lo:$hi], " +
      "(x, i) -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) << (i - 1) " +
      "ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"

  private val v18Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb,
       |    ${signWordSql("embedding", 1, 32)} AS q_lo,
       |    ${signWordSql("embedding", 33, 64)} AS q_hi
       |  FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb,
       |    ${signWordSql("embedding", 1, 32)} AS c_lo,
       |    ${signWordSql("embedding", 33, 64)} AS c_hi
       |  FROM embeddings),
       |short AS (
       |  SELECT q_id, c_id, q_emb, c_emb, ham,
       |    CAST(ham_rk AS BIGINT) AS ham_rk FROM (
       |    SELECT q_id, c_id, q_emb, c_emb,
       |      CAST(bit_count(xor(q_lo, c_lo)) + bit_count(xor(q_hi, c_hi))
       |        AS BIGINT) AS ham,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        bit_count(xor(q_lo, c_lo)) + bit_count(xor(q_hi, c_hi)), c_id)
       |        AS ham_rk
       |    FROM q JOIN c ON q_id <> c_id)
       |  WHERE ham_rk <= $BqShortlist)
       |SELECT q_id, c_id, round(cosine, 6) AS cosine_r, rk, ham, ham_rk
       |FROM (
       |  SELECT q_id, c_id, ham, ham_rk, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id)
       |      AS BIGINT) AS rk
       |  FROM (
       |    SELECT q_id, c_id, ham, ham_rk,
       |      ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")}) AS cosine
       |    FROM short))
       |WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v19 — v18 behind the published-sketch seam (the n09/BPE/IVF/PQ
  // build-once/serve-many discipline applied to the binary index): the
  // first consumer of a corpus in this process computes all sign
  // sketches ONCE and publishes the (vec_id, lo, hi) table through the
  // staged-atomic artifact store; every later consumer — and in
  // production every query batch — scans 16-byte sketch rows with ZERO
  // sign-extraction arithmetic in its plan (PlanSpec pins the absence).
  // Same output as v18 (the oracle is literally v18's SQL), so the hash
  // gate doubles as the served ≡ inline equivalence proof. The sketch
  // table scales with the corpus, so unlike the k-row model artifacts
  // it keeps its write partitioning (no coalesce).
  // ---------------------------------------------------------------------
  private def bqSketches(s: SparkSession, dir: String): DataFrame = synchronized {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${graft.sources.Sink.artifactRoot}/bq_sketch/$tag"
    graft.sources.Sink.fingerprintedArtifact(s, path, s"$dir/embeddings.parquet")(
      t(s, dir, "embeddings").select(col("vec_id"),
        signWord("embedding", 0).as("lo"), signWord("embedding", 32).as("hi")))
  }

  private def v19(s: SparkSession, dir: String): DataFrame = {
    val sk = bqSketches(s, dir)
    val e = t(s, dir, "embeddings")
    val qSk = sk.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
    val cSk = sk.select(col("vec_id").as("c_id"),
      col("lo").as("c_lo"), col("hi").as("c_hi"))
    val shortIds = broadcast(qSk).join(cSk, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"))
          .cast(LongType).as("ham"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(col("ham"), col("c_id"), BqShortlist).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        col("kv.key").as("ham"),
        (col("pos") + 1).cast(LongType).as("ham_rk"))
    val wFull = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .join(broadcast(shortIds), Seq("c_id"))
      .join(broadcast(e.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))), Seq("q_id"))
      .select(col("q_id"), col("c_id"), col("ham"), col("ham_rk"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(wFull).cast(LongType))
      .where(col("rk") <= 10)
      .select(col("q_id"), col("c_id"), round(col("cosine"), 6).as("cosine_r"),
        col("rk"), col("ham"), col("ham_rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  // ---------------------------------------------------------------------
  // v20 — binary-sketch recall audit: the v08/v12/v13 discipline applied
  // to the binary tier, closing the last ANN family without a graded
  // recall loop. Per query it grades BOTH stages of v18 against v01's
  // exact cosine top-10: the raw Hamming top-10 (what a sketch-only
  // index would serve) and the reranked top-10 (Hamming shortlist of
  // BqShortlist, exact cosine rerank). recall(rerank) ≥ recall(raw) is
  // an invariant, not an observation: raw-top-10 ⊆ shortlist, and every
  // exact-top-10 member inside the shortlist out-ranks every non-member
  // under the rerank's own (cosine, c_id) order — SimilaritySpec pins it.
  //
  // Scale: the audit runs over the small query sample (cost = sample ×
  // corpus, a sliver of one full search — the v08 contract); the Hamming
  // ranking is computed ONCE through the bounded TopKSmallest aggregate
  // and its two prefixes (top-10, shortlist) are sliced from the same
  // 50-row-per-query frame. Both tiny intermediates are persisted so the
  // three overlap consumers do not rescan the corpus.
  // ---------------------------------------------------------------------
  private def v20(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        signWord("embedding", 0).as("q_lo"), signWord("embedding", 32).as("q_hi"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      signWord("embedding", 0).as("c_lo"), signWord("embedding", 32).as("c_hi"))
    // exact side — v01's ranking through the bounded aggregate (no
    // corpus-grain rank window; the v17-audit shape)
    val exact = broadcast(q.select(col("q_id"), col("q_emb")))
      .join(c.select(col("c_id"), col("c_emb")), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("cosine"), col("c_id"), 10).as("kept"))
      .select(col("q_id"), explode(col("kept")).as("kv"))
      .select(col("q_id"), col("kv.payload").as("c_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one Hamming ranking; raw top-10 and the rerank shortlist are its
    // prefixes (v18's stage 1 verbatim)
    val ham = broadcast(q.select(col("q_id"), col("q_lo"), col("q_hi")))
      .join(c.select(col("c_id"), col("c_lo"), col("c_hi")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"))
          .cast(LongType).as("ham"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(col("ham"), col("c_id"), BqShortlist).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        (col("pos") + 1).cast(LongType).as("ham_rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw10 = ham.where(col("ham_rk") <= 10).select(col("q_id"), col("c_id"))
    // rerank — v18's stage 2: shortlist ids refetch full vectors, exact
    // cosine ranks within the ≤ BqShortlist·|q| rows
    val wFull = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val rerank = c.select(col("c_id"), col("c_emb"))
      .join(broadcast(ham.select(col("q_id"), col("c_id"))), Seq("c_id"))
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), Seq("q_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(wFull))
      .where(col("rk") <= 10)
      .select(col("q_id"), col("c_id"))
    val nRaw = exact.join(raw10, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_raw_overlap"))
    val nRerank = exact.join(rerank, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_rerank_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(nRaw, Seq("q_id"), "left")
      .join(nRerank, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_raw_overlap", "n_rerank_overlap"))
      .withColumn("recall_raw_ppm", expr("n_raw_overlap * 1000000 div n_exact"))
      .withColumn("recall_rerank_ppm",
        expr("n_rerank_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v20Sql =
    s"""WITH q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb,
       |    ${signWordSql("embedding", 1, 32)} AS q_lo,
       |    ${signWordSql("embedding", 33, 64)} AS q_hi
       |  FROM embeddings WHERE vec_id < 5),
       |c AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb,
       |    ${signWordSql("embedding", 1, 32)} AS c_lo,
       |    ${signWordSql("embedding", 33, 64)} AS c_hi
       |  FROM embeddings),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_emb", "c_emb")} / (${normS("q_emb")} * ${normS("c_emb")})
       |          DESC, c_id) AS rk
       |    FROM q JOIN c ON q_id <> c_id)
       |  WHERE rk <= 10),
       |ham AS (
       |  SELECT q_id, c_id, ham_rk FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        bit_count(xor(q_lo, c_lo)) + bit_count(xor(q_hi, c_hi)), c_id)
       |        AS ham_rk
       |    FROM q JOIN c ON q_id <> c_id)
       |  WHERE ham_rk <= $BqShortlist),
       |raw10 AS (
       |  SELECT q_id, c_id FROM ham WHERE ham_rk <= 10),
       |rerank AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT h.q_id, h.c_id,
       |      row_number() OVER (PARTITION BY h.q_id ORDER BY
       |        ${dotS("qq.q_emb", "cc.c_emb")}
       |          / (${normS("qq.q_emb")} * ${normS("cc.c_emb")}) DESC, h.c_id)
       |        AS rk
       |    FROM ham h
       |    JOIN q qq ON h.q_id = qq.q_id
       |    JOIN c cc ON h.c_id = cc.c_id)
       |  WHERE rk <= 10),
       |ov_raw AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_raw_overlap
       |  FROM exact JOIN raw10 USING (q_id, c_id) GROUP BY 1),
       |ov_rr AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_rerank_overlap
       |  FROM exact JOIN rerank USING (q_id, c_id) GROUP BY 1),
       |ex AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1)
       |SELECT q_id, n_exact,
       |  COALESCE(n_raw_overlap, 0) AS n_raw_overlap,
       |  COALESCE(n_rerank_overlap, 0) AS n_rerank_overlap,
       |  CAST(COALESCE(n_raw_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS recall_raw_ppm,
       |  CAST(COALESCE(n_rerank_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS recall_rerank_ppm
       |FROM ex LEFT JOIN ov_raw USING (q_id) LEFT JOIN ov_rr USING (q_id)
       |ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v21 — IVF-pruned binary ANN (coarse quantizer × binary sketches ×
  // exact rerank): the three-tier serving stack production vector stores
  // actually run. v16 composes IVF with PQ codes; this composes it with
  // the v18 binary tier — stage 0 prunes the candidate set to the
  // query's own trained-IVF inverted list (|corpus|/k candidates), stage
  // 1 ranks the list by XOR+popcount Hamming over 16-byte sign sketches,
  // stage 2 full-cosine reranks the ≤ BqShortlist shortlist to top-10.
  // Completes the composition matrix: every fine tier (PQ, BQ) now has
  // both a flat-scan and an IVF-pruned graded variant.
  //
  // Scale shape: the assignment frame is the v04 index (persisted — it
  // is consumed by the query side, the candidate side, and the rerank
  // refetch); the Hamming join is cent_id-equi (never all-pairs), ranked
  // through the bounded TopKSmallest; rerank is an id-gather over
  // ≤ BqShortlist·|q| rows. cent_id rides the output so cluster
  // confinement is visible (and spec-pinned against v14's assignment).
  // ---------------------------------------------------------------------
  private def v21(s: SparkSession, dir: String): DataFrame = {
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        signWord("embedding", 0).as("lo"), signWord("embedding", 32).as("hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = assigned.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("cent_id"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        col("lo").as("q_lo"), col("hi").as("q_hi"))
    val shortIds = broadcast(q.select(col("q_id"), col("cent_id"),
        col("q_lo"), col("q_hi")))
      .join(assigned.select(col("vec_id").as("c_id"), col("cent_id"),
        col("lo").as("c_lo"), col("hi").as("c_hi")), Seq("cent_id"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("cent_id"), col("c_id"),
        (expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"))
          .cast(LongType).as("ham"))
      .groupBy(col("q_id"), col("cent_id"))
      .agg(graft.functions.TopKSmallest
        .of(col("ham"), col("c_id"), BqShortlist).as("kept"))
      .select(col("q_id"), col("cent_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("cent_id"), col("kv.payload").as("c_id"),
        col("kv.key").as("ham"),
        (col("pos") + 1).cast(LongType).as("ham_rk"))
    val wFull = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    assigned.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
      .join(broadcast(shortIds), Seq("c_id"))
      .join(broadcast(q.select(col("q_id"), col("q_emb"), col("q_nrm"))),
        Seq("q_id"))
      .select(col("q_id"), col("cent_id").cast(LongType).as("cent_id"),
        col("c_id"), col("ham"), col("ham_rk"),
        (dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
          .as("cosine"))
      .withColumn("rk", row_number().over(wFull).cast(LongType))
      .where(col("rk") <= 10)
      .select(col("q_id"), col("cent_id"), col("c_id"),
        round(col("cosine"), 6).as("cosine_r"), col("rk"),
        col("ham"), col("ham_rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v21Sql =
    s"""WITH ${ivfCtesSql()},
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |sk AS (
       |  SELECT vec_id, cent_id, embedding, nrm,
       |    ${signWordSql("embedding", 1, 32)} AS lo,
       |    ${signWordSql("embedding", 33, 64)} AS hi
       |  FROM assigned),
       |q AS (
       |  SELECT vec_id AS q_id, cent_id, embedding AS q_emb, nrm AS q_nrm,
       |    lo AS q_lo, hi AS q_hi
       |  FROM sk WHERE vec_id < 5),
       |shortl AS (
       |  SELECT q_id, cent_id, c_id, ham, CAST(ham_rk AS BIGINT) AS ham_rk
       |  FROM (
       |    SELECT q.q_id, q.cent_id, c.vec_id AS c_id,
       |      CAST(bit_count(xor(q.q_lo, c.lo)) + bit_count(xor(q.q_hi, c.hi))
       |        AS BIGINT) AS ham,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        bit_count(xor(q.q_lo, c.lo)) + bit_count(xor(q.q_hi, c.hi)),
       |        c.vec_id) AS ham_rk
       |    FROM q JOIN sk c ON q.cent_id = c.cent_id AND q.q_id <> c.vec_id)
       |  WHERE ham_rk <= $BqShortlist)
       |SELECT q_id, CAST(cent_id AS BIGINT) AS cent_id, c_id,
       |  round(cosine, 6) AS cosine_r, rk, ham, ham_rk
       |FROM (
       |  SELECT s.q_id, s.cent_id, s.c_id, s.ham, s.ham_rk,
       |    ${dotS("q.q_emb", "c.embedding")} / (q.q_nrm * c.nrm) AS cosine,
       |    CAST(row_number() OVER (PARTITION BY s.q_id ORDER BY
       |      ${dotS("q.q_emb", "c.embedding")} / (q.q_nrm * c.nrm) DESC,
       |      s.c_id) AS BIGINT) AS rk
       |  FROM shortl s
       |  JOIN q ON s.q_id = q.q_id
       |  JOIN assigned c ON s.c_id = c.vec_id)
       |WHERE rk <= 10
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v22 — composed-tier recall audit: the v13 discipline applied to v21,
  // so the three-tier stack (IVF × binary × rerank) ships with a recall
  // number like every other tier. Per query it grades v21's final top-10
  // against v01's exact cosine top-10 — AND decomposes the compound loss
  // into its two stages: `cell_ceiling_ppm` is the recall the coarse
  // quantizer alone permits (|exact-top-10 ∩ query's inverted list| /
  // n_exact — no fine tier can recover a neighbor IVF pruned away), and
  // the gap between ceiling and `recall_ppm` is what the Hamming
  // shortlist cut costs. recall_ppm ≤ cell_ceiling_ppm is structural
  // (v21's candidates ⊆ the cell), and when the cell fits inside
  // BqShortlist the rerank is exhaustive so recall MUST equal the
  // ceiling — SimilaritySpec pins both.
  //
  // Scale: audit cost = |sample| × corpus for the exact side (the
  // v08/v13 contract) plus the graded v21 search itself; overlaps are
  // narrow (q_id, c_id) set intersections, integer-ppm output.
  // ---------------------------------------------------------------------
  private def v22(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    // exact top-10 through the bounded aggregate (v01's ranking verbatim)
    val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("cosine"), col("c_id"), 10).as("kept"))
      .select(col("q_id"), explode(col("kept")).as("kv"))
      .select(col("q_id"), col("kv.payload").as("c_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cell membership under the trained coarse quantizer: what stage 0
    // leaves reachable per query (three consumers — persist)
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cell = broadcast(assigned.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("cent_id")))
      .join(assigned.select(col("vec_id").as("c_id"), col("cent_id")),
        Seq("cent_id"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
    val approx = v21(s, dir).select(col("q_id"), col("c_id"))
    val nCell = cell.groupBy(col("q_id")).agg(count(lit(1)).as("n_cell"))
    val ovCell = exact.join(cell, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_cell_overlap"))
    val ovAppr = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(nCell, Seq("q_id"), "left")
      .join(ovCell, Seq("q_id"), "left")
      .join(ovAppr, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_cell", "n_cell_overlap", "n_overlap"))
      .withColumn("cell_ceiling_ppm",
        expr("n_cell_overlap * 1000000 div n_exact"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v22Sql =
    s"""WITH ${ivfCtesSql()},
       |assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |sk AS (
       |  SELECT vec_id, cent_id, embedding, nrm,
       |    ${signWordSql("embedding", 1, 32)} AS lo,
       |    ${signWordSql("embedding", 33, 64)} AS hi
       |  FROM assigned),
       |q AS (
       |  SELECT vec_id AS q_id, cent_id, embedding AS q_emb, nrm AS q_nrm,
       |    lo AS q_lo, hi AS q_hi
       |  FROM sk WHERE vec_id < 5),
       |shortl AS (
       |  SELECT q_id, cent_id, c_id FROM (
       |    SELECT q.q_id, q.cent_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY
       |        bit_count(xor(q.q_lo, c.lo)) + bit_count(xor(q.q_hi, c.hi)),
       |        c.vec_id) AS ham_rk
       |    FROM q JOIN sk c ON q.cent_id = c.cent_id AND q.q_id <> c.vec_id)
       |  WHERE ham_rk <= $BqShortlist),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT s.q_id, s.c_id,
       |      row_number() OVER (PARTITION BY s.q_id ORDER BY
       |        ${dotS("q.q_emb", "c.embedding")} / (q.q_nrm * c.nrm) DESC,
       |        s.c_id) AS rk
       |    FROM shortl s
       |    JOIN q ON s.q_id = q.q_id
       |    JOIN assigned c ON s.c_id = c.vec_id)
       |  WHERE rk <= 10),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT qq.vec_id AS q_id, cc.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |        ${dotS("qq.embedding", "cc.embedding")}
       |          / (${normS("qq.embedding")} * ${normS("cc.embedding")}) DESC,
       |        cc.vec_id) AS rk
       |    FROM embeddings qq JOIN embeddings cc ON qq.vec_id <> cc.vec_id
       |    WHERE qq.vec_id < 5)
       |  WHERE rk <= 10),
       |cell AS (
       |  SELECT q.q_id, c.vec_id AS c_id
       |  FROM q JOIN assigned c
       |    ON q.cent_id = c.cent_id AND q.q_id <> c.vec_id),
       |ncell AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cell FROM cell GROUP BY 1),
       |ovc AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cell_overlap
       |  FROM exact JOIN cell USING (q_id, c_id) GROUP BY 1),
       |ova AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1),
       |ex AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1)
       |SELECT q_id, n_exact,
       |  COALESCE(n_cell, 0) AS n_cell,
       |  COALESCE(n_cell_overlap, 0) AS n_cell_overlap,
       |  COALESCE(n_overlap, 0) AS n_overlap,
       |  CAST(COALESCE(n_cell_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS cell_ceiling_ppm,
       |  CAST(COALESCE(n_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS recall_ppm
       |FROM ex
       |LEFT JOIN ncell USING (q_id)
       |LEFT JOIN ovc USING (q_id)
       |LEFT JOIN ova USING (q_id)
       |ORDER BY q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v23 — IVFADC recall audit: v22's decomposed discipline applied to the
  // OTHER composition (v16 = IVF × PQ), so both composed stacks ship
  // recall numbers, not just their constituent tiers. Per query, v16's
  // ADC top-5 is graded against exact squared-L2 top-5 (the v12 metric —
  // the PQ family ranks by L2, not cosine), with the same per-stage
  // split: `cell_ceiling_ppm` is what coarse pruning alone permits;
  // since v16 ADC-scores the ENTIRE cell (no shortlist truncation), the
  // ceiling−recall gap here isolates pure PQ quantization error on the
  // reachable set — the complementary diagnostic to v22, where the exact
  // rerank made the gap pure shortlist-truncation cost.
  // ---------------------------------------------------------------------
  private def v23(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // exact L2 top-5 through the bounded aggregate
    val exact = broadcast(q)
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        sqDist(col("q_emb"), col("c_emb")).as("d"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(col("d"), col("c_id"), 5).as("kept"))
      .select(col("q_id"), explode(col("kept")).as("kv"))
      .select(col("q_id"), col("kv.payload").as("c_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cell = broadcast(assigned.where(col("vec_id").between(100, 104))
        .select(col("vec_id").as("q_id"), col("cent_id")))
      .join(assigned.select(col("vec_id").as("c_id"), col("cent_id")),
        Seq("cent_id"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
    val approx = v16(s, dir).select(col("q_id"), col("c_id"))
    val nCell = cell.groupBy(col("q_id")).agg(count(lit(1)).as("n_cell"))
    val ovCell = exact.join(cell, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_cell_overlap"))
    val ovAppr = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(nCell, Seq("q_id"), "left")
      .join(ovCell, Seq("q_id"), "left")
      .join(ovAppr, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_cell", "n_cell_overlap", "n_overlap"))
      .withColumn("cell_ceiling_ppm",
        expr("n_cell_overlap * 1000000 div n_exact"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .orderBy(col("q_id"))
  }
  private val v23Sql = {
    val lutJoins = lutJoinsSql("el")
    s"""WITH ${ivfCtesSql()},
       |$pqCtesSql,
       |ivf_assigned AS (
       |  SELECT vec_id, cent_id FROM ranked_assign WHERE arn = 1),
       |qc AS (
       |  SELECT q.q_id, a.cent_id
       |  FROM (SELECT DISTINCT q_id FROM lut) q
       |  JOIN ivf_assigned a ON a.vec_id = q.q_id),
       |elig AS (
       |  SELECT qc.q_id, a.vec_id AS c_id, qc.cent_id
       |  FROM qc JOIN ivf_assigned a
       |    ON a.cent_id = qc.cent_id AND a.vec_id <> qc.q_id),
       |ivfadc_scored AS (
       |  SELECT el.q_id, el.c_id, el.cent_id,
       |    l0.d + l1.d + l2.d + l3.d AS adist
       |  FROM elig el
       |  JOIN codes c ON c.vec_id = el.c_id
       |  $lutJoins),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rk
       |    FROM ivfadc_scored)
       |  WHERE rk <= 5),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT qq.vec_id AS q_id, cc.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
       |        ${distSqS("qq.embedding", "cc.embedding")}, cc.vec_id) AS rk
       |    FROM embeddings qq JOIN embeddings cc ON qq.vec_id <> cc.vec_id
       |    WHERE qq.vec_id BETWEEN 100 AND 104)
       |  WHERE rk <= 5),
       |cell AS (
       |  SELECT qa.vec_id AS q_id, ca.vec_id AS c_id
       |  FROM ivf_assigned qa JOIN ivf_assigned ca
       |    ON qa.cent_id = ca.cent_id AND qa.vec_id <> ca.vec_id
       |  WHERE qa.vec_id BETWEEN 100 AND 104),
       |ncell AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cell FROM cell GROUP BY 1),
       |ovc AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cell_overlap
       |  FROM exact JOIN cell USING (q_id, c_id) GROUP BY 1),
       |ova AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1),
       |ex AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact GROUP BY 1)
       |SELECT q_id, n_exact,
       |  COALESCE(n_cell, 0) AS n_cell,
       |  COALESCE(n_cell_overlap, 0) AS n_cell_overlap,
       |  COALESCE(n_overlap, 0) AS n_overlap,
       |  CAST(COALESCE(n_cell_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS cell_ceiling_ppm,
       |  CAST(COALESCE(n_overlap, 0) * 1000000 // n_exact AS BIGINT)
       |    AS recall_ppm
       |FROM ex
       |LEFT JOIN ncell USING (q_id)
       |LEFT JOIN ovc USING (q_id)
       |LEFT JOIN ova USING (q_id)
       |ORDER BY q_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v24 — stale-quantizer recall audit: the missing lifecycle loop of the
  // train-once/serve-many story. In production the corpus GROWS under a
  // served index: new arrivals are assigned to the FROZEN centroids
  // ([[assignWithCentroids]] — appending inverted-list entries costs one
  // broadcast pass over the delta, no retrain), and the coarse quantizer
  // slowly goes stale — it has never seen the delta's distribution. This
  // audit measures exactly that cost: centroids trained only on the base
  // snapshot (¬[[isDelta]], 75%), the FULL grown corpus assigned under
  // them, multi-probe search (v09's plan shape) graded against exact
  // full-corpus cosine per query. n_delta_exact counts how many of each
  // query's true top-5 are post-training arrivals — the drift driver: a
  // deployment alerts on recall_ppm (vs v13's fresh-centroid number) and
  // retrains when the gap crosses its SLO. Queries 100–104 include
  // vec_id 103 — itself a delta arrival probing an index that predates
  // it. Scale shape: identical to v13 (broadcast k-row codebook, pruned
  // probe join, narrow intersection) — the audit adds nothing beyond the
  // exact scan it shares with every other recall audit.
  // ---------------------------------------------------------------------
  private def v24(s: SparkSession, dir: String): DataFrame = {
    val ranked = rankedAssignmentWith(s, dir, NProbe, staleCentroids(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = ranked.where(col("arn") === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"), col("cent_id"))
    val probes = ranked.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id").as("probe_cent"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val approx = broadcast(probes)
      .join(corpus,
        col("probe_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val exact = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
    val overlap = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(isDelta(col("c_id")), 1L).otherwise(0L)).as("n_delta_exact"))
      .join(overlap, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .select(col("q_id"), col("n_exact"), col("n_delta_exact"),
        col("n_overlap"), col("recall_ppm"))
      .orderBy(col("q_id"))
  }
  private val v24Sql =
    s"""WITH ${ivfCtesSql(trainPred = s"vec_id % $DeltaMod <> ${DeltaMod - 1}")},
       |corpus AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
       |    cent_id AS probe_cent
       |  FROM ranked_assign
       |  WHERE arn <= $NProbe AND vec_id BETWEEN 100 AND 104),
       |approx AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY
       |        ${dotS("q_emb", "c_emb")} / (q_nrm * c_nrm) DESC, c_id) AS rk
       |    FROM probes JOIN corpus
       |      ON probe_cent = cent_id AND q_id <> c_id)
       |  WHERE rk <= 5),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dotS("q.embedding", "c.embedding")}
       |          / (${normS("q.embedding")} * ${normS("c.embedding")}) DESC,
       |        c.vec_id) AS rk
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id BETWEEN 100 AND 104)
       |  WHERE rk <= 5),
       |ov AS (
       |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1)
       |SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN e.c_id % $DeltaMod = ${DeltaMod - 1} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_delta_exact,
       |  CAST(coalesce(min(ov.n_overlap), 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(min(ov.n_overlap), 0) * 1000000 // count(*) AS BIGINT)
       |    AS recall_ppm
       |FROM exact e LEFT JOIN ov ON e.q_id = ov.q_id
       |GROUP BY e.q_id
       |ORDER BY e.q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v25 — stale-codebook PQ recall audit: v24 closed the staleness loop
  // for the COARSE quantizer; this closes it for the FINE one, which
  // completes the trained-tier staleness matrix (IVF → v24, PQ → v25,
  // BPE → d34; the BQ sign sketch and LSH band hashes are training-free
  // — nothing in them can go stale). Production reality: re-encoding
  // 100 TB of codes after a codebook retrain is the single most
  // expensive index operation there is, so deployments serve codes from
  // a codebook trained snapshots ago and need the recall cost measured.
  // The audit: per-subspace codebook trained only on the base cohort
  // (¬isDelta, rank-re-keyed seeds), the FULL grown corpus encoded and
  // ADC-ranked under it (v11's plan via the pqIndexWith seam), graded
  // against exact squared-L2 top-5 (v12's metric), with n_delta_exact
  // marking post-training arrivals in each true top-5. Read against
  // v12's fresh-codebook recall, the gap is the re-encode trigger.
  // ---------------------------------------------------------------------
  private def v25(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d"), col("c_id"))
    val exact = broadcast(q)
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        sqDist(col("q_emb"), col("c_emb")).as("d"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
    val approx = pqRankedWith(s, dir,
        pqIndexWith(s, dir, stalePqCodebook(s, dir)))
      .where(col("rk") <= 5).select(col("q_id"), col("c_id"))
    val overlap = exact.join(approx, Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    exact.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(isDelta(col("c_id")), 1L).otherwise(0L)).as("n_delta_exact"))
      .join(overlap, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("recall_ppm", expr("n_overlap * 1000000 div n_exact"))
      .select(col("q_id"), col("n_exact"), col("n_delta_exact"),
        col("n_overlap"), col("recall_ppm"))
      .orderBy(col("q_id"))
  }
  private val v25Sql =
    s"""WITH ${pqCtes(s"vec_id % $DeltaMod <> ${DeltaMod - 1}")},
       |approx AS (
       |  SELECT q_id, c_id FROM pq_ranked WHERE rk <= 5),
       |exact0 AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    ${distSqS("q.embedding", "c.embedding")} AS d
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id BETWEEN 100 AND 104),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY d, c_id) AS rk
       |    FROM exact0)
       |  WHERE rk <= 5),
       |ov AS (
       |  SELECT q_id, CAST(count(*) AS BIGINT) AS n_overlap
       |  FROM exact JOIN approx USING (q_id, c_id) GROUP BY 1)
       |SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(sum(CASE WHEN e.c_id % $DeltaMod = ${DeltaMod - 1} THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_delta_exact,
       |  CAST(coalesce(min(ov.n_overlap), 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(min(ov.n_overlap), 0) * 1000000 // count(*) AS BIGINT)
       |    AS recall_ppm
       |FROM exact e LEFT JOIN ov ON e.q_id = ov.q_id
       |GROUP BY e.q_id
       |ORDER BY e.q_id""".stripMargin

  // ---------------------------------------------------------------------
  // v26 — the PQ index behind the published-codes seam, completing the
  // serving-parity matrix (LSH → n09, BQ → v19, PQ → this): at 100 TB
  // the encoded CODES are the index's expensive artifact — one
  // corpus-scale encode pass and 4 bytes/vector of storage — and no
  // deployment recomputes them per query batch, yet until now only the
  // k·m-row codebook was served while every consumer re-encoded the
  // corpus. The codes table is published once per corpus fingerprint
  // (corpus-scale, so it keeps its write partitioning — the v19 rule);
  // a query batch then computes ONLY its own LUTs (|q|·m·k rows against
  // the broadcast codebook) and ADC-ranks by scanning 4-BIGINT code
  // rows — zero encode arithmetic on the candidate path (PlanSpec-style
  // pin in SimilaritySpec: no code-election aggregate in the serving
  // plan). Same output as v11 — the oracle is literally v11's SQL, so
  // the hash gate doubles as the served ≡ inline equivalence proof.
  // ---------------------------------------------------------------------
  private[graft] def servedPqCodes(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"${graft.sources.Sink.artifactRoot}/pq_codes/$tag"
      graft.sources.Sink.fingerprintedArtifact(s, path,
        s"$dir/embeddings.parquet")(pqIndex(s, dir)._1)
    }

  private def v26(s: SparkSession, dir: String): DataFrame = {
    val codes = servedPqCodes(s, dir)
    // the query batch's own LUTs, computed fresh per batch: query
    // subvectors × broadcast codebook = |q|·m·k rows
    val cb = pqCodebook(s, dir)
    val lut = t(s, dir, "embeddings")
      .where(col("vec_id").between(100, 104))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"),
        expr(s"slice(embedding, m * $PqDim + 1, $PqDim)").as("sub"))
      .join(broadcast(cb), Seq("m"))
      .select(col("vec_id").as("q_id"), col("m"), col("cent_id"),
        sqDist(col("sub"), col("csub")).as("d"))
    val base = codes.select(col("vec_id").as("c_id"),
        col("c0"), col("c1"), col("c2"), col("c3"))
      .crossJoin(broadcast(lut.select(col("q_id")).distinct()))
      .where(col("q_id") =!= col("c_id"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("c_id"))
    adcScore(base, lut)
      .withColumn("rk", row_number().over(wTop).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), round(col("adist"), 6).as("adist_r"),
        col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  // ---------------------------------------------------------------------
  // v27 — the IVF index behind a published-assignment seam, closing the
  // last cell of the serving matrix (LSH → n09, BQ → v19, PQ → v26,
  // IVF → this): the inverted lists ARE the (vec_id, cent_id, arn)
  // ranked assignment, and serving them means a query batch neither
  // re-crosses the corpus with the codebook nor re-ranks centroids —
  // it scans 3-BIGINT rows (arn = 1 is the list membership; arn ≤
  // NProbe doubles as each vector's probe list) and joins the corpus
  // by vec_id for exact scoring. At 100 TB the assignment is stored
  // WITH the vectors (the cluster id is the table's partition key —
  // v04's own design note), so the key join here stands in for a
  // co-located read; either way the serving plan carries zero
  // quantize/assign arithmetic (spec pins the absence). Same output as
  // v04 — the oracle is v04's SQL verbatim, served ≡ inline by the
  // hash gate.
  // ---------------------------------------------------------------------
  private[graft] def servedIvfAssignment(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"${graft.sources.Sink.artifactRoot}/ivf_assignment/$tag"
      graft.sources.Sink.fingerprintedArtifact(s, path,
        s"$dir/embeddings.parquet")(
        rankedAssignment(s, dir, maxArn = NProbe)
          .select(col("vec_id"), col("cent_id"), col("arn")))
    }

  private def v27(s: SparkSession, dir: String): DataFrame = {
    val lists = servedIvfAssignment(s, dir).where(col("arn") === 1)
      .select(col("vec_id"), col("cent_id"))
    val assigned = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .join(lists, Seq("vec_id"))
    val q = assigned.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id").as("q_cent"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    broadcast(q)
      .join(assigned.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm"), col("cent_id")),
        col("q_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(wTop).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("cent_id").as("cluster_id"),
        round(col("cosine"), 6).as("cosine_r"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }

  // ---------------------------------------------------------------------
  // v28 — IVF operating-curve sweep (the n10 discipline applied to the
  // coarse index): recall@5 AND candidate volume for nprobe ∈ {1, 2, 4}
  // over the k=8 trained clusters, in one report. v13 prices the
  // production point (nprobe = 2); this is the curve AROUND it — the
  // table a deployment reads to trade scan cost (candidates grow
  // ~linearly in nprobe) against recall (grows with diminishing returns
  // as probes pass the boundary-crossing neighbors v09 exists to
  // recover). Recall is monotone in nprobe BY CONSTRUCTION (probe sets
  // nest: arn ≤ 1 ⊂ arn ≤ 2 ⊂ arn ≤ 4 — larger candidate sets can only
  // add true neighbors), which SimilaritySpec pins along with the
  // nprobe=2 row's consistency with v13's graded per-query audit.
  //
  // Scale shape: ONE ranked assignment serves all three configs (arn ≤
  // max is computed once and persisted; each config is a filter), the
  // exact side is the v13 exact plan computed once, and each config
  // adds only its candidate join over the 5-query probe sliver.
  // ---------------------------------------------------------------------
  private val SweepProbes = Seq(1, 2, 4)

  private def v28(s: SparkSession, dir: String): DataFrame = {
    val ranked = rankedAssignment(s, dir, maxArn = SweepProbes.max)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        col("arn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = ranked.where(col("arn") === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"), col("cent_id"))
    val e = t(s, dir, "embeddings")
    val q = e.where(col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cAll = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    val exact = broadcast(q).join(cAll, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (norm(col("q_emb")) * norm(col("c_emb")))).as("cosine"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val rows = SweepProbes.map { p =>
      val probes = ranked
        .where(col("arn") <= p && col("vec_id").between(100, 104))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"), col("cent_id").as("probe_cent"))
      val cand = broadcast(probes).join(corpus,
        col("probe_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val approx = cand
        .withColumn("cosine",
          dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("q_id"), col("c_id"))
      val nOvl = exact.join(approx, Seq("q_id", "c_id"))
        .agg(count(lit(1)).as("n_overlap"))
      nCand.crossJoin(nExact).crossJoin(nOvl)
        .select(lit(p.toLong).as("nprobe"), col("n_candidates"),
          col("n_exact"), col("n_overlap"),
          expr("n_overlap * 1000000 div n_exact").as("recall_ppm"))
    }
    rows.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }
  private val v28Sql = {
    def cfg(p: Int): String =
      s"""probes_$p AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
         |    cent_id AS probe_cent
         |  FROM ranked_assign
         |  WHERE arn <= $p AND vec_id BETWEEN 100 AND 104),
         |cand_$p AS (
         |  SELECT q_id, c_id,
         |    ${dotS("q_emb", "c_emb")} / (q_nrm * c_nrm) AS cosine
         |  FROM probes_$p JOIN corpus
         |    ON probe_cent = cent_id AND q_id <> c_id),
         |approx_$p AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |      row_number() OVER (PARTITION BY q_id
         |        ORDER BY cosine DESC, c_id) AS rk
         |    FROM cand_$p)
         |  WHERE rk <= 5),
         |row_$p AS (
         |  SELECT CAST($p AS BIGINT) AS nprobe,
         |    (SELECT CAST(count(*) AS BIGINT) FROM cand_$p) AS n_candidates,
         |    (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM exact JOIN approx_$p USING (q_id, c_id)) AS n_overlap)""".stripMargin
    s"""WITH ${ivfCtesSql()},
       |corpus AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |exact AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${dotS("q.embedding", "c.embedding")}
       |          / (${normS("q.embedding")} * ${normS("c.embedding")}) DESC,
       |        c.vec_id) AS rk
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id BETWEEN 100 AND 104)
       |  WHERE rk <= 5),
       |${SweepProbes.map(cfg).mkString(",\n")}
       |SELECT nprobe, n_candidates, n_exact, n_overlap,
       |  CAST(n_overlap * 1000000 // n_exact AS BIGINT) AS recall_ppm
       |FROM (${SweepProbes.map(p => s"SELECT * FROM row_$p").mkString(" UNION ALL ")})
       |ORDER BY nprobe""".stripMargin
  }

  // ---------------------------------------------------------------------
  // v29 — attribute-FILTERED ANN (the "filtered vector search" every
  // production store names: FAISS IDSelector, Milvus expr filter,
  // pgvector WHERE): top-5 cosine restricted to candidates whose label
  // is in the query's filter set, over the multi-probe IVF index. The
  // load-bearing choice is PRE-filter: the predicate lands on the
  // candidate side BEFORE ranking, so the top-5 is taken over matching
  // vectors only. The tempting alternative — post-filtering an
  // unfiltered top-k — STARVES: with ~20% selectivity an unfiltered
  // top-5 keeps ~1 matching row (SimilaritySpec demonstrates exactly
  // that against v09's output). Filtering also interacts with nprobe:
  // a filter thins every cell ~5×, so the probe count that met the
  // recall SLO unfiltered may not filtered — the v28 sweep is the tool
  // for re-picking it. Plan shape is v09's with one broadcast-joined
  // label column and the filter pushed below the rank.
  // ---------------------------------------------------------------------
  private val FilterLabels = Seq(2, 7)

  private def v29(s: SparkSession, dir: String): DataFrame = {
    val ranked = rankedAssignment(s, dir, maxArn = NProbe)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        col("arn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = t(s, dir, "embeddings")
      .select(col("vec_id").as("c_id"), col("label"))
    val corpus = ranked.where(col("arn") === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"), col("cent_id"))
      .join(labels, Seq("c_id"))
      .where(col("label").isin(FilterLabels: _*)) // PRE-filter, below the rank
    val probes = ranked
      .where(col("arn") <= NProbe && col("vec_id").between(100, 104))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cent_id").as("probe_cent"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    broadcast(probes)
      .join(corpus,
        col("probe_cent") === col("cent_id") && col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(wTop).cast(LongType))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("c_id"), col("label"),
        round(col("cosine"), 6).as("cosine_r"), col("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v29Sql =
    s"""WITH ${ivfCtesSql()},
       |corpus AS (
       |  SELECT r.vec_id AS c_id, r.embedding AS c_emb, r.nrm AS c_nrm,
       |    r.cent_id, e.label
       |  FROM ranked_assign r JOIN embeddings e ON r.vec_id = e.vec_id
       |  WHERE r.arn = 1 AND e.label IN (${FilterLabels.mkString(", ")})),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
       |    cent_id AS probe_cent
       |  FROM ranked_assign
       |  WHERE arn <= $NProbe AND vec_id BETWEEN 100 AND 104),
       |scored AS (
       |  SELECT q_id, c_id, label,
       |    ${dotS("q_emb", "c_emb")} / (q_nrm * c_nrm) AS cosine
       |  FROM probes JOIN corpus
       |    ON probe_cent = cent_id AND q_id <> c_id),
       |rk AS (
       |  SELECT q_id, c_id, label, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, label, round(cosine, 6) AS cosine_r,
       |  CAST(rk AS BIGINT) AS rk
       |FROM rk WHERE rk <= 5
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v30 — corpus kNN graph: EVERY vector's top-3 cosine neighbors, not
  // just a query sample's — the artifact cluster-based curation methods
  // (SemDeDup keepers, density filtering, graph-connected dedup) start
  // from. Brute force is |corpus|² and dead at scale; here the pair
  // space is cell-confined by the trained IVF assignment (one shuffle
  // on cent_id, Σ|cell|² pairs — bounded by the balance v10 audits) and
  // per-vector state is capped by the bounded TopKSmallest aggregate
  // (never a corpus-wide rank window: with every vector a query, a
  // window would sort |corpus|²/k rows per cell task). Within-cell
  // truncation vs the exact graph is the v13 recall trade, priced by
  // the same audits. Oracle replays the trained-IVF CTEs and takes the
  // same cell-confined top-3 via a rank window — DuckDB proving the
  // bounded aggregate ≡ textbook semantics (the v01/d18 pattern).
  // ---------------------------------------------------------------------
  private val KnnK = 3

  private def v30(s: SparkSession, dir: String): DataFrame = {
    val assigned = rankedAssignment(s, dir, maxArn = 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"), col("cent_id"))
    val b = assigned.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"), col("cent_id"))
    a.join(b, Seq("cent_id")).where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (dot(col("q_emb"), col("c_emb"))
          / (col("q_nrm") * col("c_nrm"))).as("cosine"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKSmallest
        .of(-col("cosine"), col("c_id"), KnnK).as("kept"))
      .select(col("q_id"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("q_id"), col("kv.payload").as("c_id"),
        round(-col("kv.key"), 6).as("cosine_r"),
        (col("pos") + 1).cast(LongType).as("rk"))
      .orderBy(col("q_id"), col("rk"))
  }
  private val v30Sql =
    s"""WITH ${ivfCtesSql()},
       |m AS (
       |  SELECT vec_id, embedding, nrm, cent_id
       |  FROM ranked_assign WHERE arn = 1),
       |scored AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
       |    ${dotS("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
       |  FROM m a JOIN m b
       |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT q_id, c_id, cosine,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
       |  FROM scored)
       |SELECT q_id, c_id, round(cosine, 6) AS cosine_r, CAST(rk AS BIGINT) AS rk
       |FROM ranked WHERE rk <= $KnnK
       |ORDER BY q_id, rk""".stripMargin

  // ---------------------------------------------------------------------
  // v31 — density pruning from the kNN graph: the 50 LEAST-connected
  // vectors (lowest summed top-3 neighbor similarity) — the
  // prototypicality/outlier filter cluster-based curation applies after
  // building v30's graph (SemDeDup prunes the over-connected; this is
  // the complementary tail: embeddings too far from everything are
  // noise, OCR garbage, or mislabeled modality). Signals are CONSUMED
  // from the graded v30 (fn Spark-side, its SQL as a nested CTE
  // oracle-side). Density is exact-integer: each edge's cosine becomes
  // round(cosine·10⁶) — identical in both engines because the cosine
  // doubles are identical — and the per-vector sum of 3 such BIGINTs is
  // order-free, dodging the float-fold-order trap a double mean would
  // reopen. Bottom-50 lowers to TakeOrderedAndProject (never a global
  // sort), ties break on vec_id.
  // ---------------------------------------------------------------------
  private def v31(s: SparkSession, dir: String): DataFrame =
    v30(s, dir)
      .select(col("q_id").as("vec_id"),
        round(col("cosine_r") * lit(1000000d)).cast(LongType).as("edge_ppm"))
      .groupBy(col("vec_id"))
      .agg(sum(col("edge_ppm")).as("density_ppm3"))
      .orderBy(col("density_ppm3"), col("vec_id"))
      .limit(50)
  private val v31Sql =
    s"""WITH knn AS ($v30Sql)
       |SELECT vec_id, density_ppm3 FROM (
       |  SELECT q_id AS vec_id,
       |    CAST(SUM(CAST(round(cosine_r * 1000000) AS BIGINT)) AS BIGINT)
       |      AS density_ppm3
       |  FROM knn GROUP BY 1)
       |ORDER BY density_ppm3, vec_id
       |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // v32 — the kNN graph behind the artifact store: v30's graph is the
  // expensive product (cell-confined pair scoring over the whole
  // corpus), and EVERY downstream curation consumer — density pruning,
  // SemDeDup-style keeper election, duplicate-cluster audits — reads the
  // same edges. Publishing it once per corpus fingerprint (the serving
  // matrix's graph cell, after LSH/BQ/PQ/IVF/BM25/frames) turns each
  // consumer into a scan of 4-column edge rows with ZERO embedding
  // arithmetic (SimilaritySpec pins no dot-product fold in the serving
  // plan). v32 replays v31's density pruning as such a consumer, graded
  // against v31's oracle VERBATIM — the hash gate is the served ≡
  // inline proof.
  // ---------------------------------------------------------------------
  def servedKnnGraph(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Sink.fingerprintedArtifact(
      s, s"${graft.sources.Sink.artifactRoot}/knn_graph/$tag",
      s"$dir/embeddings.parquet") {
      v30(s, dir)
    }
  }

  private def v32(s: SparkSession, dir: String): DataFrame =
    servedKnnGraph(s, dir)
      .select(col("q_id").as("vec_id"),
        round(col("cosine_r") * lit(1000000d)).cast(LongType).as("edge_ppm"))
      .groupBy(col("vec_id"))
      .agg(sum(col("edge_ppm")).as("density_ppm3"))
      .orderBy(col("density_ppm3"), col("vec_id"))
      .limit(50)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("v01_cosine_topk", v01, Some(v01Sql), headline = true),
    QueryDef("v02_embedding_neardup", v02, Some(v02Sql), headline = true),
    QueryDef("v03_lsh_buckets", v03, Some(v03Sql)),
    QueryDef("v04_ivf_ann", v04, Some(v04Sql)),
    QueryDef("v05_lsh_neardup", v05, Some(v05Sql)),
    QueryDef("v06_quantized_topk", v06, Some(v06Sql)),
    QueryDef("v07_hybrid_rescore", v07, Some(v07Sql), headline = true),
    QueryDef("v08_recall_audit", v08, Some(v08Sql)),
    QueryDef("v09_multiprobe_ivf", v09, Some(v09Sql)),
    QueryDef("v10_index_balance", v10, Some(v10Sql)),
    QueryDef("v11_pq_ann", v11, Some(v11Sql)),
    QueryDef("v12_pq_recall", v12, Some(v12Sql)),
    QueryDef("v13_ivf_recall", v13, Some(v13Sql)),
    QueryDef("v14_semantic_dedup", v14, Some(v14Sql)),
    QueryDef("c11_semantic_contamination", c11, Some(c11Sql)),
    QueryDef("v15_pq_rerank", v15, Some(v15Sql)),
    QueryDef("v16_ivfadc", v16, Some(v16Sql)),
    QueryDef("v17_truncated_rerank", v17, Some(v17Sql)),
    QueryDef("v18_binary_hamming_rerank", v18, Some(v18Sql)),
    // served ≡ inline: v19 grades against v18's oracle verbatim
    QueryDef("v19_served_binary_probe", v19, Some(v18Sql)),
    QueryDef("v20_binary_recall_audit", v20, Some(v20Sql)),
    QueryDef("v21_ivf_binary_ann", v21, Some(v21Sql)),
    QueryDef("v22_ivf_binary_recall", v22, Some(v22Sql)),
    QueryDef("v23_ivfadc_recall", v23, Some(v23Sql)),
    QueryDef("v24_stale_centroid_recall", v24, Some(v24Sql)),
    QueryDef("v25_stale_codebook_recall", v25, Some(v25Sql)),
    // served ≡ inline: v26 grades against v11's oracle verbatim
    QueryDef("v26_served_pq_codes", v26, Some(v11Sql)),
    // served ≡ inline: v27 grades against v04's oracle verbatim
    QueryDef("v27_served_ivf_lists", v27, Some(v04Sql)),
    QueryDef("v28_nprobe_sweep", v28, Some(v28Sql)),
    QueryDef("v29_filtered_ann", v29, Some(v29Sql)),
    QueryDef("v30_knn_graph", v30, Some(v30Sql)),
    QueryDef("v31_density_prune", v31, Some(v31Sql)),
    // v31's oracle verbatim: served graph ≡ inline graph
    QueryDef("v32_served_knn_consumer", v32, Some(v31Sql)))
}
