package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the similarity-search family (v01-v05) on sf0.001. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("v05 pairs stay within one LSH bucket, ordered, above threshold") {
    val pairs = run("v05_lsh_neardup").cache()
    assert(pairs.count() > 0)
    assert(pairs.where(col("vec_a") >= col("vec_b")).count() == 0)
    assert(pairs.where(col("cosine_r") < 0.25).count() == 0)
    // the reported bucket is both members' v03 bucket
    val buckets = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.operators.Similarity.lshBucket(col("embedding")).as("bk"))
    val joined = pairs
      .join(buckets.select(col("vec_id").as("vec_a"), col("bk").as("bk_a")), Seq("vec_a"))
      .join(buckets.select(col("vec_id").as("vec_b"), col("bk").as("bk_b")), Seq("vec_b"))
    assert(joined.where(col("bucket") =!= col("bk_a")
      || col("bucket") =!= col("bk_b")).count() == 0)
    pairs.unpersist()
  }

  test("v01 top-k: 10 ranked neighbors per query, cosine in [-1,1] descending") {
    val rows = run("v01_cosine_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val ordered = rs.sortBy(_.getAs[Long]("rk"))
      val cosines = ordered.map(_.getAs[Double]("cosine_r"))
      assert(cosines.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      // never returns the query itself
      assert(ordered.forall(r => r.getAs[Long]("c_id") != r.getAs[Long]("q_id")))
    }
  }

  test("v02 near-dup pairs stay within their label block, above threshold") {
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val pairs = run("v02_embedding_neardup")
    assert(pairs.where(col("cosine_r") < 0.25).count() == 0)
    val mismatch = pairs
      .join(e.toDF("vec_a", "label_a"), Seq("vec_a"))
      .join(e.toDF("vec_b", "label_b"), Seq("vec_b"))
      .where(col("label_a") =!= col("label_b") || col("label") =!= col("label_a"))
    assert(mismatch.count() == 0)
  }

  test("v02 hot-label cap: a degenerate block is dropped, healthy blocks kept") {
    import spark.implicits._
    import graft.operators.Similarity
    // 20 vectors on one hot label (190 would-be pairs) + 3 on a healthy
    // one; identical embeddings so every surviving pair passes threshold
    val rows =
      (1L to 20L).map(i => (i, "hot", Array(1.0f, 0.0f))) ++
      (21L to 23L).map(i => (i, "ok", Array(0.0f, 1.0f)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val capped = Similarity.neardupPairs(emb, 0.25, maxBlock = 10).collect()
    // hot block dropped entirely, ok block's 3 pairs intact
    assert(capped.forall(_.getAs[String]("label") == "ok"))
    assert(capped.length == 3)
    // with the cap above both block sizes, the hot pairs come back
    val uncapped = Similarity.neardupPairs(emb, 0.25, maxBlock = 100)
    assert(uncapped.count() == 190 + 3)
    // default cap is non-binding on the test corpus: v02 ≡ uncapped there
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
    assert(Similarity.neardupPairs(e, 0.25).count() ==
      Similarity.neardupPairs(e, 0.25, maxBlock = Int.MaxValue).count())
  }

  test("v03 buckets: 8-bit ids, vector counts total to table size") {
    val df = run("v03_lsh_buckets")
    assert(df.where(col("bucket") < 0 || col("bucket") > 255).count() == 0)
    val total = df.agg(sum("n_vectors")).head().getLong(0)
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(total == n)
  }

  test("v06 quantized top-k: int8 range, exact integer dots, high recall vs v01") {
    val rows = run("v06_quantized_topk").cache()
    // per-query shape: k=10, dense ranks
    val byQ = rows.collect().groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      assert(rs.length == 10)
      assert(rs.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 10L))
    }
    // integer dot bound: |dot| <= 127^2 * dim
    val dim = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(rows.where(abs(col("dot_q")) > 127L * 127L * dim).count() == 0)
    // int8 quantization is a mild perturbation: the quantized top-10 must
    // substantially agree with the exact float top-10 (v01)
    val exact = run("v01_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val quant = rows.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val overlap = (exact & quant).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized/exact top-k overlap only $overlap")
    rows.unpersist()
  }

  test("v08 recall audit equals driver-side overlap of the v01/v06 sets") {
    val audit = run("v08_recall_audit").collect()
    val exact = run("v01_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
    val quant = run("v06_quantized_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val want = exact.groupBy(_._1).map { case (q, s) =>
      val n = s.size.toLong
      val ov = s.count(quant.contains).toLong
      q -> ((n, ov, ov * 1000000L / n))
    }
    val got = audit.map(r => r.getAs[Long]("q_id") ->
      ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_overlap"),
        r.getAs[Long]("recall_ppm")))).toMap
    assert(got == want)
    // one row per sampled query, and recall is genuinely high here (the
    // v06 spec already requires >= 0.8 aggregate overlap)
    assert(audit.length == want.size && audit.length == 5)
    assert(got.values.forall(_._3 >= 500000L))
  }

  test("v07 rescore: v02's pair set with exact token-set Jaccard attached") {
    val v02Pairs = run("v02_embedding_neardup").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val rows = run("v07_hybrid_rescore").collect()
    assert(rows.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      == v02Pairs)
    // the lexical leg recomputed driver-side for every pair
    val toksets = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        r.getLong(0) ->
          "[^a-z0-9]+".r.split(r.getString(1).toLowerCase).filter(_.nonEmpty).toSet
      }.toMap
    rows.foreach { r =>
      val (a, b) = (toksets(r.getAs[Long]("vec_a")), toksets(r.getAs[Long]("vec_b")))
      assert(r.getAs[Long]("n_common") == (a & b).size.toLong)
      assert(r.getAs[Long]("n_union") == (a | b).size.toLong)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  /** Driver-side mirror of Similarity's deterministic integer k-means:
    * quantize to floor(x·1024 + 0.5), assign by cosine (ties to smaller
    * cent_id), update = elementwise integer sum (cosine is
    * scale-invariant, so the un-divided sum is the centroid). */
  private def quantize(v: Array[Float]): Array[Double] =
    v.map(x => math.floor(x.toDouble * 1024.0 + 0.5))

  private def cosD(a: Array[Double], b: Array[Double]): Double = {
    var (s, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    s / (math.sqrt(na) * math.sqrt(nb))
  }

  private def trainIvfDriver(
      emb: Array[(Long, Array[Double])], k: Int, iters: Int): Array[(Long, Array[Double])] = {
    var cents = emb.filter(_._1 < k).sortBy(_._1)
    for (_ <- 0 until iters) {
      val assigned = emb.map { case (_, q) =>
        (cents.map { case (cid, c) => (cid, cosD(q, c)) }
          .sortBy { case (cid, c) => (-c, cid) }.head._1, q)
      }
      cents = cents.map { case (cid, old) =>
        val mem = assigned.filter(_._1 == cid).map(_._2)
        (cid, if (mem.isEmpty) old
              else mem.transpose.map(_.sum).toArray)
      }
    }
    cents
  }

  test("v10 balance audit: counts partition the table, margins match brute force") {
    val rows = run("v10_index_balance").collect()
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1).toArray))
    val cents = trainIvfDriver(emb, 8, 2)
    val assigned = emb.map { case (id, v) =>
      val scored = cents.map { case (cid, cv) => (cid, cosD(v, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }
      (id, scored(0)._1, scored(0)._2 - scored(1)._2)
    }
    val byCluster = assigned.groupBy(_._2)
    assert(rows.map(_.getAs[Long]("n_members")).sum == emb.length.toLong)
    rows.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val members = byCluster(cid)
      assert(r.getAs[Long]("n_members") == members.length.toLong)
      assert(math.abs(r.getAs[Double]("min_margin_r") - members.map(_._3).min) < 1e-5)
      assert(math.abs(r.getAs[Double]("max_margin_r") - members.map(_._3).max) < 1e-5)
      assert(r.getAs[Double]("min_margin_r") >= 0.0)
    }
  }

  test("v11 PQ: codes, LUTs, and ADC ranking match a driver-side recompute") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (m, dim, k) = (4, 16, 8)
    def sub(v: Array[Float], mi: Int): Array[Double] =
      v.slice(mi * dim, (mi + 1) * dim).map(_.toDouble)
    def sqD(a: Array[Double], b: Array[Double]): Double = {
      var (s, i) = (0.0, 0)
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // driver-side mirror of trainPqCodebook: L2 Lloyd in integer space
    // against the rational centroid s/n, de-quantized codebook s/(n·1024)
    def trainSub(mi: Int): Array[(Long, Array[Double])] = {
      val subsQ = emb.map { case (id, v) =>
        id -> sub(v, mi).map(x => math.floor(x * 1024.0 + 0.5))
      }
      var state = subsQ.filter(_._1 < k).sortBy(_._1)
        .map { case (cid, s0) => (cid, s0, 1L) }
      for (_ <- 0 until 2) {
        val assigned = subsQ.map { case (_, x) =>
          (state.map { case (cid, s0, n) =>
            val scaled = x.indices.map(i => { val d = n * x(i) - s0(i); d * d }).sum
            (scaled / (n.toDouble * n), cid)
          }.minBy(identity)._2, x)
        }
        state = state.map { case (cid, s0, n) =>
          val mem = assigned.filter(_._1 == cid).map(_._2)
          if (mem.isEmpty) (cid, s0, n)
          else (cid, mem.transpose.map(_.sum).toArray, mem.length.toLong)
        }
      }
      state.map { case (cid, s0, n) => (cid, s0.map(_ / (n * 1024.0))) }
    }
    val cbs = (0 until m).map(trainSub)
    def codeOf(v: Array[Float], mi: Int): Long =
      cbs(mi).map { case (cid, cv) => (sqD(sub(v, mi), cv), cid) }
        .minBy(identity)._2
    val queries = emb.filter(e => e._1 >= 100 && e._1 <= 104)
    val expected = queries.flatMap { case (qid, qv) =>
      val lut = (0 until m).map(mi =>
        cbs(mi).map { case (cid, cv) => cid -> sqD(sub(qv, mi), cv) }.toMap)
      emb.filter(_._1 != qid).map { case (cid, cv) =>
        val adist = (0 until m).map(mi => lut(mi)(codeOf(cv, mi))).sum
        (qid, cid, adist)
      }.sortBy(e => (e._3, e._2)).take(5).zipWithIndex
        .map { case ((q, c, d), i) => (q, c, i + 1L) -> d }
    }.toMap
    val got = run("v11_pq_ann").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Long]("rk"))
      val want = expected.get(key)
      assert(want.isDefined, s"unexpected row $key")
      assert(math.abs(r.getAs[Double]("adist_r") - want.get) < 1e-6)
    }
  }

  test("v13 IVF recall audit: driver-side overlap of v09 vs exact cosine") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val exact = emb.filter(e => e._1 >= 100 && e._1 <= 104).map { case (q, qv) =>
      q -> emb.filter(_._1 != q).map { case (c, cv) => (-cosD(qv, cv), c) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    val approx = run("v09_multiprobe_ivf").collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val got = run("v13_ivf_recall").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val overlap = (exact(q) & approx(q)).size.toLong
      assert(r.getAs[Long]("n_exact") == 5L)
      assert(r.getAs[Long]("n_overlap") == overlap)
      assert(r.getAs[Long]("recall_ppm") == overlap * 1000000L / 5L)
    }
  }

  test("v12 PQ recall equals the driver-side set overlap of v11 vs exact L2") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var (s, i) = (0.0, 0)
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val exact = emb.filter(e => e._1 >= 100 && e._1 <= 104).map { case (q, qv) =>
      q -> emb.filter(_._1 != q).map { case (c, cv) => (sq(qv, cv), c) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    val approx = run("v11_pq_ann").collect()
      .groupBy(_.getAs[Long]("q_id")).view
      .mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val got = run("v12_pq_recall").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val overlap = (exact(q) & approx(q)).size.toLong
      assert(r.getAs[Long]("n_exact") == 5L)
      assert(r.getAs[Long]("n_overlap") == overlap)
      assert(r.getAs[Long]("recall_ppm") == overlap * 1000000L / 5L)
    }
  }

  test("v09 multi-probe dominates v04 rank-for-rank, probes <= NProbe clusters") {
    def byQuery(name: String) = run(name).collect()
      .groupBy(_.getAs[Long]("q_id")).view.mapValues(
        _.sortBy(_.getAs[Long]("rk"))).toMap
    val v4 = byQuery("v04_ivf_ann")
    val v9 = byQuery("v09_multiprobe_ivf")
    assert(v9.keySet == v4.keySet && v9.nonEmpty)
    v9.foreach { case (q, rows9) =>
      val rows4 = v4(q)
      // widening the probe set can only improve (or tie) each rank
      rows4.zip(rows9).foreach { case (r4, r9) =>
        assert(r9.getAs[Double]("cosine_r") >= r4.getAs[Double]("cosine_r"),
          s"q=$q rank ${r4.getAs[Long]("rk")} regressed")
      }
      // candidates come from at most NProbe clusters, incl. v04's own
      val clusters9 = rows9.map(_.getAs[Long]("cluster_id")).toSet
      assert(clusters9.size <= graft.operators.Similarity.NProbe)
      // v04's single probe is always v09's first probe: its whole result
      // set must reappear unless displaced by a better cross-boundary hit
      val set4 = rows4.map(_.getAs[Long]("c_id")).toSet
      val set9 = rows9.map(_.getAs[Long]("c_id")).toSet
      val displaced = set4 -- set9
      val floor9 = rows9.map(_.getAs[Double]("cosine_r")).min
      rows4.filter(r => displaced(r.getAs[Long]("c_id"))).foreach { r =>
        assert(r.getAs[Double]("cosine_r") <= floor9)
      }
    }
  }

  test("v15 rerank: exact distances ascending, recall@5 >= raw ADC's") {
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val rer = SparkEntry.queries("v15_pq_rerank")(spark, dir).collect()
    val adc = SparkEntry.queries("v11_pq_ann")(spark, dir).collect()
    val queries = rer.map(_.getAs[Long]("q_id")).distinct.sorted
    assert(queries.toSeq == Seq(100L, 101L, 102L, 103L, 104L))
    var rRecall = 0; var aRecall = 0
    queries.foreach { q =>
      val mine = rer.filter(_.getAs[Long]("q_id") == q)
      assert(mine.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 5L))
      // reported distances are the true exact distances, ascending
      val ds = mine.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("dist_r"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      mine.foreach { r =>
        val truth = sq(e(q), e(r.getAs[Long]("c_id")))
        assert(math.abs(r.getAs[Double]("dist_r") - truth) < 1e-4)
      }
      // pooled recall@5 vs the exact top-5: rerank must not lose to ADC
      val exact5 = e.keys.filter(_ != q).toSeq
        .map(id => (id, sq(e(q), e(id)))).sortBy { case (id, d) => (d, id) }
        .take(5).map(_._1).toSet
      rRecall += mine.count(r => exact5(r.getAs[Long]("c_id")))
      aRecall += adc.filter(_.getAs[Long]("q_id") == q)
        .count(r => exact5(r.getAs[Long]("c_id")))
    }
    assert(rRecall >= aRecall,
      s"rerank recall $rRecall fell below ADC recall $aRecall")
  }

  test("v16 IVFADC: candidates confined to the query's cluster, ADC order kept") {
    val out = SparkEntry.queries("v16_ivfadc")(spark, dir).collect()
    // cluster membership oracle: v14's assignment (same trained IVF)
    val assign = SparkEntry.queries("v14_semantic_dedup")(spark, dir)
      .select(col("vec_id"), col("cent_id")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(100L, 101L, 102L, 103L, 104L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length.toLong))
      rows.foreach { r =>
        // the inverted-list contract: candidate and query share a cluster
        assert(r.getAs[Long]("cent_id") == assign(q))
        assert(assign(r.getAs[Long]("c_id")) == assign(q))
        assert(r.getAs[Long]("c_id") != q)
      }
      // ADC distances ascend with rank
      val ds = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("adist_r"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // pruning consistency vs the unrestricted ADC scan: any v11 top-5
    // hit that lives in the query's own cluster must reappear in v16
    // with the same approximate distance
    val v11 = SparkEntry.queries("v11_pq_ann")(spark, dir).collect()
    v11.foreach { r =>
      val q = r.getAs[Long]("q_id"); val c = r.getAs[Long]("c_id")
      if (assign(c) == assign(q)) {
        val hit = out.find(o => o.getAs[Long]("q_id") == q
          && o.getAs[Long]("c_id") == c)
        assert(hit.isDefined, s"in-cluster v11 hit ($q,$c) missing from v16")
        assert(math.abs(hit.get.getAs[Double]("adist_r")
          - r.getAs[Double]("adist_r")) < 1e-9)
      }
    }
  }

  test("c11 semantic contamination: eval-only, train matches, argmax per cluster") {
    val out = SparkEntry.queries("c11_semantic_contamination")(spark, dir)
      .collect()
    assert(out.nonEmpty, "tau must flag some eval docs at sf0.001")
    def splitOf(id: Long): String = {
      val bucket = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"split:$id")
          .substring(0, 15), 16) % 100L
      if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
    }
    out.foreach { r =>
      val evalId = r.getAs[Long]("vec_id")
      assert(r.getAs[String]("split") == splitOf(evalId))
      assert(r.getAs[String]("split") != "train")
      assert(splitOf(r.getAs[Long]("train_id")) == "train")
      assert(r.getAs[Double]("cosine_r") >= 0.3 - 1e-6)
    }
    // brute-force the winner for each flagged eval doc: among all train
    // vectors in the same cluster, the reported train_id must carry the
    // maximum cosine (ties broken by smaller id)
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val clusterOf = out.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    // cluster membership from v14's assignment (arn=1), same plan c11 uses
    val assign = SparkEntry.queries("v14_semantic_dedup")(spark, dir)
      .select(col("vec_id"), col("cent_id")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    out.foreach { r =>
      val evalId = r.getAs[Long]("vec_id")
      val cid = clusterOf(evalId)
      assert(assign(evalId) == cid, s"cluster mismatch for $evalId")
      val trains = assign.collect {
        case (id, c) if c == cid && splitOf(id) == "train" => id
      }
      val best = trains
        .map(id => (id, cos(e(evalId), e(id))))
        .filter(_._2 >= 0.3)
        .minBy { case (id, c) => (-c, id) }
      assert(best._1 == r.getAs[Long]("train_id"),
        s"eval $evalId: expected train ${best._1}, got ${r.getAs[Long]("train_id")}")
    }
  }

  test("v17 truncated rerank: grain, order, audit flags consistent with v01") {
    val out = run("v17_truncated_rerank").collect()
    assert(out.length == 50)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L to 4L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 10L))
      // full-dim rerank order: rounded cosine non-increasing with rk
      val byRk = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine_r"))
      byRk.zip(byRk.tail).foreach { case (a, b) => assert(a >= b) }
      // every served row came from the prefix shortlist
      assert(rows.forall(_.getAs[Long]("pre_rk") <= 50L))
      // sample rate is published on every row
      assert(rows.forall(_.getAs[Long]("audit_sample_ppm") == 500000L))
      if (rows.head.getAs[Long]("audited") == 1L) {
        // the prefix deliberately loses some of the exact top-10 per query
        val hits = rows.map(_.getAs[Long]("in_exact")).sum
        assert(hits >= 1L && hits < 10L,
          s"in_exact must split (prefix loss visible), got $hits/10")
      } else {
        // unaudited query: in_exact is unknown, not "missed"
        assert(rows.forall(r => r.isNullAt(r.fieldIndex("in_exact"))))
      }
    }
    // the md5 sample must leave both audited and unaudited queries at sf
    val auditedByQ = byQ.map { case (q, rows) => q -> rows.head.getAs[Long]("audited") }
    assert(auditedByQ.values.toSet == Set(0L, 1L), s"sample degenerate: $auditedByQ")
    // in_exact agrees with v01's exact top-10 pair set row-for-row on the
    // audited sample
    val exact = run("v01_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    out.filter(_.getAs[Long]("audited") == 1L).foreach { r =>
      val hit = exact.contains((r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
      assert(r.getAs[Long]("in_exact") == (if (hit) 1L else 0L))
    }
  }

  test("v19 served sketch probe equals inline v18; plan never re-extracts signs") {
    val served = run("v19_served_binary_probe").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"), r.getAs[Long]("c_id"),
        r.getAs[Double]("cosine_r"), r.getAs[Long]("ham"), r.getAs[Long]("ham_rk")))
      .toSeq.sorted
    val inline = run("v18_binary_hamming_rerank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rk"), r.getAs[Long]("c_id"),
        r.getAs[Double]("cosine_r"), r.getAs[Long]("ham"), r.getAs[Long]("ham_rk")))
      .toSeq.sorted
    assert(served == inline)
    // the served plan scans the published sketch table — no sign-word
    // extraction arithmetic may appear anywhere in it
    val plan = run("v19_served_binary_probe").queryExecution.executedPlan.toString
    assert(!plan.contains("shiftleft"), s"v19 recomputes sketches:\n$plan")
  }

  test("v20 binary recall audit: rerank recall dominates raw, agrees with v01/v18") {
    val out = run("v20_binary_recall_audit").collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("q_id")).toSet == (0L to 4L).toSet)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 10L)
      // the invariant the audit exists to certify: the exact rerank can
      // only recover exact-top-10 members the raw Hamming cut lost
      // (raw-top-10 ⊆ shortlist, and shortlist∩exact out-ranks the rest)
      assert(r.getAs[Long]("recall_rerank_ppm") >= r.getAs[Long]("recall_raw_ppm"),
        s"q${r.getAs[Long]("q_id")}: rerank recall below raw")
      assert(r.getAs[Long]("recall_raw_ppm") ==
        r.getAs[Long]("n_raw_overlap") * 1000000L / 10L)
      assert(r.getAs[Long]("recall_rerank_ppm") ==
        r.getAs[Long]("n_rerank_overlap") * 1000000L / 10L)
    }
    // rerank overlap recomputed from the graded v01 and v18 outputs: v18's
    // served top-10 IS the reranked set, so |v18 ∩ v01| per query must
    // equal the audit's n_rerank_overlap
    val exact = run("v01_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val rerank = run("v18_binary_hamming_rerank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
    val byQ = rerank.filter(exact.contains).groupBy(_._1).view.mapValues(_.length.toLong)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("n_rerank_overlap") == byQ.getOrElse(q, 0L),
        s"q$q: audit overlap disagrees with v18∩v01")
    }
  }

  test("v21 IVF-pruned binary ANN: cluster-confined, rerank-ordered, bounded") {
    val out = run("v21_ivf_binary_ann").collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L to 4L).toSet)
    // the graded v14 output IS the trained assignment (vec_id → cent_id)
    val assign = run("v14_semantic_dedup").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    byQ.foreach { case (qid, rows) =>
      val cent = assign(qid)
      assert(rows.forall(_.getAs[Long]("cent_id") == cent))
      // stage-0 pruning is real: every candidate sits in the query's own
      // inverted list
      rows.foreach(r => assert(assign(r.getAs[Long]("c_id")) == cent,
        s"q$qid: candidate ${r.getAs[Long]("c_id")} escaped the cluster"))
      val ordered = rows.sortBy(_.getAs[Long]("rk"))
      assert(ordered.map(_.getAs[Long]("rk")).toSeq ==
        (1L to rows.length.toLong))
      val cos = ordered.map(_.getAs[Double]("cosine_r"))
      cos.zip(cos.tail).foreach { case (a, b) => assert(a >= b) }
      assert(rows.forall(r => r.getAs[Long]("ham") >= 0L &&
        r.getAs[Long]("ham") <= 64L))
      assert(rows.forall(r => r.getAs[Long]("ham_rk") >= 1L &&
        r.getAs[Long]("ham_rk") <= 50L))
    }
  }

  test("v22 composed-tier recall: ceiling dominates, decomposition is exact") {
    val out = run("v22_ivf_binary_recall").collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("q_id")).toSet == (0L to 4L).toSet)
    // v21's graded output and v01's exact top-10 recompute the audit's
    // overlap; v14's graded assignment recomputes the cell sizes
    val exact = run("v01_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val approx = run("v21_ivf_binary_ann").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
    val assign = run("v14_semantic_dedup").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cent_id")).toMap
    val cellSize = assign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val apprOv = approx.filter(exact.contains).groupBy(_._1)
      .view.mapValues(_.length.toLong)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("n_exact") == 10L)
      // cell size = the query's inverted list minus the query itself
      assert(r.getAs[Long]("n_cell") == cellSize(assign(q)) - 1L,
        s"q$q: n_cell disagrees with v14's assignment")
      // the audit's overlap must equal |v21 ∩ v01| recomputed from the
      // graded outputs themselves
      assert(r.getAs[Long]("n_overlap") == apprOv.getOrElse(q, 0L),
        s"q$q: n_overlap disagrees with v21∩v01")
      // structural: v21's candidates never leave the cell, so its recall
      // can never exceed what IVF pruning left reachable
      assert(r.getAs[Long]("recall_ppm") <= r.getAs[Long]("cell_ceiling_ppm"),
        s"q$q: recall above the IVF ceiling")
      // when the whole cell fits in the Hamming shortlist the rerank is
      // exhaustive over the reachable set: recall IS the ceiling
      if (r.getAs[Long]("n_cell") <= 50L)
        assert(r.getAs[Long]("recall_ppm") == r.getAs[Long]("cell_ceiling_ppm"),
          s"q$q: exhaustive rerank below its ceiling")
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_overlap") * 1000000L / 10L)
      assert(r.getAs[Long]("cell_ceiling_ppm") ==
        r.getAs[Long]("n_cell_overlap") * 1000000L / 10L)
    }
  }

  test("v23 IVFADC recall: ceiling dominates, overlap ties to v16 and v12") {
    val out = run("v23_ivfadc_recall").collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("q_id")).toSet == (100L to 104L).toSet)
    // the audit's overlap recomputed from the graded v16 output against
    // v12's exact-L2 machinery: v12 already grades v11 vs the same exact
    // set, so exact∩v16 per query is reconstructible from graded outputs
    val approx = run("v16_ivfadc").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id")))
    // exact L2 top-5 recomputed driver-side (the v12 spec's technique)
    val embs = graft.sources.Tables.load(spark, dir, "embeddings")
      .collect().map { r =>
        r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding"))
      }.toMap
    def d2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val exact = (100L to 104L).flatMap { qid =>
      embs.keys.filter(_ != qid).toSeq
        .map(c => (d2(embs(qid), embs(c)), c)).sorted.take(5)
        .map { case (_, c) => (qid, c) }
    }.toSet
    val apprOv = approx.filter(exact.contains).groupBy(_._1)
      .view.mapValues(_.length.toLong)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("n_exact") == 5L)
      assert(r.getAs[Long]("n_overlap") == apprOv.getOrElse(q, 0L),
        s"q$q: n_overlap disagrees with v16∩exact")
      // structural: v16's candidates never leave the cell
      assert(r.getAs[Long]("recall_ppm") <= r.getAs[Long]("cell_ceiling_ppm"),
        s"q$q: recall above the IVF ceiling")
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_overlap") * 1000000L / 5L)
      assert(r.getAs[Long]("cell_ceiling_ppm") ==
        r.getAs[Long]("n_cell_overlap") * 1000000L / 5L)
      assert(r.getAs[Long]("n_cell_overlap") <= r.getAs[Long]("n_cell"))
    }
  }

  test("v18 binary sketch: hamming matches a driver-side sign recompute") {
    val out = run("v18_binary_hamming_rerank").collect()
    assert(out.length == 50)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (0L to 4L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 10L))
      val byRk = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine_r"))
      byRk.zip(byRk.tail).foreach { case (a, b) => assert(a >= b) }
      assert(rows.forall(r => r.getAs[Long]("ham_rk") >= 1L &&
        r.getAs[Long]("ham_rk") <= 50L))
    }
    // recompute every served pair's sign sketch + Hamming in pure Scala
    val embs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "embeddings")
      .collect().map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding"))
        val sketch = v.zipWithIndex.collect { case (x, i) if x > 0 => i }.toSet
        r.getAs[Long]("vec_id") -> sketch
      }.toMap
    out.foreach { r =>
      val a = embs(r.getAs[Long]("q_id"))
      val b = embs(r.getAs[Long]("c_id"))
      val ham = (a.diff(b) ++ b.diff(a)).size.toLong
      assert(r.getAs[Long]("ham") == ham,
        s"(${r.getAs[Long]("q_id")},${r.getAs[Long]("c_id")}): " +
          s"ham ${r.getAs[Long]("ham")} != recomputed $ham")
      assert(ham >= 0L && ham <= 64L)
    }
  }

  test("v24 incremental append: base∪delta under frozen centroids ≡ full assign") {
    import graft.operators.Similarity
    val cents = Similarity.staleCentroids(spark, dir)
    val delta = Similarity.isDelta(col("vec_id"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cent_id"), col("cent_cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the append primitive: assign ONLY the delta slice against the
    // frozen quantizer, union with the already-assigned base — must be
    // row-for-row the same index as assigning the grown corpus whole
    val base  = Similarity.assignWithCentroids(spark, dir, cents, !delta)
    val grown = Similarity.assignWithCentroids(spark, dir, cents, delta)
    val full  = Similarity.assignWithCentroids(spark, dir, cents, lit(true))
    val unioned = key(base) ++ key(grown)
    assert(key(base).nonEmpty && key(grown).nonEmpty)
    assert(unioned == key(full),
      "incremental union diverged from whole-corpus assignment")
    // every corpus vector is in the served index exactly once
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(unioned.size.toLong == n)
  }

  test("v24 stale audit: quantizer differs from fresh, grades are consistent") {
    import graft.operators.Similarity
    // non-vacuous: base-trained centroids must differ from full-corpus
    // ones (the delta actually moved the training distribution) …
    val stale = Similarity.staleCentroids(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val fresh = Similarity.servedCentroids(spark, dir)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(stale.keySet == fresh.keySet)
    assert(stale.exists { case (k, v) => fresh(k) != v },
      "stale and fresh centroids identical — the audit measures nothing")
    // … and the graded output is internally consistent
    val out = run("v24_stale_centroid_recall").collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 5L)
      assert(r.getAs[Long]("recall_ppm") == ov * 1000000L / 5L)
      val d = r.getAs[Long]("n_delta_exact")
      assert(d >= 0L && d <= 5L)
    }
    // the scenario is real at this SF: some true top-5 neighbor is a
    // post-training arrival for at least one query
    assert(out.map(_.getAs[Long]("n_delta_exact")).sum > 0L)
  }

  test("v25 stale PQ audit: codebook differs from fresh, grades are consistent") {
    import graft.operators.Similarity
    // the base-trained codebook must actually differ from the
    // full-corpus one, else the audit measures nothing
    def cb(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2))).toMap
    val stale = cb(Similarity.stalePqCodebook(spark, dir))
    val fresh = cb(Similarity.servedPqCodebook(spark, dir))
    assert(stale.keySet == fresh.keySet)
    assert(stale.exists { case (k, v) => fresh(k) != v },
      "stale and fresh PQ codebooks identical — the audit measures nothing")
    val out = run("v25_stale_codebook_recall").collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 5L)
      assert(r.getAs[Long]("recall_ppm") == ov * 1000000L / 5L)
      val d = r.getAs[Long]("n_delta_exact")
      assert(d >= 0L && d <= 5L)
    }
    // the growth scenario is real here too: some exact-L2 top-5
    // neighbor is a post-training arrival for at least one query
    assert(out.map(_.getAs[Long]("n_delta_exact")).sum > 0L)
  }

  test("v26 served PQ codes equal inline v11; serving plan never re-encodes") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Double]("adist_r"), r.getAs[Long]("rk"))).toSeq
    // served ≡ inline, row for row
    assert(rows("v26_served_pq_codes") == rows("v11_pq_ann"))
    val served = run("v26_served_pq_codes")
    val plan = served.queryExecution.executedPlan.toString
    // the candidate path scans the published 4-BIGINT code rows …
    assert(plan.contains("pq_codes"), s"served codes not scanned:\n$plan")
    // … and the plan contains NO code election (the partial_max pivot
    // that encodes the corpus) — encoding happened once at publish time
    assert(!plan.contains("partial_max"),
      s"serving plan re-encodes the corpus:\n$plan")
  }

  test("v27 served IVF lists equal inline v04; serving plan never re-assigns") {
    def rows(name: String) = run(name).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Double]("cosine_r"),
        r.getAs[Long]("rk"))).toSeq
    assert(rows("v27_served_ivf_lists") == rows("v04_ivf_ann"))
    val plan = run("v27_served_ivf_lists").queryExecution.executedPlan.toString
    // candidate path scans the published 3-BIGINT assignment rows …
    assert(plan.contains("ivf_assignment"), s"served lists not scanned:\n$plan")
    // … with zero assignment arithmetic: no centroid-cosine ranking
    // (cent_cos) anywhere in the serving plan
    assert(!plan.contains("cent_cos"),
      s"serving plan re-ranks centroids:\n$plan")
  }

  test("v28: sweep is monotone in nprobe and its production point matches v13") {
    val rows = SparkEntry.queries("v28_nprobe_sweep")(spark, SharedSpark.sf0001)
      .collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    // probe sets nest, so candidates and recall are monotone — a broken
    // probe-list filter (e.g. arn == p instead of arn <= p) fails here
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_candidates") < b.getAs[Long]("n_candidates"),
        "candidate volume not growing with nprobe")
      assert(a.getAs[Long]("recall_ppm") <= b.getAs[Long]("recall_ppm"),
        "recall not monotone in nprobe — probe sets failed to nest")
    }
    // the nprobe=2 row aggregates exactly v13's graded per-query audit
    val v13 = SparkEntry.queries("v13_ivf_recall")(spark, SharedSpark.sf0001)
      .collect()
    val p2 = rows.find(_.getAs[Long]("nprobe") == 2L).get
    assert(p2.getAs[Long]("n_overlap") == v13.map(_.getAs[Long]("n_overlap")).sum)
    assert(p2.getAs[Long]("n_exact") == v13.map(_.getAs[Long]("n_exact")).sum)
  }

  test("v29: every hit satisfies the filter, and post-filtering would have starved") {
    val rows = SparkEntry.queries("v29_filtered_ann")(spark, SharedSpark.sf0001)
      .collect()
    assert(rows.length == 25, s"expected 5 queries × top-5, got ${rows.length}")
    val allowed = Set(2, 7)
    rows.foreach(r => assert(allowed(r.getAs[Int]("label")),
      s"candidate ${r.getAs[Long]("c_id")} violates the label filter"))
    // the lesson pre-filtering exists for: filtering the UNFILTERED
    // top-5 after the fact keeps only the few matching rows that
    // happened to rank — far fewer than the filtered search returns
    val post = SparkEntry.queries("v09_multiprobe_ivf")(spark, SharedSpark.sf0001)
      .join(graft.sources.Tables.load(spark, SharedSpark.sf0001, "embeddings")
        .select(org.apache.spark.sql.functions.col("vec_id").as("c_id"),
          org.apache.spark.sql.functions.col("label")), Seq("c_id"))
      .where(org.apache.spark.sql.functions.col("label").isin(2, 7))
      .count()
    assert(post < rows.length,
      s"post-filter kept $post rows — starvation demo degenerate")
  }

  test("v30: full coverage — every vector gets a dense top-3, neighbors reciprocal-sane") {
    val rows = SparkEntry.queries("v30_knn_graph")(spark, SharedSpark.sf0001)
      .collect()
    val corpus = graft.sources.Tables.load(spark, SharedSpark.sf0001, "embeddings").count()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    // every vector is a node (cells have ≥ k+1 members at graded SFs)
    assert(byQ.size == corpus, s"graph covers ${byQ.size} of $corpus vectors")
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L))
      // ranks are by descending cosine
      val cs = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine_r"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // no self-edges
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("c_id")))
  }

  test("v31: pruned set is the true bottom-50 of v30's densities, top-k plan") {
    val knn = SparkEntry.queries("v30_knn_graph")(spark, SharedSpark.sf0001)
      .collect()
    val density = knn.groupBy(_.getAs[Long]("q_id")).map { case (q, rs) =>
      q -> rs.map(r => math.round(r.getAs[Double]("cosine_r") * 1e6)).sum
    }
    val wantBottom = density.toSeq.sortBy { case (q, d) => (d, q) }.take(50)
    val got = SparkEntry.queries("v31_density_prune")(spark, SharedSpark.sf0001)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("density_ppm3")))
    assert(got.toSeq == wantBottom, "pruned set is not the bottom-50 by density")
    // scale shape: the bottom-k lowers to TakeOrderedAndProject
    val p = SparkEntry.queries("v31_density_prune")(spark, SharedSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"v31 regressed to a global sort:\n$p")
  }

  test("v32: served graph consumer ≡ inline, zero embedding arithmetic at serve time") {
    val inline = SparkEntry.queries("v31_density_prune")(spark, SharedSpark.sf0001)
      .collect().toSeq
    val served = SparkEntry.queries("v32_served_knn_consumer")(spark, SharedSpark.sf0001)
      .collect().toSeq
    assert(served == inline, "served kNN consumer diverged from the inline pruning")
    val plan = SparkEntry.queries("v32_served_knn_consumer")(spark, SharedSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("knn_graph"), s"v32 not reading the served graph:\n$plan")
    // no per-pair dot-product fold, no norm, no centroid assignment —
    // consumers scan edge rows only
    assert(!plan.contains("vecdot") && !plan.toLowerCase.contains("embedding"),
      s"v32 recomputed embedding arithmetic at serve time:\n$plan")
  }
}
