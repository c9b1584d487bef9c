package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the retrieval family (r01/r02) on crafted corpora —
  * the DuckDB oracle proves value equality on testdata; these pin the
  * ranking/matching behavior on inputs designed to discriminate. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import graft.operators.Retrieval

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("r01 idf: one rare-term hit outranks many common-term hits") {
    // 'rare' appears in 1 of 4 docs (idf_ppm = 4_000_000); 'common' in
    // all 4 (idf_ppm = 1_000_000). Doc 3 has rare once (score 4M);
    // doc 1 spams common three times (score 3M).
    val docs = corpus(
      (1L, "common common common"),
      (2L, "common filler words"),
      (3L, "rare common filler"),
      (4L, "common other stuff"))
    val got = Retrieval.keywordTopK(docs, Seq("rare", "common"), 10).collect()
    assert(got.head.getAs[Long]("doc_id") == 3L)
    assert(got.head.getAs[Long]("score") == 4000000L + 1000000L)
    assert(got.head.getAs[Long]("n_terms_matched") == 2L)
    val doc1 = got.find(_.getAs[Long]("doc_id") == 1L).get
    assert(doc1.getAs[Long]("score") == 3000000L)
    // rk is dense 1..n and consistent with (score desc, doc_id) order
    assert(got.map(_.getAs[Long]("rk")).toSeq == (1L to got.length).toSeq)
    assert(got.sliding(2).forall {
      case Array(a, b) =>
        a.getAs[Long]("score") > b.getAs[Long]("score") ||
        (a.getAs[Long]("score") == b.getAs[Long]("score") &&
          a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"))
      case _ => true
    })
  }

  test("r01 limit k and docs without any query term are absent") {
    val docs = corpus(
      (1L, "alpha beta"), (2L, "alpha"), (3L, "beta"), (4L, "gamma only"))
    val got = Retrieval.keywordTopK(docs, Seq("alpha", "beta"), 2).collect()
    assert(got.length == 2)
    assert(!got.exists(_.getAs[Long]("doc_id") == 4L))
  }

  test("r02 phrase: consecutive-token semantics across punctuation") {
    val docs = corpus(
      (1L, "a hash join is fast"),        // 1 occurrence
      (2L, "hash, join!"),                 // tokenizer eats punctuation
      (3L, "hash table then merge join"),  // both words, not adjacent
      (4L, "join hash"),                   // wrong order
      (5L, "hash join and hash join"))     // 2 occurrences
    val got = Retrieval.phraseMatches(docs, Seq("hash", "join")).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 5L))
    val byId = got.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_occurrences") == 1L)
    assert(byId(1L).getAs[Long]("first_pos") == 1L)
    assert(byId(2L).getAs[Long]("first_pos") == 0L)
    assert(byId(5L).getAs[Long]("n_occurrences") == 2L)
  }

  test("r02 repeated-term phrase requires genuine consecutive repeats") {
    val docs = corpus(
      (1L, "go go gadget"),   // "go go" at 0
      (2L, "go stop go"))     // two 'go's, never adjacent
    val got = Retrieval.phraseMatches(docs, Seq("go", "go")).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(got.head.getAs[Long]("n_occurrences") == 1L)
  }

  test("r03 BM25: exact integer formula; saturation caps a tf-spam doc") {
    // doc 1 spams the term 10× in a 50-token doc; doc 2 mentions it once
    // in 2 tokens. r01's linear tf would score doc 1 exactly 10× doc 2;
    // BM25's saturation + length normalization keeps it under 2×.
    val docs = corpus(
      (1L, ("hash " * 10 + "filler " * 40).trim),
      (2L, "hash lookup"),
      (3L, "filler only text"))
    val got = Retrieval.bm25TopK(docs, Seq("hash"), 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    // independent reimplementation of the integer-ppm formula
    val dl = Map(1L -> 50L, 2L -> 2L)
    val tf = Map(1L -> 10L, 2L -> 1L)
    val (nDocs, nTokens) = (3L, 55L)
    val idf = nDocs * 1000000L / 2L
    def score(id: Long) = {
      val denom =
        1000000L * tf(id) + 300000L + 900000L * dl(id) * nDocs / nTokens
      idf * 2200000L * tf(id) / denom
    }
    val byId = got.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    assert(byId == Map(1L -> score(1L), 2L -> score(2L)))
    assert(byId(1L) > byId(2L) && byId(1L) < 2L * byId(2L))
  }

  test("r03 length normalization: same tf, shorter doc ranks first") {
    val docs = corpus(
      (1L, "hash " + "filler " * 48 + "end"),  // tf 1, dl 50
      (2L, "hash note"))                        // tf 1, dl 2
    val got = Retrieval.bm25TopK(docs, Seq("hash"), 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
  }

  test("r04 proximity: adjacent pair outranks distant pair, min over merge") {
    val docs = corpus(
      (1L, "sort merge join notes"),                    // gap 1
      (2L, "sort " + "x " * 9 + "merge"),               // gap 10
      (3L, "merge y sort z sort"),                      // positions m@0 s@2 s@4: gap 2
      (4L, "sort only here"),                           // one term: no match
      (5L, "merge merge merge"))                        // one term: no match
    val got = Retrieval.proximityTopK(docs, "sort", "merge", 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L, 2L))
    val byId = got.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("min_gap"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("prox_ppm"))).toMap
    assert(byId(1L) == ((1L, 1L, 1L, 1000000L)))
    assert(byId(2L) == ((10L, 1L, 1L, 100000L)))
    assert(byId(3L) == ((2L, 2L, 1L, 500000L)))
  }

  test("r04 min-gap equals the brute-force pairwise minimum on sf0.001") {
    val dir = SharedSpark.sf0001
    val got = SparkEntry.queries("r04_proximity_search")(spark, dir).collect()
    assert(got.nonEmpty)
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    val toks = graft.sources.Tables.load(spark, dir, "documents")
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got.foreach { r =>
      val t = toks(r.getAs[Long]("doc_id"))
      val as = t.zipWithIndex.collect { case ("sort", i) => i.toLong }
      val bs = t.zipWithIndex.collect { case ("merge", i) => i.toLong }
      val brute = (for (x <- as; y <- bs) yield math.abs(x - y)).min
      assert(r.getAs[Long]("min_gap") == brute)
      assert(r.getAs[Long]("n_a") == as.length.toLong)
      assert(r.getAs[Long]("n_b") == bs.length.toLong)
    }
  }

  test("r01/r02 graded queries run green on sf0.001") {
    val dir = SharedSpark.sf0001
    val r1 = SparkEntry.queries("r01_keyword_search")(spark, dir)
    assert(r1.count() > 0)
    val r2 = SparkEntry.queries("r02_phrase_search")(spark, dir)
    // every reported occurrence really contains the phrase tokens
    val ids = r2.select("doc_id").collect().map(_.getLong(0)).toSet
    val txt = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        array_join(graft.operators.TextOps.tokens(col("text")), " ").as("norm"))
      .where(col("doc_id").isin(ids.toSeq: _*))
      .collect()
    assert(txt.nonEmpty)
    txt.foreach { r =>
      val padded = " " + r.getAs[String]("norm") + " "
      assert(padded.contains(" hash join "))
    }
  }

  test("r06 query likelihood: exact integer recompute, ranks dense") {
    def ilog(x: Long): Long =
      if (x <= 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x * x)
    def pratio(cnt: Long, denom: Long): Long =
      math.floor(cnt.toDouble * 1048576.0 / denom.toDouble).toLong
    val qTerms = Seq("hash", "merge", "dup")
    val docs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
      .collect().map { r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      }.toMap
    val v = docs.values.flatten.toSet.size.toLong
    val out = SparkEntry.queries("r06_query_likelihood")(
      spark, SharedSpark.sf0001).collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to 20L))
    val scores = out.map(_.getAs[Long]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
      val dl = toks.length.toLong
      val tfs = qTerms.map(t => toks.count(_ == t).toLong)
      assert(tfs.count(_ > 0).toLong == r.getAs[Long]("n_terms_matched"))
      assert(r.getAs[Long]("n_terms_matched") > 0)
      val want = tfs.map(tf => ilog(pratio(tf + 1L, dl + v + 1L) + 1L)).sum
      assert(r.getAs[Long]("dl") == dl)
      assert(r.getAs[Long]("score") == want,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("r05 RRF: ppm formula exact, ranks dense, fused order consistent") {
    val out = SparkEntry.queries("r05_rrf_fusion")(spark, SharedSpark.sf0001)
      .collect()
    assert(out.length == 20)
    // dense fused ranks 1..20 in order
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to 20L))
    // rrf_ppm is exactly the integer reciprocal-rank sum of the two lists
    out.foreach { r =>
      val lex = Option(r.getAs[Any]("lex_rk")).map(_.asInstanceOf[Long])
      val sem = Option(r.getAs[Any]("sem_rk")).map(_.asInstanceOf[Long])
      assert(lex.nonEmpty || sem.nonEmpty)
      val want = lex.map(k => 1000000L / (60L + k)).getOrElse(0L) +
        sem.map(k => 1000000L / (60L + k)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_ppm") == want)
    }
    // fused order is (rrf_ppm desc, doc_id asc)
    val keys = out.map(r => (r.getAs[Long]("rrf_ppm"), r.getAs[Long]("doc_id")))
    keys.zip(keys.tail).foreach { case ((pa, da), (pb, db)) =>
      assert(pa > pb || (pa == pb && da < db))
    }
    // a doc ranked in BOTH lists outranks any doc whose single-list rank
    // is no better than both of its ranks (RRF's monotonicity)
    val both = out.filter(r => r.getAs[Any]("lex_rk") != null
      && r.getAs[Any]("sem_rk") != null)
    val single = out.filter(r => (r.getAs[Any]("lex_rk") == null)
      != (r.getAs[Any]("sem_rk") == null))
    for (b <- both; s <- single) {
      val bMax = math.max(b.getAs[Long]("lex_rk"), b.getAs[Long]("sem_rk"))
      val sRk = Option(s.getAs[Any]("lex_rk")).orElse(
        Option(s.getAs[Any]("sem_rk"))).get.asInstanceOf[Long]
      if (sRk >= bMax)
        assert(b.getAs[Long]("rk") < s.getAs[Long]("rk"))
    }
  }

  test("r07 audit: crafted corpus, every metric hand-checked at each k") {
    // 4 docs contain 'hash' and/or 'join'; docs 1 and 4 contain the
    // exact phrase. Doc 4 repeats the terms so BM25 ranks it first;
    // doc 3 (no phrase) still outranks doc 1 by term frequency.
    val docs = corpus(
      (1L, "a hash join here"),                     // relevant
      (2L, "hash only text"),
      (3L, "hash hash filler join join join"),      // bag-heavy, no phrase
      (4L, "hash join hash join hash join"),        // relevant, heaviest
      (5L, "nothing matching at all"))
    val got = Retrieval.rankingAudit(docs, Seq("hash", "join"),
      Seq("hash", "join"), Seq(1, 2, 4), 4).collect()
    assert(got.map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L, 4L))
    val byK = got.map(r => r.getAs[Long]("k") -> r).toMap
    // BM25 order: 4 (heaviest), 3, then 1, 2 — so hits are 1@k=1, 1@k=2
    // (doc 3 is a miss), 2@k=4; n_relevant = 2 everywhere.
    assert(got.forall(_.getAs[Long]("n_relevant") == 2L))
    assert(byK(1L).getAs[Long]("hits_at_k") == 1L)
    assert(byK(2L).getAs[Long]("hits_at_k") == 1L)
    assert(byK(4L).getAs[Long]("hits_at_k") == 2L)
    assert(byK(2L).getAs[Long]("precision_ppm") == 500000L)
    assert(byK(4L).getAs[Long]("recall_ppm") == 1000000L)
    assert(got.forall(_.getAs[Long]("first_rel_rank") == 1L))
    assert(got.forall(_.getAs[Long]("rr_ppm") == 1000000L))
  }

  test("r07 on testdata: grain, monotonicity, and metric identities hold") {
    val rows = SparkEntry.queries("r07_ranking_audit")(spark, SharedSpark.sf0001)
      .collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 10L, 20L))
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("hits_at_k") <= b.getAs[Long]("hits_at_k"))
      assert(a.getAs[Long]("recall_ppm") <= b.getAs[Long]("recall_ppm"))
    }
    rows.foreach { r =>
      val (k, h) = (r.getAs[Long]("k"), r.getAs[Long]("hits_at_k"))
      assert(h <= k && h <= r.getAs[Long]("n_relevant"))
      assert(r.getAs[Long]("precision_ppm") == h * 1000000L / k)
      val fr = r.getAs[Long]("first_rel_rank")
      assert(r.getAs[Long]("rr_ppm") == (if (fr == 0L) 0L else 1000000L / fr))
    }
  }

  test("r08: the served-index probe reproduces r03 row-for-row") {
    // served ≡ inline, asserted directly (the oracle hash gate proves it
    // against DuckDB; this pins it inside the engine too, so a future
    // index-build change that breaks parity fails here first)
    val inline = SparkEntry.queries("r03_bm25_search")(spark, SharedSpark.sf0001)
      .collect().toSeq
    val served = SparkEntry.queries("r08_served_bm25_probe")(spark, SharedSpark.sf0001)
      .collect().toSeq
    assert(served == inline, "served BM25 diverged from the inline ranker")
  }

  test("r08: probe path never tokenizes — and the term probe skips row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val (plan, scan) = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = SparkEntry.queries("r08_served_bm25_probe")(spark, SharedSpark.sf0001)
      df.collect()
      val p = df.queryExecution.executedPlan
      (p.toString,
        p.collect {
          case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(_.toString.contains("bm25_postings")) => f
        }.head)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // zero tokenization on the serve path: no explode, no regexp scan of
    // documents — only artifact reads
    assert(!plan.contains("Generate") && !plan.contains("explode"),
      s"r08 re-tokenized the corpus at query time:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"r08 scanned the raw corpus at query time:\n$plan")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("In(term") || pushed.contains("EqualTo(term"),
      s"term probe not pushed to parquet: $pushed")
    // the term-clustered layout makes the probe decode a sliver: three
    // query terms against the full vocabulary's postings
    val total = graft.operators.Retrieval
      .servedPostings(spark, SharedSpark.sf0001).count()
    val decoded = scan.metrics("numOutputRows").value
    assert(decoded > 0, "probe decoded nothing — query terms missing")
    assert(decoded * 2 <= total,
      s"no term skipping on the postings layout: decoded $decoded of $total")
  }

  test("r09: segmented growth ≡ rebuild — merged stats exact, ranking identical to r03") {
    // segment-stats merge is two sums; pin it against the whole-corpus
    // recompute so a cohort-definition drift can't silently skew idf
    import graft.operators.Retrieval
    val docs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
    val whole = Retrieval.indexStatsOf(docs).head
    val base = Retrieval.indexStatsOf(
      docs.where(pmod(col("doc_id"), lit(4)) =!= 3)).head
    val delta = Retrieval.indexStatsOf(
      docs.where(pmod(col("doc_id"), lit(4)) === 3)).head
    assert(base.getLong(0) + delta.getLong(0) == whole.getLong(0))
    assert(base.getLong(1) + delta.getLong(1) == whole.getLong(1))
    // end-to-end: the merged-segment ranking is the inline ranking
    val inline = SparkEntry.queries("r03_bm25_search")(spark, SharedSpark.sf0001)
      .collect().toSeq
    val grown = SparkEntry.queries("r09_segmented_index_growth")(spark, SharedSpark.sf0001)
      .collect().toSeq
    assert(grown == inline, "segmented index diverged from the full rebuild")
  }
}
