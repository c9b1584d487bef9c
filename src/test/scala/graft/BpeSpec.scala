package graft

import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer-training semantics (d20 + the iterative merge loop). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import graft.operators.Bpe

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") ==
      Seq("ab", "ab"))
    // overlap: a a a with merge (a,a) -> aa, a (greedy, not aa, aa)
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.applyMerge(Seq.empty, "a", "b") == Seq.empty)
  }

  test("codepointSyms keeps surrogate pairs whole") {
    // "a😀b" is 4 UTF-16 chars (😀 is a surrogate pair) but 3 codepoints;
    // char-based splitting would produce invalid lone surrogates.
    assert(Bpe.codepointSyms("a😀b") ==
      Seq("a", "😀", "b"))
    assert(Bpe.codepointSyms("") == Seq.empty)
    assert(Bpe.codepointSyms("ascii") == "ascii".map(_.toString))
  }

  test("train reproduces the classic low/lower/newest/widest merges") {
    import spark.implicits._
    // Sennrich et al.'s worked example, minus the end-of-word marker:
    // low x5, lower x2, newest x6, widest x3. First merge is (e,s) at 9
    // — st ties at 9 but (e,s) < (s,t) lexically; second is (es,t) at 9.
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).map(w => Tuple1(w)).toDF("text")
    val merges = Bpe.train(docs, 2)
    assert(merges == Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("train is deterministic and stops when no pairs remain") {
    import spark.implicits._
    val docs = Seq("ab", "ab", "cd").map(Tuple1(_)).toDF("text")
    // merges: (a,b) x2, then (c,d) x1, then every word is one symbol
    val merges = Bpe.train(docs, 10)
    assert(merges == Seq(("a", "b", 2L), ("c", "d", 1L)))
  }

  test("d20 pair counts are frequency-weighted and fully ordered") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    // corpus word freqs: to:4 (3 + 1 across docs), it:1
    //   -> pairs (t,o):4, (i,t):1
    Seq((1L, "to to to it"), (2L, "to"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d20_bpe_pair_counts")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("t", "o", 4L), ("i", "t", 1L)))
  }

  test("d20 on sf0.001: counts match a direct recompute") {
    val docs = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
    val expected = docs.collect()
      .flatMap(_.getAs[String]("text").toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq
      .flatMap { case (w, f) => w.sliding(2).filter(_.length == 2)
        .map(p => (p.substring(0, 1), p.substring(1)) -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = SparkEntry.queries("d20_bpe_pair_counts")(spark, SharedSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    assert(got.nonEmpty)
    got.foreach { case (p, n) => assert(expected(p) == n, s"pair $p") }
    // the report is the global top-k: nothing outside it outranks its floor
    val floor = got.map(_._2).min
    val excluded = expected.filterNot(e => got.exists(_._1 == e._1))
    excluded.foreach { case (_, n) => assert(n <= floor) }
  }

  test("d30 fertility census: bounds, ppm formulas, sums match d28's encode") {
    import org.apache.spark.sql.functions._
    val dir = SharedSpark.sf0001
    val rows = SparkEntry.queries("d30_tokenizer_fertility")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, p) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_pieces"))
      // every word is at least one piece; merges only shrink the stream
      assert(w <= p && p <= c, s"${r.getAs[String]("source")}: $w/$p/$c")
      assert(r.getAs[Long]("fertility_ppm") == p * 1000000L / math.max(w, 1L))
      assert(r.getAs[Long]("compression_ppm") == c * 1000000L / math.max(p, 1L))
    }
    // census totals equal the per-doc encode aggregated by source
    val bySrc = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val encPieces = SparkEntry.queries("d28_bpe_encode")(spark, dir)
      .select(col("doc_id"), col("n_pieces")).collect()
      .groupBy(r => bySrc(r.getAs[Long]("doc_id")))
      .view.mapValues(_.map(_.getAs[Long]("n_pieces")).sum).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pieces") == encPieces(r.getAs[String]("source")))
    }
  }

  test("d34 drift audit: full cohort coverage, frozen-tokenizer pieces tie out") {
    import org.apache.spark.sql.functions._
    import graft.operators.Bpe
    val dir = SharedSpark.sf0001
    val rows = SparkEntry.queries("d34_tokenizer_drift")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("cohort")).toSeq == Seq("base", "delta"))
    // every document is censused exactly once (the c15 coverage rule)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (w, p) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"))
      assert(w <= p, s"${r.getAs[String]("cohort")}: merges cannot add words")
      assert(r.getAs[Long]("fertility_ppm") == p * 1000000L / math.max(w, 1L))
    }
    // the frozen tokenizer is depth-NMerges and its encode is what the
    // census aggregated: recompute total pieces through the same seam
    val baseMerges = Bpe.baseTrainedMerges(spark, dir)
    assert(baseMerges.length == Bpe.NMerges)
    val totalPieces = Bpe.encodeWith(docs, baseMerges)
      .agg(sum(col("n_pieces"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_pieces")).sum == totalPieces)
  }
}
