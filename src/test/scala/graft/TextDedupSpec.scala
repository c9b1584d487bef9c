package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the text-analysis (d01-d10) and near-dup (n01-n05)
  * operator families on sf0.001. */
class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)
  private def docs = graft.sources.Tables.load(spark, dir, "documents")

  test("tokenizer: lowercases, splits on non-alphanumeric runs, drops empties") {
    import spark.implicits._
    val got = Seq("Hello, World!  42x ", "", "--- ---")
      .toDF("text")
      .select(graft.operators.TextOps.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("hello", "world", "42x"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("d01 exact dedup: copies partition the corpus, keeper is min doc_id") {
    val df = run("d01_dedup_exact")
    assert(df.agg(sum("n_copies")).head().getLong(0) == docs.count())
    // keeper must be one of the docs carrying that hash
    val joined = df.join(
      docs.select(md5(col("text")).as("text_hash"), col("doc_id")),
      Seq("text_hash"))
      .groupBy(col("text_hash"), col("keeper_doc_id"))
      .agg(min(col("doc_id")).as("true_min"))
      .where(col("keeper_doc_id") =!= col("true_min"))
    assert(joined.count() == 0)
  }

  test("d03 quality score bounded in [0,1] with thirds granularity") {
    val scores = run("d03_quality_score").select("quality_score")
      .collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores.forall(s => Set(0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0).exists(v => math.abs(v - s) < 1e-12)))
  }

  test("d04 predicted_lang is one of the supported languages") {
    val langs = run("d04_lang_id").select("predicted_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }

  test("d05 fingerprint is deterministic across executions") {
    val a = run("d05_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = run("d05_fingerprint").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("d08 hash split: deterministic, exhaustive, roughly 80/10/10") {
    val a = run("d08_hash_split").collect().map(r => (r.getLong(0), r.getString(3)))
    val b = run("d08_hash_split").collect().map(r => (r.getLong(0), r.getString(3)))
    assert(a.sameElements(b)) // stable across executions
    val byCnt = a.groupBy(_._2).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    assert(byCnt.keySet == Set("train", "val", "test"))
    assert(byCnt("train") / n > 0.7 && byCnt("train") / n < 0.9)
    assert(byCnt("val") / n > 0.04 && byCnt("val") / n < 0.16)
  }

  test("n01 signatures: one row per doc, values in [0, P) or -1") {
    val df = run("n01_minhash_signatures")
    assert(df.count() == docs.count())
    val mhCols = (0 until 8).map(k => col(s"mh$k"))
    val bad = df.where(mhCols.map(c =>
      !(c === -1L || (c >= 0L && c < 1000000007L))).reduce(_ || _))
    assert(bad.count() == 0)
  }

  test("n02 LSH pairs: ordered, distinct, and actually share a band") {
    val pairs = run("n02_minhash_lsh_pairs")
    assert(pairs.where(col("doc_a") >= col("doc_b")).count() == 0)
    assert(pairs.count() == pairs.distinct().count())
    // every pair shares at least one full band of the signature
    val sig = run("n01_minhash_signatures")
    val withSigs = pairs
      .join(sig.toDF(sig.columns.map(c => s"a_$c").toIndexedSeq: _*), col("doc_a") === col("a_doc_id"))
      .join(sig.toDF(sig.columns.map(c => s"b_$c").toIndexedSeq: _*), col("doc_b") === col("b_doc_id"))
    val shares = (0 until 4).map(b =>
      col(s"a_mh${2 * b}") === col(s"b_mh${2 * b}") &&
      col(s"a_mh${2 * b + 1}") === col(s"b_mh${2 * b + 1}")).reduce(_ || _)
    assert(withSigs.where(!shares).count() == 0)
  }

  test("n02 per-bucket cap drops degenerate buckets, keeps the rest intact") {
    import spark.implicits._
    // crafted bands: one degenerate bucket of 50 docs (all sharing band
    // key "hot"), one healthy 3-doc bucket, one singleton
    val hot   = (1L to 50L).map(id => (id, 0, "hot"))
    val small = Seq((101L, 1, "ok"), (102L, 1, "ok"), (103L, 1, "ok"))
    val single = Seq((201L, 2, "lonely"))
    val bands = (hot ++ small ++ single).toDF("doc_id", "band_id", "band_key")
    val uncapped = graft.operators.Dedup.cappedLshPairs(bands, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.operators.Dedup.cappedLshPairs(bands, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 50 * 49 / 2 + 3) // quadratic blowup uncapped
    assert(capped == Set((101L, 102L), (101L, 103L), (102L, 103L)))
    assert(capped.subsetOf(uncapped)) // cap only ever removes pairs
  }

  test("d09 repetition ppm: exact integer math, bounded, distinct <= total") {
    run("d09_repetition_quality").collect().foreach { r =>
      val ns = r.getAs[Long]("n_sentences"); val nds = r.getAs[Long]("n_distinct_sentences")
      val nt = r.getAs[Long]("n_tokens"); val ndt = r.getAs[Long]("n_distinct_tokens")
      assert(nds <= ns && ndt <= nt)
      assert(r.getAs[Long]("dup_sentence_ppm") ==
        (ns - nds) * 1000000L / math.max(ns, 1L))
      assert(r.getAs[Long]("dup_token_ppm") ==
        (nt - ndt) * 1000000L / math.max(nt, 1L))
    }
  }

  test("n03 simhash fits in 16 bits") {
    val bad = run("n03_simhash")
      .where(col("simhash") < 0L || col("simhash") >= 65536L)
    assert(bad.count() == 0)
  }

  test("n04 jaccard in [0.5, 1] with symmetric-free ordering") {
    val df = run("n04_ngram_jaccard")
    assert(df.where(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
    assert(df.where(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("n04 DF cap drops stopword posting lists, keeps rare-token pairs") {
    import spark.implicits._
    // Degenerate corpus: 40 docs all sharing stopwords "the of", each
    // with a unique rare token — plus one genuine near-dup pair sharing
    // three rare tokens. Uncapped, the stopwords alone pull every
    // 40-choose-2 pair above threshold=0.3 (2 common of 3+3 tokens).
    val noise = (1L to 40L).map(id => (id, "web", s"the of uniq$id"))
    val pair = Seq(
      (101L, "web", "zebra quark flux the of"),
      (102L, "web", "zebra quark flux the of"))
    val corpus = (noise ++ pair).toDF("doc_id", "source", "text")
    def pairs(maxDf: Int) = graft.operators.Dedup
      .jaccardPairs(corpus, 0.3, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.size > 500) // stopword blowup: ~42·41/2 pairs
    // cap 10 < DF(the)=DF(of)=42: stopwords dropped; the real pair's
    // jaccard over the capped vocab is 3/3 = 1.0, noise pairs share
    // nothing
    assert(pairs(10) == Set((101L, 102L)))
  }

  test("d11 chunking: dense indices, full windows except the tail, exact tail size") {
    val byDoc = run("d11_chunking").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nts = docs.select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == nts.keySet) // every doc chunks, even empty ones
    byDoc.foreach { case (id, rows) =>
      val nt = nts(id)
      val sorted = rows.sortBy(_._2)
      val n = sorted.length.toLong
      val wantN = if (nt <= 50) 1L else 1L + (nt - 50 + 39) / 40
      assert(n == wantN, s"doc $id: $n chunks for $nt tokens")
      assert(sorted.map(_._2).sameElements(0L until n))
      sorted.init.foreach(c => assert(c._3 == 50L)) // full windows
      assert(sorted.last._3 == (if (nt <= 50) nt else nt - 40 * (n - 1)))
    }
  }

  test("n05 connected components: chains merge, canonical is min id, sizes exact") {
    import spark.implicits._
    // {1,2,3} via transitive 1-2, 2-3 (no 1-3 pair); {7,9}; and a
    // 5-node chain of diameter 4 to force multiple propagation rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L),
        (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L))
      .toDF("doc_a", "doc_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("comp_size"))).toMap
    assert(cc == Map(
      1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L),
      7L -> (7L, 2L), 9L -> (7L, 2L),
      10L -> (10L, 5L), 11L -> (10L, 5L), 12L -> (10L, 5L),
      13L -> (10L, 5L), 14L -> (10L, 5L)))
  }

  test("n05 agrees with n02: both ends of every candidate pair share a canonical id") {
    val comps = run("n05_neardup_components")
    val pairs = run("n02_minhash_lsh_pairs")
    val joined = pairs
      .join(comps.select(col("doc_id").as("doc_a"), col("canonical_id").as("ca")), Seq("doc_a"))
      .join(comps.select(col("doc_id").as("doc_b"), col("canonical_id").as("cb")), Seq("doc_b"))
    assert(joined.count() == pairs.count()) // every paired doc has a component
    assert(joined.where(col("ca") =!= col("cb")).count() == 0)
  }

  test("d10 top terms: per-doc k<=3, ranked by tf desc then df asc then term") {
    val rows = run("d10_top_terms").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[String]("term"), r.getAs[Long]("rk")))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.length <= 3)
      assert(sorted.map(_._5).sameElements(1L to sorted.length))
      // the rank order must equal the declared (tf desc, df asc, term asc)
      val keys = sorted.map { case (_, tf, df, term, _) => (-tf, df, term) }
      assert(keys.sameElements(keys.sorted))
    }
  }

  test("d12 scrub redacts every injected PII span and only those") {
    import spark.implicits._
    // scrub() on crafted text: all three classes, adjacent spans
    val got = Seq(
      "mail bob.smith+x@test-site.org now",
      "node 192.168.1.254 and 10.0.0.1 up",
      "dial 555-0199 or 555-12345",  // second: 555-1234 matches, trailing 5 stays
      "clean text with no pii at all")
      .toDF("text")
      .select(graft.operators.TextOps.scrub(col("text")).as("s"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "node <IP> and <IP> up")
    assert(got(2) == "dial <PHONE> or <PHONE>5")
    assert(got(3) == "clean text with no pii at all")
    // graded query: counts follow the doc_id arithmetic exactly
    val rows = run("d12_pii_scrub").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 3 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_ips") == (if (id % 5 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") == (if (id % 7 == 0) 1L else 0L))
      // redaction only ever shrinks or keeps length (tokens are short)
      if (id % 3 != 0 && id % 5 != 0 && id % 7 != 0)
        assert(r.getAs[Long]("n_chars_delta") == 0L)
    }
  }

  test("d13 bloom-prefiltered result equals the exact anti-join") {
    val got = run("d13_bloom_incremental_dedup")
    // the Bloom prefilter is an optimization, never a semantics change:
    // compare against the plain anti-join of the same batch construction
    val docsDf = docs.select(col("doc_id"), md5(col("text")).as("digest"))
    val existing = docsDf.where(pmod(col("doc_id"), lit(2L)) === 0L)
    val batch = docsDf.where(pmod(col("doc_id"), lit(2L)) === 1L)
      .withColumn("crawl_id", col("doc_id") * 10L + 1L)
      .unionByName(docsDf.where(pmod(col("doc_id"), lit(10L)) === 0L)
        .withColumn("crawl_id", col("doc_id") * 10L + 2L))
    val want = batch.join(existing.select("digest"), Seq("digest"), "left_anti")
      .select("crawl_id").collect().map(_.getLong(0)).toSet
    val gotIds = got.select("crawl_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == want)
    // every re-crawl of an existing page is dropped; the new crawl stays
    assert(gotIds.forall(_ % 10L == 1L))
    assert(got.count() == docs.where(pmod(col("doc_id"), lit(2L)) === 1L).count())
  }

  test("d14 boilerplate digests are exactly d11's recurring chunk digests") {
    val chunks = run("d11_chunking").collect()
      .map(r => (r.getAs[String]("chunk_digest"), r.getAs[Long]("doc_id")))
    val want = chunks.groupBy(_._1).collect {
      case (dig, occ) if occ.length > 1 =>
        dig -> ((occ.length.toLong, occ.map(_._2).distinct.length.toLong,
          occ.map(_._2).min))
    }
    val got = run("d14_chunk_boilerplate").collect()
      .map(r => r.getAs[String]("chunk_digest") ->
        ((r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("min_doc_id"))))
      .toMap
    assert(got == want)
  }

  test("d16 heavy hitters equal driver-side exact tf/df counting") {
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    docs.select("text").collect().foreach { r =>
      val toks = "[^a-z0-9]+".r.split(r.getString(0).toLowerCase).filter(_.nonEmpty)
      val perDoc = toks.groupBy(identity).view.mapValues(_.length.toLong)
      perDoc.foreach { case (tk, tf) =>
        val (t0, d0) = counts.getOrElse(tk, (0L, 0L))
        counts(tk) = (t0 + tf, d0 + 1)
      }
    }
    val want = counts.toSeq
      .sortBy { case (tk, (tf, _)) => (-tf, tk) }
      .take(50)
      .zipWithIndex
      .map { case ((tk, (tf, df)), i) => (tk, tf, df, i + 1L) }
    val got = run("d16_vocab_heavy_hitters").collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("tf"),
        r.getAs[Long]("df"), r.getAs[Long]("rk")))
      .toSeq
    assert(got == want)
  }

  test("n06 incremental probe agrees with n02's odd-even candidate pairs") {
    // with caps non-binding (this corpus), probing the even-id corpus
    // with the odd-id batch must surface exactly the n02 pairs that
    // straddle the parity split
    val pairs = run("n02_minhash_lsh_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val wantByBatch = pairs
      .flatMap { case (a, b) =>
        Seq(a, b).filter(_ % 2 == 1).flatMap { odd =>
          val even = if (odd == a) b else a
          if (even % 2 == 0) Some(odd -> even) else None
        }
      }
      .groupBy(_._1)
      .map { case (odd, ps) =>
        odd -> ((ps.map(_._2).distinct.length.toLong, ps.map(_._2).min))
      }
    val got = run("n06_incremental_lsh_neardup").collect()
      .map(r => r.getAs[Long]("batch_doc") ->
        ((r.getAs[Long]("n_corpus_neardups"), r.getAs[Long]("min_corpus_doc"))))
      .toMap
    assert(got == wantByBatch)
    assert(got.nonEmpty)
  }

  test("d15 packing: per-shard running sum, starts bin into 512-token spans") {
    val rows = run("d15_sequence_pack").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_n_tokens"), r.getAs[Long]("cum_tokens")))
    assert(rows.length == run("d11_chunking").count()) // every chunk packed once
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(r => (r._3, r._4))
      var cum = 0L
      ordered.foreach { case (_, seq, _, _, nTok, cumTok) =>
        assert(cumTok == cum + nTok)     // exact running sum in walk order
        assert(seq == cum / 512)         // sequence = 512-token span of the start
        cum = cumTok
      }
      // sequence ids are dense from 0 within the shard
      val seqs = ordered.map(_._2).distinct
      assert(seqs.head == 0L && seqs.sameElements(seqs.sorted))
    }
  }

  test("d33 manifest: counts, fill, and doc-start offsets tie to d15's packing") {
    val packed = run("d15_sequence_pack").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_n_tokens"),
        r.getAs[Long]("cum_tokens")))
    val manifest = run("d33_pack_manifest").collect()
    // one manifest row per packed sequence, nothing invented or dropped
    assert(manifest.length == packed.map(p => (p._1, p._2)).distinct.length)
    val byKey = packed.groupBy(p => (p._1, p._2))
    manifest.foreach { r =>
      val key = (r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard"))
      val chunks = byKey(key)
      assert(r.getAs[Long]("n_chunks") == chunks.length)
      assert(r.getAs[Long]("n_docs") == chunks.map(_._3).distinct.length)
      val nTok = chunks.map(_._4).sum
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(r.getAs[Long]("fill_ppm") == nTok * 1000000L / 512L)
      // recompute within-sequence doc starts from the packing geometry
      val starts = chunks.groupBy(_._3).values.map { dc =>
        dc.map(c => c._5 - c._4 - key._2 * 512L).min
      }.toSeq.sorted
      assert(r.getAs[String]("doc_starts_csv") == starts.mkString(","))
      // segment offsets live inside the sequence span (spill ≤ one chunk)
      assert(starts.head >= 0L && starts.forall(_ < 512L))
    }
    // fill is meaningful at this SF: most sequences are near-full, and at
    // least one boundary spill (>10^6 ppm) exists somewhere
    assert(manifest.count(_.getAs[Long]("fill_ppm") >= 900000L) > manifest.length / 2)
  }

  test("d17 normalized dedup collapses case/punct/space variants d01 keeps") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d17").toString
    // docs 1/2/3 are one normalized group in three raw forms (+byte-dup 4
    // of 1); doc 5 differs in words, not just formatting
    Seq(
      (1L, "Alpha, Beta gamma!", "en", "web"),
      (2L, "alpha beta GAMMA", "en", "web"),
      (3L, "  alpha   beta...gamma  ", "en", "news"),
      (4L, "Alpha, Beta gamma!", "en", "web"),
      (5L, "alpha beta delta", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d17_normalized_dedup")(spark, tmp).collect()
    assert(got.length == 2)
    val big = got.find(_.getAs[Long]("keeper_doc_id") == 1L).get
    assert(big.getAs[Long]("n_copies") == 4L)
    assert(big.getAs[Long]("n_raw_forms") == 3L) // 1 and 4 share a raw form
    val other = got.find(_.getAs[Long]("keeper_doc_id") == 5L).get
    assert(other.getAs[Long]("n_copies") == 1L)
    assert(other.getAs[Long]("n_raw_forms") == 1L)
  }

  test("d19 snapshot delta: classifies adds/removes/edits, drops unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "stable text"), (2L, "will be edited"), (3L, "will be removed"))
      .toDF("doc_id", "text")
    val nw = Seq(
      (1L, "stable text"), (2L, "was edited"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.snapshotDelta(old, nw).collect()
    val byId = got.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(byId == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // digests present exactly on the sides that exist
    val r3 = got.find(_.getAs[Long]("doc_id") == 3L).get
    assert(r3.getAs[String]("old_digest") != null &&
      r3.getAs[String]("new_digest") == null)
    val r4 = got.find(_.getAs[Long]("doc_id") == 4L).get
    assert(r4.getAs[String]("old_digest") == null &&
      r4.getAs[String]("new_digest") != null)
  }

  test("d19 on testdata: statuses consistent with the synthesis rules") {
    val df = run("d19_snapshot_delta")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, st) = (r.getAs[Long]("doc_id"), r.getAs[String]("status"))
      st match {
        case "added"   => assert(id % 7 == 3 && id % 11 != 4)
        case "removed" => assert(id % 11 == 4 && id % 7 != 3)
        case "changed" => assert(id % 5 == 1 && id % 7 != 3 && id % 11 != 4)
        case other     => fail(s"unexpected status $other")
      }
    }
    // every doc matching a rule appears (no silent drops)
    val n = docs.count()
    val expect = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .count(id => (id % 7 == 3 && id % 11 != 4) ||
        (id % 11 == 4 && id % 7 != 3) ||
        (id % 5 == 1 && id % 7 != 3 && id % 11 != 4))
    assert(rows.length == expect && n > 0)
  }

  test("d21 subdoc dedup: first occurrence wins corpus-wide, rebuild exact") {
    import spark.implicits._
    val S = graft.operators.TextOps.SegSize
    val tmp = java.nio.file.Files.createTempDirectory("d21").toString
    val shared = (1 to S).map(i => s"t$i").mkString(" ")   // one full segment
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Seq(
      (1L, s"$shared a1 a2 a3"),          // owns the shared segment
      (2L, s"$shared b1 b2 b3"),          // loses seg 0, keeps its tail
      (3L, s"$shared $shared"))           // internal repetition collapses too
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d21_subdoc_dedup")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"),
          r.getAs[String]("rebuilt_digest"))).toMap
    assert(got(1L) == ((2L, 2L, md5hex(s"$shared a1 a2 a3"))))
    assert(got(2L) == ((2L, 1L, md5hex("b1 b2 b3"))))
    // doc 3: both its segments are copies of doc 1's seg 0
    assert(got(3L) == ((2L, 0L, md5hex(""))))
  }

  test("d21 on testdata: kept <= segments, rebuilt empty only when kept=0") {
    val df = run("d21_subdoc_dedup").cache()
    assert(df.count() == docs.count())
    assert(df.where(col("n_kept") > col("n_segments")).count() == 0)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(df.where(col("n_kept") === 0L &&
      col("rebuilt_digest") =!= emptyMd5).count() == 0)
    assert(df.where(col("n_kept") > 0L &&
      col("rebuilt_digest") === emptyMd5).count() == 0)
    df.unpersist()
  }

  test("d22 drift: stable source scores 0 ppm, full shift scores 2M ppm") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d22").toString
    // ids 1,2: in BOTH snapshots (1%7!=3, 1%11!=4; same for 2) -> the
    // 'stable' histograms are identical. id 4 is old-only (4%11==4),
    // id 3 is new-only (3%7==3), in different length buckets -> 'shift'
    // moves all mass between buckets: total variation = 2,000,000 ppm.
    Seq(
      (1L, "stable", 50L), (2L, "stable", 250L),
      (4L, "shift", 50L), (3L, "shift", 250L))
      .toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x"))
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d22_source_drift")(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("old_docs"), r.getAs[Long]("new_docs"),
          r.getAs[Long]("tv_ppm"))).toMap
    assert(got("stable") == ((2L, 2L, 0L)))
    assert(got("shift") == ((1L, 1L, 2000000L)))
  }

  test("d22 on testdata: totals match membership rules, tv bounded") {
    val df = run("d22_source_drift").cache()
    val expectOld = docs.where(col("doc_id") % 7 =!= 3).count()
    val expectNew = docs.where(col("doc_id") % 11 =!= 4).count()
    assert(df.agg(sum("old_docs")).head().getLong(0) == expectOld)
    assert(df.agg(sum("new_docs")).head().getLong(0) == expectNew)
    assert(df.where(col("tv_ppm") < 0L || col("tv_ppm") > 2000000L).count() == 0)
    df.unpersist()
  }

  test("n07 audit: exact copies score 1.0/1.0, exact side matches brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("n07").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    import spark.implicits._
    Seq((1L, base), (2L, base),                       // exact dup pair
      (3L, base + " extra tail words here"),          // near dup of 1/2
      (4L, "totally different content nothing shared at all right"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("n07_minhash_audit")(spark, tmp).collect()
    assert(rows.nonEmpty)
    def shingleSet(t: String) = {
      val toks = "[^a-z0-9]+".r.split(t.toLowerCase).filter(_.nonEmpty).toSeq
      (if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
       else toks).toSet
    }
    val texts = Map(1L -> base, 2L -> base,
      3L -> (base + " extra tail words here"),
      4L -> "totally different content nothing shared at all right")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      assert(r.getAs[Long]("n_inter") == (sa & sb).size.toLong)
      assert(r.getAs[Long]("n_union") == (sa | sb).size.toLong)
      assert(r.getAs[Long]("err_ppm") ==
        r.getAs[Long]("est_ppm") - r.getAs[Long]("exact_ppm"))
      assert(r.getAs[Long]("est_ppm") <= 1000000L &&
        r.getAs[Long]("exact_ppm") <= 1000000L)
    }
    val dup = rows.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L).get
    assert(dup.getAs[Long]("n_sig_match") == 8L)
    assert(dup.getAs[Long]("est_ppm") == 1000000L)
    assert(dup.getAs[Long]("exact_ppm") == 1000000L)
    assert(dup.getAs[Long]("err_ppm") == 0L)
  }

  test("d23 novelty: unique doc scores 1.0, exact copy scores 0, self-reps ignored") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d23").toString
    val unique = "alpha beta gamma delta epsilon zeta"
    Seq(
      (1L, unique),                        // all shingles globally unique
      (2L, "shared one two three four"),   // copied by doc 3
      (3L, "shared one two three four"),
      // internal repetition: same shingle twice in ONE doc stays df=1
      (4L, "aa bb cc aa bb cc aa bb cc"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d23_ngram_novelty")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("novelty_ppm"))).toMap
    assert(got(1L)._3 == 1000000L)
    assert(got(2L) == ((3L, 0L, 0L)))      // every shingle also in doc 3
    assert(got(3L) == ((3L, 0L, 0L)))
    // doc 4: shingles {aa bb cc, bb cc aa, cc aa bb} each repeated
    // WITHIN the doc only -> still globally unique -> full novelty
    assert(got(4L) == ((3L, 3L, 1000000L)))
  }

  test("d24 utilization: non-tail fill within one chunk of budget, spill bounded") {
    val budget = 512L
    val chunkSize = graft.operators.TextOps.ChunkSize.toLong
    val rows = run("d24_pack_utilization").collect()
    assert(rows.nonEmpty)
    val d15 = run("d15_sequence_pack").collect()
    val tokensByShard = d15.groupBy(_.getAs[Long]("shard")).view
      .mapValues(_.map(_.getAs[Long]("chunk_n_tokens")).sum).toMap
    val seqSums = d15
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard")))
      .view.mapValues(_.map(_.getAs[Long]("chunk_n_tokens")).sum).toMap
    rows.foreach { r =>
      val shard = r.getAs[Long]("shard")
      val (nSeqs, total) = (r.getAs[Long]("n_seqs"), r.getAs[Long]("total_tokens"))
      // offset binning: a non-tail sequence covers its whole offset bin,
      // so it can miss the budget only by the previous bin's spill
      // (< one chunk); the tail alone may be arbitrarily short
      val shardSeqs = seqSums.collect { case ((s, q), tk) if s == shard => (q, tk) }
      val tailSeq = shardSeqs.keys.max
      shardSeqs.foreach { case (q, tk) =>
        if (q != tailSeq) assert(tk > budget - chunkSize, s"shard $shard seq $q")
      }
      assert(r.getAs[Long]("full_seqs") == shardSeqs.values.count(_ >= budget).toLong)
      // boundary spill is at most one chunk
      assert(r.getAs[Long]("max_seq_tokens") < budget + chunkSize)
      assert(total == tokensByShard(shard))
      assert(r.getAs[Long]("fill_ppm") == total * 1000000L / (nSeqs * budget))
    }
  }

  test("n10 banding sweep: S-curve monotone, (4,2) row equals n02 exactly") {
    val rows = SparkEntry.queries("n10_lsh_banding_audit")(
        spark, SharedSpark.sf0001).collect()
    assert(rows.map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")))
      .toSeq == Seq((8L, 1L), (4L, 2L), (2L, 4L)))
    // precision formula holds and estimates never exceed candidates
    rows.foreach { r =>
      val cand = r.getAs[Long]("n_cand_pairs")
      val est = r.getAs[Long]("n_est_ge_50")
      assert(est <= cand)
      assert(r.getAs[Long]("precision_ppm") ==
        est * 1000000L / math.max(cand, 1L))
    }
    // the S-curve: longer rows => fewer candidates, no lower precision
    val cands = rows.map(_.getAs[Long]("n_cand_pairs"))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2))
    val prec = rows.map(_.getAs[Long]("precision_ppm"))
    assert(prec(0) <= prec(1) && prec(1) <= prec(2))
    assert(cands(2) > 0, "even the strictest banding must catch exact dups")
    // config (4,2) IS n02's production banding — counts must agree
    val n02 = SparkEntry.queries("n02_minhash_lsh_pairs")(
      spark, SharedSpark.sf0001).count()
    assert(cands(1) == n02)
  }

  test("n08 equals the all-pairs Hamming brute force (banding exact below the bucket cap)") {
    val fps = run("n03_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val expected = (for {
      i <- fps.indices.iterator
      j <- (i + 1) until fps.length
      h = java.lang.Long.bitCount(fps(i)._2 ^ fps(j)._2)
      if h <= graft.operators.Dedup.MaxHamming
    } yield {
      val (a, b) = (fps(i), fps(j))
      if (a._1 < b._1) (a._1, b._1, h.toLong) else (b._1, a._1, h.toLong)
    }).toSet
    val got = run("n08_simhash_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("d31 crafted corpus: coverage ppms exact, gram-less doc survives as keep") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d31").toString
    Seq(
      (1L, "x y x y x y"), // nc=11; top2 = "x y"x3 (cov 9), dup2 = 9+6
      (2L, "z"))           // no 2-grams at all -> zero ppms, keep
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d31_ngram_repetition")(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("top2_ppm"), r.getAs[Long]("top3_ppm"),
          r.getAs[Long]("top4_ppm"), r.getAs[Long]("dup2_ppm")),
          r.getAs[String]("verdict"))).toMap
    // 9e6/11, 10e6/11 ("x y x"x2, cov 10), 14e6/11 ("x y x y"x2), 15e6/11
    assert(got(1L) == (((818181L, 909090L, 1272727L, 1363636L), "drop")))
    assert(got(2L) == (((0L, 0L, 0L, 0L), "keep")))
  }

  test("d31 on testdata: doc grain, every rule fires, verdict = AND of flags") {
    val rows = run("d31_ngram_repetition").collect()
    assert(rows.length.toLong == docs.count())
    for (flag <- Seq("top2_ok", "top3_ok", "top4_ok", "dup2_ok"))
      assert(rows.map(_.getAs[Long](flag)).toSet == Set(0L, 1L),
        s"$flag must split the corpus — recalibrate the threshold")
    assert(rows.map(_.getAs[String]("verdict")).toSet == Set("keep", "drop"))
    rows.foreach { r =>
      val allOk = Seq("top2_ok", "top3_ok", "top4_ok", "dup2_ok")
        .forall(f => r.getAs[Long](f) == 1L)
      assert(r.getAs[String]("verdict") == (if (allOk) "keep" else "drop"))
    }
  }

  test("d32 crafted corpus: one shared window excised, bystander untouched") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // pick real split members so the crafted corpus follows d08's rule
    val splits = (1L to 60L).map(id => id ->
      spark.range(1).select(graft.operators.TextOps.splitFor(lit(id)))
        .head().getString(0)).toMap
    val trainA = splits.collectFirst { case (id, "train") => id }.get
    val trainB = splits.collect { case (id, "train") => id }
      .find(_ != trainA).get
    val evalId = splits.collectFirst {
      case (id, s) if s != "train" => id }.get
    val shared = (1 to 8).map(i => s"w$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("d32").toString
    Seq(
      (trainA, s"$shared a b c"),          // window 0 matches eval -> excised
      (trainB, "p q r s t u v w x"),       // no overlap -> untouched
      (evalId, s"$shared x y z"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d32_span_decontamination")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_excised"),
          r.getAs[String]("clean_digest")))).toMap
    assert(got.keySet == Set(trainA, trainB))
    assert(got(trainA) == ((11L, 8L, md5hex("a b c"))))
    assert(got(trainB) == ((9L, 0L, md5hex("p q r s t u v w x"))))
  }

  test("d32 on testdata: train grain, both excised and untouched docs exist") {
    val rows = run("d32_span_decontamination").collect()
    val nTrain = docs.select(col("doc_id"))
      .where(graft.operators.TextOps.splitFor(col("doc_id")) === "train").count()
    assert(rows.length.toLong == nTrain)
    assert(rows.exists(_.getAs[Long]("n_excised") > 0L))
    assert(rows.exists(_.getAs[Long]("n_excised") == 0L))
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    rows.foreach { r =>
      val (nt, ex) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_excised"))
      assert(ex >= 0L && ex <= nt)
      assert((r.getAs[String]("clean_digest") == emptyMd5) == (ex == nt))
    }
  }

  test("d17 on testdata: copies partition the corpus, raw forms <= copies") {
    val df = run("d17_normalized_dedup")
    assert(df.agg(sum("n_copies")).head().getLong(0) == docs.count())
    assert(df.where(col("n_raw_forms") > col("n_copies")).count() == 0)
    assert(df.where(col("n_raw_forms") < 1L).count() == 0)
    // normalized grouping is at least as coarse as byte-exact grouping
    assert(df.count() <= run("d01_dedup_exact").count())
  }

  test("n11 source census conserves n02's pairs and normalizes orientation") {
    val census = run("n11_neardup_source_census").collect()
    // every n02 pair lands in exactly one census cell
    val total = census.map(_.getAs[Long]("n_pairs")).sum
    assert(total == run("n02_minhash_lsh_pairs").count(),
      "census lost or double-counted candidate pairs")
    // orientation-free: src_a ≤ src_b on every row, and no mirrored cell
    val cells = census.map(r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
    assert(cells.forall { case (a, b) => a <= b })
    assert(cells.distinct.length == cells.length)
  }
}
