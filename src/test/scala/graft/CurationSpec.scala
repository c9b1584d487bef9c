package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CurationPipeline stage invariants (c01's oracle proves value
  * equality; these pin the semantic properties of each stage). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private lazy val docs =
    graft.sources.Tables.load(spark, dir, "documents")

  test("retention is monotone and every stage keeps unique doc_ids") {
    val kept = CurationPipeline.qualityFilter(CurationPipeline.annotate(docs))
    val deduped = CurationPipeline.exactDedup(kept)
    val curated = CurationPipeline.nearDupDrop(deduped)
    val n0 = docs.count(); val n1 = kept.count()
    val n2 = deduped.count(); val n3 = curated.count()
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 > 0)
    assert(curated.select("doc_id").distinct().count() == n3)
  }

  test("q_points is integer 0..3 and the filter keeps exactly >= 2") {
    val annotated = CurationPipeline.annotate(docs)
    assert(annotated.where(col("q_points") < 0 || col("q_points") > 3).count() == 0)
    val kept = CurationPipeline.qualityFilter(annotated)
    assert(kept.count() == annotated.where(col("q_points") >= 2).count())
  }

  test("exact dedup: idempotent, keeper is min doc_id, n_copies sums to input") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "alpha beta gamma", "en", "web"),
      (5L, "alpha beta gamma", "en", "web"), // exact dup of 1
      (3L, "alpha beta gamma", "en", "news"), // dup content, other source
      (2L, "delta epsilon", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CurationPipeline.exactDedup(crafted).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.sameElements(Array(1L, 2L)))
    assert(out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Long]("n_copies") == 3L)
    assert(out.map(_.getAs[Long]("n_copies")).sum == 4L)
    val again = CurationPipeline.exactDedup(CurationPipeline.exactDedup(crafted))
    assert(again.count() == 2)
    assert(again.collect().forall(_.getAs[Long]("n_copies") == 1L))
  }

  test("near-dup drop removes the greater doc of an LSH candidate pair") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog again and " +
      "again while the observer takes careful notes about every single leap"
    val crafted = Seq(
      (10L, body, "en", "web"),
      (20L, body + " extra", "en", "web"), // near-dup of 10 (shared shingles)
      (30L, "completely different content about maritime navigation and " +
        "harbor logistics in the northern fjords during winter", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CurationPipeline.nearDupDrop(crafted)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.contains(10L) && !out.contains(20L) && out.contains(30L))
  }

  test("exact dedup == d01 keeper semantics on random duplicated corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      // ~40 distinct texts spread over 200 ids: heavy duplication,
      // random id assignment, shuffled partitioning
      val texts = (1 to 40).map(i => s"document body number $i with shared words")
      val rows = (1L to 200L).map(id => (id, texts(rnd.nextInt(texts.length)), "en", "web"))
      val df = rnd.shuffle(rows).toDF("doc_id", "text", "lang", "source").repartition(7)
      val out = CurationPipeline.exactDedup(df)
        .select("doc_id", "n_copies").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
      val want = rows.groupBy(_._2).values
        .map(g => g.map(_._1).min -> g.size.toLong).toMap
      assert(out == want, s"trial $trial")
    }
  }

  test("c12 epoch materialization hits c09's allocation, copies are dense") {
    val alloc = SparkEntry.queries("c09_token_apportionment")(spark, dir)
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    val rows = SparkEntry.queries("c12_epoch_materialize")(spark, dir).collect()
    assert(rows.nonEmpty)
    // copy_idx is dense 1..n per doc — a hole or dup means the explode broke
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, copies) =>
      val idx = copies.map(_.getAs[Long]("copy_idx")).sorted.toSeq
      assert(idx == (1L to idx.length.toLong), s"doc $id copies $idx")
    }
    // every doc of a source gets floor(epochs) or floor(epochs)+1 copies
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rs) =>
      val perDoc = rs.groupBy(_.getAs[Long]("doc_id")).values.map(_.length).toSeq
      assert(perDoc.max - perDoc.min <= 1)
    }
    // materialized tokens land near the source's allocation (the
    // fractional copy is a per-doc Bernoulli, so exactness is only in
    // expectation — 25 docs/source at sf0.001 gives wide but bounded noise)
    bySrc.foreach { case (src, rs) =>
      val got = rs.map(_.getAs[Long]("nt")).sum.toDouble
      val want = alloc(src).toDouble
      assert(math.abs(got - want) / want < 0.35,
        s"$src materialized $got vs alloc $want")
    }
  }

  test("split column is exhaustive and deterministic") {
    val c1 = SparkEntry.queries("c01_curation_pipeline")(spark, dir)
    val splits = c1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.getOrElse("train", 0L) > splits.getOrElse("val", 0L))
    val c2 = SparkEntry.queries("c01_curation_pipeline")(spark, dir)
    assert(c1.collect().toSeq == c2.collect().toSeq)
  }

  test("c03 balanced sample: smallest language kept whole, larger capped, deterministic") {
    val out = SparkEntry.queries("c03_balanced_sample")(spark, dir)
    val rows = out.collect()
    // every surviving row passed its own language's threshold
    assert(rows.forall(r => r.getAs[Long]("h_ppm") < r.getAs[Long]("keep_ppm")))
    val srcCounts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = srcCounts.values.min
    val keptCounts = rows.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length.toLong).toMap
    srcCounts.foreach { case (lang, n) =>
      // census column matches the source; nothing exceeds its language
      rows.filter(_.getAs[String]("lang") == lang)
        .foreach(r => assert(r.getAs[Long]("n_lang") == n))
      assert(keptCounts.getOrElse(lang, 0L) <= n)
      // the smallest language's keep_ppm is 10^6: every doc survives
      if (n == minN) assert(keptCounts(lang) == n)
    }
    // hash selection is layout-independent: identical doc set on rerun
    val again = SparkEntry.queries("c03_balanced_sample")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == again)
  }

  test("c04 contamination is exactly the LSH pairs straddling the d08 splits") {
    val pairs = SparkEntry.queries("n02_minhash_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val split = SparkEntry.queries("d08_hash_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val want = pairs.filter { case (a, b) => split(a) != split(b) }.toSet
    val got = SparkEntry.queries("c04_split_contamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty) // the raw corpus really does leak across splits
  }

  test("c05 decontamination equals a driver-side shingle intersection") {
    import org.apache.spark.sql.Row
    val sp = SparkEntry.queries("d08_hash_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    def shingleSet(text: String): Set[String] = {
      val toks = "[^a-z0-9]+".r.split(text.toLowerCase).filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else toks.toSet
    }
    val byDoc = docs.select("doc_id", "text").collect()
      .map { case Row(id: Long, text: String) => id -> shingleSet(text) }.toMap
    val evalShingles = byDoc.collect {
      case (id, sh) if sp(id) != "train" => sh }.foldLeft(Set.empty[String])(_ ++ _)
    val want = byDoc.collect {
      case (id, sh) if sp(id) == "train" && (sh & evalShingles).nonEmpty =>
        id -> ((sh & evalShingles).size.toLong, sh.size.toLong)
    }
    val got = SparkEntry.queries("c05_ngram_decontamination")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_contaminated"), r.getAs[Long]("n_shingles"))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty) // tiny vocab: train/eval genuinely overlap
  }

  test("c06 temperature mix: smallest language keeps all, rates follow sqrt") {
    val rows = SparkEntry.queries("c06_temperature_mix")(spark, dir).collect()
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = byLang.values.min
    rows.foreach { r =>
      val n = r.getAs[Long]("n_lang")
      assert(byLang(r.getAs[String]("lang")) == n)
      val wantPpm = math.floor(1000000.0 * (math.sqrt(minN.toDouble)
        / math.sqrt(n.toDouble))).toLong
      assert(r.getAs[Long]("keep_ppm") == wantPpm)
      assert(r.getAs[Long]("h_ppm") < wantPpm)
    }
    // every doc of the smallest language survives (ppm = 10^6)
    val smallest = byLang.minBy(_._2)._1
    val keptSmallest = rows.count(_.getAs[String]("lang") == smallest)
    assert(keptSmallest == byLang(smallest))
  }

  test("c07 keeps the highest-quality member of a near-dup component") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("c07").toString
    // docs 1 and 2 share the exact token stream (identical MinHash ⇒
    // same LSH bucket in every band ⇒ one component) but differ in RAW
    // length: doc 1 is punctuation-padded past 400 chars (len_ok = 0,
    // q_points = 2), doc 2 sits in the 100-400 band (q_points = 3) — so
    // the keeper must be doc 2 despite doc 1's smaller id. Doc 3 shares
    // no vocabulary: a singleton that keeps itself.
    val words = ('a' to 'x').map(c => s"${c}word$c").mkString(" ")
    Seq(
      (1L, words + " !!!" + ("?!" * 160), "en", "web"),
      (2L, words, "en", "web"),
      (3L, (1 to 25).map(i => s"zz$i").mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("c07_cluster_keeper")(spark, tmp).collect()
    assert(got.length == 2)
    val comp = got.find(_.getAs[Long]("canonical_id") == 1L).get
    assert(comp.getAs[Long]("keeper_doc_id") == 2L)
    assert(comp.getAs[Long]("keeper_q_points") == 3L)
    assert(comp.getAs[Long]("comp_size") == 2L)
    assert(comp.getAs[Long]("n_dropped") == 1L)
    val single = got.find(_.getAs[Long]("canonical_id") == 3L).get
    assert(single.getAs[Long]("keeper_doc_id") == 3L)
    assert(single.getAs[Long]("comp_size") == 1L)
  }

  test("c07 on testdata: keepers partition the corpus, one per component") {
    val got = SparkEntry.queries("c07_cluster_keeper")(spark, dir)
    assert(got.agg(sum("comp_size")).head().getLong(0) == docs.count())
    // keeper quality is the component max (cross-check via n05 + quality)
    val comps = SparkEntry.queries("n05_neardup_components")(spark, dir)
      .select(col("doc_id"), col("canonical_id"))
    val qp = CurationPipeline.annotate(docs).select(col("doc_id"), col("q_points"))
    val bestByComp = qp.join(comps, Seq("doc_id"), "left")
      .withColumn("canonical_id", coalesce(col("canonical_id"), col("doc_id")))
      .groupBy("canonical_id").agg(max("q_points").as("want_q"))
    val bad = got.join(bestByComp, Seq("canonical_id"))
      .where(col("keeper_q_points") =!= col("want_q"))
    assert(bad.count() == 0)
  }

  test("c08 curriculum: dense positions, bands descend, intra-band hash order") {
    val rows = SparkEntry.queries("c08_curriculum_order")(spark, dir).collect()
    val n = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.length.toLong == n)
    // positions are exactly 1..n in output order
    assert(rows.map(_.getAs[Long]("position")).toSeq == (1L to n))
    // quality bands never increase along the curriculum
    val bands = rows.map(_.getAs[Long]("band"))
    bands.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    // within a band the salted hash (then doc_id) decides the order
    rows.sliding(2).foreach {
      case Array(a, b) if a.getAs[Long]("band") == b.getAs[Long]("band") =>
        val (ha, hb) = (a.getAs[Long]("h_ppm"), b.getAs[Long]("h_ppm"))
        assert(ha < hb ||
          (ha == hb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
  }

  test("c09 apportionment: allocations sum exactly to the budget") {
    val budget = 100000L
    val rows = SparkEntry.queries("c09_token_apportionment")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("alloc")).sum == budget)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    rows.foreach { r =>
      val (base, extra) = (r.getAs[Long]("base"), r.getAs[Long]("extra"))
      assert(extra == 0L || extra == 1L)
      assert(r.getAs[Long]("alloc") == base + extra)
      // Hamilton guarantee: allocation within one unit of the exact quota
      val quota = r.getAs[Long]("n_tokens") * budget / total
      assert(math.abs(r.getAs[Long]("alloc") - quota) < 1.0 + 1e-9)
    }
  }

  test("c13 funnel: per-source monotone, totals tie to the corpus and c01") {
    val rows = SparkEntry.queries("c13_funnel_report")(spark, dir).collect()
    assert(rows.map(_.getAs[String]("source")).distinct.length == rows.length)
    rows.foreach { r =>
      val (raw, q, u, f) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("n_final"))
      assert(raw >= q && q >= u && u >= f && f >= 0L)
      assert(r.getAs[Long]("quality_drop_ppm") == (raw - q) * 1000000L / math.max(raw, 1L))
      assert(r.getAs[Long]("dup_drop_ppm") == (q - u) * 1000000L / math.max(q, 1L))
      assert(r.getAs[Long]("neardup_drop_ppm") == (u - f) * 1000000L / math.max(u, 1L))
      assert(r.getAs[Long]("survival_ppm") == f * 1000000L / math.max(raw, 1L))
    }
    assert(rows.map(_.getAs[Long]("n_raw")).sum == docs.count())
    // the funnel's final total IS the graded curated corpus
    val curated = SparkEntry.queries("c01_curation_pipeline")(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_final")).sum == curated)
    // attrition is real at this SF: some stage drops something somewhere
    assert(rows.exists(r => r.getAs[Long]("n_final") < r.getAs[Long]("n_raw")))
  }

  test("c16 delivery shuffle: dense sharded positions, exact offsets, a real permutation") {
    val rows = SparkEntry.queries("c16_delivery_shuffle")(spark, dir).collect()
    val epoch = SparkEntry.queries("c12_epoch_materialize")(spark, dir).collect()
    // every epoch row delivered exactly once
    assert(rows.length == epoch.length)
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet ==
      epoch.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSet)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    // non-negativity is the pmod≡% bridge the oracle depends on (the
    // 15-hex-digit invariant in c16's shard derivation)
    assert(byShard.keySet.forall(s => s >= 0L && s < graft.Config.DeliveryShards))
    byShard.values.foreach { sr =>
      val ordered = sr.sortBy(_.getAs[Long]("pos_in_shard"))
      // dense positions from 1 and an exact running token offset
      assert(ordered.map(_.getAs[Long]("pos_in_shard")).toSeq ==
        (1L to sr.length.toLong))
      var cum = 0L
      ordered.foreach { r =>
        cum += r.getAs[Long]("nt")
        assert(r.getAs[Long]("cum_tokens") == cum)
      }
      // the order is a real shuffle, not doc_id order (a shard of any
      // size beyond a handful is astronomically unlikely to stay sorted)
      if (sr.length > 10) {
        val ids = ordered.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSeq
        assert(ids != ids.sorted, s"shard not shuffled: $ids")
      }
    }
    // determinism: a second run deals the identical order
    val again = SparkEntry.queries("c16_delivery_shuffle")(spark, dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSeq.sorted
    assert(again == rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"))).toSeq.sorted)
  }

  test("c17 decon ablation: cascade closes, signals tie to graded queries") {
    val rows = SparkEntry.queries("c17_decontamination_ablation")(spark, dir).collect()
      .sortBy(_.getAs[Long]("method_order"))
    assert(rows.map(_.getAs[String]("method")).toSeq ==
      Seq("xsplit_neardup", "ngram_doc", "semantic_source",
        "span_excision", "benchmark_ngram"))
    // census coverage: exactly the d08-train docs, every row agrees
    val n = rows.head.getAs[Long]("n_train")
    assert(rows.forall(_.getAs[Long]("n_train") == n))
    val trainCount = SparkEntry.queries("d08_hash_split")(spark, dir).collect()
      .count(_.getAs[String]("split") == "train").toLong
    assert(n == trainCount, "census no longer covers every train doc")
    rows.foreach { r =>
      val (fl, uq, ff) = (r.getAs[Long]("n_flagged"),
        r.getAs[Long]("n_unique_flag"), r.getAs[Long]("n_first_flag"))
      assert(uq <= fl && ff <= fl && fl <= n)
    }
    // the cascade accounting closes: clean-after shrinks by exactly the
    // docs this method catches first (cl_{k-1} - cl_k = ff_k, cl_0 = n)
    var prev = n
    rows.foreach { r =>
      assert(prev - r.getAs[Long]("n_clean_after") == r.getAs[Long]("n_first_flag"),
        s"cascade leak at ${r.getAs[String]("method")}")
      prev = r.getAs[Long]("n_clean_after")
    }
    // single-source ties: each count equals the graded query it consumes
    assert(rows(1).getAs[Long]("n_flagged") ==
      SparkEntry.queries("c05_ngram_decontamination")(spark, dir).count())
    val d32Flagged = SparkEntry.queries("d32_span_decontamination")(spark, dir)
      .collect().count(_.getAs[Long]("n_excised") > 0L).toLong
    assert(rows(3).getAs[Long]("n_flagged") == d32Flagged)
    // c14's own grain (%97 benchmark) is wider than the train split, so
    // the census row is a restriction of it, never an extension
    assert(rows(4).getAs[Long]("n_flagged") <=
      SparkEntry.queries("c14_benchmark_decontamination")(spark, dir).count())
    // the census is informative at this SF: something flags, nothing
    // flags everything
    assert(rows.exists(_.getAs[Long]("n_flagged") > 0L))
    assert(rows.forall(_.getAs[Long]("n_flagged") < n))
  }

  test("c15 ablation: cascade accounting closes, signals tie to their graded queries") {
    val rows = SparkEntry.queries("c15_quality_ablation")(spark, dir).collect()
      .sortBy(_.getAs[Long]("rule_order"))
    assert(rows.map(_.getAs[String]("rule")).toSeq ==
      Seq("len_band", "min_tokens", "ttr", "gopher_repetition", "ppl_not_tail"))
    val n = rows.head.getAs[Long]("n_docs")
    assert(rows.forall(_.getAs[Long]("n_docs") == n))
    // coverage: the census inner-joins d31's output on doc_id in BOTH
    // engines, so a d31 grain change would shrink n_docs identically on
    // both sides and slip past the hash gate — pin full coverage here
    assert(n == graft.sources.Tables.load(spark, dir, "documents").count(),
      "c15 census no longer covers every document (signal grain changed)")
    rows.foreach { r =>
      val (nf, uq, ff) = (r.getAs[Long]("n_fail"),
        r.getAs[Long]("n_unique_kill"), r.getAs[Long]("n_first_fail"))
      assert(uq <= nf && ff <= nf && nf <= n)
    }
    // survivors are non-increasing along the cascade and the first-fail
    // column is exactly the per-stage attrition: sa_{k-1} - sa_k = ff_k
    val sa = rows.map(_.getAs[Long]("n_survive_after"))
    val ff = rows.map(_.getAs[Long]("n_first_fail"))
    sa.zip(sa.tail).foreach { case (a, b) => assert(a >= b) }
    assert(n - sa.head == ff.head)
    sa.zip(sa.tail).zip(ff.tail).foreach { case ((prev, next), f) =>
      assert(prev - next == f)
    }
    // independent recount of each rule's fail set from its graded source
    val ann = CurationPipeline.annotate(docs)
    assert(rows(0).getAs[Long]("n_fail") == ann.where(col("f_len") === 0L).count())
    assert(rows(1).getAs[Long]("n_fail") == ann.where(col("f_tok") === 0L).count())
    assert(rows(2).getAs[Long]("n_fail") == ann.where(col("f_ttr") === 0L).count())
    assert(rows(3).getAs[Long]("n_fail") ==
      SparkEntry.queries("d31_ngram_repetition")(spark, dir)
        .where(col("verdict") === "drop").count())
    assert(rows(4).getAs[Long]("n_fail") ==
      SparkEntry.queries("d29_perplexity_filter")(spark, dir)
        .where(col("ppl_bucket") === "tail").count())
    // the suite is non-degenerate at this SF: something fails, something
    // survives, and at least one rule carries unique kills
    assert(sa.last > 0L && sa.last < n)
    assert(rows.exists(_.getAs[Long]("n_unique_kill") > 0L))
  }

  test("c19: the planted-leak contract is all-or-nothing — 10⁶ / 0 / 0") {
    val rows = SparkEntry.queries("c19_planted_leak_audit")(spark, dir)
      .collect().map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_caught"),
         r.getAs[Long]("catch_ppm"))).toMap
    val (fp, fc, fppm) = rows("full_plant")
    assert(fp > 0 && fc == fp && fppm == 1000000L,
      "a whole planted 3-gram escaped the exact detector")
    val (_, pc, pppm) = rows("partial_plant")
    assert(pc == 0L && pppm == 0L,
      "a below-threshold plant was caught — the rule lost its width contract")
    val (u, uc, _) = rows("unplanted")
    assert(u > 0 && uc == 0L, "false positive on an unplanted doc")
  }

  test("c18: resume points bracket the half-epoch mark and exist in c16's manifest") {
    val manifest = SparkEntry.queries("c16_delivery_shuffle")(spark, dir)
      .collect().map(r => ((r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")),
        (r.getAs[Long]("doc_id"), r.getAs[Long]("copy_idx"),
         r.getAs[Long]("nt"), r.getAs[Long]("cum_tokens")))).toMap
    val resume = SparkEntry.queries("c18_resume_manifest")(spark, dir).collect()
    // full coverage: one resume point per delivery shard
    assert(resume.length == graft.Config.DeliveryShards,
      s"expected ${graft.Config.DeliveryShards} shards, got ${resume.length}")
    resume.foreach { r =>
      val shard = r.getAs[Long]("shard")
      val total = r.getAs[Long]("tokens_total")
      val before = r.getAs[Long]("tokens_before")
      val pos = r.getAs[Long]("resume_pos")
      assert(pos >= 1 && pos <= r.getAs[Long]("rows_total"))
      // the row at resume_pos really is c16's row there, with matching
      // identity and offset accounting
      val (doc, copy, nt, cum) = manifest((shard, pos))
      assert(doc == r.getAs[Long]("resume_doc") && copy == r.getAs[Long]("resume_copy"))
      assert(cum - nt == before, s"shard $shard offset accounting drifted")
      // bracketing: everything before the resume row is at or under the
      // mark, the resume row strictly crosses it
      assert(before * 2 <= total, s"shard $shard resumed too late")
      assert(cum * 2 > total, s"shard $shard resumed too early")
    }
  }
}
