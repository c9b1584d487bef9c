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
}
