package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the counts-trained scorers (Classifier.scala):
  * d26 NB distillation, c10 DSIR weighting, d29 bigram-LM perplexity.
  * The oracles prove value equality; these pin the properties the hash
  * cannot see — bucket non-vacuity, score monotonicity, and the exact
  * OOV arithmetic of the integer half-bit log machinery. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  /** Test-side mirror of Classifier.ilog: floor(2*log2(x)) for x >= 1. */
  private def ilog(x: Long): Long =
    if (x <= 0L) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x * x)

  /** Test-side mirror of Classifier.pratio: floor(cnt * 2^20 / denom). */
  private def pratio(cnt: Long, denom: Long): Long =
    math.floor(cnt.toDouble * 1048576.0 / denom.toDouble).toLong

  test("d29 crafted corpus: in-domain doc outranks OOV doc, OOV weight exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d29").toString
    // Target LM corpus: tokens {red, blue}, V=2.
    //   bigrams: (red,blue) x3 with ctx(red)=3; (blue,red) x2 with ctx(blue)=2.
    Seq(
      (1L, "red blue red blue red blue", "en", "src0"),
      (10L, "red blue red blue", "en", "web"), // every bigram in-LM
      (20L, "zz qq zz qq", "en", "web"))       // every bigram OOV, unseen prevs
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("d29_perplexity_filter")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_w"),
          r.getAs[Long]("avg_w_milli"))).toMap
    assert(out.keySet == Set(10L, 20L)) // target doc is never scored
    val (nbA, swA, avgA) = out(10L)
    val (nbB, swB, avgB) = out(20L)
    assert(nbA == 3L && nbB == 3L)
    // Hand-derived weights: w(red,blue) = ilog(pratio(3+1, 3+2+1) + 1),
    // w(blue,red) = ilog(pratio(2+1, 2+2+1) + 1); doc 10 = two of the
    // former plus one of the latter.
    val wRB = ilog(pratio(4L, 6L) + 1L)
    val wBR = ilog(pratio(3L, 5L) + 1L)
    assert(swA == 2L * wRB + wBR)
    // Unseen prev => ctx 0: every OOV bigram weighs ilog(pratio(1, V+1)+1).
    val wOov = ilog(pratio(1L, 3L) + 1L)
    assert(swB == 3L * wOov)
    assert(avgA > avgB, s"in-domain $avgA must outrank OOV $avgB")
    assert(avgA == swA * 1000L / 3L && avgB == swB * 1000L / 3L)
  }

  test("d29 fuzz: random corpora match a pure-Scala brute force exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocabPool = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    (1 to 3).foreach { trial =>
      val tmp = java.nio.file.Files.createTempDirectory(s"d29f$trial").toString
      def sentence(n: Int): String =
        Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.length))).mkString(" ")
      val rows = (1L to 40L).map { id =>
        val src = if (id <= 10) "src0" else s"src${2 + rnd.nextInt(3)}"
        // lengths 0..7: exercises the no-bigram and single-token edges
        (id, sentence(rnd.nextInt(8)), "en", src)
      }
      rows.toDF("doc_id", "text", "lang", "source")
        .write.parquet(s"$tmp/documents.parquet")

      // pure-Scala brute force of the exact integer pipeline
      def toks(t: String) =
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val target = rows.filter(r => Set("src0", "src1")(r._4))
      val vocab = target.flatMap(r => toks(r._2)).distinct.size.toLong
      val cntB = target.flatMap(r => toks(r._2).sliding(2).filter(_.size == 2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ctx = cntB.groupBy(_._1.head).view.mapValues(_.values.sum).toMap
      def w(prev: String, tok: String): Long =
        cntB.get(Seq(prev, tok)) match {
          case Some(c) => ilog(pratio(c + 1L, ctx(prev) + vocab + 1L) + 1L)
          case None =>
            ilog(pratio(1L, ctx.getOrElse(prev, 0L) + vocab + 1L) + 1L)
        }
      val want = rows.filterNot(r => Set("src0", "src1")(r._4))
        .map(r => r._1 -> toks(r._2).sliding(2).filter(_.size == 2).toSeq)
        .filter(_._2.nonEmpty)
        .map { case (id, bgs) =>
          val sw = bgs.map(b => w(b.head, b(1))).sum
          id -> (bgs.size.toLong, sw,
            math.floor(sw.toDouble * 1000.0 / bgs.size.toDouble).toLong)
        }.toMap

      val got = SparkEntry.queries("d29_perplexity_filter")(spark, tmp)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_w"),
            r.getAs[Long]("avg_w_milli"))).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("d29 on testdata: all buckets populated, cutoffs honored, grain right") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val out = SparkEntry.queries("d29_perplexity_filter")(spark, dir)
    val rows = out.collect()
    // one row per non-target doc holding at least one bigram
    val expected = docs
      .where(!col("source").isin("src0", "src1"))
      .where(size(graft.operators.TextOps.tokens(col("text"))) >= 2)
      .count()
    assert(rows.length.toLong == expected)
    val byBucket = rows.groupBy(_.getAs[String]("ppl_bucket"))
    assert(byBucket.keySet == Set("head", "middle", "tail"),
      s"cutoffs must split the corpus, got ${byBucket.keySet}")
    rows.foreach { r =>
      val avg = r.getAs[Long]("avg_w_milli")
      val want =
        if (avg >= 29500L) "head" else if (avg >= 29100L) "middle" else "tail"
      assert(r.getAs[String]("ppl_bucket") == want)
    }
  }

  test("d26 held-out scoring: pred is the margin sign, accuracy beats 85%") {
    val rows = SparkEntry.queries("d26_quality_classifier")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pred = r.getAs[Long]("pred")
      val margin = r.getAs[Long]("margin")
      assert(pred == (if (margin > 0L) 1L else 0L))
    }
    val acc = rows.count(r =>
      r.getAs[Long]("pred") == r.getAs[Long]("label")).toDouble / rows.length
    // 95% at sf0.01; the sf0.001 held-out slice is ~100 docs, so the
    // bound leaves room for small-sample noise without masking a break.
    assert(acc >= 0.85, s"held-out accuracy $acc")
  }

  test("c10 selection: top-K only, raw pool only, weights descending") {
    val rows = SparkEntry.queries("c10_dsir_importance")(spark, dir).collect()
    assert(rows.length == 100)
    assert(rows.forall(r => !Set("src0", "src1")(r.getAs[String]("source"))))
    val ws = rows.map(_.getAs[Long]("weight"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }
}
