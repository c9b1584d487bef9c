package graft

import graft.functions.{MinHashSig, VecDot}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the custom Catalyst expressions against the built-in
  * HOF trees they replaced — the load-bearing guarantee: the fast path
  * must be indistinguishable from the (oracle-mirrored) slow path. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val P = 1000000007L
  private val As = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val Bs = Seq(1L, 12346L, 24691L, 37036L, 49381L, 61726L, 74071L, 86416L)

  /** The original (slow, oracle-shaped) minhash tree. */
  private def refMinhash(sh: org.apache.spark.sql.Column) = {
    val hs = transform(sh, x =>
      pmod(conv(substring(md5(x), 1, 15), 16, 10).cast(LongType), lit(P)))
    array(As.indices.map { k =>
      coalesce(array_min(transform(hs, h => pmod(h * As(k) + Bs(k), lit(P)))), lit(-1L))
    }: _*)
  }

  test("MinHashSig == reference HOF tree on real document shingles") {
    val d = graft.sources.Tables.load(spark, SharedSpark.sf0001, "documents")
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    val base = d.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= 3,
          transform(sequence(lit(1), size(col("toks")) - 2), i =>
            concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
          .otherwise(col("toks")).as("sh"))
    val fast = Bridge.column(MinHashSig(Bridge.expression(col("sh")), As, Bs, P))
    val diff = base
      .select(col("doc_id"), fast.as("a"), refMinhash(col("sh")).as("b"))
      .where(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  test("MinHashSig edge cases: empty, single, null arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a b c", "b c d"))),
      (2L, Some(Seq.empty[String])),
      (3L, Some(Seq("only"))),
      (4L, None)).toDF("id", "sh")
    val fast = Bridge.column(MinHashSig(Bridge.expression(col("sh")), As, Bs, P))
    val rows = df.select(col("id"), fast.as("a"), refMinhash(col("sh")).as("b"))
      .collect().sortBy(_.getLong(0))
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // empty and null both yield the -1 sentinel signature
    assert(rows(1).getSeq[Long](1).forall(_ == -1L))
    assert(rows(3).getSeq[Long](1).forall(_ == -1L))
  }

  test("MinHashSig is permutation- and duplication-invariant (min semantics)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("x y z", "p q r", "a b c")),
      (2L, Seq("a b c", "x y z", "p q r", "x y z", "a b c"))).toDF("id", "sh")
    val fast = Bridge.column(MinHashSig(Bridge.expression(col("sh")), As, Bs, P))
    val sigs = df.select(fast).collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
  }

  test("VecDot == zip_with+aggregate fold on real embeddings") {
    val e = graft.sources.Tables.load(spark, SharedSpark.sf0001, "embeddings")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("eb")))
      .where(col("ia") < col("ib")).limit(500)
    val ref = aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val fast = Bridge.column(VecDot(Bridge.expression(col("ea")), Bridge.expression(col("eb"))))
    // bitwise equality — no tolerance: same fold order, same IEEE ops
    assert(pairs.select(fast.as("a"), ref.as("b")).where(col("a") =!= col("b")).count() == 0)
  }

  test("VecDot null semantics: length mismatch and null element poison to NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f)),
      (2L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f)),
      (3L, Seq[java.lang.Float](1f, null), Seq[java.lang.Float](3f, 4f)))
      .toDF("id", "a", "b")
    val fast = Bridge.column(VecDot(Bridge.expression(col("a")), Bridge.expression(col("b"))))
    val rows = df.select(col("id"), fast.as("d")).collect().sortBy(_.getLong(0))
    assert(rows(0).getDouble(1) == 11.0)
    assert(rows(1).isNullAt(1))
    assert(rows(2).isNullAt(1))
  }
}
