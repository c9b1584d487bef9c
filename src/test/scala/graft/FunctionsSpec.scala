package graft

import graft.functions.{MinHashSig, TopKSmallest, VecDot}
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

  /** Window-rank reference for TopKSmallest: the textbook semantics the
    * bounded aggregate must reproduce under any partitioning. */
  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("key"), col("payload"))))
      .where(col("rk") <= k)
      .select(col("g"), col("key"), col("payload"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("key"), r.getAs[Long]("payload")))
      .toSet
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKSmallest.of(col("key"), col("payload"), k).as("kept"))
      .select(col("g"), explode(col("kept")).as("kv"))
      .select(col("g"), col("kv.key"), col("kv.payload"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("key"), r.getAs[Long]("payload")))
      .toSet

  test("TopKSmallest == rank window on random skewed data, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // one hot group (80% of rows) + many cold ones; duplicate keys force
    // the payload tie-break; payloads unique
    val rows = (0L until 2000L).map { i =>
      val g = if (rnd.nextInt(5) > 0) "hot" else s"g${rnd.nextInt(20)}"
      (g, rnd.nextInt(50).toLong, i)
    }
    for (parts <- Seq(1, 7, 32); k <- Seq(1, 3, 10)) {
      val df = rows.toDF("g", "key", "payload").repartition(parts)
      assert(aggTopK(df, k) == windowTopK(df, k),
        s"mismatch at parts=$parts k=$k")
    }
  }

  test("TopKSmallest: groups smaller than k, null keys skipped, asc order") {
    import spark.implicits._
    val df = Seq(
      ("a", java.lang.Long.valueOf(5L), 1L),
      ("a", java.lang.Long.valueOf(2L), 2L),
      ("a", null.asInstanceOf[java.lang.Long], 3L),
      ("b", java.lang.Long.valueOf(9L), 4L))
      .toDF("g", "key", "payload")
    val got = df.groupBy(col("g"))
      .agg(TopKSmallest.of(col("key"), col("payload"), 10).as("kept"))
      .collect().map(r => r.getAs[String]("g") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(got("a") == Seq((2L, 2L), (5L, 1L))) // null-key row dropped, ascending
    assert(got("b") == Seq((9L, 4L)))
  }

  test("TopKSmallest serialize/deserialize round-trips the bounded buffer") {
    val agg = graft.functions.TopKSmallest(
      Bridge.expression(lit(0L)), Bridge.expression(lit(0L)), 3)
    def pairs(b: TopKSmallest.Buffer) =
      b.sortedEntries.toSeq.map(e => (e.key, e.payload(0)))
    val buf = agg.createAggregationBuffer()
    Seq((9L, 1L), (2L, 2L), (2L, 1L), (7L, 3L), (1L, 9L))
      .foreach { case (k, p) => buf.offer(k, Array(p)) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(pairs(back) == Seq((1L, 9L), (2L, 1L), (2L, 2L)))
    // merging two buffers keeps the global k smallest
    val other = agg.createAggregationBuffer()
    Seq((0L, 5L), (8L, 8L)).foreach { case (k, p) => other.offer(k, Array(p)) }
    val merged = agg.merge(back, other)
    assert(pairs(merged) == Seq((0L, 5L), (1L, 9L), (2L, 1L)))
  }

  test("TopKSmallest sortable transform: order-preserving involution") {
    val ds = Seq(Double.NegativeInfinity, -1.5e300, -2.0, -1.0, -1e-300,
      -0.0, 0.0, 1e-300, 0.5, 1.0, 3.14, 1.5e300, Double.PositiveInfinity)
    // strict order preservation (±0.0 collapse: equal, not inverted)
    for (a <- ds; b <- ds) {
      val (sa, sb) = (TopKSmallest.sortableOf(a), TopKSmallest.sortableOf(b))
      if (a < b) assert(sa < sb || (a == 0.0 && b == 0.0), s"$a vs $b")
      if (a == b) assert(sa == sb, s"$a vs $b")
    }
    // exact round-trip (−0.0 comes back as the numerically-equal +0.0)
    ds.foreach { d =>
      val back = TopKSmallest.doubleOf(TopKSmallest.sortableOf(d))
      assert(back == d || (d == 0.0 && back == 0.0), s"round-trip $d")
    }
    // NaN sorts greatest, like Spark/DuckDB ascending sorts place it
    assert(TopKSmallest.sortableOf(Double.NaN) >
      TopKSmallest.sortableOf(Double.PositiveInfinity))
  }

  test("TopKSmallest DOUBLE keys == rank window, exact values, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate double keys (quantized to 1/8ths) force payload tie-breaks;
    // negatives and sign flips exercise the sortable transform
    val rows = (0L until 1500L).map { i =>
      val g = if (rnd.nextInt(4) > 0) "hot" else s"g${rnd.nextInt(10)}"
      (g, (rnd.nextInt(64) - 32) / 8.0, i)
    }
    def windowRef(df: org.apache.spark.sql.DataFrame, k: Int) = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rk", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("key"), col("payload"))))
        .where(col("rk") <= k)
        .select(col("g"), col("key"), col("payload"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    }
    for (parts <- Seq(1, 13); k <- Seq(1, 5)) {
      val df = rows.toDF("g", "key", "payload").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(TopKSmallest.of(col("key"), col("payload"), k).as("kept"))
        .select(col("g"), explode(col("kept")).as("kv"))
        .select(col("g"), col("kv.key"), col("kv.payload"))
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == windowRef(df, k), s"mismatch at parts=$parts k=$k")
    }
  }

  test("TopKSmallest struct payload: carried columns, tie-break on first field") {
    import spark.implicits._
    // key ties everywhere → selection is by (key, id); `extra` must ride
    // along without influencing which rows survive
    val df = Seq(
      ("a", 1.0, 3L, 30L), ("a", 1.0, 1L, 999L), ("a", 1.0, 2L, 20L),
      ("a", 0.5, 9L, 90L), ("b", 2.0, 7L, 70L))
      .toDF("g", "key", "id", "extra").repartition(3)
    val got = df.groupBy(col("g"))
      .agg(TopKSmallest.of(col("key"), struct(col("id"), col("extra")), 2)
        .as("kept"))
      .select(col("g"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("g"), col("pos"), col("kv.key"),
        col("kv.payload.id"), col("kv.payload.extra"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("a", 0, 0.5, 9L, 90L), ("a", 1, 1.0, 1L, 999L), ("b", 0, 2.0, 7L, 70L)))
  }
}
