package graft

import graft.functions.{MinHashSig, VecDot}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Fixed-seed randomized parity tests: odd unicode, empty strings,
  * boundary sizes — inputs the real testdata never produces. One Spark
  * job per property (a generated batch), not one per sample. */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val P = 1000000007L
  private val As = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val Bs = Seq(1L, 12346L, 24691L, 37036L, 49381L, 61726L, 74071L, 86416L)

  test("MinHashSig matches the HOF tree on 500 random shingle arrays") {
    import spark.implicits._
    val rnd = new Random(42)
    def randToken(): String = {
      val alphabets = Seq("abcxyz", "0189", "äöüßéç", "中文字符", "!?#")
      val a = alphabets(rnd.nextInt(alphabets.length))
      (0 until (1 + rnd.nextInt(6))).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    val rows = (1 to 500).map { i =>
      val n = rnd.nextInt(40) // includes empty arrays
      (i.toLong, (0 until n).map(_ => randToken()))
    }
    val df = rows.toDF("id", "sh")
    val fast = Bridge.column(MinHashSig(Bridge.expression(col("sh")), As, Bs, P))
    val ref = {
      val hs = transform(col("sh"), x =>
        pmod(conv(substring(md5(x), 1, 15), 16, 10).cast(LongType), lit(P)))
      array(As.indices.map { k =>
        coalesce(array_min(transform(hs, h => pmod(h * As(k) + Bs(k), lit(P)))), lit(-1L))
      }: _*)
    }
    assert(df.select(fast.as("a"), ref.as("b")).where(col("a") =!= col("b")).count() == 0)
  }

  test("VecDot matches the HOF fold on 500 random double/float vectors") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (1 to 500).map { i =>
      val n = rnd.nextInt(80)
      val a = (0 until n).map(_ => (rnd.nextDouble() * 2 - 1).toFloat)
      val b = (0 until n).map(_ => (rnd.nextGaussian() * 100).toFloat)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val fast = Bridge.column(VecDot(Bridge.expression(col("a")), Bridge.expression(col("b"))))
    val ref = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    // bitwise: same fold order → no tolerance needed even for NaN-free random data
    assert(df.select(fast.as("f"), ref.as("r")).where(col("f") =!= col("r")).count() == 0)
  }

  test("keyed dedup (q04 shape) is idempotent on random duplicated keys") {
    import spark.implicits._
    val rnd = new Random(13)
    val rows = (1 to 2000).map { i =>
      (rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(1000))
    }
    val df = rows.toDF("k", "id", "v")
    import org.apache.spark.sql.expressions.Window
    def dedup(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("id"))))
        .where(col("rn") === 1).drop("rn")
    val once = dedup(df)
    val twice = dedup(once)
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.count() == df.select("k").distinct().count())
  }

  test("bucketized temporal pairs equal the naive pairing on random inputs") {
    import spark.implicits._
    val rnd = new Random(1234)
    val W = 1000L
    // negative epochs + values clustered near bucket boundaries
    val rows = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(12).toLong,
        (rnd.nextInt(20) - 10) * W + rnd.nextInt(2 * W.toInt) - W)
    }
    val got = graft.operators.Analytics
      .temporalPairs(rows.toDF("event_id", "user_id", "sec"), W)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) < W
    } yield (a._1, b._1)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("as-of union-merge equals the join+rank reference on random inputs") {
    import spark.implicits._
    val rnd = new Random(2026)
    // 12 users × 40 days: plenty of same-user-same-date order ties (key
    // tie-break exercised), plus events before any order (NULL path).
    val events = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(12).toLong,
        86400L * rnd.nextInt(40) + rnd.nextInt(86400), "e" + rnd.nextInt(3))
    }.toDF("event_id", "user_id", "sec", "event_type")
      .withColumn("ts", col("sec").cast(TimestampType)).drop("sec")
    val orders = (1 to 200).map { i =>
      (rnd.nextInt(12).toLong, (1000 + i).toLong, 86400L * rnd.nextInt(40))
    }.toDF("o_custkey", "o_orderkey", "dsec")
      .withColumn("o_orderdate", col("dsec").cast(TimestampType)).drop("dsec")
    val cols = Seq("event_id", "user_id", "event_type", "last_orderkey", "last_orderdate")
    val merge = graft.operators.Analytics.asofMerge(events, orders)
      .select(cols.map(col): _*).collect().toSet
    val rank = graft.operators.Analytics.asofJoinRank(events, orders)
      .select(cols.map(col): _*).collect().toSet
    assert(merge.exists(_.isNullAt(3)), "want some events with no prior order")
    assert(merge.exists(!_.isNullAt(3)), "want some matched events")
    assert(merge == rank)
  }

  test("sessionization session count equals independent gap count") {
    import spark.implicits._
    val rnd = new Random(99)
    val gapMs = 60000L
    val base = 1700000000000L
    // deliberate 10s grid → exact-gap pairs occur, pinning the boundary
    // semantics: session_window merges touching sessions (diff == gap)
    val events = (1 to 1500).map { i =>
      val uid = rnd.nextInt(20).toLong
      val ts = base + rnd.nextInt(20000) * 10000L
      EventStreams.Event(i.toLong, new java.sql.Timestamp(ts), uid, "e", 1.0)
    }
    val totalSessions = EventStreams
      .sessionWindows(events.toDS().toDF(), "1 minute").count()
    // independent per-user computation in plain Scala
    val want = events.groupBy(_.user_id).values.map { es =>
      val ts = es.map(_.ts.getTime).distinct.sorted
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > gapMs }
    }.sum
    assert(totalSessions == want)
  }

  test("connected components equal driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 3).foreach { trial =>
      // sparse random graph: long chains and small clusters both occur
      val nodes = 60 + rnd.nextInt(40)
      val pairs = (1 to 80).map { _ =>
        val a = rnd.nextInt(nodes).toLong
        val b = rnd.nextInt(nodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val got = graft.operators.Dedup
        .connectedComponents(pairs.toDF("doc_a", "doc_b"))
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("canonical_id"), r.getAs[Long]("comp_size")))
        .toMap
      // reference: plain union-find over the same pairs
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = parent.keys.toSeq.groupBy(find)
      val want = members.flatMap { case (_, ms) =>
        val canon = ms.min; ms.map(_ -> (canon, ms.size.toLong))
      }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("int8 quantization: range, power-of-2 scale invariance, bounded cosine drift") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new Random(13)
    val rows = (1 to 300).map { i =>
      val n = 4 + rnd.nextInt(64)
      val v = (0 until n).map(_ => (rnd.nextGaussian() * math.pow(10, rnd.nextInt(3) - 1)).toFloat)
      // power-of-2 scaling is FP-exact, so quantization must be bit-stable
      // under it (amax and every element scale by exactly 2^k)
      val k = rnd.nextInt(7) - 3
      (i.toLong, v, v.map(x => (x * math.pow(2, k)).toFloat))
    }
    val df = rows.toDF("id", "v", "vs")
      .select(col("id"), col("v"), col("vs"),
        Similarity.absMax(col("v")).as("am"), Similarity.absMax(col("vs")).as("ams"))
      .select(col("id"), col("v"),
        Similarity.int8(col("v"), col("am")).as("q"),
        Similarity.int8(col("vs"), col("ams")).as("qs"))
    val bad = df.where(col("q") =!= col("qs")).count()
    assert(bad == 0, s"$bad vectors quantize differently under 2^k scaling")
    // range: every quantized value in [-127, 127]
    assert(df.where(exists(col("q"),
      x => abs(x) > 127.0)).count() == 0)
    // cosine drift: int8 quantization is a mild perturbation (fixed seed,
    // deterministic — tolerance is empirical headroom, not a guess)
    val drift = df
      .select(
        (Similarity.dot(col("q"), col("q"))).as("qq"),
        (Similarity.dot(col("v"), col("v"))).as("vv"),
        (Similarity.dot(col("q"), col("v"))).as("qv"))
      .where(col("qq") > 0.0 && col("vv") > 0.0)
      .select((col("qv") / (sqrt(col("qq")) * sqrt(col("vv")))).as("cosqv"))
      .agg(min(col("cosqv"))).head().getDouble(0)
    // cos(q, v) ≈ 1: the quantized vector points almost exactly along v
    assert(drift > 0.99, s"quantized vector diverged from source: min cos = $drift")
  }

  test("funnel counts equal a driver-side brute force on random event sets") {
    import spark.implicits._
    import graft.operators.Analytics
    val rnd = new Random(23)
    val types = Seq("view", "click", "purchase", "noise")
    // dense timestamp grid forces equal-ts collisions and every ordering
    val rows = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(types.length)),
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(50) * 1000L))
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "ts")
    val got = Analytics.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    val byUser = rows.groupBy(_._2)
    def firstAfter(u: Long, tpe: String, after: Option[Long]): Option[Long] =
      byUser.getOrElse(u, Seq.empty).iterator
        .filter(e => e._3 == tpe && after.forall(e._4.getTime > _))
        .map(_._4.getTime).reduceOption((a, b) => math.min(a, b))
    val t1 = byUser.keys.flatMap(u => firstAfter(u, "view", None).map(u -> _)).toMap
    val t2 = t1.flatMap { case (u, t) => firstAfter(u, "click", Some(t)).map(u -> _) }
    val t3 = t2.flatMap { case (u, t) => firstAfter(u, "purchase", Some(t)).map(u -> _) }
    assert(got(1L) == t1.size.toLong && got(2L) == t2.size.toLong &&
      got(3L) == t3.size.toLong)
    assert(t1.size >= t2.size && t2.size >= t3.size)
  }

  test("subdoc dedup reconstructs collision-free docs verbatim; dups vanish") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new Random(31)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // unique-token docs: every segment globally unique -> identity
    val uniq = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(119) // < SegSize and multi-segment; never
      // empty (two empty docs share the "" segment and would collide)
      (i.toLong, (0 until n).map(j => s"u${i}x$j").mkString(" "))
    }
    // exact-copy docs of doc 1: every segment is a duplicate
    val copies = (101 to 103).map(i => (i.toLong, uniq.head._2))
    val got = TextOps.subdocDedup(
      (uniq ++ copies).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"),
          r.getAs[String]("rebuilt_digest"))).toMap
    uniq.foreach { case (id, text) =>
      val (nSeg, nKept, digest) = got(id)
      assert(nKept == nSeg, s"doc $id lost unique segments")
      assert(digest == md5hex(text), s"doc $id did not reconstruct verbatim")
    }
    copies.foreach { case (id, _) =>
      val (nSeg, nKept, digest) = got(id)
      assert(nSeg == got(1L)._1 && nKept == 0L && digest == md5hex(""),
        s"copy $id should lose every segment to doc 1")
    }
  }

  test("rollup algebra: merge ≡ full and retract ≡ rebuild on 600 collision-heavy random events") {
    // deliberately tiny key space (3 dates × 2 types × 4 users = 24
    // grains for 600 events) so every grain spans cohorts and most
    // grains lose extrema to the deletion — the folds that a wrong
    // merge/retract cannot survive
    import spark.implicits._
    import graft.operators.MatView
    val rnd = new Random(4242)
    val rows = (1 to 600).map { i =>
      (i.toLong,
        java.sql.Timestamp.valueOf(
          f"2026-02-${1 + rnd.nextInt(3)}%02d 0${rnd.nextInt(10)}:00:00"),
        rnd.nextInt(4).toLong,
        if (rnd.nextBoolean()) "a" else "b",
        math.round(rnd.nextDouble() * 1e4) / 1e4)
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    val full = MatView.eventPartials(ev)
    // random 3-way split, merged pairwise in both association orders
    val (c0, c1, c2) = (
      ev.where(pmod(col("event_id"), lit(3)) === 0),
      ev.where(pmod(col("event_id"), lit(3)) === 1),
      ev.where(pmod(col("event_id"), lit(3)) === 2))
    val left = MatView.merge(
      MatView.merge(MatView.eventPartials(c0), MatView.eventPartials(c1)),
      MatView.eventPartials(c2))
    val right = MatView.merge(MatView.eventPartials(c0),
      MatView.merge(MatView.eventPartials(c1), MatView.eventPartials(c2)))
    assert(same(left, full), "3-way merge (left assoc) diverged from full")
    assert(same(right, full), "3-way merge (right assoc) diverged from full")
    // random deletion: retract ≡ rebuild-from-remaining
    val del = ev.where(pmod(col("event_id"), lit(7)) === 3)
    val rem = ev.where(pmod(col("event_id"), lit(7)) =!= 3)
    assert(same(MatView.retract(full, del, rem), MatView.eventPartials(rem)),
      "retract diverged from the rebuild")
  }
}
