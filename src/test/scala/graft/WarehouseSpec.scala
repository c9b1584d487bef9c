package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse-build family (q18-q20) + the round-2 additions d06/v04. */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = SharedSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q18 snowflake chain: every part resolves both hierarchy FKs") {
    val df = run("q18_dim_snowflake_chain")
    assert(df.where(col("type_sk").isNull || col("seg_sk").isNull).count() == 0)
    // surrogate keys dense 1..n at each level
    val typeSks = df.select("type_sk").distinct().collect().map(_.getLong(0)).sorted
    assert(typeSks.sameElements(1L to typeSks.length))
    val segSks = df.select("seg_sk").distinct().collect().map(_.getLong(0)).sorted
    assert(segSks.sameElements(1L to segSks.length))
    // hierarchy is consistent: a type maps to exactly one segment
    val fanout = df.groupBy("type_sk")
      .agg(countDistinct("seg_sk").as("n")).where(col("n") > 1)
    assert(fanout.count() == 0)
  }

  test("q19 junk dim: one row per flag combination, urgency derived") {
    val df = run("q19_junk_dim").collect()
    // named getters: SurrogateKeys.dense prepends junk_sk, so positions shift
    assert(df.length == df.map(r => (r.getAs[String]("order_status"),
      r.getAs[String]("order_priority"))).distinct.length)
    df.foreach { r =>
      val want =
        if (Set("1-URGENT", "2-HIGH").contains(r.getAs[String]("order_priority"))) 1 else 0
      assert(r.getAs[Int]("is_urgent") == want)
    }
    assert(df.map(_.getAs[Long]("junk_sk")).sorted.sameElements(1L to df.length))
  }

  test("q20 fact: grain preserved, every FK resolves") {
    val df = run("q20_fact_star")
    val li = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(df.count() == li)
    // testdata is referentially intact → no NULL FKs after resolution
    assert(df.where(col("customer_sk").isNull || col("junk_sk").isNull ||
      col("order_date_key").isNull).count() == 0)
  }

  test("d06 BPE counting: piece lengths reassemble the trimmed text") {
    val df = run("d06_bpe_token_count")
    assert(df.where(col("n_bpe_tokens") <= 0).count() == 0)
    assert(df.where(col("sum_piece_len") < col("n_bpe_tokens")).count() == 0)
  }

  test("d07 stopword ppm is exact integer math within [0, 1e6]") {
    run("d07_stopword_ratio").collect().foreach { r =>
      val ppm = r.getAs[Long]("stopword_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(ppm == r.getAs[Long]("n_stopwords") * 1000000L /
        math.max(r.getAs[Long]("n_tokens"), 1L))
    }
  }

  test("q24 HLL estimate lands within the 5% bound (hll_ok flag)") {
    run("q24_approx_distinct").collect().foreach { r =>
      assert(r.getAs[Long]("exact_customers") > 0L)
      assert(r.getAs[Int]("hll_ok") == 1,
        s"priority=${r.getString(0)} HLL estimate outside 50000ppm bound")
    }
  }

  test("q29 quantiles: p50 <= p95, both actual data values, sketch in bound") {
    val o = graft.sources.Tables.load(spark, SharedSpark.sf0001, "orders")
    val prices = o.select("o_totalprice").collect().map(_.getDouble(0)).toSet
    run("q29_percentiles").collect().foreach { r =>
      val p50 = r.getAs[Double]("p50"); val p95 = r.getAs[Double]("p95")
      assert(p50 <= p95)
      assert(prices.contains(p50) && prices.contains(p95)) // picked, not interpolated
      assert(r.getAs[Int]("p95_approx_ok") == 1)
    }
  }

  test("q30 group top-k: exactly k per nation, descending within group") {
    val rows = run("q30_group_topk").collect()
    rows.groupBy(_.getString(0)).values.foreach { grp =>
      assert(grp.length <= 3)
      val revs = grp.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("revenue"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q31 SCD-1 upsert: one row per key, updates win, others untouched") {
    val c = graft.sources.Tables.load(spark, SharedSpark.sf0001, "customer")
    val merged = run("q31_scd_upsert").cache()
    assert(merged.count() == c.count()) // upsert never changes cardinality
    val base = c.select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    merged.collect().foreach { r =>
      val k = r.getLong(0); val bal = r.getDouble(2)
      if (k % 10 == 0) assert(math.abs(bal - (base(k) + 100.0)) < 1e-6, k)
      else assert(bal == base(k), k)
    }
  }

  test("q33 grouping sets: two margins + grand total, gid separates them") {
    import org.apache.spark.sql.functions._
    val rows = run("q33_grouping_sets").collect()
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val nFlags = li.select("l_returnflag").distinct().count()
    val nStatus = li.select("l_linestatus").distinct().count()
    assert(rows.length == nFlags + nStatus + 1)
    // gid: 1 = by flag (status rolled up), 2 = by status, 3 = grand total
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(1L, 2L, 3L))
    assert(byGid(1L).length == nFlags && byGid(2L).length == nStatus)
    // each margin's row counts re-sum to the table size
    val total = li.count()
    assert(byGid(1L).map(_.getAs[Long]("n_rows")).sum == total)
    assert(byGid(2L).map(_.getAs[Long]("n_rows")).sum == total)
    assert(byGid(3L).head.getAs[Long]("n_rows") == total)
  }

  test("q32 SCD-2 history: compacted, contiguous intervals, one current row per key") {
    val rows = run("q32_scd2_history").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cust_key")).values.foreach { grp =>
      val hist = grp.sortBy(_.getAs[Long]("version"))
      // versions are dense 1..n
      assert(hist.map(_.getAs[Long]("version")).sameElements(1L to hist.length))
      // change compaction: consecutive versions never repeat the value
      val prios = hist.map(_.getAs[String]("priority"))
      assert(prios.zip(prios.tail).forall { case (a, b) => a != b })
      // intervals stitch: valid_to of v == valid_from of v+1; ranges ordered
      hist.zip(hist.tail).foreach { case (cur, nxt) =>
        val to = cur.get(cur.fieldIndex("valid_to"))
        assert(to == nxt.get(nxt.fieldIndex("valid_from")))
        val from = cur.get(cur.fieldIndex("valid_from"))
          .asInstanceOf[Comparable[Any]]
        assert(from.compareTo(to) <= 0)
      }
      // exactly the last version is current (open-ended)
      assert(hist.init.forall(_.getAs[Long]("is_current") == 0L))
      assert(hist.last.getAs[Long]("is_current") == 1L)
      assert(hist.last.isNullAt(hist.last.fieldIndex("valid_to")))
    }
  }

  test("q28 bucketized range join equals the naive non-equi self-join") {
    import org.apache.spark.sql.functions._
    val dir = SharedSpark.sf0001
    val e = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val a = e.toDF("event_a", "user_id", "sec_a")
    val b = e.toDF("event_b", "b_user", "sec_b")
    val naive = a.join(b,
        col("user_id") === col("b_user") &&
        col("event_a") < col("event_b") &&
        abs(col("sec_a") - col("sec_b")) < 86400L)
      .select(col("event_a"), col("event_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketized = run("q28_range_join")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(bucketized == naive)
  }

  test("q34 funnel: counts match a naive per-user recompute, ppm exact") {
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val byUser = events.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Option[java.sql.Timestamp]) =
      byUser.getOrElse(u, Array.empty).iterator
        .filter(e => e._2 == tpe && after.forall(a => e._3.after(a)))
        .map(_._3).reduceOption((a, b) => if (a.before(b)) a else b)
    val t1 = byUser.keys.flatMap(u => firstAfter(u, "view", None).map(u -> _)).toMap
    val t2 = t1.flatMap { case (u, t) => firstAfter(u, "click", Some(t)).map(u -> _) }
    val t3 = t2.flatMap { case (u, t) => firstAfter(u, "purchase", Some(t)).map(u -> _) }
    val got = run("q34_funnel").collect()
      .map(r => r.getAs[Long]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("conv_ppm"))).toMap
    assert(got(1L)._1 == t1.size && got(2L)._1 == t2.size && got(3L)._1 == t3.size)
    assert(got(1L)._2 == 1000000L)
    assert(got(2L)._2 == t2.size.toLong * 1000000L / t1.size)
    assert(got(3L)._2 == t3.size.toLong * 1000000L / t2.size)
    // strictly-ordered funnel can only shrink
    assert(t1.size >= t2.size && t2.size >= t3.size && t3.nonEmpty)
  }

  test("q35 retention: triangle matches a naive first-week recompute") {
    val mondayOf = (ts: java.sql.Timestamp) => {
      val d = ts.toLocalDateTime.toLocalDate
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    }
    val marks = graft.sources.Tables.load(spark, dir, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), mondayOf(r.getTimestamp(1))))
    val cohort = marks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = marks.map { case (u, w) =>
      (u, cohort(u).toString,
        java.time.temporal.ChronoUnit.DAYS.between(cohort(u), w) / 7)
    }.distinct
      .groupBy(m => (m._2, m._3)).view.mapValues(_.length.toLong).toMap
    val got = run("q35_retention_cohorts").collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("week_offset")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == expected)
    // offset 0 of each cohort counts the whole cohort
    cohort.values.toSet[java.time.LocalDate].foreach { c =>
      assert(got((c.toString, 0L)) == cohort.count(_._2 == c).toLong)
    }
  }

  test("q37 tolerance as-of: matched click is latest within 10 min, else null") {
    val tolUs = 600000000L
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 +
          (r.getTimestamp(3).getNanos / 1000) % 1000))
    val clicksByUser = events.filter(_._3 == "click").groupBy(_._2)
    val rows = run("q37_asof_tolerance").collect()
    assert(rows.length == events.count(_._3 == "error"))
    var matched = 0
    rows.foreach { r =>
      val errUs = events.find(_._1 == r.getAs[Long]("event_id")).get._4
      val cands = clicksByUser.getOrElse(r.getAs[Long]("user_id"), Array.empty)
        .filter(c => c._4 <= errUs && errUs - c._4 <= tolUs)
      if (r.isNullAt(r.fieldIndex("click_id"))) {
        assert(cands.isEmpty, s"missed in-window click for ${r}")
      } else {
        matched += 1
        val best = cands.maxBy(c => (c._4, c._1))
        assert(r.getAs[Long]("click_id") == best._1)
        assert(r.getAs[Long]("gap_us") == errUs - best._4)
        assert(r.getAs[Long]("gap_us") >= 0L && r.getAs[Long]("gap_us") <= tolUs)
      }
    }
    assert(matched > 0 && matched < rows.length) // both branches exercised
  }

  test("q38 sliding windows: 4x coverage, on-the-hour slices equal q16") {
    val rows = run("q38_sliding_window").collect()
    val events = graft.sources.Tables.load(spark, dir, "events")
    // every event is covered by exactly len/slide = 4 windows
    assert(rows.map(_.getAs[Long]("n_events")).sum == 4L * events.count())
    // all starts align to the 15-minute grid
    rows.foreach { r =>
      val mm = r.getAs[String]("window_start").substring(14, 16).toInt
      assert(mm % 15 == 0)
      assert(r.getAs[String]("window_start").endsWith(":00")) // whole seconds
    }
    // the :00-aligned slices ARE q16's tumbling hour windows
    val hourly = rows.filter(_.getAs[String]("window_start").substring(14, 16) == "00")
      .map(r => (r.getAs[String]("window_start"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    val q16 = run("q16_events_window").collect()
      .map(r => (r.getAs[String]("window_start"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    assert(q16.nonEmpty && hourly == q16)
  }

  test("v04 IVF: neighbors come from the query's own cluster") {
    val rows = run("v04_ivf_ann").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      assert(rs.length <= 5)
      // one cluster per query
      assert(rs.map(_.getAs[Long]("cluster_id")).toSet.size == 1)
      assert(rs.forall(r => r.getAs[Long]("c_id") != r.getAs[Long]("q_id")))
    }
  }

  test("q51: SCD-2 intervals partition the timeline — every order matches exactly once") {
    // the invariant a valid_from/valid_to boundary bug breaks first: an
    // off-by-one (≤ vs <) double-matches orders landing on a change
    // date, a gap drops them. Conservation of n_orders against the raw
    // table proves exactly-once across every boundary in the data.
    val rows = SparkEntry.queries("q51_scd2_pointintime")(spark, SharedSpark.sf0001)
      .collect()
    val matched = rows.map(_.getAs[Long]("n_orders")).sum
    val total = graft.sources.Tables.load(spark, SharedSpark.sf0001, "orders").count()
    assert(matched == total,
      s"point-in-time join matched $matched of $total orders — boundary bug")
  }

  test("q54: the star is orphan-free on every FK edge, all six edges present") {
    val rows = SparkEntry.queries("q54_referential_integrity")(spark, SharedSpark.sf0001)
      .collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0L,
        s"orphans on ${r.getAs[String]("edge")} — load-order bug in the fixture or a broken anti-join")
    }
    // the coverage side carries real signal somewhere (orders without
    // line items exist in TPC-H-shaped data) — the census isn't vacuous
    assert(rows.exists(_.getAs[Long]("n_childless") > 0L))
  }
}
