package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ATOMIC MULTI-TABLE CATALOG — the transaction scope ABOVE one table.
  *
  * A [[Snapshot]] commit is atomic per table root, which leaves the
  * classic torn pair: a fact table and its rollup each flip atomically,
  * but a reader between the two flips sees new fact + stale rollup.
  * Every warehouse that serves derived tables hits this; the table-
  * format answer (Iceberg REST catalog / Nessie, Delta commit
  * coordinators) is a CATALOG POINTER: one compare-and-swap file that
  * pins, for every registered table, the version a reader should
  * resolve. Table commits land first (durable but catalog-invisible,
  * exactly like WAP staging); ONE pointer swing then publishes the
  * whole transaction. Readers resolving through the catalog see every
  * table at the SAME transaction boundary — fully pre-txn or fully
  * post-txn, never torn.
  *
  * Mechanics mirror the manifest protocol, one level up: state lives
  * in immutable `_catalog-root/c-<seq>` files (`name=path@version`
  * lines, full state per file — a catalog holds FEW tables, so O(tables)
  * bytes per commit is trivial), published with the same
  * create-if-absent primitive manifests use. `commit(expectSeq = s)`
  * is a CAS: it publishes `c-(s+1)` and FAILS if another committer got
  * there first — the caller re-reads, re-derives, retries. Commit cost
  * is one tiny file write + one rename regardless of how much data the
  * transaction landed.
  *
  * Retention note: catalog-pinned versions are pinned LOGICALLY, not
  * physically — run [[Snapshot.expire]] with `keep` at least the
  * catalog history depth you still serve, or [[Snapshot.tag]] the
  * pinned versions (tags pin retention) for long-lived catalogs.
  */
object Catalog {

  private val Charset = java.nio.charset.StandardCharsets.UTF_8

  private def fsOf(spark: SparkSession, root: org.apache.hadoop.fs.Path) =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seqPath(root: org.apache.hadoop.fs.Path, seq: Long) =
    new org.apache.hadoop.fs.Path(root, f"c-$seq%012d")

  private def seqsOf(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("c-\\d+"))
      .map(_.stripPrefix("c-").toLong)
      .sorted

  private def readState(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      seq: Long): Map[String, (String, Long)] = {
    val p = seqPath(root, seq)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, Charset).split("\n").toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(name, rest) = l.split("=", 2)
        val at = rest.lastIndexOf('@')
        name -> (rest.substring(0, at), rest.substring(at + 1).toLong)
      }.toMap
  }

  /** `(seq, table -> (snapshot path, pinned version))` of the newest
    * catalog state; seq 0 with no tables when the catalog is empty. */
  def state(spark: SparkSession,
      catRoot: String): (Long, Map[String, (String, Long)]) = {
    val root = new org.apache.hadoop.fs.Path(catRoot)
    val fs = fsOf(spark, root)
    seqsOf(fs, root).lastOption match {
      case None => (0L, Map.empty)
      case Some(s) => (s, readState(fs, root, s))
    }
  }

  /** The catalog state as it was at `seq` — catalog time travel (every
    * pointer file is immutable, so past transactions stay readable
    * until their table versions expire). */
  def stateAt(spark: SparkSession, catRoot: String,
      seq: Long): Map[String, (String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(catRoot)
    val fs = fsOf(spark, root)
    require(seqsOf(fs, root).contains(seq),
      s"no catalog transaction c-$seq under $catRoot")
    readState(fs, root, seq)
  }

  /** All committed transaction sequence numbers, oldest first. */
  def seqs(spark: SparkSession, catRoot: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(catRoot)
    seqsOf(fsOf(spark, root), root)
  }

  /** ATOMICALLY publish one multi-table transaction: the new state is
    * the previous state overridden by `updates` (`name -> (path,
    * version)` — registering a new table and moving an existing one are
    * the same operation). CAS against `expectSeq` (what [[state]]
    * returned when the transaction derived its work): if another
    * transaction published first, throws [[SnapshotConflictException]]
    * — the caller re-reads, re-derives anything stale, and retries.
    * Every named version must already be committed in its table (the
    * catalog never points at thin air). Returns the new seq. */
  def commit(spark: SparkSession, catRoot: String,
      updates: Map[String, (String, Long)], expectSeq: Long): Long = {
    require(updates.nonEmpty, "catalog commit with no table updates")
    updates.foreach { case (name, (path, v)) =>
      require(name.nonEmpty && !name.contains("=") && !name.contains("\n"),
        s"invalid table name '$name'")
      require(Snapshot.versions(spark, path).contains(v),
        s"catalog commit pins $name -> $path@$v, which is not a " +
        "committed snapshot version — commit the table first")
    }
    val root = new org.apache.hadoop.fs.Path(catRoot)
    val fs = fsOf(spark, root)
    fs.mkdirs(root)
    val (cur, st) = seqsOf(fs, root).lastOption match {
      case None => (0L, Map.empty[String, (String, Long)])
      case Some(s) => (s, readState(fs, root, s))
    }
    if (cur != expectSeq)
      throw new SnapshotConflictException(
        s"catalog under $catRoot moved c-$expectSeq -> c-$cur during a " +
        "transaction — re-read the state and re-derive")
    val next = expectSeq + 1
    val body = (st ++ updates).toSeq.sortBy(_._1)
      .map { case (n, (p, v)) => s"$n=$p@$v" }
    val header = s"#ts=${System.currentTimeMillis()}"
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".tmp-${Sink.procTag}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write((header +: body).mkString("\n").getBytes(Charset))
    finally out.close()
    val won = Snapshot.publishIfAbsent(fs, tmp, seqPath(root, next))
    fs.delete(tmp, false): Unit
    if (!won)
      throw new SnapshotConflictException(
        s"catalog under $catRoot lost the CAS race for c-$next — " +
        "re-read the state and re-derive")
    next
  }

  /** Read table `name` at its catalog-pinned version — the torn-free
    * read: every table resolved from ONE catalog state is at the same
    * transaction boundary. */
  def readTable(spark: SparkSession, catRoot: String,
      name: String): DataFrame = {
    val (_, st) = state(spark, catRoot)
    val (path, v) = st.getOrElse(name,
      throw new IllegalArgumentException(
        s"no table '$name' in catalog $catRoot (has: ${st.keys.toSeq.sorted.mkString(", ")})"))
    Snapshot.readVersion(spark, path, v)
  }

  /** [[readTable]] at a PAST transaction — cross-table time travel. */
  def readTableAt(spark: SparkSession, catRoot: String, name: String,
      seq: Long): DataFrame = {
    val st = stateAt(spark, catRoot, seq)
    val (path, v) = st.getOrElse(name,
      throw new IllegalArgumentException(
        s"no table '$name' in catalog $catRoot at c-$seq"))
    Snapshot.readVersion(spark, path, v)
  }
}
