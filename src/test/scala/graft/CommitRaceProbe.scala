package graft

import graft.sources.Snapshot

/** External-JVM writer for the cross-process commit race: a `main`
  * that drives the REAL [[Snapshot.commit]] loop (version discovery →
  * staged manifest → write-if-absent publish → rebase on loss) against
  * a shared layout root, with no Spark session — the commit protocol
  * is pure filesystem metadata, which is exactly why it can be raced
  * from separate processes. [[SnapshotConcurrencySpec]] forks several
  * of these concurrently and asserts dense versions with no lost
  * update: the proof that commit atomicity holds ACROSS PROCESSES
  * (hard-link publish), not just across threads in one driver.
  *
  * Each commit adds one synthetic manifest entry `event_date=d0/
  * w<id>-<i>.parquet` — commit never inspects data files, so the race
  * needs no parquet, only the metadata protocol under test. */
object CommitRaceProbe {
  def main(args: Array[String]): Unit = {
    val Array(path, writerId, nStr) = args
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    (0 until nStr.toInt).foreach { i =>
      val base = Snapshot.committedVersions(fs, root).lastOption
      Snapshot.commit(fs, root, base, Set.empty,
        Seq(s"event_date=d0/$writerId-$i.parquet"),
        Map("op" -> "append", "writer" -> writerId, "seq" -> i.toString))
    }
    println(s"PROBE-OK $writerId")
  }
}
