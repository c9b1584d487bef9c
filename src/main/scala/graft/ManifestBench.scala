package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.Snapshot

/** Metadata-tier microbenchmark for the incremental manifest format:
  * how much does ONE commit write, and how long does it take, as the
  * table's live-file count grows?
  *
  * The r15 format wrote the FULL live listing per commit (and re-wrote
  * it per rebase attempt) — O(files) where the change is O(1). The
  * incremental format writes one change segment + a ref-only manifest
  * list per commit, and pays the O(files) consolidation only on the
  * every-`Config.ManifestSegments`-th fold. This main measures exactly
  * that, with NO Spark session — commits are pure filesystem ops, which
  * is the point: at 100 TB the metadata path must not scale with the
  * data.
  *
  * Usage: `runMain graft.ManifestBench [liveFiles ...]`
  * (defaults: 1000 10000 100000 1000000). Prints one JSON line per
  * store size: steady-state per-commit millis + bytes (segment + list),
  * and the fold commit's millis + bytes (the amortized old-format
  * cost). */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(1000L, 10000L, 100000L, 1000000L)
    val commits = 2 * graft.Config.ManifestSegments + 2 // ≥ two folds
    sizes.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-mb-$n")
      try {
        val root = new Path(dir.toString, "store")
        val fs = root.getFileSystem(new Configuration())
        fs.mkdirs(root)
        // bootstrap: one commit naming n synthetic live entries (the
        // manifest tier never opens data files; entries are just lines)
        val base = (0L until n).map(i =>
          f"event_date=2024-01-01/seed-$i%07d.parquet")
        var v = Snapshot.commit(fs, root, None, Set.empty, base,
          Map("op" -> "init"), allowRebase = false)
        def manifestDirBytes(): Long =
          fs.listStatus(new Path(root, "_manifests"))
            .map(_.getLen).sum
        var steadyMs = List.empty[Double]
        var steadyBytes = List.empty[Long]
        var foldMs = List.empty[Double]
        var foldBytes = List.empty[Long]
        (1 to commits).foreach { i =>
          val before = manifestDirBytes()
          val t0 = System.nanoTime()
          v = Snapshot.commit(fs, root, Some(v), Set.empty,
            Seq(f"event_date=2024-01-01/delta-$i%05d.parquet"),
            Map("op" -> "append"))
          val ms = (System.nanoTime() - t0) / 1e6
          val wrote = manifestDirBytes() - before
          // a fold consolidates the chain into ONE segment — classify
          // by the new list's ref count (a byte threshold would
          // misclassify once the steady list itself grows large)
          val refs = scala.io.Source
            .fromFile(new java.io.File(root.toUri.getPath,
              f"_manifests/m-$v%012d"))
            .getLines().count(_.startsWith("@"))
          if (refs == 1) { foldMs ::= ms; foldBytes ::= wrote }
          else { steadyMs ::= ms; steadyBytes ::= wrote }
        }
        def stats(xs: List[Double]): (Double, Double) =
          if (xs.isEmpty) (0.0, 0.0)
          else (xs.sum / xs.size, xs.sorted.apply((xs.size - 1) * 95 / 100))
        val (mMean, mP95) = stats(steadyMs)
        val (fMean, _) = stats(foldMs)
        println(
          s"""{"metric":"manifest_commit","live_files":$n""" +
          s""","steady_commits":${steadyMs.size}""" +
          f""","steady_ms_mean":$mMean%.2f,"steady_ms_p95":$mP95%.2f""" +
          s""","steady_bytes_mean":${
            if (steadyBytes.isEmpty) 0L else steadyBytes.sum / steadyBytes.size}""" +
          s""","folds":${foldMs.size}""" +
          f""","fold_ms_mean":$fMean%.2f""" +
          s""","fold_bytes_mean":${
            if (foldBytes.isEmpty) 0L else foldBytes.sum / foldBytes.size}}""")
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(dir.toFile)
      }
    }
  }
}
