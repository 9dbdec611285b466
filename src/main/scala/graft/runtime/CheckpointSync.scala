package graft.runtime

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.SparkSession

/** Checkpoint synchronization to a remote location
  * (docs/pipelines/checkpoint-sync.md): push a [[DurableRunner]]'s
  * state directory (journal + snapshots) to an object-store/remote
  * path, and restore it at startup — the disaster-recovery and
  * standby-pipeline mechanics. The reference drives rclone against an
  * S3 bucket; here the remote is any Hadoop `FileSystem` URI (a plain
  * directory always works; `s3a://` works once the object-store jars
  * are present), which is the same one-binary-no-sidecar property.
  *
  * Mirror discipline (what makes a PULLED state safe to open):
  *   - data files copy BEFORE commit markers (`_COMMIT`), so a reader
  *     of a half-pushed remote sees at worst an uncommitted batch or
  *     snapshot — exactly the states [[DurableRunner]]'s replay already
  *     ignores;
  *   - files deleted locally (journal truncation by `compact`) are
  *     removed from the remote after the new snapshot's marker lands —
  *     a pull raced against that push still finds a committed snapshot
  *     plus a superset journal, which replays correctly (batches at or
  *     below the snapshot are skipped by id).
  *
  * Pushes are incremental: a file is re-copied only when its length
  * differs (journal/snapshot files are write-once; `_DELIVERED` marks
  * appear, never mutate).
  */
object CheckpointSync {

  private def fs(spark: SparkSession, p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  private def listRec(f: FileSystem, root: Path): Seq[Path] =
    if (!f.exists(root)) Seq.empty
    else {
      val it = f.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) buf += it.next().getPath
      buf.toSeq
    }

  private def rel(root: Path, p: Path): String =
    root.toUri.relativize(p.toUri).getPath

  private def copyFile(srcFs: FileSystem, src: Path, dstFs: FileSystem,
      dst: Path): Unit = {
    dstFs.mkdirs(dst.getParent)
    val in = srcFs.open(src)
    try {
      val out = dstFs.create(dst, true)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
  }

  private def isMarker(name: String): Boolean =
    name == "_COMMIT" || name == "_DELIVERED"

  /** Push `stateDir` to `remoteDir` (incremental mirror). Returns the
    * number of files copied.
    */
  def push(spark: SparkSession, stateDir: String, remoteDir: String): Int = {
    val (lf, lroot0) = fs(spark, stateDir)
    val lroot = lf.makeQualified(lroot0)
    val (rf, rroot0) = fs(spark, remoteDir)
    val rroot = rf.makeQualified(rroot0)
    rf.mkdirs(rroot)
    val local = listRec(lf, lroot).map(p => rel(lroot, p) -> p).toMap
    val remote = listRec(rf, rroot).map(p => rel(rroot, p) -> p).toMap
    def lenOf(f: FileSystem, p: Path): Long = f.getFileStatus(p).getLen
    val toCopy = local.filter { case (r, p) =>
      !remote.contains(r) || lenOf(rf, remote(r)) != lenOf(lf, p) }
    // data first, markers last — a torn push is an uncommitted batch
    val (markers, data) = toCopy.partition { case (r, _) =>
      isMarker(new Path(r).getName) }
    (data.toSeq ++ markers.toSeq).foreach { case (r, p) =>
      copyFile(lf, p, rf, new Path(rroot, r)) }
    // drop remote files gone locally (journal truncation) AFTER the new
    // state is fully present
    remote.keys.filterNot(local.contains)
      .foreach(r => rf.delete(new Path(rroot, r), false))
    toCopy.size
  }

  /** Pull `remoteDir` into `stateDir` (same mirror, reversed) —
    * `start_from_checkpoint: latest` at startup, or a standby's
    * periodic catch-up. Open the [[DurableRunner]] AFTER the pull.
    */
  def pull(spark: SparkSession, remoteDir: String, stateDir: String): Int =
    push(spark, remoteDir, stateDir)
}
