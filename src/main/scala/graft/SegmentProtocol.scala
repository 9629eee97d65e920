package graft

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** The segment-store commit kernel — the q121 marker protocol as a
  * first-class thing (r19): ONE implementation of the commit-marker /
  * fold / recover discipline that the engine's standing stores share
  * instead of carrying verbatim copies. Call sites:
  * [[graft.streaming.EventStream]] (sketch segments, q121),
  * [[graft.operators.MinhashStore]] (band/edge/decision segments,
  * q129), and [[graft.operators.Similarity]]'s IVFPQ index lifecycle
  * (codes compaction q130/q134/q135 and the whole-index retrain swap
  * q136). Everything goes through the Hadoop FileSystem API, so a
  * store lives wherever Spark wrote it; `rename()` on one filesystem
  * is the protocol's only atomicity primitive — exactly the assumption
  * Druid's segment handoff and Hive's INSERT OVERWRITE make
  * (reference: README.md:172-193's Druid segment/compaction model).
  *
  * Two protocols:
  *
  * '''FOLD''' — bound a `seg=<id>` table's read fan-in by folding old
  * segments into one base segment:
  *
  *   1. the folded rows are written to `_compact_tmp` under the table
  *      root (invisible to readers; the folded segments are intact),
  *   2. the `_COMPACT_TARGET` marker inside it — carrying the target
  *      segment id — is the COMMIT POINT,
  *   3. finish: delete every `seg=<id ≤ target>`, rename the tmp to
  *      `seg=<target>`, drop the marker last (a crash right there
  *      leaves a "_"-file parquet readers ignore).
  *
  * READERS NEVER MUTATE (r19, ADVICE): a read concurrent with an
  * in-flight compaction must not delete the writer's unmarked tmp —
  * the old reader-side "abandon or finish" recovery could do exactly
  * that, and a reader-side finish could race a second reader's finish.
  * Instead readers take [[readView]], which reads AROUND a
  * committed-but-unfinished fold: on-disk segments strictly above the
  * marker's target stay live, and the tmp dir itself stands in for
  * `seg=<target>` (it is complete — the marker says so — and the
  * possibly half-deleted folded segments ≤ target are all superseded
  * by it). Every mutation — finishing a crashed fold forward,
  * abandoning a pre-marker tmp — is WRITER-CLASS: it runs at the start
  * of the next fold ([[recoverFold]]) under the store's single-writer
  * rule, where nothing can race it.
  *
  * '''SWAP''' — replace a whole directory (an index layout, a full
  * rebuild) behind readers' backs:
  *
  *   1. the replacement is built in a sibling tmp dir,
  *   2. a marker file inside it is the commit point,
  *   3. finish: park `live` as `old`, promote tmp to `live`, drop the
  *      marker, drop the parked copy.
  *
  * [[recoverSwap]] is writer-class and handles every crash window:
  * pre-marker tmp → abandon (live intact); marker-committed tmp →
  * finish forward (park may or may not have happened); tmp gone but
  * parked copy or in-live marker left → drop the stragglers. Readers
  * that must answer DURING the window between the two renames (live
  * parked, tmp not yet promoted) read the committed tmp directly —
  * see [[swapReadPath]].
  */
object SegmentProtocol {

  val FoldTmp = "_compact_tmp"
  val FoldMarker = "_COMPACT_TARGET"
  val SwapMarker = "_SWAP_READY"

  def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Segment ids with a `seg=<id>` dir under `root`, ascending.
    * Driver-side listing — O(segments) names, no job.
    */
  def segIdsOnDisk(fs: FileSystem, root: String): Seq[Long] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("seg="))
      .map(_.stripPrefix("seg=").toLong).sorted
  }

  /** True when `dir` exists and holds at least one non-hidden file —
    * the guard that keeps an empty segment (a batch that wrote only
    * _SUCCESS, or nothing) out of a parquet path list, where it would
    * fail schema inference for the whole union.
    */
  def hasDataFiles(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && {
      val it = fs.listFiles(dir, true)
      var hasData = false
      while (!hasData && it.hasNext) {
        val name = it.next().getPath.getName
        hasData = !name.startsWith("_") && !name.startsWith(".")
      }
      hasData
    }

  /** The committed-but-unfinished fold under `root`, if any:
    * (tmp path, target segment id). Pre-marker tmps are NOT reported —
    * to a reader they do not exist.
    */
  def committedFold(fs: FileSystem, root: String): Option[(Path, Long)] = {
    val tmp = new Path(root, FoldTmp)
    val marker = new Path(tmp, FoldMarker)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val target = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
                   finally in.close()
      Some((tmp, target))
    }
  }

  /** The reader's view of a fold table: (live on-disk segment ids,
    * committed fold). Ids ≤ a committed fold's target are superseded
    * by the tmp (which stands in for `seg=<target>`) and excluded —
    * they may be half-deleted by a crashed finish, and reading them
    * TOGETHER with the tmp would double-count. Purely observational:
    * never mutates, so it is safe concurrent with the single writer.
    */
  def readView(fs: FileSystem, root: String): (Seq[Long], Option[(Path, Long)]) = {
    val fold = committedFold(fs, root)
    val cut = fold.map(_._2).getOrElse(Long.MinValue)
    (segIdsOnDisk(fs, root).filter(_ > cut), fold)
  }

  /** WRITER-CLASS recovery: finish a marker-committed fold forward,
    * abandon a pre-marker tmp. Run at the start of every fold (and
    * any other store MUTATION), never from a read path.
    */
  def recoverFold(fs: FileSystem, root: String): Unit = {
    val tmp = new Path(root, FoldTmp)
    if (!fs.exists(tmp)) return
    if (fs.exists(new Path(tmp, FoldMarker))) finishFold(fs, root)
    else fs.delete(tmp, true) // crashed before the commit point
  }

  /** The fold's commit: write the `target` marker into the
    * already-written tmp (the commit point — the folded data and its
    * _SUCCESS are durable first) and finish the fold.
    */
  def commitFold(fs: FileSystem, root: String, target: Long): Unit = {
    val out = fs.create(new Path(new Path(root, FoldTmp), FoldMarker), true)
    try out.write(target.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    finishFold(fs, root)
  }

  private def finishFold(fs: FileSystem, root: String): Unit = {
    val tmp = new Path(root, FoldTmp)
    val markerPath = new Path(tmp, FoldMarker)
    val in = fs.open(markerPath)
    val target = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
                 finally in.close()
    segIdsOnDisk(fs, root).filter(_ <= target)
      .foreach(i => fs.delete(new Path(s"$root/seg=$i"), true))
    val dst = new Path(s"$root/seg=$target")
    require(fs.rename(tmp, dst),
      s"fold rename $tmp -> $dst failed — same-filesystem rename is " +
        "the protocol's atomicity primitive")
    // marker cleanup LAST: until the rename lands, the marker is the
    // only thing telling recovery the folded data lives in tmp. A
    // crash right here leaves a "_"-file parquet readers ignore.
    fs.delete(new Path(dst, FoldMarker), false)
  }

  // ------------------------------------------------------------------
  // SWAP protocol
  // ------------------------------------------------------------------

  /** Commit and execute a whole-directory swap: `marker` into the
    * fully-written `tmp` is the commit point; then park-promote-drop.
    * Writer-class, single-writer.
    */
  def commitSwap(fs: FileSystem, live: Path, old: Path, tmp: Path,
                 marker: String = SwapMarker): Unit = {
    fs.create(new Path(tmp, marker), true).close()
    finishSwap(fs, live, old, tmp, marker)
  }

  private def finishSwap(fs: FileSystem, live: Path, old: Path, tmp: Path,
                         marker: String): Unit = {
    if (fs.exists(live)) {
      fs.delete(old, true) // a stale parked copy from an older crash
      require(fs.rename(live, old), s"swap: parking $live as $old failed")
    }
    require(fs.rename(tmp, live),
      s"swap: promoting $tmp into $live failed — recoverSwap finishes " +
        "this forward")
    fs.delete(new Path(live, marker), false)
    fs.delete(old, true)
  }

  /** WRITER-CLASS swap recovery — finish forward or abandon; no-op on
    * a healthy layout. States, per [[commitSwap]]'s write order:
    * tmp without marker = crashed pre-commit, live intact → abandon
    * tmp; tmp with marker = replacement complete → finish forward;
    * no tmp = the promote landed → drop a leftover parked copy and
    * the in-live marker if the crash hit between those deletes.
    */
  def recoverSwap(fs: FileSystem, live: Path, old: Path, tmp: Path,
                  marker: String = SwapMarker): Unit = {
    if (fs.exists(tmp)) {
      if (fs.exists(new Path(tmp, marker))) finishSwap(fs, live, old, tmp, marker)
      else fs.delete(tmp, true)
    } else {
      val inLive = new Path(live, marker)
      if (fs.exists(inLive)) fs.delete(inLive, false)
      fs.delete(old, true)
    }
  }

  /** The READ-ONLY answer to "where is the live copy right now?"
    * during a swap: `live` when it exists; the committed `tmp` inside
    * the window between park and promote (the replacement is complete
    * — the marker says so — and reading it is exactly what the
    * finished swap would serve). Never mutates; a reader concurrent
    * with the single writer is always served a complete layout.
    */
  def swapReadPath(fs: FileSystem, live: Path, tmp: Path,
                   marker: String = SwapMarker): Path =
    if (fs.exists(live)) live
    else if (fs.exists(new Path(tmp, marker))) tmp
    else live // caller's read of the absent live dir raises its own error
}
