package graft.cube

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import scala.jdk.CollectionConverters._

/** C2 — transactional item publication (reference `publish_datacube`,
  * `processing.py:1038-1155`): every asset of an item is written to a WORK
  * directory first; publishing "commits" the item by moving its files into
  * the DATA directory only once the full asset set exists, then cleans the
  * item's work directory. A crash mid-write leaves the data dir untouched
  * and the re-run regenerates the work dir from scratch — the same
  * write-then-move discipline as the reference's `files_to_move` executed
  * after the database commit.
  */
object Publish {

  /** Work-directory path for one item's assets. */
  def itemWorkDir(workRoot: String, cube: String, tileId: String,
                  period: String): Path =
    Paths.get(workRoot, cube, tileId, period)

  /** Commit one item: move every regular file under `workDir` to the same
    * relative location under `dataRoot`, then remove the emptied work
    * tree. Existing targets are replaced (idempotent re-publish, the
    * reference's get_or_create + move), and a move that loses the race
    * to a DUPLICATE attempt of the same commit (speculative execution, a
    * zombie retry after a network blip) counts as done when the
    * destination exists — the committer runs on executors now, so two
    * attempts of one partition can walk the same item dirs. In-progress
    * staged temps ([[graft.core.Fs.StagedTempPrefix]] names, left by a
    * duplicate attempt killed mid-write) are swept, never moved.
    *
    * Returns the destination directory's full visible regular-file set —
    * deliberately NOT just what this attempt moved (a retried task whose
    * first attempt already moved some files must not under-report the
    * item's assets). The flip side: files a PREVIOUS publish left at the
    * destination are included too — e.g. an asset from an earlier run
    * with a different band set, which an idempotent re-publish replaces
    * by name but never deletes. Callers needing "what this run produced"
    * must intersect with the run's expected asset names; today's callers
    * only count the item's visible assets, for which this is the right
    * set.
    */
  def commitItem(workDir: Path, dataRoot: Path): Seq[Path] = {
    if (!Files.isDirectory(workDir)) return Nil
    // every walk/list stream here closes in try/finally: commitItem runs
    // per item on long-lived executors and tolerates concurrent duplicate
    // attempts — an iterator abandoned mid-walk by an exception would
    // otherwise pin directory handles until GC (fd exhaustion over
    // thousands of item commits)
    val walked = {
      val s = Files.walk(workDir)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .toList.sortBy(_.toString)
      finally s.close()
    }
    val (temps, files) = walked.partition(graft.core.Fs.isStagedTemp)
    // a temp here is an abandoned in-flight write from a duplicate
    // attempt that lost its race — its finished twin (if any) sits under
    // the final name already; sweep so the emptied work tree can go
    temps.foreach(Files.deleteIfExists(_))
    files.foreach { f =>
      val rel = workDir.relativize(f)
      val dest = dataRoot.resolve(rel)
      Files.createDirectories(dest.getParent)
      // ATOMIC_MOVE within a filesystem; fall back to replace-copy across
      try Files.move(f, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          // the fallback copy-move needs the SAME duplicate-attempt
          // tolerance: a twin can move the source between the atomic
          // attempt's throw and this retry (cross-mount work/data roots
          // are exactly where duplicates overlap longest)
          try Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
          catch {
            case e: java.nio.file.NoSuchFileException =>
              if (!Files.isRegularFile(dest)) throw e
          }
        case e: java.nio.file.NoSuchFileException =>
          // the source vanished: a duplicate attempt moved it first —
          // success iff the destination is there, a real error otherwise
          if (!Files.isRegularFile(dest)) throw e
      }
    }
    cleanEmpty(workDir)
    if (!Files.isDirectory(dataRoot)) Nil
    else {
      val s = Files.walk(dataRoot)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && !graft.core.Fs.isStagedTemp(p))
        .toList.sortBy(_.toString)
      finally s.close()
    }
  }

  /** Remove the emptied tree under `root`, deepest-first (reference
    * `cleanup`); emptiness is re-checked after each child deletion.
    * Tolerant of concurrent duplicate attempts racing the same scratch
    * tree — a cleanup loss is cosmetic (a leftover empty dir), never
    * worth failing a committed publication over.
    */
  private def cleanEmpty(root: Path): Unit =
    try {
      def isEmptyDir(p: Path): Boolean = Files.isDirectory(p) && {
        try {
          val s = Files.list(p)
          try !s.iterator().hasNext finally s.close()
        } catch { case _: java.nio.file.NoSuchFileException => false }
      }
      if (Files.isDirectory(root)) {
        val s = Files.walk(root)
        val dirs = try s.iterator().asScala.toList.reverse finally s.close()
        dirs.foreach { p => if (isEmptyDir(p)) Files.deleteIfExists(p) }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Stage composite blocks as GeoTIFFs in the work root and commit each
    * (cube, tile, period) item into the data root — S9 write + C2 commit.
    * The write lands in per-item directories
    * (`workRoot/cube/tile/period/…`), and the move into the data root
    * happens one ITEM at a time, only after that item's full band set
    * finished streaming out — the reference's per-item
    * `files_to_move`-after-commit granularity (`processing.py:1038-1155`).
    * Items commit in parallel on the executors (each task moves whole
    * items); a crash mid-publication leaves some items fully published
    * and the rest absent — no item is ever half-visible.
    */
  def publishGeoTiffs(blocks: DataFrame, workRoot: String, dataRoot: String,
                      periodCols: Seq[String] = Seq("p_start")): Seq[Path] = {
    graft.sources.RasterIO.writeGeoTiffs(blocks, workRoot, periodCols,
      itemTree = true)
    val work = Paths.get(workRoot)
    val depth = 2 + periodCols.size // cube / tile / period…
    val itemDirs =
      if (!Files.isDirectory(work)) Nil
      else {
        val s = Files.walk(work, depth)
        try s.iterator().asScala
          .filter(p => Files.isDirectory(p) &&
            work.relativize(p).getNameCount == depth)
          .toList.sortBy(_.toString)
        finally s.close()
      }
    // Commit items from the EXECUTORS (same shared-filesystem contract as
    // the staged write above): the unit of work shipped is a directory
    // name, each task commits whole items, and only destination paths come
    // back — so the move fan-out scales with the cluster instead of a
    // serial driver rename loop (100k items x several assets x per-rename
    // latency is hours on one thread). Atomicity is unchanged — an item
    // still becomes visible only as a whole — but a crash mid-publication
    // now leaves an arbitrary SUBSET of items committed rather than a
    // sorted prefix; the ledger/read-back already treats any incomplete
    // publication as pending, so re-runs converge identically.
    val moved =
      if (itemDirs.isEmpty) Nil
      else {
        val sc = blocks.sparkSession.sparkContext
        val workRootStr = work.toString
        val slices = math.max(1,
          math.min(itemDirs.size, sc.defaultParallelism))
        sc.parallelize(itemDirs.map(_.toString), slices)
          .flatMap { d =>
            val dir = Paths.get(d)
            commitItem(dir, Paths.get(dataRoot)
              .resolve(Paths.get(workRootStr).relativize(dir)))
              .map(_.toString)
          }
          .collect().toSeq.map(Paths.get(_))
      }
    cleanEmpty(work)
    moved
  }
}
