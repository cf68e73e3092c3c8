package graft.core

import org.apache.spark.sql.SparkSession

/** Filesystem helpers shared by the catalog commit machinery and the
  * bucketed-layout scratch cleanup.
  */
object Fs {

  /** Recursive delete through the Hadoop FileSystem (not java.io.File,
    * which silently no-ops on non-local filesystems — on cluster
    * storage that turns "cleanup" into a full-data-copy leak per run).
    */
  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true): Unit
  }

  /** Name prefix for in-progress staged files under a publication work
    * tree. Executor-side staged writes (COG band files, quicklook PNGs)
    * stream into a uniquely-named temp sibling and become visible under
    * the final name only via an atomic rename — so a DUPLICATE attempt
    * (speculative execution, a zombie retry) killed mid-write can never
    * leave a torn file under an asset's final name for the item commit
    * to publish. `graft.cube.Publish.commitItem` recognizes the prefix
    * and sweeps abandoned temps instead of committing them.
    */
  val StagedTempPrefix = ".graft-tmp."

  /** Is `p` an in-progress staged temp (never commit these)? */
  def isStagedTemp(p: java.nio.file.Path): Boolean = {
    val name = p.getFileName
    name != null && name.toString.startsWith(StagedTempPrefix)
  }

  /** Unique temp sibling for `dest` — SAME directory, so the commit
    * rename below stays within one filesystem and can be atomic.
    */
  def stagedTempFor(dest: java.nio.file.Path): java.nio.file.Path =
    dest.resolveSibling(StagedTempPrefix +
      java.util.UUID.randomUUID().toString + "." + dest.getFileName.toString)

  /** Publish a finished temp file under its final name: ATOMIC_MOVE
    * where the filesystem supports it, plain replace-move otherwise.
    * Replace semantics keep duplicate attempts idempotent — both
    * attempts produced the same bytes, last rename wins whole.
    */
  def commitStagedTemp(tmp: java.nio.file.Path,
                       dest: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }

  /** Write `bytes` to `dest` with the write-then-rename discipline above
    * (the one-shot form, for payloads already assembled in memory).
    */
  def writeAtomic(dest: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    val tmp = stagedTempFor(dest)
    java.nio.file.Files.write(tmp, bytes): Unit
    commitStagedTemp(tmp, dest)
  }
}
