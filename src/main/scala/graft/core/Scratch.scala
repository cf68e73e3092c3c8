package graft.core

/** Local-mode scratch placement for the driver-contract mains.
  *
  * Spark's shuffle/spill scratch (`spark.local.dir`) defaults to
  * `java.io.tmpdir` = `/tmp`, which on this box sits on the root disk —
  * every shuffle write and disk-spilled block pays rotational/ext4
  * latency even when the data is kilobytes. When a RAM-backed tmpfs is
  * available (`/dev/shm` here), pointing the scratch at it removes that
  * tax; on a real cluster the same knob points at the NVMe scratch array,
  * so the production story is unchanged — this only decides where LOCAL
  * runs spill.
  *
  * `SPARK_GRAFT_LOCAL_DIR` overrides (validated for writability like the
  * tmpfs path — unusable entries are dropped with a warning rather than
  * handed to Spark to crash on). An override whose EVERY entry is
  * unusable disables the election entirely and yields the JVM default:
  * an operator who set the override did so precisely because the
  * automatic tmpfs choice is wrong for their data (too big for RAM), so
  * silently re-routing them onto tmpfs would trade a visible mkdir
  * failure for a mid-run ENOSPC. An unusable tmpfs (no override set)
  * falls back to the JVM default silently (returning None keeps the
  * builder untouched).
  *
  * Sizing note: the 8 GiB usable-space bar is checked once at session
  * build. Spark has no mid-run failover between local dirs — a
  * comma-list (`tmpfs,/tmp`) HASHES block files across entries, sending
  * ~half of every shuffle to the slow disk always, which defeats the
  * election — so a shuffle that outgrows the tmpfs mid-run fails with
  * ENOSPC rather than degrading. At this suite's scale (sf0.1, peak
  * shuffle well under 1 GiB) the 8 GiB bar leaves >8× headroom; a caller
  * running genuinely tmpfs-sized data should set `SPARK_GRAFT_LOCAL_DIR`
  * to a disk-backed dir explicitly.
  */
object Scratch {
  /** Minimum usable tmpfs space to elect it as scratch: below this
    * (e.g. Docker's default 64 MB /dev/shm) the first real shuffle
    * would ENOSPC where the /tmp default worked — too-small is as
    * unusable as non-writable.
    */
  private val MinUsableBytes = 8L << 30

  /** A dir (created if needed) Spark can actually write scratch into —
    * the ELECTION path, where creating our own subdir is the point.
    */
  private def usable(path: String): Option[String] = {
    val d = new java.io.File(path)
    if ((d.isDirectory || d.mkdirs()) && d.canWrite) Some(d.getAbsolutePath)
    else None
  }

  /** Override entries must already EXIST (and be writable): an operator
    * points the override at real mount points, and auto-creating a
    * mistyped path under some writable parent would silently elect the
    * wrong disk — the typo protection the validation exists for.
    */
  private def usableExisting(path: String): Option[String] = {
    val d = new java.io.File(path)
    if (d.isDirectory && d.canWrite) Some(d.getAbsolutePath) else None
  }

  def fastLocalDir(): Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty) match {
      case Some(p) =>
        // spark.local.dir accepts a comma list; validate each entry and
        // keep the usable ones. Every dropped entry is reported — a
        // silent partial drop would look like both dirs stripe shuffle
        // when only one does. A fully-unusable override yields None (JVM
        // default), NOT the tmpfs election: the operator overrode the
        // election on purpose (e.g. data too big for tmpfs), and routing
        // them onto tmpfs anyway risks a mid-run ENOSPC worse than the
        // typo it would paper over.
        val entries = p.split(",").map(_.trim).filter(_.nonEmpty)
        val kept = entries.flatMap { e =>
          val u = usableExisting(e)
          if (u.isEmpty) System.err.println(
            s"[scratch] SPARK_GRAFT_LOCAL_DIR entry '$e' missing or " +
              "not writable; dropping it")
          u
        }
        if (kept.isEmpty) {
          System.err.println(
            s"[scratch] SPARK_GRAFT_LOCAL_DIR='$p' has no usable entry; " +
              "override disables the tmpfs election; using the JVM " +
              "default scratch (java.io.tmpdir)")
          None
        } else Some(kept.mkString(","))
      case None =>
        val shm = new java.io.File("/dev/shm")
        if (!shm.isDirectory || !shm.canWrite ||
          shm.getUsableSpace < MinUsableBytes) None
        else usable("/dev/shm/graft-spark-scratch")
    }

  /** Apply [[fastLocalDir]] to a session builder (no-op when unavailable). */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    fastLocalDir().fold(b)(d => b.config("spark.local.dir", d))
}
