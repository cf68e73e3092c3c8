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
  * `SPARK_GRAFT_LOCAL_DIR` overrides; an unusable tmpfs falls back to the
  * JVM default silently (returning None keeps the builder untouched).
  */
object Scratch {
  /** Minimum usable tmpfs space to elect it as scratch: below this
    * (e.g. Docker's default 64 MB /dev/shm) the first real shuffle
    * would ENOSPC where the /tmp default worked — too-small is as
    * unusable as non-writable.
    */
  private val MinUsableBytes = 8L << 30

  def fastLocalDir(): Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").filter(_.nonEmpty).orElse {
      val shm = new java.io.File("/dev/shm")
      if (!shm.isDirectory || !shm.canWrite ||
        shm.getUsableSpace < MinUsableBytes) None
      else {
        val d = new java.io.File(shm, "graft-spark-scratch")
        if (d.isDirectory || d.mkdirs()) Some(d.getAbsolutePath) else None
      }
    }

  /** Apply [[fastLocalDir]] to a session builder (no-op when unavailable). */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder =
    fastLocalDir().fold(b)(d => b.config("spark.local.dir", d))
}
