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
}
