package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.install(spark)
    new java.io.File(outDir).mkdirs()
    // Dev aid (driver-neutral): SPARK_GRAFT_VERIFY_ONLY="q1,q2" dumps only
    // the named queries, for re-gating a change's affected oracles without
    // the full sweep. Unset = all queries (the driver's official run).
    // Names validated against the live query map: a typo'd list would
    // otherwise dump nothing, write a manifest of ghosts, and let the
    // subset gate read "0 pass, 0 fail" as green.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .map { names =>
        val unknown = names.diff(SparkEntry.queries.keySet)
        if (unknown.nonEmpty)
          System.err.println("[verify] WARNING: unknown query names in " +
            s"SPARK_GRAFT_VERIFY_ONLY ignored: ${unknown.toSeq.sorted.mkString(",")}")
        val known = names.intersect(SparkEntry.queries.keySet)
        if (known.isEmpty) {
          System.err.println("[verify] ERROR: SPARK_GRAFT_VERIFY_ONLY " +
            "matches no query - nothing to dump")
          spark.stop()
          sys.exit(2)
        }
        known
      }
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Always the COMPLETE, CURRENT oracle map, even under VERIFY_ONLY:
    // a subset rerun must neither shrink a full run's gate (overwriting
    // the map with a subset) nor leave a STALE map in place (preserving
    // an old file would re-gate an edited query against its pre-edit
    // SQL). SparkEntry.oracleSql is the live source of truth, so the
    // full rewrite is always both complete and current.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
    // Subset manifest, so a VERIFY_ONLY dump into a fresh outDir is
    // self-describing: tools/check_oracles.py reads this automatically
    // and checks only the queries this run actually dumped — without it
    // every non-dumped query's missing parquet dir reads as a failure.
    // A FULL run deletes any stale manifest so the gate can never be
    // silently narrowed by a leftover file.
    val onlyPath = Paths.get(s"$outDir/verify_only.json")
    only match {
      case Some(names) =>
        val arr = names.toSeq.sorted.map(q).mkString("[", ",", "]")
        Files.writeString(onlyPath, arr): Unit
      case None =>
        Files.deleteIfExists(onlyPath): Unit
    }
    spark.stop()
  }
}
