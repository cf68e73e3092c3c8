package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cube.Repair

/** Operator entry point for the torn-partition repair workflow — the
  * engine's counterpart to the reference's ERROR-activity retry loop
  * (`cube_builder/celery/tasks.py:234` ledgers a failed merge as an ERROR
  * activity row; `models/activity.py:44,55` is the status the operator
  * re-dispatches by). The library surface ([[graft.cube.Repair]]) is
  * plan + apply; this main makes the workflow drivable without a REPL:
  *
  * {{{
  * sbt "runMain graft.tools.RepairCube <cubeOutDir>"          # dry run
  * sbt "runMain graft.tools.RepairCube <cubeOutDir> --apply"  # execute
  * }}}
  *
  * The dry run prints one row per (tile_id, p_start) block partition with
  * the planned action — the same planning fold the `c36_torn_repair_plan`
  * gate pins — and changes NOTHING; it exits 1 when torn partitions are
  * pending so scripts can gate on it (healthy cube exits 0; usage errors
  * and not-a-cube paths exit 2; an unexpected store/Spark fault exits 3,
  * never 1 — a crash must not read as "repairs pending"). `--apply`
  * downgrades each torn partition's ledger units SUCCESS → ERROR first,
  * then deletes its directory (that order is load-bearing — see
  * [[graft.cube.Repair.applyTornRepair]]); the next [[graft.cube.CubeRun]]
  * over the same outDir re-plans exactly those units and republishes them
  * from source.
  */
object RepairCube {

  /** What a run saw/did: partition dirs planned, of them torn, of them
    * repaired (0 on dry runs).
    */
  final case class Summary(partitions: Long, torn: Long, repaired: Long)

  /** Drive the plan (and, with `doApply`, the repair) against `outDir`,
    * reporting through `out`. Split from [[main]] so RepairCubeSpec can
    * run the whole operator workflow in-process against a real cube.
    */
  def run(spark: SparkSession, outDir: String, doApply: Boolean,
          out: String => Unit = println): Summary = {
    // guard the typo'd-path case first: for an outDir that is not a cube
    // at all, "healthy — nothing to repair" would be the wrong answer
    val hconf = spark.sessionState.newHadoopConf()
    val isCube = Seq("blocks", "ledger").exists { d =>
      val p = new org.apache.hadoop.fs.Path(s"$outDir/$d")
      p.getFileSystem(hconf).exists(p)
    }
    require(isCube, s"$outDir is not a cube output directory " +
      "(neither blocks/ nor ledger/ exists underneath)")

    val plan = Repair.tornRepairPlan(spark, outDir).collect() // ≤ tiles×periods
    out(f"[repair] ${"tile_id"}%-16s ${"p_start"}%-12s ${"n_files"}%8s " +
      f"${"dir_bytes"}%12s ${"n_torn"}%7s  action")
    plan.foreach { r =>
      out(f"[repair] ${r.getAs[String]("tile_id")}%-16s " +
        f"${r.getAs[String]("p_start")}%-12s ${r.getAs[Long]("n_files")}%8d " +
        f"${r.getAs[Long]("dir_bytes")}%12d ${r.getAs[Long]("n_torn")}%7d  " +
        r.getAs[String]("action"))
    }
    val torn = plan.count(_.getAs[String]("action") == "delete_and_retry")
    if (torn == 0) {
      out(s"[repair] cube is healthy (${plan.length} block partitions) - " +
        "nothing to repair")
      Summary(plan.length.toLong, 0L, 0L)
    } else if (!doApply) {
      out(s"[repair] DRY RUN: $torn of ${plan.length} block partitions " +
        "torn; re-run with --apply to delete them and downgrade their " +
        "ledger units to ERROR")
      Summary(plan.length.toLong, torn.toLong, 0L)
    } else {
      // apply exactly the plan that was just printed (no second probe,
      // no window for the cube to change between print and apply)
      val tornPairs = plan.toSeq
        .filter(_.getAs[String]("action") == "delete_and_retry")
        .map(r => (r.getAs[String]("tile_id"), r.getAs[String]("p_start")))
      val repaired = Repair.applyTornRepair(spark, outDir, Some(tornPairs))
      out(s"[repair] repaired $repaired torn partition(s): directories " +
        "deleted, ledger units downgraded to ERROR - the next CubeRun " +
        "over this outDir republishes them from source")
      Summary(plan.length.toLong, torn.toLong, repaired)
    }
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val badFlags = flags.filterNot(_ == "--apply")
    if (positional.length != 1 || badFlags.nonEmpty) {
      System.err.println("usage: RepairCube <cubeOutDir> [--apply]")
      sys.exit(2)
    }
    val spark = graft.core.Scratch.configure(SparkSession.builder()
      .master("local[32]")
      .appName("repair-cube")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exit-code contract scripts can gate on: 0 healthy (or applied),
    // 1 dry run with pending repairs, 2 usage / not-a-cube, 3 crash.
    // A store fault must NOT exit 1 — the JVM's default uncaught-exit
    // status is also 1, and a gating script would read the crash as
    // "repairs pending" and e.g. loop on --apply instead of alerting.
    val status =
      try {
        val s = run(spark, positional(0), doApply = flags.contains("--apply"))
        if (s.torn > 0 && s.repaired == 0) 1 else 0
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"[repair] ${e.getMessage}")
          2
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[repair] FAILED: $e")
          3
      } finally spark.stop()
    if (status != 0) sys.exit(status)
  }
}
