package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: write `explain("formatted")` for every SparkEntry query (or a
  * comma-separated subset) to one file per query — the round's plan-shape
  * evidence. No query executes: plans come from the analyzer/optimizer
  * only, so the whole suite dumps in well under a minute. Usage:
  *   sbt "runMain graft.tools.DumpPlans <outDir> [sfDir] [q1,q2,...]"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: DumpPlans <outDir> [sfDir] [names]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // same session shape as Bench so the dumped plans are the ones the
    // bench actually runs (shuffle partitions, AQE on, UTC)
    val spark = graft.core.Scratch.configure(SparkSession.builder()
      .master("local[32]")
      .appName("dump-plans")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.install(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // queryExecution.explainString — the same text explain() prints,
        // captured instead of sent to stdout
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          txt.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    println(s"[plans] dumped ${qs.size} plans to $outDir")
    spark.stop()
  }
}
