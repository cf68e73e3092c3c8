package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{queries => gq}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY §2 (plus the
  * training-data-pipeline operators) to a DataFrame query over the
  * driver-provided synthetic tables; `oracleSql` holds the equivalent
  * DuckDB SQL the driver uses as the correctness oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The classic pricing-summary aggregation (scan → filter → group → agg),
    * emitted with hash-stable integer money columns.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        floor(sum($"l_extendedprice") * 100 + 0.5).cast("long").as("price_x100"),
        floor(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")) * 10000 + 0.5)
          .cast("long").as("revenue_x10000"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q1_pricing_summary" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      s.read.parquet(s"$d/lineitem.parquet")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").cast("long").as("sum_qty"),
          floor(sum($"l_extendedprice") * 100 + 0.5).cast("long").as("price_x100"),
          floor(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")) * 10000 + 0.5)
            .cast("long").as("revenue_x10000"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })) ++
      gq.Relational.queries ++ gq.CubeOps.queries ++ gq.EngineOps.queries ++
      gq.Pipeline.queries ++ gq.Curation.queries ++ gq.Analytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Map("q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         CAST(floor(sum(l_extendedprice)*100 + 0.5) AS BIGINT) AS price_x100,
         CAST(floor(sum(l_extendedprice*(1.0 - l_discount))*10000 + 0.5) AS BIGINT)
           AS revenue_x10000,
         count(*) AS n
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""") ++
      gq.Relational.oracles ++ gq.CubeOps.oracles ++ gq.EngineOps.oracles ++
      gq.Pipeline.oracles ++ gq.Curation.oracles ++ gq.Analytics.oracles
}
