package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TopKAgg

/** TopKAgg must be indistinguishable from the windowed row_number()
  * top-k — including under heavy ties and arbitrary partial-merge
  * splits — while keeping O(k) state.
  */
class TopKAggSpec extends SparkSpec {

  test("heap top-k equals window top-k under ties and partial merges") {
    val sparkS = spark
    import sparkS.implicits._
    // score = id % 37 → dozens of exact ties per group; 11 partitions
    // force map-side partials to merge across splits
    val rows = spark.range(0, 2000)
      .select(($"id" % 5).as("g"), $"id",
        (($"id" % 37).cast("double") / 10.0).as("score"))
      .repartition(11)
    val viaAgg = rows.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 10).as("top"))
      .select($"g", posexplode($"top").as(Seq("i", "e")))
      .select($"g", ($"i" + 1).cast("long").as("rk"), $"e.score", $"e.id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = rows.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 10)
      .select($"g", $"rk".cast("long"), $"score", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("groups smaller than k return all rows, best-first; k=1 is argmax") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1))
      .toDF("g", "id", "score")
    val out = rows.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 5).as("top"))
      .select($"g", $"top").collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getDouble(0), e.getLong(1)))).toMap
    assert(out(1L) == Seq((0.9, 11L), (0.5, 10L)))
    assert(out(2L) == Seq((0.1, 20L)))
    val arg = rows.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 1).as("top"))
      .select($"g", element_at($"top", 1).getField("id").as("best"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(arg == Map(1L -> 11L, 2L -> 20L))
  }

  test("NaN scores rank first, exactly like the row_number window") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = Seq((1L, 10L, 0.5), (1L, 11L, Double.NaN), (1L, 12L, 0.9),
      (1L, 13L, Double.NaN), (1L, 14L, 0.1)).toDF("g", "id", "score")
      .repartition(3)
    val viaAgg = rows.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 3).as("top"))
      .select(posexplode($"top").as(Seq("i", "e")))
      .select($"e.id").as[Long].collect().toSeq
    val w = Window.partitionBy($"g").orderBy($"score".desc, $"id")
    val viaWindow = rows.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).orderBy($"rk")
      .select($"id").as[Long].collect().toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg == Seq(11L, 13L, 12L)) // NaN above all, tie on id asc
  }

  test("top-k aggregation plans partial (map-side) trimming, no window sort") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = spark.range(0, 100)
      .select(($"id" % 3).as("g"), $"id", rand(7).as("score"))
    val plan = rows.groupBy($"g")
      .agg(TopKAgg.topKByScore($"score", $"id", 10).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"),
      s"expected map-side partial top-k:\n$plan")
    assert(!plan.contains("Window"), s"no window sort expected:\n$plan")
  }
}
