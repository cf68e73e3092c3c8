package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** AsOf.asofJoin semantics: inclusive at equal ts, latest-at-or-before,
  * nulls before the first right row, one shuffle.
  */
class AsOfSpec extends SparkSpec {

  test("carries the latest right row at or before each left ts") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (3L, 1L, 999.0))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .select($"tag", $"asof_ts", $"asof_v").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out == Set(
      ("a", 10L, 100.0),  // right row AT l.ts is visible (inclusive)
      ("b", 20L, 200.0),  // latest at-or-before, not first
      ("c", -1L, -1.0),   // before any right row -> null
      ("d", -1L, -1.0)))  // key with no right rows -> null
  }

  test("a matched row's null value stays null — no backfill from older rows") {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some(100.0)), (1L, 20L, None))
      .toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("v"))
      .select($"asof_ts", $"asof_v").collect().head
    assert(out.getLong(0) == 20L) // the matched row is ts=20...
    assert(out.isNullAt(1))       // ...and its null value is NOT papered
                                  // over with ts=10's 100.0
  }

  test("multiple carried columns and exactly one shuffle") {
    val sparkS = spark
    import sparkS.implicits._
    val left = spark.range(0, 100).select(($"id" % 4).as("k"), $"id".as("ts"))
    val right = spark.range(0, 25).select(($"id" % 4).as("k"),
      ($"id" * 4).as("ts"), ($"id" * 10).as("v1"), ($"id" + 1000).as("v2"))
    val joined = AsOf.asofJoin(left, right, "k", "ts", Seq("v1", "v2"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"asof join must shuffle exactly once:\n$plan")
    // spot-check against a naive per-row lookup
    val rights = right.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = joined.select($"k", $"ts", $"asof_v1", $"asof_v2").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (if (r.isNullAt(2)) -1L else r.getLong(2),
         if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    left.collect().map(r => (r.getLong(0), r.getLong(1))).foreach { case (k, ts) =>
      val best = rights.filter(t => t._1 == k && t._2 <= ts)
        .sortBy(_._2).lastOption
      val expected = best.map(t => (t._3, t._4)).getOrElse((-1L, -1L))
      assert(got((k, ts)) == expected, s"k=$k ts=$ts")
    }
  }

  test("reserved/output name collisions fail typed instead of clobbering") {
    import spark.implicits._
    val l = Seq((1L, 1L, 9L)).toDF("k", "ts", "asof_ts")
    val r = Seq((1L, 1L, 2L)).toDF("k", "ts", "v")
    val err = intercept[IllegalArgumentException](
      AsOf.asofJoin(l, r, "k", "ts", Seq("v")))
    assert(err.getMessage.contains("asof_ts"))
    val l2 = Seq((1L, 1L)).toDF("k", "ts")
    val r2 = Seq((1L, 1L, 2L, 0)).toDF("k", "ts", "v", "__side")
    val err2 = intercept[IllegalArgumentException](
      AsOf.asofJoin(l2, r2, "k", "ts", Seq("v")))
    assert(err2.getMessage.contains("__side"))
  }
}
