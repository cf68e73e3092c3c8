package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{Pipeline, Tables}

/** Pins the 100 TB path of incremental bloom dedup — Spark's native
  * `bloom_filter_agg` bitset, built once over the old snapshot and
  * broadcast into a `might_contain` probe — against the replayable
  * position-join formulation the DuckDB oracle checks
  * ([[Pipeline.bloomMaybeSeen]]). Both must honor Bloom's contract
  * (no false negatives); the native bitset uses different hash functions,
  * so per-doc flags may differ only in the false-positive direction.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def fp(df: DataFrame): DataFrame = df.select($"doc_id",
    md5(lower(trim(regexp_replace($"text", " +", " "))).cast("binary")).as("fp"))

  private def corpus: DataFrame = {
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    base.unionAll(base.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 1000001L).as("doc_id"), $"text"))
  }

  test("native bitset path: no false negatives, probe is a narrow filter") {
    val c = corpus
    val oldFp = fp(c.filter($"doc_id" % 2 === 0))
    val newFp = fp(c.filter($"doc_id" % 2 === 1))
    // distributed build (mergeable sketch under treeAggregate), one
    // KB-sized bitset shipped to executors — the shape that replaces the
    // 4n-row position shuffle at 100 TB
    val bf = oldFp.stat.bloomFilter($"fp", expectedNumItems = 5000L, fpp = 0.001)
    val bcast = spark.sparkContext.broadcast(bf)
    val might = udf((s: String) => if (bcast.value.mightContainString(s)) 1L else 0L)
    val probed = newFp.select($"doc_id", might($"fp").as("native_seen"))
    val replay = Pipeline.bloomMaybeSeen(
      c.filter($"doc_id" % 2 === 0), c.filter($"doc_id" % 2 === 1))
    val j = probed.join(replay, "doc_id").cache()
    // Bloom contract on the native path: every exact duplicate is flagged
    assert(j.filter($"native_seen" < $"exact_dup").count() == 0,
      "native bloom produced a false negative")
    // and it is not vacuous: the 10 re-crawled docs are all caught
    assert(j.filter($"exact_dup" === 1).count() == 10)
    assert(j.filter($"native_seen" === 1 && $"exact_dup" === 1).count() == 10)
    // the probe itself must stay narrow: no join, no exchange — the
    // bitset rides the closure, not a shuffle
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"bloom probe must be a narrow map:\n$plan")
    j.unpersist()
  }

  test("replayable path: false-positive rate is bounded at the configured sizing") {
    val c = corpus
    val out = Pipeline.bloomMaybeSeen(
      c.filter($"doc_id" % 2 === 0), c.filter($"doc_id" % 2 === 1)).cache()
    // 16^5 slots, 4 hashes, ~n·4 insertions at n≈260 → fill ≈ 1e-3,
    // FP ≈ fill^4 ≈ 1e-12: flagged non-duplicates must be absent here
    assert(out.filter($"maybe_seen" === 1 && $"exact_dup" === 0).count() == 0,
      "unexpected false positive at this filter sizing")
    assert(out.filter($"fn_ok" =!= 1).count() == 0)
    out.unpersist()
  }
}
