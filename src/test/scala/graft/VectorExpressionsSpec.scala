package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {

  test("DOT matches a sequential fold bit-for-bit and handles nulls") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.7f))).toDF("a", "b")
    val native = df.select(VectorExpressions.dotProduct($"a", $"b")).collect()
      .map(_.getDouble(0))
    val folded = df.select(aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)).collect().map(_.getDouble(0))
    assert(native.toSeq == folded.toSeq)
    val withNull = Seq((Array(1.0f), null.asInstanceOf[Array[Float]])).toDF("a", "b")
    assert(withNull.select(VectorExpressions.dotProduct($"a", $"b")).head().isNullAt(0))
  }

  test("DOT participates in whole-stage codegen") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorExpressions.dotProduct($"a", $"b").as("d"))
    // the expression must not force interpreted fallback
    val plan = df.queryExecution.executedPlan.toString
    df.collect()
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("graft_dot is registered for SQL") {
    import spark.implicits._
    VectorExpressions.register(spark)
    Seq((Array(2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT graft_dot(a, b) FROM vecs").head().getDouble(0)
    assert(got == 2.0 * 4.0 + 3.0 * 5.0)
  }

  test("type check rejects non-float arrays") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dotProduct($"a", $"b")).collect()
    }
  }
}
