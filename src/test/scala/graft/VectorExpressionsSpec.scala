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

  test("LSH_BUCKETS packs sign bits per table, codegen matches interpreted") {
    import spark.implicits._
    // 4 planes over 3 dims, 2 bits per table → 2 tables
    val signs = Array(
      Array(1, 1, 1),     // plane 0: sum of all
      Array(-1, -1, -1),  // plane 1: negated sum
      Array(1, -1, 1),    // plane 2
      Array(-1, 1, -1))   // plane 3
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f, 3.0f)),    // q = (1000, 2000, 3000)
      Tuple1(Array(-1.0f, 0.5f, -2.0f)))  // q = (-1000, 500, -2000)
      .toDF("e")
    val got = df.select(VectorExpressions.lshBuckets($"e", signs, 2).as("b"))
      .collect().map(_.getSeq[Int](0))
    // v0: p0=6000>0, p1=-6000, p2=2000>0, p3=-2000 → t0=0b01, t1=0b01
    assert(got(0) == Seq(1, 1))
    // v1: p0=-2500, p1=2500>0, p2=-3500, p3=3500>0 → t0=0b10, t1=0b10
    assert(got(1) == Seq(2, 2))
    // interpreted path (codegen off) must agree
    val conf = spark.conf
    val prevWs = conf.get("spark.sql.codegen.wholeStage")
    val prevFm = conf.get("spark.sql.codegen.factoryMode")
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(VectorExpressions.lshBuckets($"e", signs, 2).as("b"))
        .collect().map(_.getSeq[Int](0))
      assert(interp.toSeq.map(_.toSeq) == got.toSeq.map(_.toSeq))
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prevWs)
      conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("lshSigns matrix matches the oracle's md5 construction") {
    // spot-check a few cells against DuckDB's rule:
    // +1 iff substr(md5(h || '_' || k), 1, 1) >= '8'
    val signs = VectorExpressions.lshSigns(4, 4)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (h <- 0 until 4; k <- 0 until 4) {
      val hex = md.digest(s"${h}_$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = if (hex.charAt(0) >= '8') 1 else -1
      assert(signs(h)(k) == expect, s"cell ($h,$k): md5=$hex")
    }
  }

  test("type check rejects non-float arrays") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dotProduct($"a", $"b")).collect()
    }
  }
}
