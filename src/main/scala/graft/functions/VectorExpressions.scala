package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for the embedding-similarity hot path
  * (SURVEY §2.9 tier (b): a codegen'd `Expression` beats a Scala UDF —
  * no ArrayData→Array copy, no boxing, inlined into the surrounding
  * whole-stage-generated code).
  */

/** `DOT(a, b)`: double dot product of two float vectors, summed in index
  * order (IEEE-identical to a sequential fold, so results match the
  * interpreted and UDF formulations bit-for-bit).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DOT expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `LSH_BUCKETS(embedding)`: sign-hyperplane LSH bucket keys for a float
  * vector, one packed int per hash table. Hyperplane `h` has Rademacher
  * (±1) weights `signs(h)(k)`; the projection quantizes each component to
  * `floor(double(e[k]) * 1000)` and accumulates in exact 64-bit integer
  * arithmetic, so the sign bit is independent of summation order — a
  * DuckDB oracle recomputing the same sum in any order gets the same
  * buckets (a double-precision fold could flip a near-zero bit).
  * Bit `h % bitsPerTable` of table `h / bitsPerTable` is set iff the
  * projection is > 0.
  */
case class LshBuckets(child: Expression, signs: Array[Array[Int]],
                      bitsPerTable: Int)
    extends UnaryExpression {

  private val numTables = signs.length / bitsPerTable

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"LSH_BUCKETS expects array<float> input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val buckets = new Array[Int](numTables)
    var h = 0
    while (h < signs.length) {
      val row = signs(h)
      val n = math.min(e.numElements(), row.length)
      var p = 0L
      var k = 0
      while (k < n) {
        p += row(k) * math.floor(e.getFloat(k).toDouble * 1000.0).toLong
        k += 1
      }
      if (p > 0) buckets(h / bitsPerTable) |= 1 << (h % bitsPerTable)
      h += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val signsRef = ctx.addReferenceObj("lshSigns", signs, "int[][]")
      val buckets = ctx.freshName("buckets")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      s"""
         |int[] $buckets = new int[$numTables];
         |for (int $h = 0; $h < ${signs.length}; $h++) {
         |  int[] $row = $signsRef[$h];
         |  int $n = java.lang.Math.min($e.numElements(), $row.length);
         |  long $p = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    $p += $row[$k] *
         |      (long) java.lang.Math.floor(((double) $e.getFloat($k)) * 1000.0);
         |  }
         |  if ($p > 0) $buckets[$h / $bitsPerTable] |= 1 << ($h % $bitsPerTable);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper: `dot(a, b)` as a codegen'd expression. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Deterministic Rademacher hyperplanes shared with the DuckDB oracle:
    * `signs(h)(k)` = +1 iff the first hex char of `md5("h_k")` is >= '8'.
    * MD5 is engine-portable, so the oracle recomputes the identical matrix
    * with `substr(md5(h || '_' || k), 1, 1) >= '8'`.
    */
  def lshSigns(numPlanes: Int, dims: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (h, k) =>
      val d = md.digest(s"${h}_$k".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1 else -1
    }
  }

  /** Column wrapper: packed LSH table buckets for a float vector. */
  def lshBuckets(e: Column, signs: Array[Array[Int]], bitsPerTable: Int): Column =
    ColumnBridge.column(LshBuckets(ColumnBridge.expression(e), signs, bitsPerTable))

  /** Register `graft_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}
