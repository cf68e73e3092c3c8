package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen kernels for the pixel-array hot path (SURVEY §2.2).
  *
  * Spark does not whole-stage-codegen the bodies of higher-order-function
  * lambdas (`transform`/`aggregate` run an interpreted `LambdaFunction`
  * per element — measured ~40× slower than generated loops on this
  * workload, see the DOT product note in `graft.queries.Pipeline`). Every
  * per-sample raster kernel therefore gets a hand-rolled `Expression`
  * with `doGenCode` emitting a primitive `int[]` loop, following the
  * [[DotProduct]] pattern: no boxing, no per-element virtual calls, and
  * the loop inlines into the surrounding generated stage.
  *
  * All kernels take `array<int>` pixel blocks and return `array<int>`
  * (or a scalar count), preserving the exact semantics of the previous
  * HOF formulations, which the CORRECTNESS oracles pin.
  */
object PixelExpressions {

  private val IntArray = ArrayType(IntegerType, containsNull = false)

  /** `countInList(arr, values)`: how many samples equal any of `values`
    * (M5 conditional count, reference `processing.py:1386-1448`).
    */
  def countInList(pixels: Column, values: Seq[Long]): Column =
    ColumnBridge.column(CountInList(ColumnBridge.expression(pixels), values))

  /** Array P9 — see [[graft.operators.Composite.repairQuality]]. */
  def repairQuality(qa: Column, qaNodata: Column, saturatedValue: Column,
                    bandPixels: Seq[(Column, Column)]): Column =
    ColumnBridge.column(RepairQualityExpr(
      ColumnBridge.expression(qa),
      ColumnBridge.expression(qaNodata.cast("int")),
      ColumnBridge.expression(saturatedValue.cast("int")),
      bandPixels.map(p => ColumnBridge.expression(p._1)),
      bandPixels.map(p => ColumnBridge.expression(p._2.cast("int")))))

  /** Array P2 — linear rescale with dtype clamp over a pixel block. */
  def rescale(pixels: Column, nodata: Column, mult: Double, add: Double,
              newScaleMult: Double, lo: Double, hi: Double): Column =
    ColumnBridge.column(ArrayRescale(
      ColumnBridge.expression(pixels),
      ColumnBridge.expression(nodata.cast("int")),
      mult, add, newScaleMult, lo, hi))

  /** Array S6 — Sentinel-2 baseline offset over a pixel block. */
  def baselineOffset(pixels: Column, baselineMajor: Column, nodata: Column): Column =
    ColumnBridge.column(ArrayBaselineOffset(
      ColumnBridge.expression(pixels),
      ColumnBridge.expression(baselineMajor.cast("int")),
      ColumnBridge.expression(nodata.cast("int"))))

  /** Array P8 — evaluate a band-algebra AST per sample over N aligned
    * pixel blocks, clamping to `[lo, hi]` and mapping NaN → `nodata`.
    */
  def bandExpr(bands: Seq[(String, Column)], expression: String,
               lo: Double, hi: Double, nodata: Int): Column = {
    val ast = BandExprParser.parse(expression)
    val needed = BandExprParser.refs(ast)
    val bound = bands.toMap
    val missing = needed.filterNot(bound.contains)
    require(missing.isEmpty, s"unbound bands $missing in: $expression")
    val used = needed.map(n => n -> bound(n))
    ColumnBridge.column(BandExprArray(
      used.map(b => ColumnBridge.expression(b._2)),
      used.map(_._1), ast, lo, hi, nodata))
  }

  /** `arraySumLong(arr)`: sum of an int array as long (publish stats). */
  def arraySumLong(pixels: Column): Column =
    ColumnBridge.column(ArraySumLong(ColumnBridge.expression(pixels)))

  /** `valueHistogram(arr, nodata)`: per-block value→count histogram as
    * `array<struct<value:int, cnt:long>>`, nodata excluded. The T10 shuffle
    * reducer: a 10560²-pixel block collapses to ≤ |distinct values| rows
    * (int16 imagery ⇒ ≤65k) before any explode reaches an exchange.
    */
  def valueHistogram(pixels: Column, nodata: Column): Column =
    ColumnBridge.column(ValueHistogram(
      ColumnBridge.expression(pixels),
      ColumnBridge.expression(nodata.cast("int"))))
}

/** Count of samples equal to any of `values`. */
case class CountInList(child: Expression, values: Seq[Long]) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  require(values.nonEmpty, "CountInList needs a non-empty value list")

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null
    else {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var cnt = 0L
      var i = 0
      while (i < n) {
        val v = arr.getInt(i).toLong
        if (values.contains(v)) cnt += 1
        i += 1
      }
      cnt
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val v = ctx.freshName("v")
    val arr = ctx.freshName("arr")
    val cond = values.map(x => s"$v == ${x}L").mkString(" || ")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ArrayData $arr = ${c.value};
        int $n = $arr.numElements();
        for (int $i = 0; $i < $n; $i++) {
          long $v = (long) $arr.getInt($i);
          if ($cond) ${ev.value}++;
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_count_in_list"
}

/** Sum of an int array as long. */
case class ArraySumLong(child: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null
    else {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var s = 0L
      var i = 0
      while (i < n) { s += arr.getInt(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val arr = ctx.freshName("arr")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = ${c.isNull};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ArrayData $arr = ${c.value};
        int $n = $arr.numElements();
        for (int $i = 0; $i < $n; $i++) ${ev.value} += (long) $arr.getInt($i);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_array_sum"
}

/** Per-block value histogram: `array<struct<value:int, cnt:long>>` of the
  * distinct non-nodata sample values in an int pixel block, ascending by
  * value. The per-pixel loop runs inside `eval` as compiled Scala;
  * complex-typed construction stays interpreted ([[CodegenFallback]]) —
  * one call per block row, so the row-dispatch overhead is O(blocks),
  * not O(pixels), and the surrounding stage keeps codegen.
  */
case class ValueHistogram(child: Expression, nodata: Expression)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def children: Seq[Expression] = Seq(child, nodata)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", IntegerType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable || nodata.nullable

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    val nd = nodata.eval(input)
    if (a == null || nd == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val skip = nd.asInstanceOf[Int]
    val n = arr.numElements()
    val counts = new java.util.TreeMap[Integer, java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v != skip) {
        val prev = counts.get(v)
        counts.put(v, if (prev == null) 1L else prev.longValue() + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey.intValue(), e.getValue.longValue())
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nodata = newChildren(1))
  override def prettyName: String = "graft_value_histogram"
}

/** P9 cross-band repair kernel: `qa==qaNodata → qa`, else any band sample
  * at nodata → `sat`, else `qa` (reference `processing.py:446-518`).
  */
case class RepairQualityExpr(qa: Expression, qaNodata: Expression,
                             sat: Expression,
                             bands: Seq[Expression], nodatas: Seq[Expression])
    extends Expression {
  require(bands.nonEmpty && bands.length == nodatas.length)

  override def children: Seq[Expression] = Seq(qa, qaNodata, sat) ++ bands ++ nodatas
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val qv = qa.eval(input)
    if (qv == null) return null
    val qaArr = qv.asInstanceOf[ArrayData]
    val qaNdV = qaNodata.eval(input)
    val satVV = sat.eval(input)
    if (qaNdV == null || satVV == null) return null
    val qaNd = qaNdV.asInstanceOf[Int]
    val satV = satVV.asInstanceOf[Int]
    val n = qaArr.numElements()
    val bandArrs = new Array[ArrayData](bands.length)
    val nds = new Array[Int](bands.length)
    var bi = 0
    while (bi < bands.length) {
      val bv = bands(bi).eval(input)
      val nv = nodatas(bi).eval(input)
      if (bv == null || nv == null) return null
      bandArrs(bi) = bv.asInstanceOf[ArrayData]
      nds(bi) = nv.asInstanceOf[Int]
      if (bandArrs(bi).numElements() != n)
        throw new IllegalArgumentException(
          s"graft_repair_quality: band $bi has ${bandArrs(bi).numElements()} " +
          s"samples but the QA block has $n — band blocks must be aligned")
      bi += 1
    }
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val q = qaArr.getInt(i)
      if (q == qaNd) out(i) = q
      else {
        var hit = false
        var b = 0
        while (!hit && b < bandArrs.length) {
          if (bandArrs(b).getInt(i) == nds(b)) hit = true
          b += 1
        }
        out(i) = if (hit) satV else q
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qaGen = qa.genCode(ctx)
    val ndGen = qaNodata.genCode(ctx)
    val satGen = sat.genCode(ctx)
    val bandGens = bands.map(_.genCode(ctx))
    val ndGens = nodatas.map(_.genCode(ctx))
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val q = ctx.freshName("q")
    val out = ctx.freshName("out")
    val arr = ctx.freshName("arr")
    val hit = bandGens.zip(ndGens)
      .map { case (b, nd) => s"${b.value}.getInt($i) == ${nd.value}" }
      .mkString(" || ")
    val childCode = (Seq(ndGen, satGen) ++ bandGens ++ ndGens)
      .map(_.code.toString).mkString("\n")
    val anyChildNull = (Seq(ndGen, satGen) ++ bandGens ++ ndGens)
      .map(_.isNull.toString).mkString(" || ")
    val lengthChecks = bandGens.zipWithIndex.map { case (b, bi) =>
      s"""if (${b.value}.numElements() != $n)
            throw new IllegalArgumentException(
              "graft_repair_quality: band $bi has " + ${b.value}.numElements() +
              " samples but the QA block has " + $n + " - band blocks must be aligned");"""
    }.mkString("\n")
    ev.copy(code = code"""
      ${qaGen.code}
      boolean ${ev.isNull} = ${qaGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        $childCode
        ${ev.isNull} = $anyChildNull;
        if (!${ev.isNull}) {
          ArrayData $arr = ${qaGen.value};
          int $n = $arr.numElements();
          $lengthChecks
          int[] $out = new int[$n];
          for (int $i = 0; $i < $n; $i++) {
            int $q = $arr.getInt($i);
            $out[$i] = ($q == ${ndGen.value}) ? $q : (($hit) ? ${satGen.value} : $q);
          }
          ${ev.value} = UnsafeArrayData.fromPrimitiveArray($out);
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = {
    val nb = bands.length
    copy(qa = newChildren(0), qaNodata = newChildren(1), sat = newChildren(2),
      bands = newChildren.slice(3, 3 + nb), nodatas = newChildren.slice(3 + nb, 3 + 2 * nb))
  }
  override def prettyName: String = "graft_repair_quality"
}

/** P2 rescale kernel (reference `utils/image.py:611-662`): clamp the
  * scaled intermediate to the dtype range, divide by the new scale,
  * clamp again and truncate toward zero (numpy astype), nodata preserved.
  */
case class ArrayRescale(pixels: Expression, nodata: Expression,
                        mult: Double, add: Double, newScaleMult: Double,
                        lo: Double, hi: Double) extends Expression {
  override def children: Seq[Expression] = Seq(pixels, nodata)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = pixels.nullable

  private def kernel(px: Int, nd: Int): Int =
    if (px == nd) nd
    else {
      val scaled = px * mult + add
      val clamped = math.min(math.max(scaled, lo), hi) / newScaleMult
      math.min(math.max(clamped, lo), hi).toLong.toInt
    }

  override def eval(input: InternalRow): Any = {
    val a = pixels.eval(input)
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val nd = nodata.eval(input).asInstanceOf[Int]
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = kernel(arr.getInt(i), nd); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pGen = pixels.genCode(ctx)
    val ndGen = nodata.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val px = ctx.freshName("px")
    val s = ctx.freshName("s")
    val cl = ctx.freshName("cl")
    val out = ctx.freshName("out")
    val arr = ctx.freshName("arr")
    ev.copy(code = code"""
      ${pGen.code}
      boolean ${ev.isNull} = ${pGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ndGen.code}
        ArrayData $arr = ${pGen.value};
        int $n = $arr.numElements();
        int[] $out = new int[$n];
        for (int $i = 0; $i < $n; $i++) {
          int $px = $arr.getInt($i);
          if ($px == ${ndGen.value}) { $out[$i] = $px; continue; }
          double $s = $px * (${mult}D) + (${add}D);
          double $cl = java.lang.Math.min(java.lang.Math.max($s, (${lo}D)), (${hi}D)) / (${newScaleMult}D);
          $out[$i] = (int)(long) java.lang.Math.min(java.lang.Math.max($cl, (${lo}D)), (${hi}D));
        }
        ${ev.value} = UnsafeArrayData.fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pixels = newChildren(0), nodata = newChildren(1))
  override def prettyName: String = "graft_rescale"
}

/** S6 baseline-offset kernel (reference `sentinel/sentinel2.py:136-174`):
  * baseline ≥ 4 subtracts 1000; results below zero become nodata.
  */
case class ArrayBaselineOffset(pixels: Expression, baselineMajor: Expression,
                               nodata: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(pixels, baselineMajor, nodata)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = pixels.nullable

  override def eval(input: InternalRow): Any = {
    val a = pixels.eval(input)
    if (a == null) return null
    val arr = a.asInstanceOf[ArrayData]
    val bl = baselineMajor.eval(input).asInstanceOf[Int]
    val nd = nodata.eval(input).asInstanceOf[Int]
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val px = arr.getInt(i)
      out(i) =
        if (bl >= 4 && px != nd) { if (px - 1000 < 0) nd else px - 1000 }
        else px
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pGen = pixels.genCode(ctx)
    val blGen = baselineMajor.genCode(ctx)
    val ndGen = nodata.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val px = ctx.freshName("px")
    val out = ctx.freshName("out")
    val arr = ctx.freshName("arr")
    ev.copy(code = code"""
      ${pGen.code}
      boolean ${ev.isNull} = ${pGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${blGen.code}
        ${ndGen.code}
        ArrayData $arr = ${pGen.value};
        int $n = $arr.numElements();
        int[] $out = new int[$n];
        for (int $i = 0; $i < $n; $i++) {
          int $px = $arr.getInt($i);
          if (${blGen.value} >= 4 && $px != ${ndGen.value}) {
            $out[$i] = ($px - 1000 < 0) ? ${ndGen.value} : ($px - 1000);
          } else {
            $out[$i] = $px;
          }
        }
        ${ev.value} = UnsafeArrayData.fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(pixels = newChildren(0), baselineMajor = newChildren(1), nodata = newChildren(2))
  override def prettyName: String = "graft_baseline_offset"
}

/** P8 band-algebra kernel: evaluates a [[BandExprParser.Ast]] per sample
  * over N aligned `array<int>` blocks (reference `index_generator.py:
  * 34-127` — the Python `exec` VM becomes generated Java inlined in the
  * stage loop). Output clamps to `[lo, hi]`, truncates toward zero, and
  * maps NaN → `nodata` like the reference's float-index path.
  */
case class BandExprArray(bands: Seq[Expression], names: Seq[String],
                         ast: BandExprParser.Ast,
                         lo: Double, hi: Double, nodata: Int) extends Expression {
  require(bands.nonEmpty && bands.length == names.length)

  override def children: Seq[Expression] = bands
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = bands.exists(_.nullable)

  // Index-bound evaluator compiled once per expression instance — the
  // interpreted fallback must not allocate a Map per pixel.
  @transient private lazy val evaluator: Array[Double] => Double =
    BandExprParser.compileIndexed(ast, names)

  override def eval(input: InternalRow): Any = {
    val arrs = new Array[ArrayData](bands.length)
    var b = 0
    while (b < bands.length) {
      val v = bands(b).eval(input)
      if (v == null) return null
      arrs(b) = v.asInstanceOf[ArrayData]
      b += 1
    }
    val n = arrs(0).numElements()
    b = 1
    while (b < arrs.length) {
      if (arrs(b).numElements() != n)
        throw new IllegalArgumentException(
          s"graft_band_expr: band '${names(b)}' has ${arrs(b).numElements()} " +
          s"samples but band '${names.head}' has $n — band blocks must be aligned")
      b += 1
    }
    val out = new Array[Int](n)
    val samples = new Array[Double](arrs.length)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < arrs.length) { samples(j) = arrs(j).getInt(i).toDouble; j += 1 }
      val v = evaluator(samples)
      out(i) =
        if (v.isNaN) nodata
        else math.min(math.max(v, lo), hi).toLong.toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = bands.map(_.genCode(ctx))
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val v = ctx.freshName("v")
    val out = ctx.freshName("out")
    val sampleVars = names.map(_ => ctx.freshName("s"))
    val bind = names.zip(sampleVars).toMap
    val body = BandExprParser.toJava(ast, bind)
    val loads = gens.zip(sampleVars)
      .map { case (g, sv) => s"double $sv = (double) ${g.value}.getInt($i);" }
      .mkString("\n")
    val nullCheck = gens.map(g => g.isNull.toString).mkString(" || ")
    val childCode = gens.map(_.code.toString).mkString("\n")
    val lengthChecks = gens.tail.zip(names.tail).map { case (g, nm) =>
      s"""if (${g.value}.numElements() != $n)
            throw new IllegalArgumentException(
              "graft_band_expr: band '$nm' has " + ${g.value}.numElements() +
              " samples but band '${names.head}' has " + $n +
              " - band blocks must be aligned");"""
    }.mkString("\n")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $nullCheck;
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        int $n = ${gens.head.value}.numElements();
        $lengthChecks
        int[] $out = new int[$n];
        for (int $i = 0; $i < $n; $i++) {
          $loads
          double $v = $body;
          $out[$i] = java.lang.Double.isNaN($v)
            ? $nodata
            : (int)(long) java.lang.Math.min(java.lang.Math.max($v, (${lo}D)), (${hi}D));
        }
        ${ev.value} = UnsafeArrayData.fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(bands = newChildren)
  override def prettyName: String = "graft_band_expr"
}
