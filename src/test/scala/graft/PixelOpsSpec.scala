package graft

import org.apache.spark.sql.functions._
import graft.functions.{BandExprParser, PixelOps}
import graft.model.MaskDef

/** Golden tests ported from the reference's `tests/test_image.py` plus the
  * band-expression surface.
  */
class PixelOpsSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def one(df: DataFrame): Seq[Int] = df.head().getSeq[Int](0)

  test("P2 rescale: Landsat C2 L2 golden matrix (test_image.py:72-93)") {
    import spark.implicits._
    val input = Seq(
      17834, 16269, 8275, 27369,
      15755, 19081, 21684, 20865,
      24655, 21416, 8932, 32578,
      27168, 21827, 11382, 37001)
    val expected = Seq(
      2904, 2473, 275, 5526,
      2332, 3247, 3963, 3737,
      4780, 3889, 456, 6958,
      5471, 4002, 1130, 8175)
    val df = Seq(input).toDF("px")
    val out = df.select(
      PixelOps.rescale($"px", lit(-1), 0.0000275, -0.2, 0.0001, "uint16").as("r"))
    assert(one(out) == expected)
  }

  test("P4 bit extraction: 43 = 0b00101011 (test_image.py:111-117)") {
    import spark.implicits._
    val df = Seq(43).toDF("v")
    for (bit <- Seq(0, 1, 3, 5)) {
      val got = df.select((PixelOps.qaBitS($"v", bit) * lit(1 << bit)).as("b"))
        .head().getInt(0)
      assert(got == (1 << bit), s"bit $bit")
    }
    assert(df.select(PixelOps.qaBitS($"v", 2)).head().getInt(0) == 0)
  }

  test("P5 RADSAT bit range: [1026, 1037] bits 1..7 → [1, 6] (test_image.py:120-124)") {
    import spark.implicits._
    val df = Seq((1026, 1037)).toDF("a", "b")
    val row = df.select(
      PixelOps.bitRangeS($"a", 1, 7).as("x"),
      PixelOps.bitRangeS($"b", 1, 7).as("y")).head()
    assert(row.getLong(0) == 1L && row.getLong(1) == 6L)
  }

  test("P6 value-list classification") {
    import spark.implicits._
    val mask = MaskDef(clearData = Seq(0, 1), notClearData = Seq(2, 3, 4),
      saturatedData = Seq(9), nodata = 255)
    val df = Seq((0, 1, 2, 9, 255, 77)).toDF("a", "b", "c", "d", "e", "f")
    val row = df.select(
      PixelOps.classifyS($"a", mask), PixelOps.classifyS($"b", mask),
      PixelOps.classifyS($"c", mask), PixelOps.classifyS($"d", mask),
      PixelOps.classifyS($"e", mask), PixelOps.classifyS($"f", mask)).head()
    assert((0 until 6).map(row.getInt) == Seq(1, 1, 2, 3, 0, 2))
  }

  test("P7 confidence rule over 2-bit field") {
    import spark.implicits._
    // bits 8-9 = cloud confidence; value with field=3 (HIGH)
    val v = 3 << 8
    val df = Seq(v).toDF("qa")
    assert(df.select(PixelOps.confidenceS($"qa", 8, ">=", 2)).head().getBoolean(0))
    assert(!df.select(PixelOps.confidenceS($"qa", 8, "<", 2)).head().getBoolean(0))
  }

  test("P6 bitwise QA mask: get_qa_mask doctest golden (image.py:529-550)") {
    import spark.implicits._
    // qa=22080, clear bits {6,7}, not-clear {1,2,3,4}, nodata=1
    val df = Seq(22080).toDF("qa")
    // no confidence → clear (bit 6 set, no not-clear bit set)
    assert(df.select(PixelOps.qaMaskBitwiseS($"qa", Seq(6, 7), Seq(1, 2, 3, 4), 1L))
      .head().getBoolean(0))
    // cloud == MEDIUM confidence: field (qa>>8)&3 = 2 → masked
    assert(!df.select(PixelOps.qaMaskBitwiseS($"qa", Seq(6, 7), Seq(1, 2, 3, 4), 1L,
      confidence = Seq((8, "==", 2)))).head().getBoolean(0))
    // cirrus rule only fires on OLI samples
    val cirrusVal = 3 << 14 | (1 << 6)
    val df2 = Seq((cirrusVal, true), (cirrusVal, false)).toDF("qa", "oli")
    val got = df2.select(PixelOps.qaMaskBitwiseS($"qa", Seq(6), Seq(1, 3, 4), 1L,
      confidence = Seq((14, ">=", 2)), oli = $"oli")).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(false, true))
  }

  test("P6 bits mode flows through the composite kernel") {
    import graft.model.MaskDef
    import graft.operators.Composite
    import graft.operators.Composite._
    val mask = MaskDef(clearData = Seq(6, 7), notClearData = Seq(1, 2, 3, 4),
      nodata = 1, bits = true)
    val r = Composite.compose(
      IndexedSeq(Obs(90, 10, 0, Array(500, 600, 700), Array(1 << 6, 1 << 3, 1))),
      mask, -9999)
    assert(r.value.toSeq == Seq(500, 600, 700)) // 600/700 via non-nodata backfill
    assert(r.clearob.toSeq == Seq(1, 0, 0))
    assert(r.totalob.toSeq == Seq(1, 1, 0))     // qa==nodata(1) excluded
  }

  test("S6 Sentinel-2 baseline >= 4 subtracts 1000, negatives become nodata") {
    import spark.implicits._
    val df = Seq((Seq(1500, 800, 0, 42), 4), (Seq(1500, 800, 0, 42), 3))
      .toDF("px", "baseline")
    val out = df.select(PixelOps.baselineOffset($"px", $"baseline", lit(0)).as("r"))
      .collect().map(_.getSeq[Int](0))
    assert(out(0) == Seq(500, 0, 0, 0))  // 800-1000 < 0 → nodata(0); 0 is nodata already
    assert(out(1) == Seq(1500, 800, 0, 42))
  }

  test("P8 band expression: NDVI-style over arrays, clamped to int16") {
    import spark.implicits._
    val df = Seq((Seq(5000, 100), Seq(3000, 200))).toDF("B8A", "B04")
    val ndvi = PixelOps.bandExpr(
      Map("B8A" -> $"B8A", "B04" -> $"B04"),
      "10000.*((B8A-B04)/(B8A+B04))", "int16", -9999)
    val out = one(df.select(ndvi.as("r")))
    assert(out == Seq(2500, -3333)) // 10000*2000/8000; 10000*(-100)/300 trunc
  }

  test("P8 parser: precedence, power, unary minus, functions, trailing-dot floats") {
    import spark.implicits._
    val df = Seq((6.0, 2.0)).toDF("a", "b")
    def eval(e: String): Double =
      df.select(BandExprParser.compile(e, Map("a" -> $"a", "b" -> $"b")).cast("double"))
        .head().getDouble(0)
    assert(eval("a+b*2") == 10.0)
    assert(eval("(a+b)*2") == 16.0)
    assert(eval("a/b/3") == 1.0)
    assert(eval("-a+b") == -4.0)
    assert(eval("2**3**2") == 512.0) // right-assoc
    assert(eval("max(a, b, 7)") == 7.0)
    assert(eval("min(a-b, 2)") == 2.0)
    assert(eval("sqrt(b*b)") == 2.0)
    assert(eval("clip(a*10, 0, 30)") == 30.0)
    assert(eval("10.*a") == 60.0)
    assert(eval("1e2+a") == 106.0)
  }

  test("P8 parser rejects unbound identifiers and unknown functions") {
    intercept[IllegalArgumentException] {
      BandExprParser.compile("B05+1", Map.empty)
    }
    intercept[IllegalArgumentException] {
      BandExprParser.compile("system('x')", Map.empty)
    }
  }

  test("P11 item id formatting") {
    import spark.implicits._
    val df = Seq(("lc8-16d", 1, "007011", java.sql.Date.valueOf("2020-01-01")))
      .toDF("cube", "v", "tile", "d")
    val got = df.select(PixelOps.itemId($"cube", $"v", $"tile", $"d")).head().getString(0)
    assert(got == "LC8-16D_V001_007011_20200101")
  }

  test("P7 rule-string parser maps reference rules to (offset, op, level)") {
    assert(PixelOps.parseConfidenceRule("cloud >= MEDIUM") == ((8, ">=", 2)))
    assert(PixelOps.parseConfidenceRule("cloud_shadow > LOW") == ((10, ">", 1)))
    assert(PixelOps.parseConfidenceRule("snow == HIGH") == ((12, "==", 3)))
    assert(PixelOps.parseConfidenceRule("cirrus != NO_CONFIDENCE") == ((14, "!=", 0)))
    assert(PixelOps.parseConfidenceRule("cloud <= 1") == ((8, "<=", 1)))
    intercept[IllegalArgumentException](PixelOps.parseConfidenceRule("fog >= LOW"))
    intercept[IllegalArgumentException](PixelOps.parseConfidenceRule("cloud >= WET"))
    intercept[IllegalArgumentException](PixelOps.parseConfidenceRule("cloud"))
    // string form and triple form agree on a live column
    import spark.implicits._
    val df = Seq(3 << 8, 1 << 8).toDF("qa")
    val got = df.select(
      PixelOps.confidenceS($"qa", "cloud >= MEDIUM"),
      PixelOps.confidenceS($"qa", 8, ">=", 2)).collect()
    assert(got.forall(r => r.getBoolean(0) == r.getBoolean(1)))
  }

  private def messageChain(t: Throwable): Seq[String] = {
    var cur = t; val out = Seq.newBuilder[String]
    while (cur != null) { if (cur.getMessage != null) out += cur.getMessage; cur = cur.getCause }
    out.result()
  }

  test("P8 array kernel rejects misaligned band blocks with a clear error") {
    import spark.implicits._
    val df = Seq((Seq(1, 2, 3), Seq(1, 2))).toDF("A", "B")
    val ex = intercept[Exception] {
      df.select(PixelOps.bandExpr(Map("A" -> $"A", "B" -> $"B"),
        "A+B", "int16", -9999)).collect()
    }
    assert(messageChain(ex).exists(_.contains("must be aligned")))
  }

  test("P9 repair kernel: null band block yields null, not an NPE") {
    import spark.implicits._
    import graft.functions.PixelExpressions
    val df = Seq((Seq(0, 2), true), (Seq(0, 2), false)).toDF("qa", "f")
    val maybeNull = when(!$"f", array(lit(-9999), lit(1)))
    val out = df.select(PixelExpressions.repairQuality(
      $"qa", lit(255), lit(1), Seq((maybeNull, lit(-9999)))).as("r"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Int](0) == Seq(1, 2)) // b=-9999 at i=0 → saturated
  }

  test("P9 repair kernel rejects misaligned band blocks") {
    import spark.implicits._
    import graft.functions.PixelExpressions
    val df = Seq((Seq(0, 2), Seq(1))).toDF("qa", "b")
    val ex = intercept[Exception] {
      df.select(PixelExpressions.repairQuality(
        $"qa", lit(255), lit(1), Seq(($"b", lit(-9999))))).collect()
    }
    assert(messageChain(ex).exists(_.contains("must be aligned")))
  }

  test("P8 scalar and array paths agree on division by zero (IEEE, not null)") {
    import spark.implicits._
    val df = Seq((5, 0), (0, 0), (-5, 0), (6, 2)).toDF("num", "den")
    val arr = df.select(array($"num").as("N"), array($"den").as("D"))
      .select(PixelOps.bandExpr(Map("N" -> $"N", "D" -> $"D"),
        "N/D", "int16", -9999).as("r"))
      .collect().map(_.getSeq[Int](0).head)
    val sc = df.select(PixelOps.bandExprS(Map("N" -> $"num", "D" -> $"den"),
      "N/D", "int16", -9999).as("r"))
      .collect().map(_.getInt(0))
    assert(arr.toSeq == Seq(32767, -9999, -32768, 3)) // +Inf→hi, NaN→nodata, -Inf→lo
    assert(sc.toSeq == arr.toSeq)
  }

  test("P8 interpreted fallback: index-bound evaluator matches Map evaluator") {
    val ast = BandExprParser.parse("10000.*((B8A-B04)/(B8A+B04))")
    val f = BandExprParser.compileIndexed(ast, Seq("B8A", "B04"))
    assert(f(Array(5000.0, 3000.0)) ==
      BandExprParser.evalAst(ast, Map("B8A" -> 5000.0, "B04" -> 3000.0)))
    assert(f(Array(0.0, 0.0)).isNaN)
    val clip = BandExprParser.parse("clip(a % b, min(a, b, 0), max(a, 2))")
    val g = BandExprParser.compileIndexed(clip, Seq("a", "b"))
    assert(g(Array(7.0, 4.0)) ==
      BandExprParser.evalAst(clip, Map("a" -> 7.0, "b" -> 4.0)))
  }

  test("P3 linear scale maps input range onto output range") {
    import spark.implicits._
    val df = Seq((0, 5000, 10000, 12000)).toDF("a", "b", "c", "d")
    val row = df.select(
      PixelOps.linearScaleS($"a", 0, 10000, 0, 255),
      PixelOps.linearScaleS($"b", 0, 10000, 0, 255),
      PixelOps.linearScaleS($"c", 0, 10000, 0, 255),
      PixelOps.linearScaleS($"d", 0, 10000, 0, 255)).head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == 127.5)
    assert(row.getDouble(2) == 255.0)
    assert(row.getDouble(3) == 255.0) // clipped
  }
}
