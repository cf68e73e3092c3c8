package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.{Band, MaskDef}

/** Scalar pixel functions (SURVEY §2.2) as codegen-friendly `Column`
  * expressions. Every function comes in two shapes: a per-sample Column
  * (`*S`, operating on one numeric column) and an array shape that maps the
  * same expression over a `pixels: Array[Int]` column with `transform` —
  * both stay inside whole-stage codegen (no UDFs).
  */
object PixelOps {

  /** P2 — linear rescale with dtype clamp (reference `utils/image.py:611-662`):
    * `clamp((px*mult + add)/newScale)` to the target dtype range, preserving
    * nodata. All arithmetic in double, truncated toward zero on cast (numpy
    * `astype` semantics).
    */
  def rescaleS(px: Column, nodata: Column, mult: Double, add: Double,
               newScaleMult: Double, dataType: String): Column = {
    val (lo, hi) = Band.dtypeRange(dataType)
    // reference order: clamp the scaled intermediate to the dtype range,
    // THEN divide by the new scale and cast (truncating toward zero, numpy
    // astype). The final cast saturates instead of numpy's silent wrap.
    val scaled = px.cast("double") * mult + add
    val clamped = least(greatest(scaled, lit(lo)), lit(hi)) / newScaleMult
    val result = least(greatest(clamped, lit(lo)), lit(hi)).cast("long")
    when(px === nodata, nodata.cast("long")).otherwise(result)
  }

  def rescale(pixels: Column, nodata: Column, mult: Double, add: Double,
              newScaleMult: Double, dataType: String): Column = {
    val (lo, hi) = Band.dtypeRange(dataType)
    PixelExpressions.rescale(pixels, nodata, mult, add, newScaleMult, lo, hi)
  }

  /** P3 — linear display scale (reference `utils/image.py:711-737`): clip to
    * `[inMin, inMax]` then map linearly onto `[outMin, outMax]`.
    */
  def linearScaleS(px: Column, inMin: Double, inMax: Double,
                   outMin: Double, outMax: Double): Column = {
    val clipped = least(greatest(px.cast("double"), lit(inMin)), lit(inMax))
    (clipped - inMin) / (inMax - inMin) * (outMax - outMin) + outMin
  }

  /** P4 — QA single-bit extract (reference `utils/image.py:418-425`):
    * `(px & (1 << bit)) != 0` as 0/1.
    */
  def qaBitS(px: Column, bit: Int): Column =
    when(px.bitwiseAND(lit(1L << bit)) =!= 0, lit(1)).otherwise(lit(0))

  /** P5 — bit-range extract (reference `utils/image.py:249-290`):
    * `(px >> start) & ((1 << (end-start+1)) - 1)`.
    */
  def bitRangeS(px: Column, startBit: Int, endBit: Int): Column =
    shiftright(px, startBit).bitwiseAND(lit((1L << (endBit - startBit + 1)) - 1))

  /** P6 — value-list QA classification (reference `utils/image.py:514-608`,
    * value-list branch `processing.py:810-817`): classify a quality sample
    * as clear / not-clear / saturated / nodata. Returns 0=nodata, 1=clear,
    * 2=not-clear, 3=saturated (first matching class wins in that order,
    * mirroring the reference's final `clear overrides` write order).
    */
  def classifyS(qa: Column, mask: MaskDef): Column = {
    val clear = if (mask.clearData.nonEmpty) qa.isin(mask.clearData: _*) else lit(false)
    val notClear = if (mask.notClearData.nonEmpty) qa.isin(mask.notClearData: _*) else lit(false)
    val saturated = if (mask.saturatedData.nonEmpty) qa.isin(mask.saturatedData: _*) else lit(false)
    when(qa === mask.nodata, lit(0))
      .when(clear, lit(1))
      .when(notClear, lit(2))
      .when(saturated, lit(3))
      .otherwise(lit(2))
  }

  /** Clear predicate for one QA sample under a value-list mask. */
  def isClearS(qa: Column, mask: MaskDef): Column = classifyS(qa, mask) === 1

  /** P7 — Landsat-C2 confidence rule (reference `utils/image.py:434-511`):
    * a rule like `cloud >= MEDIUM` over a 2-bit confidence field at
    * `offset`. Levels: 0 NO, 1 LOW, 2 MEDIUM, 3 HIGH.
    */
  def confidenceS(qa: Column, offset: Int, op: String, level: Int): Column = {
    val field = bitRangeS(qa, offset, offset + 1)
    op match {
      case ">=" => field >= level
      case ">"  => field > level
      case "<=" => field <= level
      case "<"  => field < level
      case "==" => field === level
      case "!=" => field =!= level
      case o    => throw new IllegalArgumentException(s"bad confidence op: $o")
    }
  }

  private val ConfidenceRulePattern = """^(\w+)\s*(>=|<=|==|!=|>|<)\s*(\w+)$""".r

  /** P7 — rule-string parser (reference `utils/image.py:427-511`): turns
    * the reference's confidence rule strings (`"cloud >= MEDIUM"`) into
    * the `(offset, op, level)` triples consumed by [[confidenceS]] /
    * [[qaMaskBitwiseS]]. Fields map to the Landsat C2 QA_PIXEL 2-bit
    * confidence ranges (cloud@8, cloud_shadow@10, snow@12, cirrus@14);
    * levels are NO_CONFIDENCE=0, LOW=1, MEDIUM=RESERVED=2, HIGH=3.
    */
  def parseConfidenceRule(rule: String): (Int, String, Int) = rule.trim match {
    case ConfidenceRulePattern(field, op, level) =>
      val offset = field.toLowerCase match {
        case "cloud"                   => 8
        case "cloud_shadow" | "shadow" => 10
        case "snow" | "snow_ice"       => 12
        case "cirrus"                  => 14
        case f => throw new IllegalArgumentException(
          s"unknown confidence field '$f' in rule '$rule'")
      }
      val lvl = level.toUpperCase match {
        case "NO_CONFIDENCE" | "NO"  => 0
        case "LOW"                   => 1
        case "MEDIUM" | "RESERVED"   => 2
        case "HIGH"                  => 3
        case n if n.forall(_.isDigit) => n.toInt
        case l => throw new IllegalArgumentException(
          s"unknown confidence level '$l' in rule '$rule'")
      }
      (offset, op, lvl)
    case _ => throw new IllegalArgumentException(
      s"bad confidence rule: '$rule' (expected '<field> <op> <level>')")
  }

  /** P7 over a reference-style rule string, e.g. `"cloud >= MEDIUM"`. */
  def confidenceS(qa: Column, rule: String): Column = {
    val (offset, op, level) = parseConfidenceRule(rule)
    confidenceS(qa, offset, op, level)
  }

  /** P6 bitwise mode — Landsat C2 QA_PIXEL mask (reference `get_qa_mask`,
    * `utils/image.py:514-608`): a sample is usable iff
    *
    *  - it is not QA-nodata,
    *  - no configured confidence rule fires (2-bit fields: cloud@8,
    *    shadow@10, snow@12, cirrus@14 — cirrus only evaluated on OLI
    *    samples),
    *  - none of the `notClearBits` are set (the cirrus bit 2 check is
    *    likewise OLI-guarded when confidence is in play), and
    *  - at least one of the `clearBits` is set.
    *
    * Confidence rules are (offset, op, level) triples from [[confidenceS]];
    * the reference's rule strings (`"cloud >= MEDIUM"`) map directly
    * (NO_CONFIDENCE=0, LOW=1, MEDIUM=2, HIGH=3).
    */
  def qaMaskBitwiseS(qa: Column, clearBits: Seq[Int], notClearBits: Seq[Int],
                     nodata: Long,
                     confidence: Seq[(Int, String, Int)] = Nil,
                     oli: Column = lit(true)): Column = {
    val confHit: Column = confidence.map { case (offset, op, level) =>
      val rule = confidenceS(qa, offset, op, level)
      if (offset == 14) rule && oli else rule // cirrus applies on OLI only
    }.foldLeft(lit(false))(_ || _)
    val anyNotClear = notClearBits.map { b =>
      val hit = qa.bitwiseAND(lit(1L << b)) =!= 0
      if (b == 2 && confidence.nonEmpty) hit && oli else hit
    }.foldLeft(lit(false))(_ || _)
    val anyClear = clearBits.map(b => qa.bitwiseAND(lit(1L << b)) =!= 0)
      .foldLeft(lit(false))(_ || _)
    qa =!= nodata && !confHit && !anyNotClear && anyClear
  }

  /** [[qaMaskBitwiseS]] with reference-style rule strings. */
  def qaMaskBitwiseRulesS(qa: Column, clearBits: Seq[Int], notClearBits: Seq[Int],
                          nodata: Long, rules: Seq[String],
                          oli: Column = lit(true)): Column =
    qaMaskBitwiseS(qa, clearBits, notClearBits, nodata,
      rules.map(parseConfidenceRule), oli)

  /** S6 — Sentinel-2 processing-baseline offset (reference
    * `sentinel/sentinel2.py:136-174`): baseline ≥ 4 subtracts 1000; results
    * below zero become nodata.
    */
  def baselineOffsetS(px: Column, baselineMajor: Column, nodata: Column): Column =
    when(baselineMajor >= 4 && px =!= nodata,
      when(px - 1000 < 0, nodata).otherwise(px - 1000)).otherwise(px)

  def baselineOffset(pixels: Column, baselineMajor: Column, nodata: Column): Column =
    PixelExpressions.baselineOffset(pixels, baselineMajor, nodata)

  /** P8 — band-expression evaluation over pixel arrays: evaluate the
    * parsed band-algebra AST per sample over N aligned band arrays, then
    * clamp to the output dtype (reference `utils/interpreter.py:28-60`,
    * `index_generator.py:34-127` — the Python `exec` VM is replaced by a
    * generated Java loop, [[BandExprArray]]).
    *
    * `bandExpr(Map("B04" -> col4, "B8A" -> col8a), "10000*((B8A-B04)/(B8A+B04))", ...)`
    */
  def bandExpr(bands: Map[String, Column], expression: String,
               dataType: String, nodata: Int): Column = {
    require(bands.nonEmpty)
    val (lo, hi) = Band.dtypeRange(dataType)
    PixelExpressions.bandExpr(bands.toSeq, expression, lo, hi, nodata)
  }

  /** Scalar form of P8: evaluate `expression` over bound sample columns,
    * clamp to the output dtype range, NaN/null → nodata.
    */
  def bandExprS(env: Map[String, Column], expression: String,
                dataType: String, nodata: Int): Column = {
    val (lo, hi) = Band.dtypeRange(dataType)
    val value = BandExprParser.compile(expression, env)
    val clamped = least(greatest(value, lit(lo)), lit(hi)).cast("int")
    when(value.isNull || value.isNaN, lit(nodata)).otherwise(clamped)
  }

  /** P11 — item-ID / path templating (reference `processing.py:119-132`,
    * `utils/strings.py:27-50`): `{datacube:upper}_V{version}_{tile}_{date}`.
    */
  def itemId(datacube: Column, version: Column, tile: Column, date: Column): Column =
    concat_ws("_", upper(datacube),
      concat(lit("V"), lpad(version.cast("string"), 3, "0")),
      tile, date_format(date, "yyyyMMdd"))
}
