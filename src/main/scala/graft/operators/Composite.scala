package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import graft.model.MaskDef

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Temporal compositing core (SURVEY §2.4 T2-T9) and merge mosaic (§2.3
  * M2/M3): one custom aggregate each — the only genuinely custom
  * aggregates in the engine (SURVEY §7.3).
  *
  * Semantics re-expressed from the reference's per-window loops
  * (`cube_builder/utils/processing.py:764-902` for blend,
  * `processing.py:330-367` for merge), as an explicit per-pixel state
  * machine (SURVEY §7.4):
  *
  * For each pixel, observations ordered by priority (descending
  * `100*efficacy/resolution`, ties toward the later date):
  *
  *  - '''usable''' (the reference's unmasked state): QA sample is in
  *    `clear_data`, OR it is none of {QA nodata, not-clear, saturated,
  *    band nodata}. (Note the reference quirk, kept here: a clear QA value
  *    overrides a nodata band sample — `processing.py:810-817` sets the
  *    mask False for clear values *after* masking band nodata. The P9
  *    cross-band repair exists to neutralize this upstream.)
  *  - '''LCF value''': first usable observation; pixels never usable take
  *    the first observation whose band sample is non-nodata (cloudy
  *    fallback, `processing.py:586-588,836-857`); else nodata.
  *  - '''MED''': median over usable samples (numpy masked-median: mean of
  *    the two middle values for even counts, truncated toward zero on the
  *    int cast); nodata when no usable sample.
  *  - '''AVG''': mean over usable samples, truncated toward zero.
  *  - '''TOTALOB''' (T5): count of observations whose QA sample != QA
  *    nodata (`processing.py:826-833`).
  *  - '''CLEAROB''' (T6): count of usable observations.
  *  - '''PROVENANCE''' (T7): day-of-year of the observation supplying the
  *    LCF value; -1 where nodata.
  *  - '''DATASOURCE''' (T8): source index of that observation; 255 where
  *    nodata.
  *  - '''T9 valid-range''': optionally require `min <= sample <= max` for
  *    an observation to count as usable. (In the reference this clamp is
  *    silently inert due to a chained fancy-indexing copy,
  *    `processing.py:879-885`; here it is honored when enabled.)
  *
  * Both aggregates are `TypedImperativeAggregate`s over primitive-array
  * buffers: the observation list lives as a plain JVM object in the hash
  * map and serializes to a compact byte image only at partial-aggregate
  * shuffle boundaries — unlike an `Aggregator`-via-`udaf` buffer, which
  * round-trips through its row encoder on every single input row. At
  * 512×512-sample blocks × thousands of groups that encoder churn was the
  * dominant GC load of the whole engine (round-1 bench).
  */
object Composite {

  /** One scene observation of one block: band samples + QA samples. */
  final case class Obs(
      priority: Double,
      doy: Int,
      source: Int,
      pixels: Array[Int],
      qa: Array[Int])

  final case class CompositeResult(
      value: Array[Int],
      median: Array[Int],
      average: Array[Int],
      provenance: Array[Int],
      datasource: Array[Int],
      clearob: Array[Int],
      totalob: Array[Int])

  final case class MosaicResult(value: Array[Int], datasource: Array[Int])

  val DatasourceNodata = 255
  val ProvenanceNodata = -1

  /** Shared usability predicate (see class doc). In `bits` mode the mask
    * lists hold BIT POSITIONS (Landsat C2 QA_PIXEL): usable iff not
    * QA-nodata, no not-clear bit set, and some clear bit set (reference
    * `get_qa_mask` bitwise branch; confidence rules are applied upstream
    * at merge time via [[graft.functions.PixelOps.qaMaskBitwiseS]]).
    */
  private def usable(qa: Int, px: Int, mask: MaskDef, nodata: Int,
                     applyValidRange: Boolean, minV: Double, maxV: Double): Boolean = {
    val base =
      if (mask.bits) {
        qa.toLong != mask.nodata &&
          !mask.notClearData.exists(b => (qa & (1L << b)) != 0) &&
          mask.clearData.exists(b => (qa & (1L << b)) != 0)
      } else {
        val clearQa = mask.clearData.contains(qa.toLong)
        val masked = qa.toLong == mask.nodata ||
          mask.notClearData.contains(qa.toLong) ||
          mask.saturatedData.contains(qa.toLong) ||
          px == nodata
        clearQa || !masked
      }
    if (applyValidRange) base && px >= minV && px <= maxV else base
  }

  /** Pure T2-T9 kernel over one group's observations (any order): the
    * per-pixel state machine of the class doc. Shared by the aggregate's
    * `eval` and the golden-semantics tests.
    */
  def compose(observations: IndexedSeq[Obs], mask: MaskDef, nodata: Int,
              applyValidRange: Boolean = false,
              minValue: Double = Double.MinValue,
              maxValue: Double = Double.MaxValue): CompositeResult = {
    // priority desc, ties toward later date (reference sorts
    // (efficacy/resolution, date-key) tuples descending).
    val ordered = observations.sortBy(o => (-o.priority, -o.doy)).toArray
    val n = if (ordered.isEmpty) 0 else ordered(0).pixels.length
    val value = Array.fill(n)(nodata)
    val med = Array.fill(n)(nodata)
    val avg = Array.fill(n)(nodata)
    val prov = Array.fill(n)(ProvenanceNodata)
    val src = Array.fill(n)(DatasourceNodata)
    val clearob = new Array[Int](n)
    val totalob = new Array[Int](n)
    val usableVals = new Array[Double](ordered.length)

    var i = 0
    while (i < n) {
      var stack = nodata
      var stackProv = ProvenanceNodata
      var stackSrc = DatasourceNodata
      var notdone = true
      var usableCount = 0
      var o = 0
      while (o < ordered.length) {
        val obs = ordered(o)
        val px = obs.pixels(i)
        val qa = obs.qa(i)
        val isUsable = usable(qa, px, mask, nodata, applyValidRange, minValue, maxValue)
        // step A: backfill any non-nodata sample into nodata stack slots
        if (stack == nodata && px != nodata) {
          stack = px; stackProv = obs.doy; stackSrc = obs.source
        }
        // step B: first usable observation wins
        if (notdone && isUsable) {
          stack = px; stackProv = obs.doy; stackSrc = obs.source
          notdone = false
        }
        if (isUsable) { usableVals(usableCount) = px.toDouble; usableCount += 1 }
        if (qa.toLong != mask.nodata) totalob(i) += 1
        o += 1
      }
      value(i) = stack
      prov(i) = stackProv
      src(i) = stackSrc
      clearob(i) = usableCount
      if (usableCount > 0) {
        val vals = java.util.Arrays.copyOf(usableVals, usableCount)
        java.util.Arrays.sort(vals)
        val m =
          if (usableCount % 2 == 1) vals(usableCount / 2)
          else (vals(usableCount / 2 - 1) + vals(usableCount / 2)) / 2.0
        med(i) = m.toInt // numpy astype: truncate toward zero
        avg(i) = (vals.sum / usableCount).toInt
      }
      i += 1
    }
    CompositeResult(value, med, avg, prov, src, clearob, totalob)
  }

  /** Pure M2/M3 kernel: overlay same-date scenes in asset order.
    * `combined = true` (multi-collection) fills only still-nodata holes
    * (first valid wins, `processing.py:330-349`); `combined = false`
    * overwrites valid pixels (last valid wins, `processing.py:350-352`).
    * Provenance records the source index of the supplying asset.
    */
  def mosaic(observations: IndexedSeq[(Int, Int, Array[Int])], nodata: Int,
             combined: Boolean): MosaicResult = {
    val ordered = observations.sortBy(_._1).toArray
    val n = if (ordered.isEmpty) 0 else ordered(0)._3.length
    val value = Array.fill(n)(nodata)
    val src = Array.fill(n)(DatasourceNodata)
    var i = 0
    while (i < n) {
      var o = 0
      while (o < ordered.length) {
        val px = ordered(o)._3(i)
        if (px != nodata && (value(i) == nodata || !combined)) {
          value(i) = px; src(i) = ordered(o)._2
        }
        o += 1
      }
      i += 1
    }
    MosaicResult(value, src)
  }

  /** Growable observation buffer for [[CompositeAgg]]: parallel primitive
    * arrays, serialized as one length-prefixed byte image.
    */
  final class ObsBuf {
    var n = 0
    var nodata: Int = Int.MinValue
    var minV: Double = Double.MinValue
    var maxV: Double = Double.MaxValue
    var metaSet = false
    var priority = new Array[Double](4)
    var doy = new Array[Int](4)
    var source = new Array[Int](4)
    var pixels = new Array[Array[Int]](4)
    var qa = new Array[Array[Int]](4)

    def append(p: Double, d: Int, s: Int, px: Array[Int], q: Array[Int]): Unit = {
      if (n == priority.length) {
        val cap = n * 2
        priority = java.util.Arrays.copyOf(priority, cap)
        doy = java.util.Arrays.copyOf(doy, cap)
        source = java.util.Arrays.copyOf(source, cap)
        pixels = java.util.Arrays.copyOf(pixels, cap)
        qa = java.util.Arrays.copyOf(qa, cap)
      }
      priority(n) = p; doy(n) = d; source(n) = s; pixels(n) = px; qa(n) = q
      n += 1
    }

    def toObs: IndexedSeq[Obs] =
      (0 until n).map(i => Obs(priority(i), doy(i), source(i), pixels(i), qa(i)))

    def serialize(): Array[Byte] = {
      var bytes = 4 + 4 + 8 + 8 + 1
      var i = 0
      while (i < n) { bytes += 8 + 4 + 4 + 8 + 4 * (pixels(i).length + qa(i).length); i += 1 }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(n); bb.putInt(nodata); bb.putDouble(minV); bb.putDouble(maxV)
      bb.put(if (metaSet) 1.toByte else 0.toByte)
      i = 0
      while (i < n) {
        bb.putDouble(priority(i)); bb.putInt(doy(i)); bb.putInt(source(i))
        bb.putInt(pixels(i).length)
        var j = 0
        while (j < pixels(i).length) { bb.putInt(pixels(i)(j)); j += 1 }
        bb.putInt(qa(i).length)
        j = 0
        while (j < qa(i).length) { bb.putInt(qa(i)(j)); j += 1 }
        i += 1
      }
      bb.array()
    }
  }

  object ObsBuf {
    def deserialize(bytes: Array[Byte]): ObsBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new ObsBuf
      val count = bb.getInt
      buf.nodata = bb.getInt; buf.minV = bb.getDouble; buf.maxV = bb.getDouble
      buf.metaSet = bb.get() == 1
      var i = 0
      while (i < count) {
        val p = bb.getDouble; val d = bb.getInt; val s = bb.getInt
        val px = new Array[Int](bb.getInt)
        var j = 0
        while (j < px.length) { px(j) = bb.getInt; j += 1 }
        val q = new Array[Int](bb.getInt)
        j = 0
        while (j < q.length) { q(j) = bb.getInt; j += 1 }
        buf.append(p, d, s, px, q)
        i += 1
      }
      buf
    }
  }

  private def intArray(a: Array[Int]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(a)

  /** The T2-T9 aggregate. Group rows by (cube, tile, band, period, block)
    * and feed one observation per row. Ordering happens once at `eval`,
    * which makes the aggregate insensitive to input order — required for
    * correct partial-aggregate merges. `nodata`/`minV`/`maxV` ride as
    * input columns (constant within a group key that includes the band),
    * so bands with different nodata and valid ranges composite correctly
    * in one pass — the reference applies these per band
    * (`processing.py:764-791`).
    */
  final case class CompositeAgg(
      priority: Expression, doy: Expression, source: Expression,
      pixels: Expression, qa: Expression,
      nodataExpr: Expression, minExpr: Expression, maxExpr: Expression,
      mask: MaskDef, applyValidRange: Boolean,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ObsBuf] {

    override def children: Seq[Expression] =
      Seq(priority, doy, source, pixels, qa, nodataExpr, minExpr, maxExpr)

    override def nullable: Boolean = false

    override def dataType: DataType = StructType(Seq(
      StructField("value", ArrayType(IntegerType, containsNull = false)),
      StructField("median", ArrayType(IntegerType, containsNull = false)),
      StructField("average", ArrayType(IntegerType, containsNull = false)),
      StructField("provenance", ArrayType(IntegerType, containsNull = false)),
      StructField("datasource", ArrayType(IntegerType, containsNull = false)),
      StructField("clearob", ArrayType(IntegerType, containsNull = false)),
      StructField("totalob", ArrayType(IntegerType, containsNull = false))))

    override def createAggregationBuffer(): ObsBuf = new ObsBuf

    override def update(buf: ObsBuf, input: InternalRow): ObsBuf = {
      val px = pixels.eval(input)
      val q = qa.eval(input)
      if (px != null && q != null) {
        if (!buf.metaSet) {
          buf.nodata = nodataExpr.eval(input).asInstanceOf[Int]
          buf.minV = minExpr.eval(input).asInstanceOf[Double]
          buf.maxV = maxExpr.eval(input).asInstanceOf[Double]
          buf.metaSet = true
        }
        buf.append(
          priority.eval(input).asInstanceOf[Double],
          doy.eval(input).asInstanceOf[Int],
          source.eval(input).asInstanceOf[Int],
          px.asInstanceOf[ArrayData].toIntArray(),
          q.asInstanceOf[ArrayData].toIntArray())
      }
      buf
    }

    override def merge(buf: ObsBuf, other: ObsBuf): ObsBuf = {
      if (!buf.metaSet && other.metaSet) {
        buf.nodata = other.nodata; buf.minV = other.minV; buf.maxV = other.maxV
        buf.metaSet = true
      }
      var i = 0
      while (i < other.n) {
        buf.append(other.priority(i), other.doy(i), other.source(i),
          other.pixels(i), other.qa(i))
        i += 1
      }
      buf
    }

    override def eval(buf: ObsBuf): Any = {
      val r = compose(buf.toObs, mask, buf.nodata, applyValidRange, buf.minV, buf.maxV)
      InternalRow(intArray(r.value), intArray(r.median), intArray(r.average),
        intArray(r.provenance), intArray(r.datasource),
        intArray(r.clearob), intArray(r.totalob))
    }

    override def serialize(buf: ObsBuf): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): ObsBuf = ObsBuf.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): CompositeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CompositeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(priority = newChildren(0), doy = newChildren(1),
        source = newChildren(2), pixels = newChildren(3), qa = newChildren(4),
        nodataExpr = newChildren(5), minExpr = newChildren(6),
        maxExpr = newChildren(7))
    override def prettyName: String = "graft_composite"
  }

  /** Column builder for [[CompositeAgg]]: yields a struct column
    * `(value, median, average, provenance, datasource, clearob, totalob)`.
    */
  def compositeAgg(mask: MaskDef, applyValidRange: Boolean = false)(
      priority: Column, doy: Column, source: Column,
      pixels: Column, qa: Column,
      nodata: Column, minValue: Column = lit(Double.MinValue),
      maxValue: Column = lit(Double.MaxValue)): Column = {
    def e(c: Column, t: String) = ColumnBridge.expression(c.cast(t))
    ColumnBridge.column(CompositeAgg(
      e(priority, "double"), e(doy, "int"), e(source, "int"),
      ColumnBridge.expression(pixels), ColumnBridge.expression(qa),
      e(nodata, "int"), e(minValue, "double"), e(maxValue, "double"),
      mask, applyValidRange).toAggregateExpression())
  }

  /** Growable buffer for [[MosaicAgg]]. */
  final class AssetBuf {
    var n = 0
    var order = new Array[Int](4)
    var source = new Array[Int](4)
    var pixels = new Array[Array[Int]](4)

    def append(o: Int, s: Int, px: Array[Int]): Unit = {
      if (n == order.length) {
        val cap = n * 2
        order = java.util.Arrays.copyOf(order, cap)
        source = java.util.Arrays.copyOf(source, cap)
        pixels = java.util.Arrays.copyOf(pixels, cap)
      }
      order(n) = o; source(n) = s; pixels(n) = px
      n += 1
    }

    def toTuples: IndexedSeq[(Int, Int, Array[Int])] =
      (0 until n).map(i => (order(i), source(i), pixels(i)))

    def serialize(): Array[Byte] = {
      var bytes = 4
      var i = 0
      while (i < n) { bytes += 4 + 4 + 4 + 4 * pixels(i).length; i += 1 }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(n)
      i = 0
      while (i < n) {
        bb.putInt(order(i)); bb.putInt(source(i)); bb.putInt(pixels(i).length)
        var j = 0
        while (j < pixels(i).length) { bb.putInt(pixels(i)(j)); j += 1 }
        i += 1
      }
      bb.array()
    }
  }

  object AssetBuf {
    def deserialize(bytes: Array[Byte]): AssetBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new AssetBuf
      val count = bb.getInt
      var i = 0
      while (i < count) {
        val o = bb.getInt; val s = bb.getInt
        val px = new Array[Int](bb.getInt)
        var j = 0
        while (j < px.length) { px(j) = bb.getInt; j += 1 }
        buf.append(o, s, px)
        i += 1
      }
      buf
    }
  }

  /** M2/M3 merge-mosaic aggregate (see [[mosaic]] for semantics). */
  final case class MosaicAgg(
      order: Expression, source: Expression, pixels: Expression,
      nodata: Int, combined: Boolean,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[AssetBuf] {

    override def children: Seq[Expression] = Seq(order, source, pixels)
    override def nullable: Boolean = false

    override def dataType: DataType = StructType(Seq(
      StructField("value", ArrayType(IntegerType, containsNull = false)),
      StructField("datasource", ArrayType(IntegerType, containsNull = false))))

    override def createAggregationBuffer(): AssetBuf = new AssetBuf

    override def update(buf: AssetBuf, input: InternalRow): AssetBuf = {
      val px = pixels.eval(input)
      if (px != null) {
        buf.append(order.eval(input).asInstanceOf[Int],
          source.eval(input).asInstanceOf[Int],
          px.asInstanceOf[ArrayData].toIntArray())
      }
      buf
    }

    override def merge(buf: AssetBuf, other: AssetBuf): AssetBuf = {
      var i = 0
      while (i < other.n) {
        buf.append(other.order(i), other.source(i), other.pixels(i))
        i += 1
      }
      buf
    }

    override def eval(buf: AssetBuf): Any = {
      val r = mosaic(buf.toTuples, nodata, combined)
      InternalRow(intArray(r.value), intArray(r.datasource))
    }

    override def serialize(buf: AssetBuf): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): AssetBuf = AssetBuf.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): MosaicAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MosaicAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(order = newChildren(0), source = newChildren(1), pixels = newChildren(2))
    override def prettyName: String = "graft_mosaic"
  }

  /** Column builder for [[MosaicAgg]]: yields `(value, datasource)`. */
  def mosaicAgg(nodata: Int, combined: Boolean)(
      order: Column, source: Column, pixels: Column): Column = {
    def e(c: Column, t: String) = ColumnBridge.expression(c.cast(t))
    ColumnBridge.column(MosaicAgg(
      e(order, "int"), e(source, "int"), ColumnBridge.expression(pixels),
      nodata, combined).toAggregateExpression())
  }

  /** M5 — efficacy / cloud-ratio statistics over a QA pixels column
    * (reference `_qa_statistics`, `processing.py:1386-1448`):
    * `efficacy = round(100*clear/total, 2)`,
    * `cloud = round(100*notClear/(clear+notClear), 2)` (100 when no data).
    * Expressed as conditional-count aggregation over the pixel arrays —
    * no explode, one codegen'd [[graft.functions.CountInList]] pass per
    * array (interpreted HOF `aggregate` lambdas measured ~40× slower).
    */
  def qaStatistics(qaPixels: Column, mask: MaskDef): (Column, Column) = {
    def countIn(values: Seq[Long]): Column =
      if (values.isEmpty) lit(0L)
      else graft.functions.PixelExpressions.countInList(qaPixels, values)
    val clear = sum(countIn(mask.clearData))
    val notClear = sum(countIn(mask.notClearData))
    val total = sum(size(qaPixels).cast("long"))
    val efficacy = round(clear * 100.0 / total, 2)
    val cloud = when(clear + notClear === 0, lit(100.0))
      .otherwise(round(notClear * 100.0 / (clear + notClear), 2))
    (efficacy, cloud)
  }

  /** M4 — saturated-mask propagation (reference `tasks.py:355-366`,
    * `processing.py:787-791`): where the RADSAT companion block has any of
    * bits 1..7 set, rewrite the QA sample to the saturated `marker` so the
    * composite's usability predicate rejects it. A null RADSAT block (date
    * has no companion band) passes QA through unchanged.
    */
  def saturatedPropagate(qa: Column, radsat: Column, marker: Int): Column =
    when(radsat.isNull, qa).otherwise(
      zip_with(qa, radsat, (q, r) =>
        when(graft.functions.PixelOps.bitRangeS(r, 1, 7) =!= 0, lit(marker))
          .otherwise(q)))

  /** P9 — cross-band nodata repair (reference `post_processing_quality`,
    * `processing.py:446-518`): where any spectral band holds nodata but the
    * QA sample is not QA-nodata, force QA := `saturatedValue` (1 for
    * Sentinel-2, else QA nodata); original QA-nodata samples are preserved.
    *
    * `bandPixels` are the spectral-band arrays (same geometry), each paired
    * with its nodata value. Codegen'd single pass
    * ([[graft.functions.RepairQualityExpr]]).
    */
  def repairQuality(qaPixels: Column, qaNodata: Column, saturatedValue: Column,
                    bandPixels: Seq[(Column, Column)]): Column =
    graft.functions.PixelExpressions.repairQuality(
      qaPixels, qaNodata, saturatedValue, bandPixels)

  /** Scalar form of P9 for one sample per row: plain `when` chains, no
    * array wrapping (the array form pays three allocations + an array
    * walk per row when the inputs are scalars).
    */
  def repairQualityS(qa: Column, qaNodata: Column, saturatedValue: Column,
                     bands: Seq[(Column, Column)]): Column = {
    val anyBandNodata = bands.map { case (px, nd) => px === nd }.reduce(_ || _)
    when(qa === qaNodata, qa)
      .when(anyBandNodata, saturatedValue)
      .otherwise(qa)
  }
}
