package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.model.MaskDef

/** Temporal compositing core (SURVEY §2.4 T2-T9) and merge mosaic (§2.3
  * M2/M3): one custom `Aggregator` each — the only genuinely custom
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

  final case class Buf(var obs: List[Obs])

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

  /** The T2-T9 aggregator. Group rows by (cube, tile, band, period, block)
    * and aggregate `Obs` inputs. The buffer accumulates the (small, bounded
    * by scenes-per-period) observation list; ordering happens once at
    * `finish`, which makes the aggregate insensitive to input order —
    * required for correct partial-aggregate merges.
    */
  final class CompositeAggregator(
      mask: MaskDef,
      nodata: Int,
      applyValidRange: Boolean = false,
      minValue: Double = Double.MinValue,
      maxValue: Double = Double.MaxValue)
      extends Aggregator[Obs, Buf, CompositeResult] {

    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Obs): Buf = { b.obs = a :: b.obs; b }
    override def merge(b1: Buf, b2: Buf): Buf = { b1.obs = b1.obs ::: b2.obs; b1 }

    override def finish(b: Buf): CompositeResult = {
      // priority desc, ties toward later date (reference sorts
      // (efficacy/resolution, date-key) tuples descending).
      val ordered = b.obs.sortBy(o => (-o.priority, -o.doy)).toArray
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

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[CompositeResult] = Encoders.product[CompositeResult]
  }

  /** M2/M3 merge-mosaic aggregator: overlay same-date scenes in asset
    * order. `combined = true` (multi-collection) fills only still-nodata
    * holes (first valid wins, `processing.py:330-349`); `combined = false`
    * overwrites valid pixels (last valid wins, `processing.py:350-352`).
    * Provenance records the source index of the supplying asset.
    */
  final case class AssetObs(order: Int, source: Int, pixels: Array[Int])
  final case class MosaicResult(value: Array[Int], datasource: Array[Int])
  final case class MosaicBuf(var obs: List[AssetObs])

  final class MosaicAggregator(nodata: Int, combined: Boolean)
      extends Aggregator[AssetObs, MosaicBuf, MosaicResult] {
    override def zero: MosaicBuf = MosaicBuf(Nil)
    override def reduce(b: MosaicBuf, a: AssetObs): MosaicBuf = { b.obs = a :: b.obs; b }
    override def merge(b1: MosaicBuf, b2: MosaicBuf): MosaicBuf = {
      b1.obs = b1.obs ::: b2.obs; b1
    }
    override def finish(b: MosaicBuf): MosaicResult = {
      val ordered = b.obs.sortBy(_.order).toArray
      val n = if (ordered.isEmpty) 0 else ordered(0).pixels.length
      val value = Array.fill(n)(nodata)
      val src = Array.fill(n)(DatasourceNodata)
      var i = 0
      while (i < n) {
        var o = 0
        while (o < ordered.length) {
          val px = ordered(o).pixels(i)
          if (px != nodata && (value(i) == nodata || !combined)) {
            value(i) = px; src(i) = ordered(o).source
          }
          o += 1
        }
        i += 1
      }
      MosaicResult(value, src)
    }
    override def bufferEncoder: Encoder[MosaicBuf] = Encoders.product[MosaicBuf]
    override def outputEncoder: Encoder[MosaicResult] = Encoders.product[MosaicResult]
  }

  /** M5 — efficacy / cloud-ratio statistics over a QA pixels column
    * (reference `_qa_statistics`, `processing.py:1386-1448`):
    * `efficacy = round(100*clear/total, 2)`,
    * `cloud = round(100*notClear/(clear+notClear), 2)` (100 when no data).
    * Expressed as conditional-count aggregation over the pixel arrays —
    * no explode, a single pass of codegen'd array folds.
    */
  def qaStatistics(qaPixels: Column, mask: MaskDef): (Column, Column) = {
    def countIn(values: Seq[Long]): Column =
      if (values.isEmpty) lit(0L)
      else aggregate(qaPixels, lit(0L),
        (acc, px) => acc + when(px.isin(values: _*), 1L).otherwise(0L))
    val clear = sum(countIn(mask.clearData))
    val notClear = sum(countIn(mask.notClearData))
    val total = sum(size(qaPixels).cast("long"))
    val efficacy = round(clear * 100.0 / total, 2)
    val cloud = when(clear + notClear === 0, lit(100.0))
      .otherwise(round(notClear * 100.0 / (clear + notClear), 2))
    (efficacy, cloud)
  }

  /** P9 — cross-band nodata repair (reference `post_processing_quality`,
    * `processing.py:446-518`): where any spectral band holds nodata but the
    * QA sample is not QA-nodata, force QA := `saturatedValue` (1 for
    * Sentinel-2, else QA nodata); original QA-nodata samples are preserved.
    *
    * `bandPixels` are the spectral-band arrays (same geometry), each paired
    * with its nodata value.
    */
  def repairQuality(qaPixels: Column, qaNodata: Column, saturatedValue: Column,
                    bandPixels: Seq[(Column, Column)]): Column = {
    val anyBandNodata: Column => Column = idx =>
      bandPixels.map { case (px, nd) => element_at(px, idx + 1) === nd }
        .reduce(_ || _)
    transform(qaPixels, (qa, i) =>
      when(qa === qaNodata, qa)
        .when(anyBandNodata(i), saturatedValue)
        .otherwise(qa))
  }
}
