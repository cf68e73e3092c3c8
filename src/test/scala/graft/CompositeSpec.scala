package graft

import org.apache.spark.sql.functions._
import graft.model.MaskDef
import graft.operators.Composite
import graft.operators.Composite._

/** Golden tests for the T2-T9 composite semantics, built from the worked
  * example in the reference's blend docstring
  * (`cube_builder/utils/processing.py:549-588`): two scenes (15/1 efficacy
  * ~83%, 10/1 efficacy 50%) over a 3×4 block. Note the docstring's printed
  * LCF/MED values for pixel (2,3) are swapped relative to its own algebra
  * (402 is the first-clear value, 411 the truncated median of {402, 421});
  * the expectations here follow the algebra, which the rest of the
  * docstring matches.
  *
  * Tests drive the pure kernels [[Composite.compose]] / [[Composite.mosaic]]
  * directly (order-shuffled inputs prove order-insensitivity, the property
  * the TypedImperativeAggregate's merge relies on), plus one distributed
  * round-trip through [[Composite.compositeAgg]].
  */
class CompositeSpec extends SparkSpec {

  private val mask = MaskDef(clearData = Seq(0L, 1L), notClearData = Seq(2L, 3L, 4L),
    nodata = 255L)
  private val nodata = -9999

  // 15/1 — best scene (higher efficacy)
  private val qaA = Array(0, 0, 255, 255, 0, 1, 1, 1, 0, 0, 0, 0)
  private val pxA = Array(854, 756, 9800, 9454, 945, 400, 402, 422, 869, 975, 788, 799)
  // 10/1 — worst scene
  private val qaB = Array(0, 0, 2, 4, 0, 1, 1, 4, 0, 2, 2, 4)
  private val pxB = Array(702, 876, 7000, 9000, 687, 444, 421, 9113, 1241, 1548, 2111, 1987)

  // worst-first input order proves the kernel sorts by priority itself
  private def goldenObs: IndexedSeq[Obs] =
    IndexedSeq(Obs(50.0, 10, 1, pxB, qaB), Obs(83.0, 15, 0, pxA, qaA))

  private def composeGolden(applyValidRange: Boolean = false,
                            minV: Double = Double.MinValue,
                            maxV: Double = Double.MaxValue): CompositeResult =
    Composite.compose(goldenObs, mask, nodata, applyValidRange, minV, maxV)

  test("LCF best-pixel: first clear, non-nodata backfill where best is QA-nodata") {
    val r = composeGolden()
    // The docstring prints 7000/9000 (scene 10/1) for pixels (0,2)/(0,3),
    // but the code's step-A backfill (`processing.py:836-857`) writes the
    // FIRST non-nodata band sample in priority order regardless of QA — the
    // 15/1 scene has band data (9800/9454) under its QA-nodata there, so it
    // wins. (In real pipelines merge writes band nodata exactly where QA is
    // nodata, making the two readings coincide.) We follow the code.
    assert(r.value.toSeq == Seq(854, 756, 9800, 9454, 945, 400, 402, 422, 869, 975, 788, 799))
    assert(r.provenance.toSeq == Seq(15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15))
    assert(r.datasource.toSeq == Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("LCF with band-nodata under QA-nodata falls through to the next scene") {
    val r = Composite.compose(IndexedSeq(
      Obs(83.0, 15, 0, Array(nodata), Array(255)),
      Obs(50.0, 10, 1, Array(7000), Array(2))), mask, nodata)
    assert(r.value.toSeq == Seq(7000))
    assert(r.provenance.toSeq == Seq(10))
    assert(r.datasource.toSeq == Seq(1))
  }

  test("MED: masked median over clear observations, nodata where none") {
    val r = composeGolden()
    assert(r.median.toSeq == Seq(778, 816, nodata, nodata, 816, 422, 411, 422, 1055, 975, 788, 799))
  }

  test("CLEAROB and TOTALOB counts") {
    val r = composeGolden()
    assert(r.clearob.toSeq == Seq(2, 2, 0, 0, 2, 2, 2, 1, 2, 1, 1, 1))
    assert(r.totalob.toSeq == Seq(2, 2, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2))
  }

  test("AVG: truncated mean over clear observations") {
    val r = composeGolden()
    assert(r.average(0) == (854 + 702) / 2)
    assert(r.average(2) == nodata)
  }

  test("nodata in best image is filled by any later non-nodata observation") {
    // best scene: band nodata, cloudy QA; worst scene: cloudy but has data
    val r = Composite.compose(IndexedSeq(
      Obs(90.0, 20, 0, Array(nodata), Array(2)),
      Obs(10.0, 5, 1, Array(1234), Array(2))), mask, nodata)
    assert(r.value.toSeq == Seq(1234))     // cloudy fallback tier
    assert(r.provenance.toSeq == Seq(5))
    assert(r.median.toSeq == Seq(nodata))  // no clear observation
    assert(r.clearob.toSeq == Seq(0))
    assert(r.totalob.toSeq == Seq(2))
  }

  test("T9 valid-range excludes out-of-range samples when enabled") {
    val r = Composite.compose(IndexedSeq(
      Obs(90.0, 20, 0, Array(20000), Array(0)), // clear but saturated
      Obs(10.0, 5, 1, Array(500), Array(0))),
      mask, nodata, applyValidRange = true, minValue = 0, maxValue = 10000)
    assert(r.value.toSeq == Seq(500))
    assert(r.clearob.toSeq == Seq(1))
  }

  test("unknown QA values with valid data count as usable (reference mask algebra)") {
    val r = Composite.compose(IndexedSeq(
      Obs(90.0, 20, 0, Array(777), Array(99))), mask, nodata) // 99 in no list
    assert(r.value.toSeq == Seq(777))
    assert(r.clearob.toSeq == Seq(1))
  }

  test("mosaic: combined fills holes (first valid), single overlay overwrites (last valid)") {
    val a = (0, 0, Array(1, nodata, 3))
    val b = (1, 1, Array(7, 8, nodata))
    // insert out of asset order to prove the kernel sorts by order itself
    val combined = Composite.mosaic(IndexedSeq(b, a), nodata, combined = true)
    assert(combined.value.toSeq == Seq(1, 8, 3))
    assert(combined.datasource.toSeq == Seq(0, 1, 0))

    val single = Composite.mosaic(IndexedSeq(a, b), nodata, combined = false)
    assert(single.value.toSeq == Seq(7, 8, 3))
  }

  test("composite runs distributed via Spark groupBy (aggregate round-trips)") {
    import spark.implicits._
    val obs = Seq(
      ("t1", 83.0, 15, 0, pxA.toSeq, qaA.toSeq),
      ("t1", 50.0, 10, 1, pxB.toSeq, qaB.toSeq),
      ("t2", 70.0, 3, 0, Seq(5, nodata, 7), Seq(0, 0, 2)))
      .toDF("tile", "priority", "doy", "source", "px", "qa")
    val c = Composite.compositeAgg(mask)(
      col("priority"), col("doy"), col("source"), col("px"), col("qa"),
      lit(nodata))
    val rows = obs.groupBy($"tile").agg(c.as("c"))
      .select($"tile", $"c.value", $"c.clearob")
      .collect().map(r => r.getString(0) -> (r.getSeq[Int](1), r.getSeq[Int](2))).toMap
    assert(rows("t1")._1 ==
      Seq(854, 756, 9800, 9454, 945, 400, 402, 422, 869, 975, 788, 799))
    assert(rows("t2")._1 == Seq(5, nodata, 7))
    // pixel 1: clear QA over band nodata counts as usable (reference quirk)
    assert(rows("t2")._2 == Seq(1, 1, 0))
  }

  test("M5 qa statistics over pixel arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(0, 0, 2, 255)),   // 2 clear, 1 cloud, 1 nodata
      (Seq(1, 4, 4, 4))).toDF("qa")
    val (eff, cloud) = Composite.qaStatistics(col("qa"), mask)
    val row = df.agg(eff.as("e"), cloud.as("c")).head()
    // clear=3, notClear=4, total=8 → efficacy 37.5, cloud 57.14
    assert(row.getDouble(0) == 37.5)
    assert(row.getDouble(1) == 57.14)
  }

  test("P9 repairs clear QA over band nodata, preserving QA nodata") {
    import spark.implicits._
    val df = Seq((Seq(0, 0, 255, 0), Seq(100, -9999, 50, -9999), Seq(1, 2, 3, 4)))
      .toDF("qa", "b1", "b2")
    val repaired = Composite.repairQuality(col("qa"), lit(255), lit(1),
      Seq((col("b1"), lit(-9999)), (col("b2"), lit(-1))))
    val out = df.select(repaired.as("r")).head().getSeq[Int](0)
    assert(out == Seq(0, 1, 255, 1))
  }
}
