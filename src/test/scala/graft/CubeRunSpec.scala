package graft

import graft.cube.CubeRun
import graft.model.{Band, Collection, MaskDef}
import graft.sources.GeoTiff

/** Orchestrated run: plan → execute → publish → ledger; idempotent rerun. */
class CubeRunSpec extends SparkSpec {

  private val nodata = -9999
  private val coll = Collection(
    name = "run", version = 1, grid = "G", compositeFunction = "LCF",
    temporalSchema = "Continuous", temporalUnit = "day", temporalStep = 16,
    bands = Seq(
      Band("B04", "red", "int16", nodata),
      Band("B8A", "nir", "int16", nodata),
      Band("QA", "quality", "uint8", 255)),
    qualityBand = "QA")
  private val mask = MaskDef(clearData = Seq(0L, 1L), notClearData = Seq(2L, 3L, 4L),
    nodata = 255L)

  test("run plans pending units, publishes, and reruns as a no-op") {
    val sceneDir = java.nio.file.Files.createTempDirectory("run_scenes")
    val outDir = java.nio.file.Files.createTempDirectory("run_out").toString
    val w = 32; val h = 32
    for ((date, seed) <- Seq(("20200105", 1), ("20200120", 2));
         band <- Seq("B04", "B8A", "QA")) {
      val isQa = band == "QA"
      val px = Array.tabulate(w * h)(i =>
        if (isQa) (if ((i + seed) % 5 == 0) 4 else 0)
        else 100 + (i * 7 + seed * 13) % 900)
      val bytes = GeoTiff.write(px, w, h, tileSize = 32,
        originX = 0, originY = 320, scaleX = 10, scaleY = 10,
        nodata = if (isQa) 255 else nodata)
      java.nio.file.Files.write(sceneDir.resolve(s"S_T9_${date}_$band.tif"), bytes)
    }

    val r1 = CubeRun.run(spark, coll, mask, sceneDir.toString, outDir, "t9",
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2020, 1, 31),
      blockSize = 32)
    // 2 periods × 2 spectral bands + QA? expected counts bands incl QA unit rows
    assert(r1.planned == 2 * 3)
    assert(r1.items == 2)   // one item per period
    assert(r1.blocks == 2 * 2) // (2 periods × 2 spectral bands) × 1 block

    val r2 = CubeRun.run(spark, coll, mask, sceneDir.toString, outDir, "t9",
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2020, 1, 31),
      blockSize = 32)
    assert(r2.planned == 0, "second run must be a no-op")

    // force rebuilds
    val r3 = CubeRun.run(spark, coll, mask, sceneDir.toString, outDir, "t9",
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2020, 1, 31),
      force = true, blockSize = 32)
    assert(r3.planned == 6)

    // extending the range backfills only the new periods (C4)
    val r4 = CubeRun.run(spark, coll, mask, sceneDir.toString, outDir, "t9",
      java.time.LocalDate.of(2020, 1, 1), java.time.LocalDate.of(2020, 2, 15),
      blockSize = 32)
    assert(r4.planned == 3) // one new period × 3 bands
  }
}
