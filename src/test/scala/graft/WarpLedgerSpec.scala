package graft

import org.apache.spark.sql.functions._
import graft.operators.{HistogramMatch, Visual, Warp}
import graft.catalog.Ledger

class WarpLedgerSpec extends SparkSpec {

  private def srcBlocks = {
    import spark.implicits._
    // one 4×4 source block at res 10, origin (0, 40): values = r*4+c
    Seq(("c1", "t1", java.sql.Date.valueOf("2020-01-05"), "B04",
      0, 0, 4, 4, 0.0, 40.0, 10.0, 10.0, -9999,
      Array.tabulate(16)(identity)))
      .toDF("cube", "tileId", "date", "band", "blockY", "blockX",
        "height", "width", "x0", "y0", "resX", "resY", "nodata", "pixels")
  }

  test("warp identity grid reproduces the source (nearest)") {
    val grid = Warp.destGrid(0, 40, 4, 4, 10, blockSize = 4)
    val out = Warp.warpBand(srcBlocks, grid, -9999, "nearest")
    assert(out.select("pixels").head().getSeq[Int](0) == (0 until 16))
  }

  test("warp 2x downsample samples block centers; bilinear interpolates") {
    val grid = Warp.destGrid(0, 40, 2, 2, 20, blockSize = 2)
    val nearest = Warp.warpBand(srcBlocks, grid, -9999, "nearest")
      .select("pixels").head().getSeq[Int](0)
    // dest centers at src fractional (0.5, 0.5) etc. → rounds to pixel 1 col?
    // src frac col = (10-0)/10-0.5 = 0.5 → rounds to 1 (HALF_UP)
    assert(nearest == Seq(5, 7, 13, 15))
    val bilinear = Warp.warpBand(srcBlocks, grid, -9999, "bilinear")
      .select("pixels").head().getSeq[Int](0)
    // bilinear at (0.5, 0.5): mean of 0,1,4,5 = 2.5 → rounds 3
    assert(bilinear == Seq(3, 5, 11, 13))
  }

  test("warp fills uncovered destination with nodata") {
    val grid = Warp.destGrid(-40, 40, 4, 2, 10, blockSize = 4)
    val out = Warp.warpBand(srcBlocks, grid, -9999, "nearest")
      .select("pixels").head().getSeq[Int](0)
    assert(out == Seq(-9999, -9999, -9999, -9999, -9999, -9999, -9999, -9999))
  }

  test("cross-CRS warp: longlat source onto a sinusoidal grid") {
    import spark.implicits._
    import graft.core.Grid
    // source in lon/lat degrees: 4×4 block over lon [-56,-52], lat [-14,-10],
    // res 1°; value encodes (lonIdx, latIdx)
    val srcLl = Seq(("c1", "t1", java.sql.Date.valueOf("2020-01-05"), "B04",
      0, 0, 4, 4, -56.0, -10.0, 1.0, 1.0, -9999,
      Array.tabulate(16)(identity)))
      .toDF("cube", "tileId", "date", "band", "blockY", "blockX",
        "height", "width", "x0", "y0", "resX", "resY", "nodata", "pixels")
    val sinu = Grid.Sinusoidal(lon0Deg = -54)
    // destination: one 2×2 block centered on the source area in sinu meters
    val (cx, cy) = sinu.forward(-54, -12)
    val res = 110000.0 // ~1 degree of latitude in meters
    val grid = Warp.destGrid(cx - res, cy + res, 2, 2, res, blockSize = 2)
    val out = Warp.warpBand(srcLl, grid, -9999, "nearest",
      dstProjection = Some(sinu),
      srcProjection = Some(Grid.projectionFor("longlat", 0)))
      .select("pixels").head().getSeq[Int](0)
    // dest pixel centers ≈ lon/lat (-54.5±, -11.5/-12.5) → src cells around
    // the middle of the 4×4 block; all must be valid (not nodata)
    assert(out.forall(_ != -9999), out.toString)
    // top-left dest center ≈ (-54.5, -11.5) → src col 1.0→1|2, row 1.5→2
    assert(Seq(5, 6, 9, 10).contains(out.head), out.toString)
  }

  test("ledger: pending = expected minus done; upsert keeps latest") {
    import spark.implicits._
    val tiles = Seq("t1", "t2").toDF("tile_id")
    val periods = Seq(("2020-01-01", "2020-01-16"), ("2020-01-17", "2020-02-01"))
      .toDF("p_start", "p_end")
    val expected = Ledger.expectedUnits(tiles, periods, Seq("B04", "QA"), "c1")
    assert(expected.count() == 2 * 2 * 2)

    val ledger = Seq(("c1", "t1", "2020-01-01", "2020-01-16", "B04", "SUCCESS"),
      ("c1", "t1", "2020-01-01", "2020-01-16", "QA", "ERROR"))
      .toDF("cube", "tile_id", "p_start", "p_end", "band", "status")
    val pending = Ledger.pendingUnits(expected, ledger)
    assert(pending.count() == 7) // only the SUCCESS unit is excluded
    assert(Ledger.pendingUnits(expected, ledger, force = true).count() == 8)

    val completions = Seq(("c1", "t1", "2020-01-01", "2020-01-16", "QA", "SUCCESS"))
      .toDF("cube", "tile_id", "p_start", "p_end", "band", "status")
    val updated = Ledger.upsert(ledger, completions)
    assert(updated.count() == 2)
    assert(updated.filter($"band" === "QA" && $"status" === "SUCCESS").count() == 1)
    assert(Ledger.pendingUnits(expected, updated).count() == 6)
  }

  test("ledger: commitVersion flips the pointer atomically, retains the " +
       "previous version for in-flight readers, and sweeps older ones") {
    import graft.catalog.Ledger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    def onDisk(): Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.toArray.map(_.toString.split("/").last).toSet finally s.close()
    }
    assert(Ledger.readCurrent(spark, dir).isEmpty)
    Ledger.commitVersion(spark, dir, Seq(("a", 1)).toDF("k", "v"))
    assert(Ledger.currentVersion(dir).contains("v0"))
    assert(Ledger.readCurrent(spark, dir).get.count() == 1)
    // a reader holding the CURRENT version's lazy plan must survive the
    // next commit (retain = 2 keeps its version on disk) …
    val inFlight = Ledger.readCurrent(spark, dir).get
    Ledger.commitVersion(spark, dir, Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    assert(Ledger.currentVersion(dir).contains("v1"))
    assert(Ledger.readCurrent(spark, dir).get.count() == 2)
    assert(onDisk().filter(_.matches("v\\d+")) == Set("v0", "v1"),
      s"retain=2 keeps the superseded version: ${onDisk()}")
    assert(inFlight.count() == 1,
      "a reader on the superseded version must not hit FileNotFound")
    // … and is swept one commit later
    Ledger.commitVersion(spark, dir, Seq(("c", 3)).toDF("k", "v"))
    assert(Ledger.currentVersion(dir).contains("v2"))
    assert(onDisk().filter(_.matches("v\\d+")) == Set("v1", "v2"),
      s"got ${onDisk()}")

    // crash simulation: an orphan version dir WITHOUT a pointer flip is
    // invisible to readers and clobbered/reused by the next commit
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "v3"))
    assert(Ledger.currentVersion(dir).contains("v2"),
      "an unflipped version must stay invisible")
    Ledger.commitVersion(spark, dir, Seq(("d", 4)).toDF("k", "v"))
    assert(Ledger.currentVersion(dir).contains("v3"))
    assert(Ledger.readCurrent(spark, dir).get.count() == 1)

    // cross-process guard: a competing committer's CLAIM on the next
    // number forces this committer onto a fresh number — the two never
    // write the same directory
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, ".claim_v4"))
    Ledger.commitVersion(spark, dir, Seq(("e", 5)).toDF("k", "v"))
    assert(Ledger.currentVersion(dir).contains("v5"),
      "a claimed version number must be skipped, not clobbered")
    assert(Ledger.readCurrent(spark, dir).get.as[(String, Int)]
      .collect().toSet == Set(("e", 5)))
  }

  test("ledger: readCurrent falls back to a legacy flat-parquet layout " +
       "and commitVersion migrates it (legacy files swept)") {
    import graft.catalog.Ledger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cvleg").toString
    // a pre-pointer-era dir: parquet written straight into it
    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    assert(Ledger.currentVersion(dir).isEmpty)
    val legacy = Ledger.readCurrent(spark, dir)
    assert(legacy.isDefined, "legacy layout must be readable, not ignored")
    assert(legacy.get.count() == 2)
    // upsert derived from the legacy read, committed pointer-versioned:
    // the migration — contents carry over, top level holds ONLY
    // versioned content + markers afterwards
    val migrated = Ledger.upsert(legacy.get.withColumnRenamed("k", "cube")
      .select($"cube", lit("t").as("tile_id"), lit("p").as("p_start"),
        lit("q").as("p_end"), lit("B").as("band"), lit("S").as("status")),
      Seq(("c", "t", "p", "q", "B", "S"))
        .toDF("cube", "tile_id", "p_start", "p_end", "band", "status"))
    // the legacy read's plan may still be in flight elsewhere, so the
    // migration commit leaves the flat files in place (the same
    // one-commit grace superseded versions get) …
    val inFlight = legacy.get
    Ledger.commitVersion(spark, dir, migrated)
    assert(Ledger.currentVersion(dir).contains("v0"))
    assert(Ledger.readCurrent(spark, dir).get.count() == 3,
      "readCurrent must prefer the pointer over retained legacy files")
    assert(inFlight.count() == 2,
      "a reader over the legacy files must survive the migration commit")
    // … and the NEXT commit sweeps them
    Ledger.commitVersion(spark, dir,
      Ledger.readCurrent(spark, dir).get)
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val names = try s.toArray.map(_.toString.split("/").last).toSet
      finally s.close()
    assert(!names.exists(n => n.startsWith("part-") || n == "_SUCCESS" ||
      n.endsWith(".crc")), s"legacy files must be swept: $names")
    assert(Ledger.readCurrent(spark, dir).get.count() == 3)
  }

  test("histogram matching: identical distributions map to identity") {
    import spark.implicits._
    val vals = Seq(1, 2, 2, 3, 3, 3, 7, 9)
    val src = vals.map(("k", _)).toDF("key", "value")
    val table = HistogramMatch.mappingTable(src, src)
    table.collect().foreach { r =>
      assert(math.abs(r.getInt(1) - r.getDouble(2)) < 1e-9,
        s"identity expected: ${r.getInt(1)} -> ${r.getDouble(2)}")
    }
  }

  test("histogram matching: constant shift is recovered") {
    import spark.implicits._
    val base = Seq(1, 2, 2, 3, 3, 3, 7, 9)
    val src = base.map(("k", _)).toDF("key", "value")
    val ref = base.map(v => ("k", v + 100)).toDF("key", "value")
    val got = HistogramMatch.mappingTable(src, ref).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    base.distinct.foreach { v =>
      assert(math.abs(got(v) - (v + 100)) < 1e-9, s"$v -> ${got(v)}")
    }
  }

  test("histogram match to reference scene: shifted scene is corrected") {
    import spark.implicits._
    // ref date (high priority): values 10,20,30,40; shifted scene: +100
    def block(date: String, px: Array[Int]) =
      ("c1", "t1", java.sql.Date.valueOf(date), "B04", 0, 0, 2, 2,
        0.0, 20.0, 10.0, 10.0, -9999, px)
    val merged = Seq(
      block("2020-01-10", Array(10, 20, 30, 40)),
      block("2020-01-05", Array(110, 120, 130, 140)))
      .toDF("cube", "tileId", "date", "band", "blockY", "blockX",
        "height", "width", "x0", "y0", "resX", "resY", "nodata", "pixels")
    val matched = graft.cube.CubeBuilder.histogramMatchScenes(
      merged, dayofyear(col("date")).cast("double"), "QA")
    val shifted = matched.filter(col("date") === "2020-01-05")
      .select("pixels").head().getSeq[Int](0)
    assert(shifted == Seq(10, 20, 30, 40)) // quantile-mapped onto ref
    val ref = matched.filter(col("date") === "2020-01-10")
      .select("pixels").head().getSeq[Int](0)
    assert(ref == Seq(10, 20, 30, 40)) // reference untouched
  }

  test("convex hull of a square with interior points") {
    val hull = Visual.convexHull(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0),
      (0.0, 2.0), (1.0, 1.0), (0.5, 1.5)))
    assert(hull.toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
  }

  test("png encoding produces a decodable image") {
    val rgb = Array.tabulate(16 * 8)(i => (i * 1000) & 0xffffff)
    val png = Visual.encodePng(rgb, 16, 8)
    assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 16 && img.getHeight == 8)
    assert((img.getRGB(5, 3) & 0xffffff) == rgb(3 * 16 + 5))
  }
}
