package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P1 — reproject/resample warp (reference `processing.py:223-231`,
  * rasterio `reproject`), as a distributed per-destination-block gather.
  *
  * Plan shape (scale-first):
  *  1. the destination block grid is a small driver-side table;
  *  2. source blocks spatial-join (broadcast the grid) to every
  *     destination block they overlap — the M1 bbox join;
  *  3. `groupByKey(destBlock).mapGroups` gathers each destination pixel
  *     from its source position — inverse-transform + nearest/bilinear,
  *     the same kernel the reference runs per rasterio window.
  *
  * This round supports affine warps (origin shift + resolution change
  * within one CRS); cross-CRS warps compose this with the
  * [[graft.core.Grid.Projection]] forward/inverse pair at block corners.
  */
object Warp {

  final case class DstBlock(blockY: Int, blockX: Int, height: Int, width: Int,
                            x0: Double, y0: Double, resX: Double, resY: Double)

  final case class SrcBlock(x0: Double, y0: Double, resX: Double, resY: Double,
                            height: Int, width: Int, pixels: Array[Int])

  /** Destination grid covering (xmin..xmax, ymin..ymax) at `res`. */
  def destGrid(xmin: Double, ymax: Double, widthPx: Int, heightPx: Int,
               res: Double, blockSize: Int = 512): Seq[DstBlock] =
    for {
      by <- 0 until (heightPx + blockSize - 1) / blockSize
      bx <- 0 until (widthPx + blockSize - 1) / blockSize
    } yield DstBlock(by, bx,
      math.min(blockSize, heightPx - by * blockSize),
      math.min(blockSize, widthPx - bx * blockSize),
      xmin + bx * blockSize * res, ymax - by * blockSize * res, res, res)

  /** Warp all blocks of one (cube, tile, date, band) slice onto `grid`.
    *
    * @param method "nearest" (quality bands) or "bilinear" (spectral) —
    *               selection mirrors `image.py:740-753`
    * @param dstProjection with `srcProjection`: the grid lives in
    *               `dstProjection`'s plane and sources in
    *               `srcProjection`'s — each destination pixel center maps
    *               dest→lonlat→src before sampling (cross-CRS warp). Both
    *               None = same-CRS affine warp.
    */
  def warpBand(src: DataFrame, grid: Seq[DstBlock], nodata: Int,
               method: String = "nearest",
               dstProjection: Option[graft.core.Grid.Projection] = None,
               srcProjection: Option[graft.core.Grid.Projection] = None): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val bilinear = method == "bilinear"

    // For the overlap join, express each destination block's extent in the
    // SOURCE plane (sample the block edges through dest→lonlat→src; edges
    // curve under reprojection, corners alone under-cover).
    val gridWithSrcExtent = grid.map { b =>
      val corners = for {
        i <- 0 to 8
        (x, y) <- Seq(
          (b.x0 + b.width * b.resX * i / 8.0, b.y0),
          (b.x0 + b.width * b.resX * i / 8.0, b.y0 - b.height * b.resY),
          (b.x0, b.y0 - b.height * b.resY * i / 8.0),
          (b.x0 + b.width * b.resX, b.y0 - b.height * b.resY * i / 8.0))
      } yield (dstProjection, srcProjection) match {
        case (Some(dp), Some(sp)) =>
          val (lon, lat) = dp.inverse(x, y)
          sp.forward(lon, lat)
        case _ => (x, y)
      }
      (b.blockY, b.blockX, b.height, b.width, b.x0, b.y0, b.resX, b.resY,
        corners.map(_._1).min, corners.map(_._1).max,
        corners.map(_._2).min, corners.map(_._2).max)
    }
    val gridDf = gridWithSrcExtent.toDF("blockY", "blockX", "height", "width",
      "x0", "y0", "resX", "resY", "sxmin", "sxmax", "symin", "symax")

    // M1-style overlap join in the source plane
    val joined = src.join(broadcast(gridDf),
      src("x0") < gridDf("sxmax") &&
      src("x0") + src("width") * src("resX") > gridDf("sxmin") &&
      src("y0") > gridDf("symin") &&
      src("y0") - src("height") * src("resY") < gridDf("symax"))

    val keyed = joined.select(
      struct(src("cube"), src("tileId"), src("date"), src("band"),
        gridDf("blockY"), gridDf("blockX"), gridDf("height"), gridDf("width"),
        gridDf("x0"), gridDf("y0"), gridDf("resX"), gridDf("resY")).as("k"),
      struct(src("x0").as("x0"), src("y0").as("y0"),
        src("resX").as("resX"), src("resY").as("resY"),
        src("height").as("height"), src("width").as("width"),
        src("pixels").as("pixels")).as("s"))
      .as[(WarpKey, SrcBlock)]

    val reproject: Option[(Double, Double) => (Double, Double)] =
      (dstProjection, srcProjection) match {
        case (Some(dp), Some(sp)) => Some { (x: Double, y: Double) =>
          val (lon, lat) = dp.inverse(x, y)
          sp.forward(lon, lat)
        }
        case _ => None
      }

    val matched = keyed.groupByKey(_._1).mapGroups { (k, rows) =>
      val srcs = rows.map(_._2).toArray
      val out = Array.fill(k.height * k.width)(nodata)
      var r = 0
      while (r < k.height) {
        val y = k.y0 - (r + 0.5) * k.resY
        var c = 0
        while (c < k.width) {
          val x = k.x0 + (c + 0.5) * k.resX
          val (sx, sy) = reproject.map(f => f(x, y)).getOrElse((x, y))
          out(r * k.width + c) = sample(srcs, sx, sy, nodata, bilinear)
          c += 1
        }
        r += 1
      }
      (k, out)
    }.toDF("k", "pixels")
      .select(col("k.*"), col("pixels"))

    // destination blocks with no overlapping source are all-nodata (the
    // join above drops them); synthesize them per (cube, tile, date, band)
    val slices = src.select("cube", "tileId", "date", "band").distinct()
    val empties = slices.crossJoin(
      broadcast(gridDf.drop("sxmin", "sxmax", "symin", "symax")))
      .join(matched,
        Seq("cube", "tileId", "date", "band", "blockY", "blockX"), "left_anti")
      .withColumn("pixels", array_repeat(lit(nodata), col("height") * col("width")))

    matched.unionByName(empties)
      .withColumn("nodata", lit(nodata))
  }

  /** Sample the source mosaic at projected point (x, y). */
  private def sample(srcs: Array[SrcBlock], x: Double, y: Double,
                     nodata: Int, bilinear: Boolean): Int = {
    var i = 0
    while (i < srcs.length) {
      val s = srcs(i)
      val fc = (x - s.x0) / s.resX - 0.5
      val fr = (s.y0 - y) / s.resY - 0.5
      if (fc > -0.5 && fr > -0.5 && fc < s.width - 0.5 && fr < s.height - 0.5) {
        if (!bilinear) {
          val c = math.round(fc).toInt.max(0).min(s.width - 1)
          val r = math.round(fr).toInt.max(0).min(s.height - 1)
          val v = s.pixels(r * s.width + c)
          if (v != nodata) return v
        } else {
          val c0 = math.floor(fc).toInt.max(0).min(s.width - 1)
          val r0 = math.floor(fr).toInt.max(0).min(s.height - 1)
          val c1 = (c0 + 1).min(s.width - 1)
          val r1 = (r0 + 1).min(s.height - 1)
          val wc = (fc - c0).max(0).min(1)
          val wr = (fr - r0).max(0).min(1)
          val p00 = s.pixels(r0 * s.width + c0)
          val p01 = s.pixels(r0 * s.width + c1)
          val p10 = s.pixels(r1 * s.width + c0)
          val p11 = s.pixels(r1 * s.width + c1)
          if (p00 != nodata && p01 != nodata && p10 != nodata && p11 != nodata) {
            val v = p00 * (1 - wr) * (1 - wc) + p01 * (1 - wr) * wc +
              p10 * wr * (1 - wc) + p11 * wr * wc
            return math.round(v).toInt
          } else if (p00 != nodata) {
            return p00 // degrade to nearest at nodata edges
          }
        }
      }
      i += 1
    }
    nodata
  }

  final case class WarpKey(cube: String, tileId: String, date: java.sql.Date,
                           band: String, blockY: Int, blockX: Int,
                           height: Int, width: Int,
                           x0: Double, y0: Double, resX: Double, resY: Double)
}
