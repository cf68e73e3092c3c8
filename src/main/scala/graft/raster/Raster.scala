package graft.raster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chunked-raster data model (SURVEY §1.1, §7.1).
  *
  * Pixel data is represented as one row per (cube, tile, date, band, block):
  * a dense `Array[Int]` of `width*height` samples in row-major order plus a
  * block geotransform. This is the Spark-native analog of the reference's
  * 512×512 rasterio windows (`cube_builder/utils/processing.py:764-766`,
  * block size default `forms.py:239`).
  *
  * Values are `Int` regardless of the band's declared dtype (int16/uint8/
  * uint16 all fit); Parquet bit-packs them back down on disk, and dtype
  * clamping happens at the operator level via [[graft.model.Band.dtypeRange]].
  *
  * Scale design: partition layout is `(tile_id, block_y, block_x)` so that
  * the temporal-composite group-by `(tile, band, block)` over dates never
  * shuffles pixel payloads across tiles — co-partitioning replaces the
  * reference's per-(tile, period, band) Celery task routing.
  */
object Raster {

  val DefaultBlockSize = 512

  /** One block of one band of one scene-date. */
  final case class Block(
      cube: String,
      tileId: String,
      date: java.sql.Date,
      band: String,
      blockY: Int,
      blockX: Int,
      height: Int,
      width: Int,
      /** upper-left projected coordinate of this block */
      x0: Double,
      y0: Double,
      /** pixel size (resX positive, resY positive; y decreases downward) */
      resX: Double,
      resY: Double,
      nodata: Int,
      pixels: Array[Int])

  val blockSchema: StructType = StructType(Seq(
    StructField("cube", StringType, nullable = false),
    StructField("tileId", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("blockY", IntegerType, nullable = false),
    StructField("blockX", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("x0", DoubleType, nullable = false),
    StructField("y0", DoubleType, nullable = false),
    StructField("resX", DoubleType, nullable = false),
    StructField("resY", DoubleType, nullable = false),
    StructField("nodata", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** Block grid covering a `tilePx`-pixel tile: (blockY, blockX, h, w). */
  def blockWindows(tileWidthPx: Int, tileHeightPx: Int,
                   blockSize: Int = DefaultBlockSize): Seq[(Int, Int, Int, Int)] =
    for {
      by <- 0 until (tileHeightPx + blockSize - 1) / blockSize
      bx <- 0 until (tileWidthPx + blockSize - 1) / blockSize
    } yield (by, bx,
      math.min(blockSize, tileHeightPx - by * blockSize),
      math.min(blockSize, tileWidthPx - bx * blockSize))

  /** S10 empty-raster generator (reference `utils/image.py:147-192`): an
    * all-nodata band for timeline steps with no scenes, produced
    * distributively (one task per block, no driver-side array).
    */
  def emptyRaster(spark: SparkSession, cube: String, tileId: String,
                  date: java.sql.Date, band: String,
                  tileWidthPx: Int, tileHeightPx: Int,
                  xmin: Double, ymax: Double, res: Double, nodata: Int,
                  blockSize: Int = DefaultBlockSize): DataFrame = {
    import spark.implicits._
    val windows = blockWindows(tileWidthPx, tileHeightPx, blockSize)
    windows.toDF("blockY", "blockX", "height", "width")
      .select(
        lit(cube).as("cube"), lit(tileId).as("tileId"),
        lit(date).as("date"), lit(band).as("band"),
        $"blockY", $"blockX", $"height", $"width",
        (lit(xmin) + $"blockX" * blockSize * res).as("x0"),
        (lit(ymax) - $"blockY" * blockSize * res).as("y0"),
        lit(res).as("resX"), lit(res).as("resY"),
        lit(nodata).as("nodata"),
        array_repeat(lit(nodata), $"height" * $"width").as("pixels"))
  }

  /** S10 over a PERIODS DataFrame: one all-nodata band per input date,
    * generated as a broadcast cross-join against the (tiny) block grid —
    * the production M6 route. No driver-side collect: at scale the empty
    * periods are themselves a DataFrame (anti-join output) and stay one.
    */
  def emptyRasters(periods: DataFrame, dateCol: String,
                   cube: String, tileId: String, band: String,
                   tileWidthPx: Int, tileHeightPx: Int,
                   xmin: Double, ymax: Double, res: Double, nodata: Int,
                   blockSize: Int = DefaultBlockSize): DataFrame = {
    val spark = periods.sparkSession
    import spark.implicits._
    val windows = blockWindows(tileWidthPx, tileHeightPx, blockSize)
      .toDF("blockY", "blockX", "height", "width")
    periods.select(col(dateCol).cast("date").as("date"))
      .crossJoin(broadcast(windows))
      .select(
        lit(cube).as("cube"), lit(tileId).as("tileId"), $"date",
        lit(band).as("band"),
        $"blockY", $"blockX", $"height", $"width",
        (lit(xmin) + $"blockX" * blockSize * res).as("x0"),
        (lit(ymax) - $"blockY" * blockSize * res).as("y0"),
        lit(res).as("resX"), lit(res).as("resY"),
        lit(nodata).as("nodata"),
        array_repeat(lit(nodata), $"height" * $"width").as("pixels"))
  }

  /** Build an in-memory block DataFrame from dense test arrays
    * (row-major, one entry per (date, band)). Test/fixture helper.
    */
  def fromArrays(spark: SparkSession, cube: String, tileId: String,
                 width: Int, height: Int, nodata: Int,
                 scenes: Seq[(String, String, Array[Int])]): DataFrame = {
    import spark.implicits._
    scenes.map { case (date, band, px) =>
      Block(cube, tileId, java.sql.Date.valueOf(date), band, 0, 0,
        height, width, 0d, 0d, 1d, 1d, nodata, px)
    }.toDF()
  }
}
