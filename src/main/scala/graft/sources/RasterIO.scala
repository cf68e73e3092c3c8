package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster source/sink integration with Spark (SURVEY §2.1).
  *
  *  - S2 local directory scan: `binaryFile` listing + regex band/date
  *    extraction from paths (reference `local_accessor.py:120-190`);
  *  - S3 block reads: GeoTIFF payloads decode to chunked-raster rows
  *    inside `mapPartitions` — one task per file partition, no driver
  *    involvement;
  *  - S9 sink: composite blocks re-encode as tiled GeoTIFFs, one file per
  *    (tile, period, band), written from executors via `foreachPartition`.
  *
  * Scale: listing and regex metadata extraction never read pixel bytes
  * (binaryFile supports `pathGlobFilter`; with
  * `spark.sql.files.maxPartitionBytes` sizing the scan). A 100 TB ingest
  * is file-parallel: decode cost is per-file and embarrassingly parallel.
  */
object RasterIO {

  /** S2 — discover scene files: extract (sceneId, band, date) from file
    * names like `S2A_..._20200105_B04.tif` via configurable regexes.
    * Metadata-only: reads paths, not contents.
    */
  def scanDirectory(spark: SparkSession, dir: String,
                    bandPattern: String = "_(B[0-9A-Z]+|QA|SCL)\\.tiff?$",
                    datePattern: String = "(20[0-9]{6})",
                    glob: String = "*.tif*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      // extract from the file NAME only — directories may contain digits
      .withColumn("fname", element_at(split($"path", "/"), -1))
      .select($"path", $"length", $"content",
        regexp_extract($"fname", bandPattern, 1).as("band"),
        try_to_date(regexp_extract($"fname", datePattern, 1), "yyyyMMdd")
          .as("date"))
      .filter($"band" =!= "" && $"date".isNotNull)
  }

  /** S3 — decode discovered GeoTIFF files into chunked-raster block rows.
    * Input must carry `path`, `content`, `band`, `date` (from
    * [[scanDirectory]] without dropping content).
    */
  def decodeBlocks(files: DataFrame, cube: String, tileId: String,
                   blockSize: Int = 512): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select($"path", $"content", $"band", $"date")
      .as[(String, Array[Byte], String, java.sql.Date)]
      .flatMap { case (path, content, band, date) =>
        val info = GeoTiff.readInfo(content)
        val nodata = if (info.nodata.isNaN) -9999 else info.nodata.toInt
        for {
          by <- 0 until (info.height + blockSize - 1) / blockSize
          bx <- 0 until (info.width + blockSize - 1) / blockSize
        } yield {
          val h = math.min(blockSize, info.height - by * blockSize)
          val w = math.min(blockSize, info.width - bx * blockSize)
          val px = GeoTiff.readWindow(content, info,
            by * blockSize, bx * blockSize, h, w)
          graft.raster.Raster.Block(cube, tileId, date, band, by, bx, h, w,
            info.originX + bx * blockSize * info.scaleX,
            info.originY - by * blockSize * info.scaleY,
            info.scaleX, info.scaleY, nodata, px)
        }
      }.toDF()
  }

  /** S9 — write one GeoTIFF per (cube, tileId, date|period, band) from
    * block rows, executor-side. Blocks of one output raster are collected
    * within their group (bounded: one tile's blocks), assembled and
    * encoded with the block grid as the TIFF tile grid.
    */
  def writeGeoTiffs(blocks: DataFrame, outDir: String,
                    periodCols: Seq[String] = Seq("date")): Unit = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val keyCols = Seq("cube", "tileId", "band") ++ periodCols
    val grouped = blocks
      .withColumn("k", concat_ws("_", keyCols.map(c => col(c).cast("string")): _*))
      .groupBy($"k")
      .agg(
        collect_list(struct($"blockY", $"blockX", $"height", $"width",
          $"x0", $"y0", $"resX", $"resY", $"nodata", $"pixels")).as("bs"))
    grouped.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      rows.foreach { row =>
        val key = row.getString(0)
        val bs = row.getSeq[org.apache.spark.sql.Row](1)
        val maxY = bs.map(b => b.getInt(0)).max
        val maxX = bs.map(b => b.getInt(1)).max
        val bh = bs.head.getInt(2); val bw = bs.head.getInt(3)
        // full raster dims from the block grid (last block may be partial)
        val lastRow = bs.filter(_.getInt(0) == maxY).head
        val lastCol = bs.filter(_.getInt(1) == maxX).head
        val height = maxY * bh + lastRow.getInt(2)
        val width = maxX * bw + lastCol.getInt(3)
        val nodata = bs.head.getInt(8)
        val full = Array.fill(height * width)(nodata)
        bs.foreach { b =>
          val by = b.getInt(0); val bx = b.getInt(1)
          val h = b.getInt(2); val w = b.getInt(3)
          val px = b.getSeq[Int](9)
          var r = 0
          while (r < h) {
            var c = 0
            while (c < w) {
              full((by * bh + r) * width + bx * bw + c) = px(r * w + c)
              c += 1
            }
            r += 1
          }
        }
        val origin = bs.minBy(b => (b.getInt(0), b.getInt(1)))
        val bytes = GeoTiff.write(full, width, height,
          tileSize = 256, bitsPerSample = 16, sampleFormat = 2,
          originX = origin.getDouble(4), originY = origin.getDouble(5),
          scaleX = origin.getDouble(6), scaleY = origin.getDouble(7),
          nodata = nodata.toDouble)
        val out = java.nio.file.Paths.get(outDir, s"$key.tif")
        java.nio.file.Files.createDirectories(out.getParent)
        java.nio.file.Files.write(out, bytes)
      }
    }
  }
}
