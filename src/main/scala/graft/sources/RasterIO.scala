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
  /** Default filename conventions, shared with [[graft.cube.CubeRun]] /
    * [[graft.cube.CubeStream]] so the horizon parse, the stream's file
    * filter and the run's scan can never disagree on what is a scene.
    */
  val DefaultBandPattern = "_(B[0-9A-Z]+|QA|SCL)\\.tiff?$"
  val DefaultDatePattern = "(20[0-9]{6})"
  val DefaultGlob = "*.tif*"

  def scanDirectory(spark: SparkSession, dir: String,
                    bandPattern: String = DefaultBandPattern,
                    datePattern: String = DefaultDatePattern,
                    glob: String = DefaultGlob): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      // extract from the file NAME only — directories may contain digits.
      // content is deliberately NOT selected: binaryFile prunes the unread
      // column, so the scan (and every join/filter planning happens on
      // downstream of it) moves path-sized rows, never file bytes — a
      // 10560² scene is ~220 MB, and carrying it as a row value put whole
      // rasters through Tungsten row buffers and shuffle writers. Decode
      // reads pixel windows straight from the file (decodeBlocksByTile).
      .withColumn("fname", element_at(split($"path", "/"), -1))
      .select($"path", $"length",
        regexp_extract($"fname", bandPattern, 1).as("band"),
        try_to_date(regexp_extract($"fname", datePattern, 1), "yyyyMMdd")
          .as("date"))
      .filter($"band" =!= "" && $"date".isNotNull)
  }

  /** binaryFile paths are URIs (`file:/...`); resolve one to a NIO path,
    * falling back to a raw-path parse for scheme-less or unescaped input.
    */
  private[graft] def scenePath(path: String): java.nio.file.Path =
    try {
      val uri = new java.net.URI(path)
      if (uri.getScheme == null) java.nio.file.Paths.get(path)
      else java.nio.file.Paths.get(uri)
    } catch { case _: Exception => java.nio.file.Paths.get(path) }

  /** Scenes at or below this size read straight into a heap array: a
    * many-small-file ingest then creates NO file mappings (Linux caps a
    * process at ~65k concurrent mappings) and needs no unmap
    * bookkeeping; only reference-class rasters pay the mmap machinery.
    */
  private val HeapReadSceneBytes = 8L * 1024 * 1024

  /** Open a scanned scene for windowed reads: heap array below
    * [[HeapReadSceneBytes]], memory-mapped above (address space, not
    * heap — only the pages a read touches fault in). Same POSIX
    * shared-filesystem contract as [[writeGeoTiffs]]: the path must be
    * openable on the executor. CONTRACT: scene files must be immutable
    * while a run decodes them (land with write-then-rename) — an
    * in-place rewrite mid-run is a data race under any IO scheme, and
    * truncating a MAPPED file turns it into a JVM-killing SIGBUS rather
    * than a catchable decode error.
    */
  private def mapScene(path: String): java.nio.ByteBuffer = {
    val ch = java.nio.channels.FileChannel.open(
      scenePath(path), java.nio.file.StandardOpenOption.READ)
    try {
      val size = ch.size()
      if (size <= HeapReadSceneBytes) {
        val buf = java.nio.ByteBuffer.allocate(size.toInt)
        while (buf.hasRemaining && ch.read(buf) >= 0) ()
        buf.flip()
        GeoTiff.ordered(buf)
      } else
        GeoTiff.ordered(ch.map(
          java.nio.channels.FileChannel.MapMode.READ_ONLY, 0, size))
    } finally ch.close()
  }

  /** Release a mapped scene eagerly (no-op for heap buffers). Unmapping
    * is otherwise GC-driven, and a partition of many large scenes can
    * pile up mappings between collections — `Unsafe.invokeCleaner` is
    * the supported JDK 9+ way to drop one deterministically. Failures
    * fall back to GC unmapping.
    */
  private def unmapScene(bb: java.nio.ByteBuffer): Unit =
    if (bb.isDirect)
      try RasterIO.unsafe.invokeCleaner(bb)
      catch { case scala.util.control.NonFatal(_) => () }

  private lazy val unsafe: sun.misc.Unsafe = {
    val f = classOf[sun.misc.Unsafe].getDeclaredField("theUnsafe")
    f.setAccessible(true)
    f.get(null).asInstanceOf[sun.misc.Unsafe]
  }

  /** Wrap a block iterator so the scene buffer releases when the stream
    * ends — exhaustion or a thrown decode error. (An iterator abandoned
    * mid-stream falls back to GC unmapping.)
    */
  private def releasing[T](bb: java.nio.ByteBuffer,
                           it: Iterator[T]): Iterator[T] =
    new Iterator[T] {
      private var released = false
      private def release(): Unit =
        if (!released) { released = true; unmapScene(bb) }
      def hasNext: Boolean = { val h = it.hasNext; if (!h) release(); h }
      def next(): T =
        try it.next()
        catch { case e: Throwable => release(); throw e }
    }

  /** Raster (width, height) of one scene from its TIFF header — a
    * driver-side metadata probe (mmap + IFD walk touches a few KB of a
    * multi-hundred-MB scene, then unmaps). None on any failure: callers
    * use this for advisories that must never fail a run.
    */
  def sceneDims(path: String): Option[(Int, Int)] =
    try {
      val bb = mapScene(path)
      try {
        val info = GeoTiff.readInfo(bb)
        Some((info.width, info.height))
      } finally unmapScene(bb)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** S3 — decode discovered GeoTIFF files into chunked-raster block rows.
    * Input must carry `path`, `band`, `date` (from [[scanDirectory]]).
    */
  def decodeBlocks(files: DataFrame, cube: String, tileId: String,
                   blockSize: Int = 512): DataFrame =
    decodeBlocksByTile(
      files.withColumn("tile", org.apache.spark.sql.functions.lit(tileId)),
      cube, blockSize)

  /** [[decodeBlocks]] with a PER-FILE tile id from a `tile` column —
    * the multi-tile scan path ([[graft.cube.CubeRun.runTiles]]): one
    * directory of many tiles' scenes decodes into one chunked-raster
    * frame keyed by each file's own tile.
    */
  def decodeBlocksByTile(files: DataFrame, cube: String,
                         blockSize: Int = 512): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select($"path", $"band", $"date", $"tile")
      .as[(String, String, java.sql.Date, String)]
      .flatMap { case (path, band, date, tileId) =>
        // windowed + LAZY: the mapped buffer faults in ~one TIFF tile per
        // emitted block and the iterator holds ONE block at a time — peak
        // task memory is block-sized regardless of scene size. (A strict
        // per-file Seq here held the whole decoded raster — ~450 MB at
        // the 10560² reference tile — and OOM'd 32-way.)
        val bb = mapScene(path)
        val info =
          try GeoTiff.readInfo(bb)
          catch { case e: Throwable => unmapScene(bb); throw e }
        val nodata = if (info.nodata.isNaN) -9999 else info.nodata.toInt
        val nby = (info.height + blockSize - 1) / blockSize
        val nbx = (info.width + blockSize - 1) / blockSize
        releasing(bb, Iterator.tabulate(nby * nbx) { k =>
          val by = k / nbx; val bx = k % nbx
          val h = math.min(blockSize, info.height - by * blockSize)
          val w = math.min(blockSize, info.width - bx * blockSize)
          val px = GeoTiff.readWindow(bb, info,
            by * blockSize, bx * blockSize, h, w)
          graft.raster.Raster.Block(cube, tileId, date, band, by, bx, h, w,
            info.originX + bx * blockSize * info.scaleX,
            info.originY - by * blockSize * info.scaleY,
            info.scaleX, info.scaleY, nodata, px)
        })
      }.toDF()
  }

  /** One output row of [[decodeBlocksQuarantining]]: a decoded block
    * (`error` null) or a quarantined file (`error` set, block fields
    * zeroed, `blockY = -1`). `path` rides along on every row so the
    * orchestrator can retire stale quarantine entries when a previously
    * corrupt file decodes cleanly.
    */
  final case class DecodedOrError(
      cube: String, tileId: String, date: java.sql.Date, band: String,
      blockY: Int, blockX: Int, height: Int, width: Int,
      x0: Double, y0: Double, resX: Double, resY: Double, nodata: Int,
      pixels: Array[Int], path: String, error: String)

  /** [[decodeBlocksByTile]] with per-file error capture — the reference
    * maestro's activity-error discipline (`tasks.py:126-182` marks the
    * unit ERROR and carries on) instead of Spark's default
    * fail-the-whole-job: a corrupt or truncated scene file yields an
    * error row (file path + decoder message) and every healthy file
    * still decodes. Header parse and tile-offset bounds validate UP
    * FRONT, so the common corruptions (garbage, truncation) quarantine
    * before any block emits; a failure later in the lazy window reads
    * (in-bounds bit rot) emits the quarantine row mid-stream and stops —
    * blocks already emitted for that file are rendered inert by the
    * orchestrator, which excludes the whole (tile, period) from
    * publication and ledgers it ERROR whenever any error row exists.
    */
  def decodeBlocksQuarantining(files: DataFrame, cube: String,
                               blockSize: Int = 512): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select($"path", $"band", $"date", $"tile")
      .as[(String, String, java.sql.Date, String)]
      .flatMap { case (path, band, date, tileId) =>
        def errRow(e: Throwable) =
          DecodedOrError(cube, tileId, date, band, -1, 0, 0, 0,
            0.0, 0.0, 0.0, 0.0, 0, Array.empty[Int], path,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        scala.util.Try(mapScene(path)) match {
          case scala.util.Failure(e) => Iterator.single(errRow(e))
          case scala.util.Success(bb) =>
            scala.util.Try {
              val info = GeoTiff.readInfo(bb)
              // bounds audit: every tile payload must lie inside the
              // file — catches truncation at open, before any block emits
              val end = bb.capacity().toLong
              var i = 0
              while (i < info.tileOffsets.length) {
                val off = info.tileOffsets(i)
                val len = info.tileByteCounts(i)
                require(off + len <= end,
                  s"tile $i payload [$off, ${off + len}) beyond file end $end")
                i += 1
              }
              info
            } match {
              case scala.util.Failure(e) =>
                unmapScene(bb)
                Iterator.single(errRow(e))
              case scala.util.Success(info) =>
                val nodata =
                  if (info.nodata.isNaN) -9999 else info.nodata.toInt
                val nby = (info.height + blockSize - 1) / blockSize
                val nbx = (info.width + blockSize - 1) / blockSize
                val blocks = releasing(bb, Iterator.tabulate(nby * nbx) { k =>
                  val by = k / nbx; val bx = k % nbx
                  val h = math.min(blockSize, info.height - by * blockSize)
                  val w = math.min(blockSize, info.width - bx * blockSize)
                  val px = GeoTiff.readWindow(bb, info,
                    by * blockSize, bx * blockSize, h, w)
                  DecodedOrError(cube, tileId, date, band, by, bx, h, w,
                    info.originX + bx * blockSize * info.scaleX,
                    info.originY - by * blockSize * info.scaleY,
                    info.scaleX, info.scaleY, nodata, px, path, null)
                })
                // guard the lazy reads: a mid-stream decode failure (the
                // releasing wrapper has already dropped the mapping)
                // becomes the file's quarantine row, not a job failure
                new Iterator[DecodedOrError] {
                  private var done = false
                  def hasNext: Boolean = !done && blocks.hasNext
                  def next(): DecodedOrError =
                    try blocks.next()
                    catch { case scala.util.control.NonFatal(e) =>
                      done = true; errRow(e)
                    }
                }
            }
        }
      }.toDF()
  }

  /** S9 — write one GeoTIFF per (cube, tileId, date|period, band) from
    * block rows, executor-side and streaming: blocks repartition by output
    * file and sort within the partition, so each raster's blocks arrive in
    * row-major order at a [[GeoTiffStreamWriter]] that appends one TIFF
    * tile per block. Peak memory per task is one block (~1 MB), never a
    * full tile raster — a 10560² reference tile streams through unchanged.
    * The block grid IS the TIFF tile grid; overviews build at close.
    */
  def writeGeoTiffs(blocks: DataFrame, outDir: String,
                    periodCols: Seq[String] = Seq("date"),
                    deflate: Boolean = true,
                    overviews: Boolean = true,
                    /** nest files as `cube/tileId/period…/<flat-name>.tif`
                      * so each (cube, tile, period) item owns a directory —
                      * the unit `Publish.publishGeoTiffs` commits
                      * independently */
                    itemTree: Boolean = false): Unit = {
    val spark = blocks.sparkSession
    import spark.implicits._
    val keyCols = Seq("cube", "tileId", "band") ++ periodCols
    val dirCols = Seq("cube", "tileId") ++ periodCols
    blocks
      .withColumn("k", concat_ws("_", keyCols.map(c => col(c).cast("string")): _*))
      .withColumn("dirk",
        if (itemTree) concat_ws("/", dirCols.map(c => col(c).cast("string")): _*)
        else lit(""))
      .select($"k", $"blockY", $"blockX", $"height", $"width",
        $"x0", $"y0", $"resX", $"resY", $"nodata", $"pixels", $"dirk")
      .repartition($"k")
      .sortWithinPartitions($"k", $"blockY", $"blockX")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        var key: String = null
        var writer: GeoTiffStreamWriter = null
        var tmp: java.nio.file.Path = null
        var dest: java.nio.file.Path = null
        var ox, oy, sx, sy = 0.0
        // band files stream into a temp sibling and land under the final
        // name only via the atomic rename AFTER close() finished the IFD —
        // the same write-then-rename immutability contract mapScene
        // documents for scene files, and what keeps a duplicate attempt
        // (speculation, zombie retry) killed mid-stream from leaving a
        // torn .tif for Publish.commitItem to publish
        def finish(): Unit = if (writer != null) {
          writer.close(ox, oy, sx, sy)
          writer = null
          graft.core.Fs.commitStagedTemp(tmp, dest)
        }
        // a failed task must not hold the open writer's fd until GC —
        // release it and leave the never-renamed temp for the commit sweep
        def failing[T](body: => T): T =
          try body
          catch {
            case t: Throwable =>
              if (writer != null) { writer.dispose(); writer = null }
              throw t
          }
        failing {
        rows.foreach { row =>
          // columns: k, blockY, blockX, height, width, x0, y0, resX, resY,
          //          nodata, pixels, dirk
          val k = row.getString(0)
          val by = row.getInt(1); val bx = row.getInt(2)
          val h = row.getInt(3); val w = row.getInt(4)
          if (k != key) {
            finish()
            key = k
            dest = java.nio.file.Paths.get(outDir, row.getString(11), s"$k.tif")
            java.nio.file.Files.createDirectories(dest.getParent)
            tmp = graft.core.Fs.stagedTempFor(dest)
            // sorted order ⇒ the first block is (minY, minX): full-size
            // unless the raster itself is narrower than one block
            writer = new GeoTiffStreamWriter(tmp, tileWidth = w, tileHeight = h,
              bitsPerSample = 16, sampleFormat = 2,
              nodata = row.getInt(9).toDouble, deflate = deflate,
              overviews = overviews)
            sx = row.getDouble(7); sy = row.getDouble(8)
            // this block's corner back-projects to the raster origin
            ox = row.getDouble(5) - bx * w * sx
            oy = row.getDouble(6) + by * h * sy
          }
          val px = row.getSeq[Int](10)
          writer.writeBlock(by, bx, h, w, px.toArray)
        }
        finish()
        } // failing
      }
  }
}
