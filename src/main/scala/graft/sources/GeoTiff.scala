package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal single-band GeoTIFF codec (SURVEY §2.1 S3/S9), implemented from
  * the public TIFF 6.0 and GeoTIFF specs — no external libraries.
  *
  * Supported layout (what the engine itself writes): little-endian,
  * single-band, uncompressed, tiled (or single-strip) int16/uint8/int32,
  * with ModelPixelScale + ModelTiepoint GeoTIFF tags and a nodata ASCII
  * tag (GDAL tag 42113). This is intentionally the COG-shaped subset: a
  * block-aligned tile grid maps 1:1 onto the chunked-raster DataFrame.
  *
  * Reference behavior mirrored: windowed band reads
  * (`drivers/datasets/base.py:30-135`), COG write with tiling
  * (`utils/image.py:309-378`).
  */
object GeoTiff {

  final case class TiffInfo(
      width: Int, height: Int, bitsPerSample: Int, sampleFormat: Int,
      tileWidth: Int, tileHeight: Int,
      tileOffsets: Array[Long], tileByteCounts: Array[Long],
      /** origin (upper-left) and pixel scale from GeoTIFF tags */
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      nodata: Double,
      /** 1 = none, 8 = deflate */
      compression: Int = 1,
      /** TIFF NewSubfileType: 0 full, 1 reduced-res, 4 mask, 5 both */
      subfileType: Int = 0,
      /** TIFF PhotometricInterpretation: 1 min-is-black, 4 transparency mask */
      photometric: Int = 1)

  // TIFF tag ids
  private val TNewSubfileType = 254
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TSampleFormat = 339
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGdalNodata = 42113

  /** Byte-order-stamped view of a TIFF: every read-side entry point takes
    * a ByteBuffer so the SAME codec serves an in-memory array (archive
    * members, tests) and a memory-mapped file (the scan path — windowed
    * IO through the page cache, zero heap for untouched tiles). All codec
    * reads are ABSOLUTE (no position mutation), so one buffer serves a
    * whole task's block iterator.
    */
  def ordered(bb: ByteBuffer): ByteBuffer =
    bb.order(if (bb.get(0) == 'I') ByteOrder.LITTLE_ENDIAN
             else ByteOrder.BIG_ENDIAN)

  /** Absolute bulk copy (order-independent). */
  private def copyBytes(bb: ByteBuffer, off: Int, len: Int): Array[Byte] = {
    val a = new Array[Byte](len)
    val d = bb.duplicate()
    d.position(off)
    d.get(a)
    a
  }

  /** Parse the header + first IFD of a TIFF byte array. */
  def readInfo(bytes: Array[Byte]): TiffInfo = readInfos(bytes).head

  /** [[readInfo]] over a (typically memory-mapped) buffer. */
  def readInfo(bb: ByteBuffer): TiffInfo = readInfos(bb).head

  /** Parse every IFD in the chain: the full-resolution image first, then
    * one entry per reduced-resolution overview (COG layout).
    */
  def readInfos(bytes: Array[Byte]): Seq[TiffInfo] =
    readInfos(ByteBuffer.wrap(bytes))

  def readInfos(bb0: ByteBuffer): Seq[TiffInfo] = {
    val bb = ordered(bb0.duplicate())
    require(bb.getShort(2) == 42, "not a TIFF")
    val out = scala.collection.mutable.ArrayBuffer.empty[TiffInfo]
    var off = bb.getInt(4)
    while (off != 0) {
      val (info, next) = parseIfd(bb, off)
      out += info
      off = next
    }
    out.toSeq
  }

  /** Parse one IFD at `ifdOff`; returns its info + the next-IFD offset. */
  private def parseIfd(bb: ByteBuffer, ifdOff: Int): (TiffInfo, Int) = {
    var width = 0; var height = 0; var bps = 16; var fmt = 2
    var tw = 0; var th = 0; var rowsPerStrip = 0
    var tileOffsets = Array.empty[Long]; var tileCounts = Array.empty[Long]
    var stripOffsets = Array.empty[Long]; var stripCounts = Array.empty[Long]
    var sx = 1.0; var sy = 1.0; var ox = 0.0; var oy = 0.0
    var nodata = Double.NaN
    var compression = 1
    var subfileType = 0
    var photometric = 1

    val n = bb.getShort(ifdOff) & 0xffff
    for (i <- 0 until n) {
      val e = ifdOff + 2 + i * 12
      val tag = bb.getShort(e) & 0xffff
      val typ = bb.getShort(e + 2) & 0xffff
      val count = bb.getInt(e + 4)
      def typeSize = typ match {
        case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 9 | 11 => 4
        case 5 | 10 | 12 => 8; case _ => 1
      }
      val valOff = if (count.toLong * typeSize <= 4) e + 8 else bb.getInt(e + 8)
      def readValue(idx: Int): Long = typ match {
        case 3 => (bb.getShort(valOff + idx * 2) & 0xffff).toLong
        case 4 => bb.getInt(valOff + idx * 4).toLong & 0xffffffffL
        case _ => bb.getInt(valOff + idx * 4).toLong
      }
      def readDouble(idx: Int): Double = bb.getDouble(valOff + idx * 8)
      def readLongs: Array[Long] = Array.tabulate(count)(readValue)
      tag match {
        case TNewSubfileType => subfileType = readValue(0).toInt
        case TPhotometric => photometric = readValue(0).toInt
        case TImageWidth => width = readValue(0).toInt
        case TImageLength => height = readValue(0).toInt
        case TBitsPerSample => bps = readValue(0).toInt
        case TSampleFormat => fmt = readValue(0).toInt
        case TTileWidth => tw = readValue(0).toInt
        case TTileLength => th = readValue(0).toInt
        case TTileOffsets => tileOffsets = readLongs
        case TTileByteCounts => tileCounts = readLongs
        case TStripOffsets => stripOffsets = readLongs
        case TStripByteCounts => stripCounts = readLongs
        case TRowsPerStrip => rowsPerStrip = readValue(0).toInt
        case TModelPixelScale => sx = readDouble(0); sy = readDouble(1)
        case TModelTiepoint => ox = readDouble(3); oy = readDouble(4)
        case TGdalNodata =>
          val s = new String(copyBytes(bb, valOff, count), "ASCII")
            .trim.stripSuffix("\u0000").trim
          nodata = try s.toDouble catch { case _: Throwable => Double.NaN }
        case TCompression =>
          val c = readValue(0)
          require(c == 1 || c == 8, s"unsupported TIFF compression: $c")
          compression = c.toInt
        case _ => ()
      }
    }
    if (tileOffsets.isEmpty) {
      // striped layout → treat as full-width tiles
      tw = width
      th = if (rowsPerStrip > 0) rowsPerStrip else height
      tileOffsets = stripOffsets
      tileCounts = stripCounts
    }
    (TiffInfo(width, height, bps, fmt, tw, th, tileOffsets, tileCounts,
      ox, oy, sx, sy, nodata, compression, subfileType, photometric),
      bb.getInt(ifdOff + 2 + n * 12))
  }

  /** Read one tile (tileY, tileX) as an Int array (row-major, padded to
    * tileWidth×tileHeight like TIFF requires). Deflate (COG-style)
    * compression inflates the tile payload first.
    */
  def readTile(bytes: Array[Byte], info: TiffInfo, tileY: Int,
               tileX: Int): Array[Int] =
    readTile(ordered(ByteBuffer.wrap(bytes)), info, tileY, tileX)

  /** [[readTile]] over an order-stamped buffer (see [[ordered]]) — the
    * memory-mapped scan path: only this tile's payload bytes are touched,
    * so the page cache faults in ~one tile, never the file.
    */
  def readTile(bb: ByteBuffer, info: TiffInfo, tileY: Int,
               tileX: Int): Array[Int] = {
    val tilesAcross = (info.width + info.tileWidth - 1) / info.tileWidth
    val idx = tileY * tilesAcross + tileX
    val off = info.tileOffsets(idx).toInt
    val len = info.tileByteCounts(idx).toInt
    val count = info.tileWidth * info.tileHeight
    if (len == 0 || off == 0) // sparse tile (GDAL convention): all nodata
      return Array.fill(count)(if (info.nodata.isNaN) 0 else info.nodata.toInt)
    val bytesPerSample = info.bitsPerSample / 8
    val tileBytes: Array[Byte] =
      if (info.compression == 8) {
        val inf = new java.util.zip.Inflater()
        inf.setInput(copyBytes(bb, off, len))
        val out = new Array[Byte](count * bytesPerSample)
        // end() in finally: corrupt payloads throw out of the loop (the
        // quarantine path SURVIVES that and keeps decoding other files),
        // so a leak here compounds across every bad file in a long run
        try {
          var written = 0
          while (written < out.length && !inf.finished()) {
            val n = inf.inflate(out, written, out.length - written)
            // corrupt/truncated payloads can stall at 0 bytes without
            // throwing — fail loudly instead of spinning
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              throw new java.util.zip.ZipException(
                s"tile payload at $off truncated or corrupt " +
                  s"($written of ${out.length} bytes inflated)")
            written += n
          }
        } finally inf.end()
        out
      } else copyBytes(bb, off, len)
    val tb = ByteBuffer.wrap(tileBytes).order(bb.order())
    val out = new Array[Int](count)
    var i = 0
    info.bitsPerSample match {
      case 8 =>
        while (i < count) { out(i) = tileBytes(i) & 0xff; i += 1 }
      case 16 =>
        while (i < count) {
          val v = tb.getShort(i * 2)
          out(i) = if (info.sampleFormat == 2) v.toInt else v & 0xffff
          i += 1
        }
      case 32 =>
        while (i < count) { out(i) = tb.getInt(i * 4); i += 1 }
      case b => throw new IllegalArgumentException(s"unsupported bits/sample: $b")
    }
    out
  }

  /** Read a window (row0, col0, h, w) across tiles. */
  def readWindow(bytes: Array[Byte], info: TiffInfo,
                 row0: Int, col0: Int, h: Int, w: Int): Array[Int] =
    readWindow(ordered(ByteBuffer.wrap(bytes)), info, row0, col0, h, w)

  /** [[readWindow]] over an order-stamped buffer (see [[ordered]]). */
  def readWindow(bb: ByteBuffer, info: TiffInfo,
                 row0: Int, col0: Int, h: Int, w: Int): Array[Int] = {
    val out = new Array[Int](h * w)
    val ty0 = row0 / info.tileHeight
    val ty1 = (row0 + h - 1) / info.tileHeight
    val tx0 = col0 / info.tileWidth
    val tx1 = (col0 + w - 1) / info.tileWidth
    for (ty <- ty0 to ty1; tx <- tx0 to tx1) {
      val tile = readTile(bb, info, ty, tx)
      val tileRow0 = ty * info.tileHeight
      val tileCol0 = tx * info.tileWidth
      val r0 = math.max(row0, tileRow0)
      val r1 = math.min(row0 + h, tileRow0 + info.tileHeight)
      val c0 = math.max(col0, tileCol0)
      val c1 = math.min(col0 + w, tileCol0 + info.tileWidth)
      var r = r0
      while (r < r1) {
        var c = c0
        while (c < c1) {
          out((r - row0) * w + (c - col0)) =
            tile((r - tileRow0) * info.tileWidth + (c - tileCol0))
          c += 1
        }
        r += 1
      }
    }
    out
  }

  /** Encode a single-band tiled GeoTIFF (little-endian; optional deflate
    * compression, COG-style).
    *
    * @param pixels row-major samples, width*height
    * @param bitsPerSample 8, 16 or 32 (signed for 16/32 unless fmt=1)
    */
  def write(pixels: Array[Int], width: Int, height: Int,
            tileSize: Int = 256, bitsPerSample: Int = 16,
            sampleFormat: Int = 2,
            originX: Double = 0, originY: Double = 0,
            scaleX: Double = 1, scaleY: Double = 1,
            nodata: Double = Double.NaN,
            deflate: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height)
    val tilesAcross = (width + tileSize - 1) / tileSize
    val tilesDown = (height + tileSize - 1) / tileSize
    val numTiles = tilesAcross * tilesDown

    // encode each tile (padded to tileSize^2), optionally deflated
    val tileData: Array[Array[Byte]] =
      (for (ty <- 0 until tilesDown; tx <- 0 until tilesAcross) yield {
        val raw = ByteBuffer.allocate(tileSize * tileSize * (bitsPerSample / 8))
          .order(ByteOrder.LITTLE_ENDIAN)
        var r = 0
        while (r < tileSize) {
          var c = 0
          while (c < tileSize) {
            val row = ty * tileSize + r
            val col = tx * tileSize + c
            val v = if (row < height && col < width) pixels(row * width + col) else 0
            bitsPerSample match {
              case 8  => raw.put(v.toByte)
              case 16 => raw.putShort(v.toShort)
              case 32 => raw.putInt(v)
            }
            c += 1
          }
          r += 1
        }
        if (deflate) {
          // deflate never expands beyond a small constant over the input
          val d = new java.util.zip.Deflater()
          d.setInput(raw.array()); d.finish()
          val buf = new Array[Byte](raw.array().length + 128)
          val n = d.deflate(buf)
          require(d.finished(), "deflate output larger than bound")
          d.end()
          java.util.Arrays.copyOf(buf, n)
        } else raw.array()
      }).toArray

    val nodataAscii =
      if (nodata.isNaN) Array.empty[Byte]
      else (formatNodata(nodata) + "").getBytes("ASCII")

    // layout: header(8) | tiles | doubles(pixelScale 3 + tiepoint 6) |
    //         offsets/counts arrays | nodata ascii | IFD
    val tilesStart = 8L
    val tileOffsets = tileData.scanLeft(tilesStart)(_ + _.length).init
    val doublesStart = tilesStart + tileData.map(_.length.toLong).sum
    val offsetsStart = doublesStart + (3 + 6) * 8
    val countsStart = offsetsStart + numTiles * 4L
    val nodataStart = countsStart + numTiles * 4L
    val ifdStart = nodataStart + nodataAscii.length

    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    entries += ((TImageWidth, 3, 1, width.toLong))
    entries += ((TImageLength, 3, 1, height.toLong))
    entries += ((TBitsPerSample, 3, 1, bitsPerSample.toLong))
    entries += ((TCompression, 3, 1, if (deflate) 8L else 1L))
    entries += ((TPhotometric, 3, 1, 1L))
    entries += ((TSamplesPerPixel, 3, 1, 1L))
    entries += ((TSampleFormat, 3, 1, sampleFormat.toLong))
    entries += ((TTileWidth, 3, 1, tileSize.toLong))
    entries += ((TTileLength, 3, 1, tileSize.toLong))
    // TIFF stores values ≤4 bytes inline in the entry: a single-tile
    // offset/count array must be the value itself, not a pointer
    entries += ((TTileOffsets, 4, numTiles,
      if (numTiles == 1) tileOffsets(0) else offsetsStart))
    entries += ((TTileByteCounts, 4, numTiles,
      if (numTiles == 1) tileData(0).length.toLong else countsStart))
    entries += ((TModelPixelScale, 12, 3, doublesStart))
    entries += ((TModelTiepoint, 12, 6, doublesStart + 24))
    if (nodataAscii.nonEmpty)
      entries += ((TGdalNodata, 2, nodataAscii.length, nodataStart))
    val sorted = entries.sortBy(_._1)

    val totalLen = ifdStart + 2 + sorted.length * 12 + 4
    val out = ByteBuffer.allocate(totalLen.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdStart.toInt)
    tileData.foreach(t => out.put(t))
    // geo doubles
    out.putDouble(scaleX).putDouble(scaleY).putDouble(0)
    out.putDouble(0).putDouble(0).putDouble(0)
    out.putDouble(originX).putDouble(originY).putDouble(0)
    // tile offsets / counts
    tileOffsets.foreach(o => out.putInt(o.toInt))
    tileData.foreach(t => out.putInt(t.length))
    out.put(nodataAscii)
    // IFD
    out.putShort(sorted.length.toShort)
    for ((tag, typ, count, value) <- sorted) {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) out.putShort(value.toShort).putShort(0)
      else out.putInt(value.toInt)
    }
    out.putInt(0) // next IFD
    out.array()
  }

  private def formatNodata(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite) v.toLong.toString else v.toString
}
