package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Archive-wrapped scene access (SURVEY §2.1 S4/S5/S7/S13).
  *
  *  - S4: zip archives (Sentinel-2 SAFE): band → member routing by name
  *    pattern (reference `drivers/datasets/compressed.py:24-38`,
  *    `sentinel/sentinel2.py:44-111`);
  *  - S5: tar archives (Landsat C2): header sniff + `SCENE_BAND.TIF`
  *    member (reference `drivers/datasets/__init__.py:72-101`);
  *  - S7: URI/payload dispatch by magic bytes and extension
  *    (reference `dataset_from_uri`, `drivers/datasets/__init__.py:34-58`);
  *  - S13: integrity check = full decode attempt
  *    (reference `utils/image.py:293-306`).
  *
  * All functions operate on in-memory payloads (`binaryFile` content) so
  * they run inside executors — the 100 TB path is one task per archive.
  */
object Archives {

  sealed trait Format
  case object TiffFormat extends Format
  case object ZipFormat extends Format
  case object TarFormat extends Format
  case object UnknownFormat extends Format

  /** S7 — sniff the payload format from magic bytes. */
  def detect(payload: Array[Byte]): Format = {
    if (payload.length >= 4 &&
        ((payload(0) == 'I' && payload(1) == 'I' && payload(2) == 42) ||
         (payload(0) == 'M' && payload(1) == 'M' && payload(3) == 42))) TiffFormat
    else if (payload.length >= 4 && payload(0) == 'P' && payload(1) == 'K' &&
             payload(2) == 3 && payload(3) == 4) ZipFormat
    else if (payload.length >= 263 &&
             new String(payload, 257, 5, "ASCII").startsWith("ustar")) TarFormat
    else UnknownFormat
  }

  /** S4 — list zip member names. */
  def zipMembers(payload: Array[Byte]): Seq[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(payload))
    val names = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null).map(_.getName).toList
    zin.close()
    names
  }

  /** S4 — extract one zip member by predicate (e.g. band routing). */
  def zipMember(payload: Array[Byte], select: String => Boolean): Option[Array[Byte]] =
    zipMemberWithName(payload, select).map(_._2)

  /** S4 — like [[zipMember]] but keeps the member name (for typed errors). */
  def zipMemberWithName(payload: Array[Byte],
                        select: String => Boolean): Option[(String, Array[Byte])] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(payload))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .collectFirst { case e if select(e.getName) => (e.getName, zin.readAllBytes()) }
    } finally zin.close()
  }

  /** S5 — tar members: (name, offset, size) from 512-byte headers. */
  def tarMembers(payload: Array[Byte]): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    var off = 0
    var done = false
    while (!done && off + 512 <= payload.length) {
      val name = new String(payload, off, 100, "ASCII").takeWhile(_ != 0)
      if (name.isEmpty) done = true
      else {
        val sizeStr = new String(payload, off + 124, 12, "ASCII")
          .takeWhile(c => c != 0 && c != ' ')
        val size = if (sizeStr.isEmpty) 0 else Integer.parseInt(sizeStr, 8)
        out += ((name, off + 512, size))
        off += 512 + ((size + 511) / 512) * 512
      }
    }
    out.toList
  }

  def tarMember(payload: Array[Byte], select: String => Boolean): Option[Array[Byte]] =
    tarMembers(payload).collectFirst {
      case (name, off, size) if select(name) =>
        java.util.Arrays.copyOfRange(payload, off, off + size)
    }

  /** Sentinel-2 SAFE band routing: member whose name ends `_B04.jp2`-style. */
  def safeBandSelector(band: String): String => Boolean =
    name => name.matches(s".*_$band\\.(jp2|tif|tiff)$$")

  /** Landsat C2 band routing: member `<SCENE>_<band>.TIF`. */
  def landsatBandSelector(band: String): String => Boolean =
    name => name.matches(s".*_$band\\.(TIF|tif)$$")

  /** Thrown when band routing lands on a JPEG-2000 member: this engine
    * ships no JP2 codec (the reference decodes JP2 through rasterio/GDAL,
    * `drivers/sentinel/sentinel2.py:44-111`). Typed and loud — never
    * silent nodata, never an untyped "not a TIFF" downstream.
    */
  final case class Jp2UnsupportedException(member: String)
      extends UnsupportedOperationException(
        s"JPEG-2000 member '$member' has no decoder in this engine; " +
        "re-package the scene as GeoTIFF/COG (the reference reads JP2 via GDAL)")

  /** JP2 sniff: JP2 signature box or a raw JPEG-2000 codestream. */
  def isJp2(payload: Array[Byte]): Boolean =
    (payload.length >= 8 && payload(0) == 0 && payload(1) == 0 &&
      payload(2) == 0 && (payload(3) & 0xff) == 0x0c &&
      payload(4) == 'j' && payload(5) == 'P') ||
    (payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0x4f && (payload(2) & 0xff) == 0xff &&
      (payload(3) & 0xff) == 0x51)

  /** S3/S4/S5 unified open: route by format, extract the band payload.
    * @throws Jp2UnsupportedException when the routed member is JPEG-2000
    */
  def openBand(payload: Array[Byte], band: String): Option[Array[Byte]] =
    detect(payload) match {
      case TiffFormat => Some(payload)
      case ZipFormat =>
        zipMemberWithName(payload, safeBandSelector(band)).map {
          case (name, bytes) =>
            if (isJp2(bytes)) throw Jp2UnsupportedException(name)
            bytes
        }
      case TarFormat  => tarMember(payload, landsatBandSelector(band))
      case UnknownFormat => None
    }

  /** S13 — integrity check: the payload fully decodes as a GeoTIFF. */
  def checkIntegrity(payload: Array[Byte], fullRead: Boolean = true): Boolean =
    try {
      val info = GeoTiff.readInfo(payload)
      if (fullRead) {
        GeoTiff.readWindow(payload, info, 0, 0, info.height, info.width)
        true
      } else info.width > 0 && info.height > 0
    } catch { case _: Throwable => false }
}
