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
    * ships no JP2 entropy decoder (the reference decodes JP2 through
    * rasterio/GDAL, `drivers/sentinel/sentinel2.py:44-111`). Typed and
    * loud — never silent nodata, never an untyped "not a TIFF"
    * downstream — and as precise as the public container format allows:
    * the ISO 15444-1 ihdr/SIZ geometry (see [[jp2Meta]]) names the band
    * and raster dimensions in the message.
    */
  final case class Jp2UnsupportedException(member: String, band: String = "",
      geometry: Option[(Int, Int, Int)] = None)
      extends UnsupportedOperationException({
        val what = geometry match {
          case Some((w, h, nc)) => s"($w x $h px, $nc component(s))"
          case None => "(geometry unreadable)"
        }
        val forBand = if (band.isEmpty) "" else s" for band $band"
        s"JPEG-2000 member '$member' $what$forBand has no decoder in this " +
        "engine; add a GeoTIFF sidecar with the same basename (.tif) to " +
        "the archive, or re-package the scene as GeoTIFF/COG (the " +
        "reference reads JP2 via GDAL)"
      })

  /** JP2 sniff: JP2 signature box or a raw JPEG-2000 codestream. */
  def isJp2(payload: Array[Byte]): Boolean =
    (payload.length >= 8 && payload(0) == 0 && payload(1) == 0 &&
      payload(2) == 0 && (payload(3) & 0xff) == 0x0c &&
      payload(4) == 'j' && payload(5) == 'P') ||
    (payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0x4f && (payload(2) & 0xff) == 0xff &&
      (payload(3) & 0xff) == 0x51)

  /** JP2 metadata decode — (width, height, components) from the PUBLIC
    * container structures of ISO/IEC 15444-1, no entropy decoding:
    * either the `jp2h`/`ihdr` box of a JP2 file (Annex I: height, width
    * as big-endian u32, component count u16), or the SIZ marker segment
    * of a raw codestream (Annex A.5.1: width = Xsiz-XOsiz,
    * height = Ysiz-YOsiz, components = Csiz). Lets S4 report scene
    * geometry and fail precisely even though the payload stays undecoded.
    */
  def jp2Meta(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def be16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    def be32(o: Int): Int =
      ((p(o) & 0xff) << 24) | ((p(o + 1) & 0xff) << 16) |
        ((p(o + 2) & 0xff) << 8) | (p(o + 3) & 0xff)
    if (!isJp2(p)) None
    else if ((p(0) & 0xff) == 0xff) {
      // raw codestream: SOC(2) SIZ(2) Lsiz(2) Rsiz(2) Xsiz Ysiz XOsiz
      // YOsiz ... Csiz at offset 40
      if (p.length < 42) None
      else Some((be32(8) - be32(16), be32(12) - be32(20), be16(40)))
    } else {
      // box walk: find jp2h superbox, then its ihdr child
      def findBox(tpe: String, from: Int, until: Int): Option[(Int, Int)] = {
        var off = from
        while (off + 8 <= until) {
          val lbox = be32(off)
          val id = new String(p, off + 4, 4, "ISO-8859-1")
          // LBox 0 = "to end of file"; 1 = 64-bit XLBox (never needed for
          // the small header boxes this walks, but skip correctly)
          val (body, end) =
            if (lbox == 0) (off + 8, until)
            else if (lbox == 1) {
              if (off + 16 > until) return None
              val xl = be32(off + 12) // low 32 bits; headers are tiny
              (off + 16, off + xl)
            } else (off + 8, off + lbox)
          if (end > until || end <= off) return None
          if (id == tpe) return Some((body, end))
          off = end
        }
        None
      }
      findBox("jp2h", 0, p.length).flatMap { case (from, until) =>
        findBox("ihdr", from, until).collect {
          case (b, e) if e - b >= 10 => (be32(b + 4), be32(b), be16(b + 8))
        }
      }
    }
  }

  /** S3/S4/S5 unified open: route by format, extract the band payload.
    * For SAFE archives carrying JP2 band rasters, a GeoTIFF sidecar
    * member with the same band suffix (`..._B04.tif`) is preferred when
    * present — the documented ingest path for pre-converted archives.
    * @throws Jp2UnsupportedException when the routed member is JPEG-2000
    *         and no sidecar exists (message carries band + ihdr geometry)
    */
  def openBand(payload: Array[Byte], band: String): Option[Array[Byte]] =
    detect(payload) match {
      case TiffFormat => Some(payload)
      case ZipFormat =>
        val select = safeBandSelector(band)
        val names = zipMembers(payload).filter(select)
        val chosen = names.find(n => n.toLowerCase.endsWith(".tif") ||
            n.toLowerCase.endsWith(".tiff"))
          .orElse(names.headOption)
        chosen.flatMap(n => zipMemberWithName(payload, _ == n)).map {
          case (name, bytes) =>
            if (isJp2(bytes))
              throw Jp2UnsupportedException(name, band, jp2Meta(bytes))
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
