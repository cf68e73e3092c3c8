package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt mandate): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs;
  * decode / feature-extract / resize / frame-sample run as per-partition
  * kernels over batches of rows.
  *
  * Codecs are pluggable behind [[Multimodal.Codec]]: [[ImageCodec]] is a
  * REAL image decoder (JDK `javax.imageio` — PNG/BMP/GIF/JPEG, no
  * external dependency) producing a luma sample plane; [[WavCodec]] is a
  * REAL audio decoder (RIFF/WAVE PCM parsed from scratch);
  * [[AviMjpegCodec]] is a REAL video codec (MJPEG frames in an AVI/RIFF
  * container, frames through the JDK JPEG reader); [[FakeCodec]] remains
  * a deterministic synthetic stand-in for tests and benchmarks.
  * [[Multimodal.codecFor]] sniffs the payload and routes.
  *
  * Scale design: media rows are large (MBs); the kernels are
  * `mapPartitions` so one task streams a partition without per-row
  * task-dispatch overhead, and partition sizing is governed by
  * `spark.sql.files.maxPartitionBytes` at the source. Metadata-only
  * operations (filtering by width, codec, duration) touch only the meta
  * struct — column pruning keeps the binary payload unread at the parquet
  * scan when the query never references it.
  */
object Multimodal {

  // All payloads here are in-memory byte arrays, but ImageIO's default
  // stream factories spool every read/write through a temp FILE
  // (FileCache streams) — per-frame disk round-trips that turn the pure-
  // CPU codecs IO-bound whenever java.io.tmpdir is slow. Force the
  // memory-cached stream implementations process-wide; executors hit
  // this on classload since every codec call enters through this object.
  javax.imageio.ImageIO.setUseCache(false)
  // One in-band line at init: if some other classpath tenant re-enables
  // the disk cache after this object loads, the bench forensics need to
  // know which mode the codecs actually ran in — the setting is global
  // JVM state, not ours to assume.
  System.err.println("[multimodal] ImageIO useCache=" +
    javax.imageio.ImageIO.getUseCache + " cacheDir=" +
    javax.imageio.ImageIO.getCacheDirectory)

  /** JPEG writer provider, resolved ONCE. `ImageIO.getImageWritersByFormatName`
    * takes the IIORegistry's global lock per call — 32 encoder threads x
    * ~1,700 frames contending a synchronized registry scan for an answer
    * that never changes. The SPI itself is a stateless factory; each
    * caller mints its own writer instance from it lock-free.
    */
  private lazy val jpegWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val spi = w.getOriginatingProvider
    w.dispose()
    spi
  }

  /** Typed metadata carried alongside every media payload. */
  final case class MediaMeta(kind: String, codec: String,
                             width: Int, height: Int,
                             frames: Int, sampleRateHz: Int)

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class Feature(media_id: Long, kind: String,
                           meanLuma: Double, histogram: Array[Long])

  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frames", IntegerType, nullable = false),
      StructField("sampleRateHz", IntegerType, nullable = false))), nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Pluggable payload codec: metadata sniff, sample-plane decode,
    * re-encode. `decodeMeta` returns (width, height, frames, sampleRateHz).
    */
  trait Codec extends Serializable {
    def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Int)]
    def samples(payload: Array[Byte]): Array[Byte]
    def encode(meta: MediaMeta, samples: Array[Byte]): Array[Byte]
  }

  /** Route a payload to its codec: GRFT header → [[FakeCodec]],
    * RIFF/WAVE → [[WavCodec]], anything `javax.imageio` recognizes
    * (PNG/BMP/GIF/JPEG) → [[ImageCodec]].
    */
  def codecFor(payload: Array[Byte]): Codec = {
    def riffType(t: String) = payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == t(0) && payload(9) == t(1) &&
      payload(10) == t(2) && payload(11) == t(3)
    if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'R' &&
        payload(2) == 'F' && payload(3) == 'T') FakeCodec
    else if (riffType("WAVE")) WavCodec
    else if (riffType("AVI ")) AviMjpegCodec
    else ImageCodec
  }

  /** REAL audio codec: RIFF/WAVE PCM, parsed from scratch (the container
    * is a public byte format — no library involved). `decodeMeta` maps
    * (channels, bitsPerSample, frames, sampleRateHz) onto the generic
    * (width, height, frames, rate) slots. The 8-bit sample plane is the
    * interleaved PCM stream down-converted per sample: 16-bit signed →
    * `(s >> 8) + 128`, 8-bit PCM is already unsigned and passes through.
    * `encode` writes a canonical 44-byte-header PCM file; unknown chunks
    * (LIST/fact/…) are skipped on read like any compliant parser.
    */
  object WavCodec extends Codec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** (fmtOffset, dataOffset, dataLen) of the fmt and data chunks. */
    private def chunks(p: Array[Byte]): Option[(Int, Int, Int)] = {
      if (p.length < 12) return None
      var off = 12
      var fmt = -1; var data = -1; var dataLen = 0
      while (off + 8 <= p.length && (fmt < 0 || data < 0)) {
        val id = new String(p, off, 4, "ASCII")
        val len = u32(p, off + 4).toInt
        if (len < 0) return None // malformed/overflowing chunk length
        if (id == "fmt ") fmt = off + 8
        else if (id == "data") { data = off + 8; dataLen = math.min(len, p.length - data) }
        off += 8 + len + (len & 1) // chunks are word-aligned
      }
      if (fmt >= 0 && data >= 0) Some((fmt, data, dataLen)) else None
    }

    override def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Int)] =
      chunks(payload).flatMap { case (fmt, _, dataLen) =>
        val audioFormat = u16(payload, fmt)
        val channels = u16(payload, fmt + 2)
        val rate = u32(payload, fmt + 4).toInt
        val bits = u16(payload, fmt + 14)
        val frameBytes = channels * (bits / 8)
        if (audioFormat != 1 || channels == 0 || (bits != 8 && bits != 16)) None
        else Some((channels, bits, dataLen / frameBytes, rate))
      }

    override def samples(payload: Array[Byte]): Array[Byte] =
      chunks(payload) match {
        case None => Array.emptyByteArray
        case Some((fmt, data, dataLen)) =>
          val bits = u16(payload, fmt + 14)
          if (bits == 8) java.util.Arrays.copyOfRange(payload, data, data + dataLen)
          else {
            val n = dataLen / 2
            val out = new Array[Byte](n)
            var i = 0
            while (i < n) {
              val s = ((payload(data + 2 * i) & 0xff) |
                (payload(data + 2 * i + 1) << 8)).toShort
              out(i) = ((s >> 8) + 128).toByte
              i += 1
            }
            out
          }
      }

    /** meta.width = channels, meta.height = bitsPerSample. */
    override def encode(meta: MediaMeta, samples: Array[Byte]): Array[Byte] = {
      val bits = if (meta.height == 8) 8 else 16
      val channels = math.max(meta.width, 1)
      val dataLen = samples.length * (bits / 8)
      val out = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("ASCII"))
      out.put("fmt ".getBytes("ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(meta.sampleRateHz)
        .putInt(meta.sampleRateHz * channels * (bits / 8))
        .putShort((channels * (bits / 8)).toShort).putShort(bits.toShort)
      out.put("data".getBytes("ASCII")).putInt(dataLen)
      var i = 0
      if (bits == 8) out.put(samples)
      else while (i < samples.length) {
        out.putShort((((samples(i) & 0xff) - 128) << 8).toShort)
        i += 1
      }
      out.array()
    }
  }

  /** REAL image codec over the JDK's `javax.imageio` readers (PNG, BMP,
    * GIF, JPEG — no external dependency). The sample plane is 8-bit luma
    * (ITU-R BT.601 integer weights); `encode` writes grayscale PNG.
    * Single-frame by definition (`frames = 1`).
    */
  object ImageCodec extends Codec {
    def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    override def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Int)] =
      decodeImage(payload).map(img => (img.getWidth, img.getHeight, 1, 0))

    override def samples(payload: Array[Byte]): Array[Byte] =
      decodeImage(payload) match {
        case None => Array.emptyByteArray
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            // read the gray raster raw — getRGB would run the samples
            // through sRGB gamma conversion and break the round-trip
            val out = new Array[Byte](w * h)
            img.getRaster.getDataElements(0, 0, w, h, out)
            out
          } else {
            val out = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                out(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
                x += 1
              }
              y += 1
            }
            out
          }
      }

    override def encode(meta: MediaMeta, samples: Array[Byte]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(meta.width, meta.height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, meta.width, meta.height, samples)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL video codec: MJPEG inside an AVI/RIFF container, both public
    * byte formats. The container walk (nested LIST chunks, `avih` header,
    * `..dc`/`..db` frame chunks) is parsed from scratch; each frame is a
    * complete JPEG image decoded through the JDK reader into an 8-bit
    * luma plane, and `samples` concatenates the planes in frame order.
    * `encode` writes a canonical hdrl+movi AVI whose frames are JPEG
    * (quality 0.98) — lossy like any MJPEG writer, so round-trips are
    * near-exact, not bit-exact (metadata IS exact).
    * meta mapping: width × height per frame, `frames` = frame count,
    * `sampleRateHz` = frames per second.
    */
  object AviMjpegCodec extends Codec {
    private def u32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private final case class Parsed(width: Int, height: Int, usPerFrame: Int,
                                    frames: List[(Int, Int)])

    private def parse(p: Array[Byte]): Option[Parsed] = {
      if (p.length < 12) return None
      var width = 0; var height = 0; var usf = 0
      val frames = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = new String(p, off, 4, "ASCII")
          val len = u32(p, off + 4)
          val body = off + 8
          if (len < 0 || body + len > p.length) return // truncated chunk
          if (id == "LIST") walk(body + 4, body + len)
          else if (id == "avih") {
            usf = u32(p, body); width = u32(p, body + 32)
            height = u32(p, body + 36)
          } else if (id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")) && len > 0)
            frames += ((body, len))
          off = body + len + (len & 1) // chunks are word-aligned
        }
      }
      walk(12, p.length)
      if (width > 0 && height > 0 && frames.nonEmpty)
        Some(Parsed(width, height, usf, frames.toList))
      else None
    }

    override def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Int)] =
      parse(payload).map { v =>
        val fps = if (v.usPerFrame > 0) (1000000 + v.usPerFrame / 2) / v.usPerFrame else 0
        (v.width, v.height, v.frames.size, fps)
      }

    override def samples(payload: Array[Byte]): Array[Byte] =
      parse(payload) match {
        case None => Array.emptyByteArray
        case Some(v) =>
          val plane = v.width * v.height
          val out = new Array[Byte](plane * v.frames.size)
          v.frames.zipWithIndex.foreach { case ((off, len), fi) =>
            val jpeg = java.util.Arrays.copyOfRange(payload, off, off + len)
            // ImageCodec reads gray rasters raw (getRGB would gamma-shift)
            val luma = ImageCodec.samples(jpeg)
            System.arraycopy(luma, 0, out, fi * plane,
              math.min(plane, luma.length))
          }
          out
      }

    private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      // per-frame writer from the cached SPI: no registry lock (writers
      // themselves are not thread-safe, so the INSTANCE stays per-call)
      val writer = jpegWriterSpi.createWriterInstance()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.98f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose(); ios.close()
      bos.toByteArray
    }

    override def encode(meta: MediaMeta, samples: Array[Byte]): Array[Byte] = {
      val w = meta.width; val h = meta.height
      val plane = w * h
      val fps = math.max(meta.sampleRateHz, 1)
      val frames = (0 until meta.frames).map { fi =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val pl = new Array[Byte](plane)
        val from = fi * plane
        if (from + plane <= samples.length)
          System.arraycopy(samples, from, pl, 0, plane)
        img.getRaster.setDataElements(0, 0, w, h, pl)
        jpegBytes(img)
      }
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = body.length & 1
        val out = ByteBuffer.allocate(8 + body.length + pad)
          .order(ByteOrder.LITTLE_ENDIAN)
        out.put(id.getBytes("ASCII")).putInt(body.length).put(body)
        out.array()
      }
      def list(typ: String, children: Array[Byte]): Array[Byte] =
        chunk("LIST", typ.getBytes("ASCII") ++ children)
      val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      avih.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
        .putInt(frames.size).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h)
      val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      strh.put("vids".getBytes("ASCII")).put("MJPG".getBytes("ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(fps) // dwScale=1, dwRate=fps
        .putInt(0).putInt(frames.size)
      val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      strf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .put("MJPG".getBytes("ASCII")).putInt(plane * 3)
      val hdrl = list("hdrl", chunk("avih", avih.array()) ++
        list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
      val movi = list("movi", frames.map(chunk("00dc", _)).fold(Array.emptyByteArray)(_ ++ _))
      val payload = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
      val out = ByteBuffer.allocate(8 + payload.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("ASCII")).putInt(payload.length).put(payload)
      out.array()
    }
  }

  /** Deterministic stand-in codec over a 16-byte header + raw "samples":
    * bytes 0-3 magic "GRFT", 4-5 width, 6-7 height, 8-11 frame count,
    * 12-15 sample rate; payload after the header is one byte per sample.
    * Kept as the loss-free synthetic payload for tests and benchmarks
    * (every real codec here except WAV is lossy or format-bound).
    */
  object FakeCodec extends Codec {
    val HeaderLen = 16

    def encode(meta: MediaMeta, samples: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](HeaderLen + samples.length)
      out(0) = 'G'; out(1) = 'R'; out(2) = 'F'; out(3) = 'T'
      out(4) = (meta.width >> 8).toByte; out(5) = meta.width.toByte
      out(6) = (meta.height >> 8).toByte; out(7) = meta.height.toByte
      var i = 0
      while (i < 4) {
        out(8 + i) = (meta.frames >> (24 - 8 * i)).toByte
        out(12 + i) = (meta.sampleRateHz >> (24 - 8 * i)).toByte
        i += 1
      }
      System.arraycopy(samples, 0, out, HeaderLen, samples.length)
      out
    }

    def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (payload.length < HeaderLen || payload(0) != 'G' || payload(1) != 'R' ||
          payload(2) != 'F' || payload(3) != 'T') return None
      val w = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
      val h = ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
      def i32(off: Int) = (0 until 4).foldLeft(0)((a, i) => (a << 8) | (payload(off + i) & 0xff))
      Some((w, h, i32(8), i32(12)))
    }

    def samples(payload: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(payload, HeaderLen, payload.length)
  }

  /** Feature extraction kernel: mean "luma" + 8-bin histogram per row,
    * streamed per partition (batch shape: one task per input partition).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { row =>
        val codec = codecFor(row.payload)
        codec.decodeMeta(row.payload).map { _ =>
          val s = codec.samples(row.payload)
          val hist = new Array[Long](8)
          var sum = 0.0
          var i = 0
          while (i < s.length) {
            val v = s(i) & 0xff
            sum += v
            hist(v >> 5) += 1
            i += 1
          }
          Feature(row.media_id, row.meta.kind,
            if (s.length == 0) 0.0 else sum / s.length, hist)
        }
      }
    }
  }

  /** Resize stub: nearest-neighbor downsample of the sample plane by an
    * integer factor — real per-pixel gather logic, fake pixels.
    */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { row =>
        val codec = codecFor(row.payload)
        codec.decodeMeta(row.payload) match {
          case Some((w, h, frames, rate)) if w >= factor && h >= factor =>
            val s = codec.samples(row.payload)
            val nw = w / factor; val nh = h / factor
            val out = new Array[Byte](nw * nh)
            var y = 0
            while (y < nh) {
              var x = 0
              while (x < nw) {
                val src = (y * factor) * w + (x * factor)
                out(y * nw + x) = if (src < s.length) s(src) else 0
                x += 1
              }
              y += 1
            }
            val meta = row.meta.copy(width = nw, height = nh)
            MediaRow(row.media_id, meta, codec.encode(meta, out))
          case _ => row
        }
      }
    }
  }

  /** Frame sampling: keep every `stride`-th frame of a multi-frame payload
    * (frames are consecutive width×height planes). Single-frame payloads
    * (all [[ImageCodec]] media) pass through unchanged.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { row =>
        val codec = codecFor(row.payload)
        codec.decodeMeta(row.payload) match {
          case Some((w, h, frames, rate)) if frames > 1 =>
            val s = codec.samples(row.payload)
            val plane = w * h
            val kept = (0 until frames by stride).toArray
            val out = new Array[Byte](kept.length * plane)
            kept.zipWithIndex.foreach { case (f, i) =>
              val from = f * plane
              if (from + plane <= s.length)
                System.arraycopy(s, from, out, i * plane, plane)
            }
            val meta = row.meta.copy(frames = kept.length)
            MediaRow(row.media_id, meta, codec.encode(meta, out))
          case _ => row
        }
      }
    }
  }

  /** Deterministic synthetic media table for tests/benchmarks. */
  def synthetic(spark: SparkSession, n: Int, width: Int = 32, height: Int = 24,
                frames: Int = 4): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val meta = MediaMeta(if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
        "grft", width, height, frames, 16000)
      val body = new Array[Byte](width * height * frames)
      var i = 0
      while (i < body.length) { body(i) = ((id * 131 + i * 7) % 251).toByte; i += 1 }
      MediaRow(id, meta, FakeCodec.encode(meta, body))
    }
  }
}
