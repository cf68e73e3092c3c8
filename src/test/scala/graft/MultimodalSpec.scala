package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: schema, per-partition kernels, and the stubbed
  * codec round-trip over deterministic synthetic payloads.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthetic(spark, n = 12, width = 32,
    height = 24, frames = 4)

  test("codec round-trips header metadata") {
    val m = MediaMeta("image", "grft", 1024, 768, 30, 44100)
    val payload = FakeCodec.encode(m, Array[Byte](1, 2, 3))
    assert(FakeCodec.decodeMeta(payload).contains((1024, 768, 30, 44100)))
    assert(FakeCodec.samples(payload).toSeq == Seq[Byte](1, 2, 3))
    assert(FakeCodec.decodeMeta("nope".getBytes) == None)
  }

  test("ImageCodec decodes real PNG bytes: meta, luma samples, round-trip") {
    // hand-built 4×2 RGB PNG via ImageIO (the JDK encoder is the fixture)
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, ((x * 60) << 16) | ((y * 100) << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    assert(Multimodal.codecFor(png) eq ImageCodec)
    assert(ImageCodec.decodeMeta(png).contains((4, 2, 1, 0)))
    val s = ImageCodec.samples(png)
    assert(s.length == 8)
    // BT.601 integer luma of pixel (x=1, y=1): r=60, g=100, b=30
    assert((s(5) & 0xff) == (60 * 299 + 100 * 587 + 30 * 114) / 1000)
    // grayscale re-encode decodes back to the same plane
    val back = ImageCodec.encode(MediaMeta("image", "png", 4, 2, 1, 0), s)
    assert(ImageCodec.decodeMeta(back).contains((4, 2, 1, 0)))
    assert(ImageCodec.samples(back).toSeq == s.toSeq)
    // non-image bytes are rejected, not crashed on
    assert(ImageCodec.decodeMeta(Array[Byte](1, 2, 3)) == None)
  }

  test("kernels route real PNG payloads through ImageCodec") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, (x * 30) << 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val rows = Seq(MediaRow(1L, MediaMeta("image", "png", 8, 6, 1, 0), png)).toDS()

    val feats = extractFeatures(rows).collect()
    assert(feats.length == 1 && feats.head.histogram.sum == 48L)

    val resized = resize(rows, 2).collect().head
    assert(resized.meta.width == 4 && resized.meta.height == 3)
    assert(ImageCodec.decodeMeta(resized.payload).contains((4, 3, 1, 0)))
    // nearest-neighbor: resized (x,y) samples source (2x, 2y)
    val rs = ImageCodec.samples(resized.payload)
    val os = ImageCodec.samples(png)
    assert((rs(1) & 0xff) == (os(2) & 0xff))

    // single-frame → sampleFrames is a pass-through
    val sampled = sampleFrames(rows, 2).collect().head
    assert(sampled.payload.toSeq == png.toSeq)
  }

  test("feature extraction runs per-partition and is deterministic") {
    val f1 = extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length == 12)
    assert(f1.map(_.meanLuma).toSeq == f2.map(_.meanLuma).toSeq)
    // histogram covers exactly the sample count
    f1.foreach(f => assert(f.histogram.sum == 32L * 24 * 4))
  }

  test("metadata-only queries never read the payload column from parquet") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("meta.kind") === "image").select(col("media_id"))
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    val readSchema = scan.split("ReadSchema:").last
    assert(!readSchema.contains("payload"),
      s"payload must be pruned from the scan: $readSchema")
  }

  test("resize halves dimensions and keeps the header consistent") {
    val out = resize(media, 2).collect().head
    assert(out.meta.width == 16 && out.meta.height == 12)
    assert(FakeCodec.decodeMeta(out.payload).map(t => (t._1, t._2)).contains((16, 12)))
    assert(FakeCodec.samples(out.payload).length == 16 * 12)
  }

  test("frame sampling keeps every 2nd frame") {
    val out = sampleFrames(media, 2).collect().head
    assert(out.meta.frames == 2)
    assert(FakeCodec.samples(out.payload).length == 32 * 24 * 2)
    // kept frame 0 must equal the original first plane
    val orig = media.collect().find(_.media_id == out.media_id).get
    val origPlane = FakeCodec.samples(orig.payload).take(32 * 24).toSeq
    assert(FakeCodec.samples(out.payload).take(32 * 24).toSeq == origPlane)
  }

  test("WavCodec: 16-bit PCM round-trip, meta fields, sniffer routing") {
    val raw = Array.tabulate(200)(i => ((i * 7) % 251).toByte)
    val meta = MediaMeta("audio", "wav", 1, 16, raw.length, 44100)
    val payload = WavCodec.encode(meta, raw)
    assert(payload.length == 44 + 2 * raw.length)
    assert(new String(payload, 0, 4, "ASCII") == "RIFF")
    assert(Multimodal.codecFor(payload) eq WavCodec)
    assert(WavCodec.decodeMeta(payload).contains((1, 16, 200, 44100)))
    assert(WavCodec.samples(payload).toSeq == raw.toSeq)
  }

  test("WavCodec: 8-bit PCM and stereo frame counting") {
    val raw = Array.tabulate(64)(i => (i * 3).toByte)
    val payload = WavCodec.encode(MediaMeta("audio", "wav", 2, 8, 32, 8000), raw)
    // 64 interleaved 8-bit samples over 2 channels = 32 frames
    assert(WavCodec.decodeMeta(payload).contains((2, 8, 32, 8000)))
    assert(WavCodec.samples(payload).toSeq == raw.toSeq)
  }

  test("WavCodec: skips unknown chunks before data (LIST)") {
    val raw = Array.tabulate(10)(i => (i + 1).toByte)
    val base = WavCodec.encode(MediaMeta("audio", "wav", 1, 16, 10, 16000), raw)
    // splice an odd-length LIST chunk between fmt and data (tests the
    // word-alignment skip too)
    val listBody = "INFOxyz".getBytes("ASCII") // 7 bytes, padded to 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36) // RIFF header + fmt chunk
    out.write("LIST".getBytes("ASCII")); out.write(Array[Byte](7, 0, 0, 0))
    out.write(listBody); out.write(0)
    out.write(base, 36, base.length - 36) // data chunk
    val spliced = out.toByteArray
    assert(WavCodec.decodeMeta(spliced).contains((1, 16, 10, 16000)))
    assert(WavCodec.samples(spliced).toSeq == raw.toSeq)
    assert(WavCodec.decodeMeta("RIFFxxxxWAVE".getBytes("ASCII")).isEmpty)
  }

  test("AviMjpegCodec: metadata exact, luma planes near-exact, routing") {
    val w = 32; val h = 24; val nf = 3
    val samples = Array.tabulate(nf * w * h) { i =>
      // smooth (wrap-free) gradient: JPEG ringing stays negligible
      val f = i / (w * h); val y = (i / w) % h; val x = i % w
      (x * 4 + y * 3 + f * 20).toByte
    }
    val meta = MediaMeta("video", "mjpeg", w, h, nf, 10)
    val payload = AviMjpegCodec.encode(meta, samples)
    assert(new String(payload, 8, 4, "ASCII") == "AVI ")
    assert(Multimodal.codecFor(payload) eq AviMjpegCodec)
    assert(AviMjpegCodec.decodeMeta(payload).contains((w, h, nf, 10)))
    val back = AviMjpegCodec.samples(payload)
    assert(back.length == samples.length)
    // MJPEG is lossy; smooth gradients at q=0.98 stay within a few levels
    val maxErr = samples.zip(back)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 6, s"JPEG drift too large: $maxErr")
  }

  test("frame sampling works on real AVI payloads through the codec API") {
    val sparkS = spark
    import sparkS.implicits._
    val w = 16; val h = 12; val nf = 4
    val rows = spark.range(0, 3).as[Long].map { id =>
      val samples = Array.tabulate(nf * w * h)(i => ((id * 9 + i) % 180).toByte)
      val meta = MediaMeta("video", "mjpeg", w, h, nf, 5)
      MediaRow(id, meta, AviMjpegCodec.encode(meta, samples))
    }
    val out = sampleFrames(rows, 2).collect().head
    assert(AviMjpegCodec.decodeMeta(out.payload).exists(_._3 == 2))
    assert(AviMjpegCodec.samples(out.payload).length == 2 * w * h)
  }

  test("feature extraction runs over real WAV payloads") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = spark.range(0, 6).as[Long].map { id =>
      val raw = Array.tabulate(50)(i => ((id * 11 + i) % 256).toByte)
      val meta = MediaMeta("audio", "wav", 1, 16, raw.length, 16000)
      MediaRow(id, meta, WavCodec.encode(meta, raw))
    }
    val feats = extractFeatures(rows).collect().sortBy(_.media_id)
    assert(feats.length == 6)
    val expected0 = Array.tabulate(50)(i => (i % 256) & 0xff).sum / 50.0
    assert(math.abs(feats(0).meanLuma - expected0) < 1e-9)
    assert(feats.forall(_.histogram.sum == 50))
  }
}
