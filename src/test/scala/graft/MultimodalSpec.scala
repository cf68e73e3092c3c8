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
}
