package graft

import org.apache.spark.sql.functions._
import graft.queries.Pipeline

/** Crafted-input semantics for the CCNet-style paragraph dedup rewrite:
  * global first occurrence (min (doc_id, seg_idx)) keeps, every later
  * occurrence — cross-doc or within-doc — drops, and documents are
  * reassembled from surviving segments in position order.
  */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // segWords = 3 keeps the crafted docs readable
  private def run(docs: Seq[(Long, String)]) =
    Pipeline.paragraphDedup(docs.toDF("doc_id", "text"), segWords = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "kept_segs", "kept_md5")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("cross-doc duplicate segment drops from the later doc only") {
    val shared = "a b c"
    val out = run(Seq(
      (1L, s"$shared x y z"),   // segs: "a b c", "x y z"  — both first
      (2L, s"p q r $shared")))  // segs: "p q r", "a b c"  — second drops
    assert(out == Seq(
      (1L, 2L, 2L, md5Hex("a b c x y z")),
      (2L, 2L, 1L, md5Hex("p q r"))))
  }

  test("within-doc duplicate segment keeps only the first occurrence") {
    val out = run(Seq((1L, "a b c a b c d e f")))
    // segs: "a b c" (kept), "a b c" (dup), "d e f" (kept)
    assert(out == Seq((1L, 3L, 2L, md5Hex("a b c d e f"))))
  }

  test("a fully-duplicated doc reassembles to the empty string") {
    val out = run(Seq((1L, "a b c"), (2L, "a b c")))
    assert(out == Seq(
      (1L, 1L, 1L, md5Hex("a b c")),
      (2L, 1L, 0L, md5Hex(""))))
  }

  test("short tail segment and whitespace-only docs") {
    val out = run(Seq((1L, "a b c d"), (2L, "   ")))
    // doc 1: "a b c" + tail "d"; doc 2 filtered (no segments at all)
    assert(out == Seq((1L, 2L, 2L, md5Hex("a b c d"))))
  }

  test("corpus invariant: kept_segs <= n_segs and totals account for every segment") {
    val out = Pipeline.paragraphDedup(
      queries.Tables.documents(spark, sfDir), segWords = 10)
    val bad = out.filter($"kept_segs" > $"n_segs" || $"kept_segs" < 0)
    assert(bad.count() == 0)
    // distinct segment hashes == total kept segments (each hash keeps exactly once)
    val segs = queries.Tables.documents(spark, sfDir)
      .filter(length(trim($"text")) > 0)
      .select($"doc_id", split(trim($"text"), " +").as("w"))
      .select(posexplode(transform(
        sequence(lit(0), ceil(size($"w") / lit(10.0)).cast("int") - 1),
        j => array_join(slice($"w", j * 10 + 1, lit(10)), " ")))
        .as(Seq("i", "seg")))
    val distinctSegs = segs.select("seg").distinct().count()
    val keptTotal = out.agg(sum($"kept_segs")).as[Long].head()
    assert(keptTotal == distinctSegs,
      s"kept $keptTotal != distinct segments $distinctSegs")
  }
}
