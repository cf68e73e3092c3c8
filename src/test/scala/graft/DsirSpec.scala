package graft

import graft.queries.Pipeline

/** Crafted-corpus semantics for DSIR importance selection: documents
  * whose hashed n-gram features match the target-language distribution
  * must outrank documents drawn from the off-target distribution, and
  * the selection is a bounded top-k with a deterministic tie-break.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "good clean prose", "en"),
    (1L, "good clean prose", "de"), // same features as 0 — same score
    (2L, "spam spam spam", "de"),
    (3L, "good spam", "de")
  ).toDF("doc_id", "text", "lang")

  test("target-distribution docs outrank off-target docs; k bounds rows") {
    val out = Pipeline.dsirSelect(docs, targetLang = "en", k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 3)
    val score = out.map { case (id, _, s) => id -> s }.toMap
    // doc 1 duplicates doc 0's text, so it inherits the target-like
    // score regardless of its own lang tag — DSIR scores content, not
    // labels; the pure-spam doc must rank below both and fall out of k=3
    assert(score(0L) == score(1L))
    assert(!score.contains(2L), s"pure off-target doc selected: $out")
    assert(score(0L) > score(3L),
      s"mixed doc must score below pure target-like docs: $out")
  }

  test("every-doc-is-target degenerates to uniform relative frequency") {
    val all = docs.withColumn("lang",
      org.apache.spark.sql.functions.lit("en"))
    val out = Pipeline.dsirSelect(all, targetLang = "en", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // ct == cr and nt == nr for every bucket → sb = ct*nr - cr*nt = 0
    assert(out.size == 4 && out.forall(_._3 == 0L),
      s"expected all-zero scores when target == raw: $out")
  }
}
