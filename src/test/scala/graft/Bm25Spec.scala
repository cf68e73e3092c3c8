package graft

import graft.queries.Pipeline

/** Crafted-corpus semantics for integer BM25: term-frequency saturation,
  * length normalization, exclusion of docs without query terms, and the
  * exact integer scores the clearing-denominators formula produces
  * (which the DuckDB oracle replays bit-for-bit at corpus scale).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "cat"),                 // tf=1, dl=1
    (1L, "cat cat cat cat"),     // tf=4, dl=4
    (2L, "cat dog dog dog"),     // tf=1, dl=4
    (3L, "dog")                  // no query term
  ).toDF("doc_id", "text")

  test("exact integer scores: tf raises, length normalizes, absent docs drop") {
    // N=4, A=10, idf = 1000*4 div 3 = 1333; contribution
    // (idf * 440*tf) div (200*tf + 60 + 72*dl):
    //   doc0: 586520 div 332  = 1766
    //   doc1: 2346080 div 1148 = 2043
    //   doc2: 586520 div 548  = 1070
    val out = Pipeline.bm25Search(docs, Seq("cat"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 1766L), (1L, 1L, 2043L), (2L, 1L, 1070L)))
    val score = out.map { case (id, _, s) => id -> s }.toMap
    assert(score(1L) > score(0L), "more matches must outrank at any length")
    assert(score(0L) > score(2L), "equal tf: shorter doc must outrank")
  }

  test("k bounds the result; multi-term docs accumulate per-term nterms") {
    val out = Pipeline.bm25Search(docs, Seq("cat", "dog"), k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 2)
    // doc 2 contains both terms → nterms = 2
    val all = Pipeline.bm25Search(docs, Seq("cat", "dog"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(all.find(_._1 == 2L).get._2 == 2L)
  }
}
