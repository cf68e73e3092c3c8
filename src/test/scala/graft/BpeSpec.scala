package graft

import graft.queries.Pipeline

/** Crafted-corpus semantics for the distributed BPE merge-learner:
  * weighted pair counts, lexicographic tie-breaks, and the greedy
  * leftmost-first merge (a just-merged token must not chain-merge within
  * its round).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def learn(texts: Seq[String], rounds: Int) =
    Pipeline.bpeLearn(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), rounds)
      .select("r", "pa", "pb", "merged", "wcnt")
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("weighted counts pick the most frequent pair; greedy merge does not chain") {
    // words: "aaab" x2, "ab" x1
    // round 1: (a,a) weight 4 beats (a,b) weight 3; "aaab" merges to
    // [aa, a, b] — the fresh "aa" must NOT swallow the following "a"
    // round 2: on merged symbols, (a,b) weight 3 beats (aa,a) weight 2
    val out = learn(Seq("aaab aaab ab"), rounds = 2)
    assert(out == Seq((1, "a", "a", "aa", 4L), (2, "a", "b", "ab", 3L)))
  }

  test("count ties break to the lexicographically smallest pair") {
    val out = learn(Seq("ba ca"), rounds = 1)
    assert(out == Seq((1, "b", "a", "ba", 1L)))
  }

  test("single-char words survive the merge rounds untouched") {
    // pairs exist only in "xy"; "a" and "b" contribute none and must not
    // break the fold (empty slice leaves the 1-symbol accumulator)
    val out = learn(Seq("a b xy xy"), rounds = 1)
    assert(out == Seq((1, "x", "y", "xy", 2L)))
  }

  test("apply tokenizes via the final vocab table: both merges counted") {
    // merges learned above: r1 (a,a)->aa, r2 (a,b)->ab
    // "aaab" -> [aa, ab] (2 tokens), "ab" -> [ab] (1 token)
    val docs = Seq((0L, "aaab aaab ab"), (1L, "ab"))
      .toDF("doc_id", "text")
    val out = Pipeline.bpeApply(docs, rounds = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 5L, 10L, 2000L), // 3 words, 2+2+1 tokens, 4+4+2 chars
      (1L, 1L, 1L, 2L, 2000L)))
  }
}
