package graft

/** Answer-quality gate for the int8-quantized ANN path: the DuckDB oracle
  * replays the quantization and candidate ranking exactly; this spec adds
  * the honest quality number — how much of the exact brute-force top-5
  * the int8 candidate ranking retains on the synthetic corpus.
  */
class AnnInt8Spec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("int8 returns exactly top-10 candidates per query, ranked 1..10") {
    val out = rows("v_ann_int8")
    assert(out.length == 30, s"3 queries x 10 candidates, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to 10),
        s"qid $qid ranks must be 1..10")
    }
  }

  test("int8 candidate top-10 contains the exact top-5 (127-level quantization band)") {
    val exact = rows("v_ann_cosine").filter(_.getInt(3) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val int8 = rows("v_ann_int8")
    int8.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val hits = rs.count(r => exact((qid, r.getLong(1))))
      assert(hits >= 4,
        s"qid $qid: int8 top-10 holds only $hits/5 of the exact top-5")
    }
  }
}
