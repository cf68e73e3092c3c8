package graft

/** Answer-quality gate for the product-quantization ANN path: beyond the
  * DuckDB integer-replay oracle (which pins `recall_ok` to a literal 1),
  * this recomputes the overlap between the PQ top-5 and the exact
  * brute-force top-5 (`v_ann_cosine`) independently, so a regression in
  * either the codebook construction or the ADC candidate generation shows
  * up as a recall drop here even before the oracle run.
  */
class AnnPqSpec extends SparkSpec {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sfDir).collect()

  test("PQ returns exactly top-5 per query with recall_ok = 1") {
    val pq = rows("v_ann_pq")
    assert(pq.length == 15, s"3 queries x 5 ranks, got ${pq.length}")
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5),
        s"qid $qid ranks")
      assert(rs.forall(_.getInt(4) == 1),
        s"qid $qid recall_ok must be 1 (band ${queries.Pipeline.PqRecallBand})")
    }
  }

  test("PQ top-5 overlaps exact top-5 at or above the pinned band") {
    val exact = rows("v_ann_cosine").filter(_.getInt(3) <= 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = rows("v_ann_pq")
    pq.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val hits = rs.count(r => exact((qid, r.getLong(1))))
      assert(hits >= queries.Pipeline.PqRecallBand,
        s"qid $qid: PQ recall $hits/5 below band ${queries.Pipeline.PqRecallBand}")
    }
  }
}
