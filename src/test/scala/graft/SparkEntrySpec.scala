package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every declared query must carry an oracle
  * (a missing one silently downgrades that query to a rows-only check),
  * every oracle must point at a declared query, and names must be
  * filesystem/JSON-safe.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("no module defines a query or oracle key another module also defines") {
    // the merged Map silently last-wins on duplicate keys — a new entry
    // shadowing an existing one would quietly replace a gated operator
    // (this round's x_ab_srm near-miss). Counting keys across the
    // module maps makes a collision a hard failure.
    import graft.{queries => gq}
    val queryMaps = Seq(
      "entry" -> Set("q1_pricing_summary"),
      "Relational" -> gq.Relational.queries.keySet,
      "CubeOps" -> gq.CubeOps.queries.keySet,
      "EngineOps" -> gq.EngineOps.queries.keySet,
      "Pipeline" -> gq.Pipeline.queries.keySet,
      "Curation" -> gq.Curation.queries.keySet,
      "Analytics" -> gq.Analytics.queries.keySet)
    for {
      (na, a) <- queryMaps; (nb, b) <- queryMaps if na < nb
      dup = a intersect b if dup.nonEmpty
    } fail(s"query key(s) defined in both $na and $nb: ${dup.toSeq.sorted}")
    val oracleMaps = Seq(
      "entry" -> Set("q1_pricing_summary"),
      "Relational" -> gq.Relational.oracles.keySet,
      "CubeOps" -> gq.CubeOps.oracles.keySet,
      "EngineOps" -> gq.EngineOps.oracles.keySet,
      "Pipeline" -> gq.Pipeline.oracles.keySet,
      "Curation" -> gq.Curation.oracles.keySet,
      "Analytics" -> gq.Analytics.oracles.keySet)
    for {
      (na, a) <- oracleMaps; (nb, b) <- oracleMaps if na < nb
      dup = a intersect b if dup.nonEmpty
    } fail(s"oracle key(s) defined in both $na and $nb: ${dup.toSeq.sorted}")
  }

  test("query names are fs-safe and oracles are non-empty") {
    SparkEntry.queries.keys.foreach { name =>
      assert(name.matches("[a-z0-9_]+"), s"unsafe query name: $name")
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle: $name")
    }
  }
}
