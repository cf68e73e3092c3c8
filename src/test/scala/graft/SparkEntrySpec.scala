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

  test("query names are fs-safe and oracles are non-empty") {
    SparkEntry.queries.keys.foreach { name =>
      assert(name.matches("[a-z0-9_]+"), s"unsafe query name: $name")
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle: $name")
    }
  }
}
