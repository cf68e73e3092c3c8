package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BandExprParser

/** C11 — band provenance edges (BandSRC, reference `controller.py:199-202`):
  * when a band's metadata carries a generating expression, one provenance
  * edge (band_id → band_src_id) is recorded per source band the expression
  * references.
  *
  * The source set comes from the same band-algebra parser that executes
  * the expression (P8), so lineage can never drift from evaluation.
  * Parsing happens once per band on the driver — band catalogs are
  * metadata-sized — and name→id resolution is a broadcast join.
  */
object BandLineage {

  final case class BandDef(bandId: Int, name: String,
                           expression: Option[String] = None)

  /** Edge table `(band_id, band_src_id, src_name)` for every expression
    * band, ordered for deterministic output. Unresolvable references fail
    * loudly — a lineage edge to a band the catalog doesn't know is a
    * catalog bug, not a row to drop.
    */
  def edges(s: SparkSession, bands: Seq[BandDef]): DataFrame = {
    import s.implicits._
    val refs = bands.flatMap { b =>
      b.expression.toSeq.flatMap { e =>
        BandExprParser.refs(BandExprParser.parse(e)).map(r => (b.bandId, r))
      }
    }
    val known = bands.map(_.name).toSet
    val unknown = refs.collect { case (_, r) if !known.contains(r) => r }.distinct
    require(unknown.isEmpty,
      s"band expressions reference unknown bands: ${unknown.mkString(", ")}")
    // an AMBIGUOUS reference is the same class of catalog bug as an
    // unknown one: duplicate band names would silently fan the join out
    // to one contradictory edge per same-named id instead of failing
    val dup = bands.groupBy(_.name).collect { case (n, bs) if bs.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate band names in the catalog: ${dup.toSeq.sorted.mkString(", ")}")
    val catalog = bands.map(b => (b.bandId, b.name)).toDF("band_src_id", "src_name")
    refs.toDF("band_id", "src_name")
      .join(broadcast(catalog), Seq("src_name"))
      .select($"band_id", $"band_src_id", $"src_name")
  }
}
