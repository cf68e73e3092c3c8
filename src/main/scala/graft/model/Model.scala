package graft.model

/** Core data-model case classes (SURVEY §1.1).
  *
  * These mirror the reference's catalog entities (collections, bands, tiles,
  * items, activities — `cube_builder/models/`, `bdc_catalog`) as plain Scala
  * types with Spark `Encoder`-friendly shapes (no Options of primitives in
  * hot paths, nullable via defaults).
  */

/** Composite functions supported by the engine (reference `controller.py`,
  * `USING.rst:37-41`): identity, median, least-cloud-cover-first (STK is the
  * legacy alias), average.
  */
object CompositeFunction extends Enumeration {
  val IDT, MED, LCF, AVG = Value
  def parse(s: String): Value = s.toUpperCase match {
    case "IDT" => IDT
    case "MED" => MED
    case "LCF" | "STK" => LCF
    case "AVG" => AVG
    case other => throw new IllegalArgumentException(s"unknown composite function: $other")
  }
}

/** Band definition (reference `forms.py:86-93`, `controller.py:53-87`). */
final case class Band(
    name: String,
    commonName: String,
    dataType: String,          // int8|uint8|int16|uint16|int32|uint32|float32|float64
    nodata: Double,
    minValue: Double = Double.MinValue,
    maxValue: Double = Double.MaxValue,
    scaleMult: Double = 1.0,
    scaleAdd: Double = 0.0,
    resolutionX: Double = 0.0,
    resolutionY: Double = 0.0,
    /** non-empty for derived index bands, e.g. "10000.*((B8A-B04)/(B8A+B04))" */
    expression: String = "")

object Band {
  /** Inclusive value range per pixel dtype (rasterio `dtype_ranges` analog). */
  def dtypeRange(dataType: String): (Double, Double) = dataType match {
    case "int8"    => (-128d, 127d)
    case "uint8"   => (0d, 255d)
    case "int16"   => (-32768d, 32767d)
    case "uint16"  => (0d, 65535d)
    case "int32"   => (Int.MinValue.toDouble, Int.MaxValue.toDouble)
    case "uint32"  => (0d, 4294967295d)
    case "float32" => (Float.MinValue.toDouble, Float.MaxValue.toDouble)
    case "float64" => (Double.MinValue, Double.MaxValue)
    case other     => throw new IllegalArgumentException(s"unsupported data type: $other")
  }
}

/** QA-mask definition (reference `forms.py:102-110`): value lists
  * classifying quality-band pixels, or bit-field mode for Landsat C2.
  */
final case class MaskDef(
    clearData: Seq[Long] = Nil,
    notClearData: Seq[Long] = Nil,
    saturatedData: Seq[Long] = Nil,
    nodata: Long = 255,
    /** bit positions per class for bitwise (Landsat C2) mode */
    bits: Boolean = false,
    saturatedBand: String = "")

/** Collection / cube definition (reference `controller.py:100-240`). */
final case class Collection(
    name: String,
    version: Int,
    grid: String,
    compositeFunction: String,   // CompositeFunction name
    temporalSchema: String,      // Continuous | Cyclic
    temporalUnit: String,        // day | month | year
    temporalStep: Int,
    cycleUnit: String = "",
    cycleStep: Int = 1,
    bands: Seq[Band] = Nil,
    qualityBand: String = "",
    quicklook: Seq[String] = Nil) {
  def identifier: String = s"$name-$version"
}

/** One discovered input asset: a band of a scene on a date
  * (reference `maestro.py:724-749`).
  */
final case class Asset(
    sceneId: String,
    tileId: String,
    date: java.sql.Date,
    band: String,
    uri: String,
    dataset: String = "",
    platform: String = "",
    nodata: Double = 0.0,
    cloudCover: Double = 0.0)

/** Published catalog item: one (cube, tile, period) with per-band asset
  * paths (reference `processing.py:1038-1155`).
  */
final case class Item(
    cube: String,
    tileId: String,
    startDate: java.sql.Date,
    endDate: java.sql.Date,
    assets: Map[String, String],
    cloudCover: Double,
    xmin: Double, ymin: Double, xmax: Double, ymax: Double)

/** Execution-ledger record for idempotent resume (reference
  * `models/activity.py:32-59`).
  */
final case class Activity(
    cube: String,
    tileId: String,
    period: String,
    band: String,
    date: String,
    status: String,   // CREATED | STARTED | SUCCESS | ERROR
    argsJson: String = "",
    traceback: String = "")
