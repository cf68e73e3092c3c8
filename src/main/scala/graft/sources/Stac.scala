package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — STAC-style asset catalog (reference `maestro.py:630-753`,
  * `clients/_adapter.py:76-201`).
  *
  * Scene discovery is modeled as a DataFrame over STAC item documents:
  * `itemsFromJson` parses the item JSON (`from_json` + `explode` of the
  * assets map — the reference's band→date→dataset regrouping), and
  * `searchAssets` applies the spatio-temporal predicates
  * (bbox-intersects + datetime range + cloud-cover ceiling + collection).
  * Against a parquet-backed catalog these predicates push down to the scan
  * (partition pruning on collection/date when so partitioned); a live STAC
  * endpoint would wrap the same schema behind a DSv2 reader with
  * `SupportsPushDownFilters` — same query surface either way.
  */
object Stac {

  /** Minimal STAC item schema: the fields the reference consumes. */
  val itemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("collection", StringType),
    StructField("bbox", ArrayType(DoubleType)),
    StructField("properties", StructType(Seq(
      StructField("datetime", StringType),
      StructField("eo:cloud_cover", DoubleType),
      StructField("platform", StringType)))),
    StructField("assets", MapType(StringType, StructType(Seq(
      StructField("href", StringType),
      StructField("type", StringType)))))))

  /** Parse raw STAC item JSON documents into one row per (item, band asset):
    * `(sceneId, collection, platform, date, cloudCover, xmin, ymin, xmax,
    * ymax, band, href)`.
    */
  def itemsFromJson(items: DataFrame, jsonCol: String = "json"): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(from_json(col(jsonCol), itemSchema).as("it"))
      .filter($"it.id".isNotNull)
      .select(
        $"it.id".as("sceneId"),
        $"it.collection".as("collection"),
        $"it.properties.platform".as("platform"),
        to_date(substring($"it.properties.datetime", 1, 10)).as("date"),
        coalesce($"it.properties.`eo:cloud_cover`", lit(0.0)).as("cloudCover"),
        element_at($"it.bbox", 1).as("xmin"),
        element_at($"it.bbox", 2).as("ymin"),
        element_at($"it.bbox", 3).as("xmax"),
        element_at($"it.bbox", 4).as("ymax"),
        explode($"it.assets").as(Seq("band", "asset")))
      .select($"sceneId", $"collection", $"platform", $"date", $"cloudCover",
        $"xmin", $"ymin", $"xmax", $"ymax", $"band", $"asset.href".as("href"))
  }

  /** Spatio-temporal asset search: the reference's `search_images`
    * predicate set. All plain Column predicates — pushdown-eligible.
    */
  def searchAssets(catalog: DataFrame,
                   collection: String,
                   bbox: (Double, Double, Double, Double),
                   startDate: String, endDate: String,
                   bands: Seq[String] = Nil,
                   maxCloudCover: Double = 100.0): DataFrame = {
    val (xmin, ymin, xmax, ymax) = bbox
    val c = catalog
      .filter(col("collection") === collection)
      .filter(col("date") >= lit(startDate).cast("date") &&
        col("date") <= lit(endDate).cast("date"))
      .filter(col("cloudCover") <= maxCloudCover)
      // axis-aligned bbox intersection (reference geometries are boxes)
      .filter(col("xmin") < xmax && col("xmax") > xmin &&
        col("ymin") < ymax && col("ymax") > ymin)
    if (bands.isEmpty) c else c.filter(col("band").isin(bands: _*))
  }

  /** M6 — empty-period detection: periods with no discovered assets
    * (left anti-join); these route to the S10 empty-raster generator.
    */
  def emptyPeriods(periods: DataFrame, assets: DataFrame): DataFrame =
    periods.join(assets,
      assets("date") >= periods("p_start") && assets("date") <= periods("p_end"),
      "left_anti")
}
