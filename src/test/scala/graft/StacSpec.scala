package graft

import org.apache.spark.sql.functions._
import graft.sources.Stac

class StacSpec extends SparkSpec {

  private def item(id: String, date: String, cloud: Double,
                   bbox: (Double, Double, Double, Double)): String =
    s"""{"id":"$id","collection":"S2_L2A","bbox":[${bbox._1},${bbox._2},${bbox._3},${bbox._4}],
        "properties":{"datetime":"${date}T13:22:29Z","eo:cloud_cover":$cloud,"platform":"sentinel-2a"},
        "assets":{"B04":{"href":"s3://x/$id/B04.tif","type":"image/tiff"},
                  "B8A":{"href":"s3://x/$id/B8A.tif","type":"image/tiff"},
                  "SCL":{"href":"s3://x/$id/SCL.tif","type":"image/tiff"}}}"""
      .replaceAll("\n\\s*", "")

  private lazy val catalog = {
    import spark.implicits._
    Stac.itemsFromJson(Seq(
      item("s1", "2020-01-05", 12.5, (0, 0, 10, 10)),
      item("s2", "2020-01-10", 55.0, (5, 5, 15, 15)),
      item("s3", "2020-02-20", 5.0, (20, 20, 30, 30)),
      "{not valid json").toDF("json"))
  }

  test("STAC item JSON parses to one row per band asset; bad JSON dropped") {
    assert(catalog.count() == 9)
    val r = catalog.filter(col("sceneId") === "s1" && col("band") === "B04").head()
    assert(r.getAs[String]("href") == "s3://x/s1/B04.tif")
    assert(r.getAs[java.sql.Date]("date").toString == "2020-01-05")
    assert(r.getAs[Double]("cloudCover") == 12.5)
  }

  test("search applies bbox, datetime, cloud and band predicates") {
    val hits = Stac.searchAssets(catalog, "S2_L2A", (8, 8, 12, 12),
      "2020-01-01", "2020-01-31", bands = Seq("B04", "B8A"), maxCloudCover = 60)
    val ids = hits.select("sceneId", "band").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    // s3 out of date range+bbox; SCL filtered; s1 and s2 bboxes intersect
    assert(ids.toSeq == Seq(("s1", "B04"), ("s1", "B8A"), ("s2", "B04"), ("s2", "B8A")))
    val cloudy = Stac.searchAssets(catalog, "S2_L2A", (8, 8, 12, 12),
      "2020-01-01", "2020-01-31", maxCloudCover = 20)
    assert(cloudy.select("sceneId").distinct().count() == 1)
  }

  test("M6 empty periods anti-join routes to the empty-raster path") {
    import spark.implicits._
    val periods = Seq(("2020-01-01", "2020-01-16"), ("2020-01-17", "2020-02-01"),
      ("2020-02-02", "2020-02-17")).toDF("p_start", "p_end")
      .select(col("p_start").cast("date"), col("p_end").cast("date"))
    val empty = Stac.emptyPeriods(periods, catalog)
    assert(empty.collect().map(_.getDate(0).toString).toSeq == Seq("2020-01-17", "2020-02-02"))
  }
}
