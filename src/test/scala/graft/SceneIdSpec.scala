package graft

import org.apache.spark.sql.functions._
import graft.functions.SceneId

class SceneIdSpec extends SparkSpec {

  test("Landsat C2 scene id parses") {
    import spark.implicits._
    val r = Seq("LC08_L2SP_223064_20200105_20200113_02_T1").toDF("id")
      .select(SceneId.parseLandsat($"id").as("p")).select("p.*").head()
    assert(r.getString(0) == "LC08" && r.getString(1) == "L2SP")
    assert(r.getInt(2) == 223 && r.getInt(3) == 64)
    assert(r.getDate(4).toString == "2020-01-05")
  }

  test("Sentinel-2 scene id parses incl. processing baseline") {
    import spark.implicits._
    val r = Seq("S2A_MSIL2A_20200105T132229_N0213_R038_T22JBM_20200105T153508")
      .toDF("id").select(SceneId.parseSentinel2($"id").as("p")).select("p.*").head()
    assert(r.getString(0) == "S2A" && r.getString(1) == "L2A")
    assert(r.getDate(2).toString == "2020-01-05")
    assert(r.getInt(3) == 213 && r.getInt(4) == 38 && r.getString(5) == "22JBM")
  }

  test("CBERS scene id parses") {
    import spark.implicits._
    val r = Seq("CBERS_4_MUX_20200105_159_099_L4").toDF("id")
      .select(SceneId.parseCbers($"id").as("p")).select("p.*").head()
    assert(r.getString(0) == "CBERS_4" && r.getString(1) == "MUX")
    assert(r.getInt(3) == 159 && r.getInt(4) == 99 && r.getString(5) == "L4")
  }

  test("dispatch by shape") {
    import spark.implicits._
    val kinds = Seq(
      "S2A_MSIL2A_20200105T132229_N0213_R038_T22JBM_20200105T153508",
      "LC08_L2SP_223064_20200105_20200113_02_T1",
      "CBERS_4_MUX_20200105_159_099_L4").toDF("id")
      .select(SceneId.parseAny($"id").getField("kind")).collect().map(_.getString(0))
    assert(kinds.toSeq == Seq("sentinel2", "landsat", "cbers"))
  }
}
