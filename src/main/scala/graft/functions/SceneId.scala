package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scene-identifier parsers (SURVEY §2.7; reference
  * `sentinel/sentinel2.py:254-295`, `landsat/landsat.py:46-53`,
  * `maestro.py:756-777`): regex decomposition of platform scene ids into
  * typed columns.
  */
object SceneId {

  /** Landsat C2: `LC08_L2SP_223064_20200105_20200113_02_T1` →
    * (platform, level, path, row, acquired).
    */
  def parseLandsat(id: Column): Column = {
    val re = "^(L[A-Z][0-9]{2})_([A-Z0-9]+)_([0-9]{3})([0-9]{3})_([0-9]{8})_"
    struct(
      regexp_extract(id, re, 1).as("platform"),
      regexp_extract(id, re, 2).as("level"),
      regexp_extract(id, re, 3).cast("int").as("path"),
      regexp_extract(id, re, 4).cast("int").as("row"),
      try_to_date(regexp_extract(id, re, 5), "yyyyMMdd").as("acquired"))
  }

  /** Sentinel-2: `S2A_MSIL2A_20200105T132229_N0213_R038_T22JBM_20200105T153508`
    * → (platform, level, acquired, baseline, orbit, tile).
    */
  def parseSentinel2(id: Column): Column = {
    val re = "^(S2[AB])_MSI(L[0-9A-C]+)_([0-9]{8})T[0-9]{6}_N([0-9]{4})_R([0-9]{3})_T([0-9A-Z]{5})"
    struct(
      regexp_extract(id, re, 1).as("platform"),
      regexp_extract(id, re, 2).as("level"),
      try_to_date(regexp_extract(id, re, 3), "yyyyMMdd").as("acquired"),
      regexp_extract(id, re, 4).cast("int").as("baseline"),
      regexp_extract(id, re, 5).cast("int").as("orbit"),
      regexp_extract(id, re, 6).as("tile"))
  }

  /** CBERS-4/4A: `CBERS_4_MUX_20200105_159_099_L4` →
    * (satellite, sensor, acquired, path, row, level).
    */
  def parseCbers(id: Column): Column = {
    val re = "^(CBERS_[0-9A-Z]+)_([A-Z0-9]+)_([0-9]{8})_([0-9]{3})_([0-9]{3})_(L[0-9A-Z]+)"
    struct(
      regexp_extract(id, re, 1).as("satellite"),
      regexp_extract(id, re, 2).as("sensor"),
      try_to_date(regexp_extract(id, re, 3), "yyyyMMdd").as("acquired"),
      regexp_extract(id, re, 4).cast("int").as("path"),
      regexp_extract(id, re, 5).cast("int").as("row"),
      regexp_extract(id, re, 6).as("level"))
  }

  /** Dispatch by id shape; returns (kind, platform, acquired, tile). */
  def parseAny(id: Column): Column = {
    val landsat = parseLandsat(id)
    val s2 = parseSentinel2(id)
    val cbers = parseCbers(id)
    when(id.startsWith("S2"),
      struct(lit("sentinel2").as("kind"), s2.getField("platform").as("platform"),
        s2.getField("acquired").as("acquired"), s2.getField("tile").as("tile")))
      .when(id.startsWith("CBERS"),
        struct(lit("cbers").as("kind"), cbers.getField("satellite").as("platform"),
          cbers.getField("acquired").as("acquired"),
          concat(cbers.getField("path"), lit("_"), cbers.getField("row")).as("tile")))
      .otherwise(
        struct(lit("landsat").as("kind"), landsat.getField("platform").as("platform"),
          landsat.getField("acquired").as("acquired"),
          concat(landsat.getField("path"), lit("_"), landsat.getField("row")).as("tile")))
  }
}
