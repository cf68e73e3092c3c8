package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T10 — histogram matching (reference `image.py:195-246`, skimage
  * `match_histograms`): remap each source value so the source CDF matches
  * the reference CDF, per group key.
  *
  * Distributed shape (SURVEY §2.4): per (key, value) counts → windowed
  * cumulative sums give both CDFs; a single sort-merge pass (union +
  * running last/next reference quantile) brackets every source quantile,
  * and linear interpolation between the brackets reproduces
  * `numpy.interp(src_quantiles, ref_quantiles, ref_values)`. No
  * driver-side collect; the shuffle key is the group key, so each group's
  * quantile table builds within one partition.
  */
object HistogramMatch {

  /** Build the value→matched-value lookup per key.
    *
    * @param src (key, value) rows of the raster to transform
    * @param ref (key, value) rows of the reference raster
    * @return (key, value, matched: double) mapping table
    */
  def mappingTable(src: DataFrame, ref: DataFrame,
                   keyCol: String = "key", valueCol: String = "value"): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._

    def cdf(df: DataFrame): DataFrame = {
      val k = col(keyCol)
      val counts = df.groupBy(k, col(valueCol)).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(k).orderBy(col(valueCol))
      val tot = Window.partitionBy(k)
      counts.select(k, col(valueCol),
        (sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          sum($"cnt").over(tot)).as("cdf"))
    }

    val s = cdf(src).select(col(keyCol), col(valueCol).as("v"), $"cdf",
      lit(1).as("is_src"))
    val r = cdf(ref).select(col(keyCol), col(valueCol).as("v"), $"cdf",
      lit(0).as("is_src"))
    val all = s.unionByName(r)

    // bracket each source quantile with the nearest reference quantiles:
    // running last ref at-or-below (by cdf order), and next ref at-or-above
    val ord = Window.partitionBy(col(keyCol))
      .orderBy($"cdf", $"is_src") // ref first on cdf ties → exact match wins
    val refPoint = when($"is_src" === 0, struct($"cdf".as("c"), $"v".as("rv")))
    val lo = last(refPoint, ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    // The unbounded-FOLLOWING frame is O(rows²) per partition (Spark
    // re-scans the tail per row) — acceptable ONLY because a partition
    // here is a value histogram, bounded by the sample grid (≤256 rows
    // for byte imagery), not corpus-sized. On unbounded partitions use
    // a running frame over the reversed ordering (see f_interpolate).
    val hi = first(refPoint, ignoreNulls = true)
      .over(ord.rowsBetween(0, Window.unboundedFollowing))

    all.select(col(keyCol), $"v", $"cdf", $"is_src", lo.as("lo"), hi.as("hi"))
      .filter($"is_src" === 1)
      .select(col(keyCol), $"v".as(valueCol),
        when($"lo".isNull, $"hi.rv")
          .when($"hi".isNull, $"lo.rv")
          .when($"hi.c" === $"lo.c", $"lo.rv".cast("double"))
          .otherwise($"lo.rv" +
            ($"cdf" - $"lo.c") / ($"hi.c" - $"lo.c") * ($"hi.rv" - $"lo.rv"))
          .as("matched"))
  }

  /** Apply histogram matching to `src` rows, returning matched values. */
  def apply(src: DataFrame, ref: DataFrame,
            keyCol: String = "key", valueCol: String = "value"): DataFrame = {
    val table = mappingTable(src, ref, keyCol, valueCol)
    src.join(table, Seq(keyCol, valueCol)).withColumnRenamed("matched", "value_matched")
  }

  /** T10 as used by prepare-blend (reference `tasks.py:368-385`): match
    * every scene-date of a (tile, band) group to the group's reference
    * scene. `src` rows are (groupCols..., sceneCol, value); `ref` rows are
    * (groupCols..., value) — the reference CDF is built once per group and
    * bracket-joined against all scene CDFs in a single sort-merge pass.
    *
    * Inputs may carry a pre-aggregated weight column `cnt` (one row per
    * distinct value with its occurrence count) — the CDFs then sum the
    * weights instead of counting rows, so callers can collapse O(pixels)
    * to O(distinct values) BEFORE this shuffle (see
    * [[graft.cube.CubeBuilder.histogramMatchScenes]]).
    *
    * Returns (groupCols..., sceneCol, value, matched).
    */
  def matchToReference(src: DataFrame, ref: DataFrame,
                       groupCols: Seq[String], sceneCol: String,
                       valueCol: String = "value"): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    def cntAgg(df: DataFrame): Column =
      if (df.columns.contains("cnt")) sum(col("cnt")) else count(lit(1))

    val srcCdf = {
      val counts = src.groupBy((g :+ col(sceneCol) :+ col(valueCol)): _*)
        .agg(cntAgg(src).as("cnt"))
      val w = Window.partitionBy((g :+ col(sceneCol)): _*).orderBy(col(valueCol))
      val tot = Window.partitionBy((g :+ col(sceneCol)): _*)
      counts.select((g :+ col(sceneCol) :+ col(valueCol).as("v") :+
        (sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          sum($"cnt").over(tot)).as("cdf")): _*)
    }
    val refCdf = {
      val counts = ref.groupBy((g :+ col(valueCol)): _*)
        .agg(cntAgg(ref).as("cnt"))
      val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
      val tot = Window.partitionBy(g: _*)
      counts.select((g :+ col(valueCol).as("v") :+
        (sum($"cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)) /
          sum($"cnt").over(tot)).as("cdf")): _*)
    }

    val s = srcCdf.withColumn("is_src", lit(1))
    val r = refCdf.withColumn(sceneCol, lit(null).cast(srcCdf.schema(sceneCol).dataType))
      .withColumn("is_src", lit(0))
      .select(s.columns.toIndexedSeq.map(col): _*)
    val all = s.unionByName(r)

    val ord = Window.partitionBy(g: _*).orderBy($"cdf", $"is_src")
    val refPoint = when($"is_src" === 0, struct($"cdf".as("c"), $"v".as("rv")))
    val lo = last(refPoint, ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, 0))
    // The unbounded-FOLLOWING frame is O(rows²) per partition (Spark
    // re-scans the tail per row) — acceptable ONLY because a partition
    // here is a value histogram, bounded by the sample grid (≤256 rows
    // for byte imagery), not corpus-sized. On unbounded partitions use
    // a running frame over the reversed ordering (see f_interpolate).
    val hi = first(refPoint, ignoreNulls = true)
      .over(ord.rowsBetween(0, Window.unboundedFollowing))

    all.select((g :+ col(sceneCol) :+ $"v" :+ $"cdf" :+ $"is_src" :+
      lo.as("lo") :+ hi.as("hi")): _*)
      .filter($"is_src" === 1)
      .select((g :+ col(sceneCol) :+ $"v".as(valueCol) :+
        when($"lo".isNull, $"hi.rv")
          .when($"hi".isNull, $"lo.rv")
          .when($"hi.c" === $"lo.c", $"lo.rv".cast("double"))
          .otherwise($"lo.rv" +
            ($"cdf" - $"lo.c") / ($"hi.c" - $"lo.c") * ($"hi.rv" - $"lo.rv"))
          .as("matched")): _*)
  }
}
