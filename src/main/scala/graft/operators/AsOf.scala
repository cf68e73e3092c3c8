package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * `r.ts <= l.ts` on the same key (the point-in-time lookup of feature
  * stores and slowly-changing catalogs).
  *
  * Spark has no native as-of join; the naive encoding — a range
  * theta-join followed by a per-left-row argmax — explodes to
  * O(|L| · matches) intermediate rows and usually degrades to a
  * broadcast-nested-loop. This operator instead UNIONS the two sides,
  * tags them, and runs one window pass per key ordered by (ts, side):
  * a running `last(right value, ignoreNulls)` carries each right row
  * forward to every later left row. One shuffle on the key, no
  * row-pair explosion, state bounded by the window frame — the shape
  * that survives 100 TB. Right rows must be unique per (key, ts);
  * pre-aggregate if they are not (the gate query does).
  *
  * Ordering at equal timestamps puts the right row first, so a right
  * row AT `l.ts` is visible to that left row — matching DuckDB's
  * `ASOF JOIN ... ON r.ts <= l.ts` inclusive semantics.
  */
object AsOf {

  /** @param left      rows to annotate (must carry `keyCol` and `tsCol`)
    * @param right     lookup rows (must carry `keyCol`, `tsCol`, and
    *                  `valueCols`)
    * @param keyCol    equi-join key column name
    * @param tsCol     event-time column name (any orderable type)
    * @param valueCols right columns carried onto each left row, null
    *                  when the key has no right row at or before `ts`
    *                  (emitted as `asof_<name>`, plus `asof_ts`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // reserved internal plumbing + emitted output names: a caller column
    // with one of these names would be silently clobbered or duplicated
    val reserved = Set("__side", "__row", "__asof", "asof_ts") ++
      valueCols.map(c => s"asof_$c")
    val clash = (leftCols ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin: input column(s) ${clash.distinct.mkString(", ")} collide " +
        s"with reserved internal/output names (${reserved.mkString(", ")}); " +
        "rename them before the join")
    val l = left.withColumn("__side", lit(1))
    // the whole matched row rides as ONE struct: the struct itself is
    // non-null for every right row, so the ignoreNulls carry-forward
    // always takes the latest matched ROW — a null value INSIDE it stays
    // null (carrying columns separately would backfill a null value from
    // an older right row and mix columns across rows)
    val r = right.select(
        col(keyCol), col(tsCol),
        struct((col(tsCol).as("__ts") +: valueCols.map(col)): _*).as("__row"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = unioned.withColumn("__asof",
      last(col("__row"), ignoreNulls = true).over(w))
    val outCols = (leftCols.map(col) :+ col("__asof.__ts").as("asof_ts")) ++
      valueCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    withCarry.filter(col("__side") === 1).select(outCols.toSeq: _*)
  }

  /** Convenience: carry a single value column. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String): DataFrame =
    asofJoin(left, right, keyCol, tsCol, Seq(valueCol))
}
