package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.5/§2.6 catalog-relational operators, exercised over the
  * driver's synthetic tables with DuckDB oracles.
  *
  * Determinism rules used throughout the query surface:
  *  - money sums are emitted as `floor(sum*100 + 0.5)` BIGINTs — inputs have
  *    two decimals, so the true value×100 is an integer and the ±1e-10
  *    float summation-order jitter can never cross the .5 boundary;
  *  - truncating int casts go through `trunc()` on the DuckDB side (its
  *    CAST rounds, Spark's truncates);
  *  - timestamps are emitted as formatted strings;
  *  - every query orders by a unique key prefix.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // C7b — multi-level catalog summaries in ONE pass via ROLLUP
    // (status, priority) → per-pair, per-status, and grand-total rows
    // with the grouping level; Spark expands the sets before the
    // aggregate, so it's still a single shuffle
    "c15_rollup_stats" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("int").as("lvl"),
          count(lit(1)).as("n"),
          floor(sum($"o_totalprice") * 100 + 0.5).cast("long").as("total_x100"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"lvl", $"n", $"total_x100")
        .orderBy($"status", $"priority")
    }),

    // §2.6 — lag/lead navigation: per-customer order gaps and the next
    // order key (the scene-sequence navigation shape)
    "s_window_funcs" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      orders(s, d).filter($"o_custkey" <= 200)
        .select($"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("odate"),
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w))
            .as("gap_prev_days"),
          lead($"o_orderkey", 1).over(w).as("next_key"))
        .orderBy($"o_custkey", $"odate", $"o_orderkey")
    }),

    // §2.6 — pivot: status × priority counts as a crosstab (one shuffle;
    // Spark rewrites pivot to conditional aggregation, same as the oracle)
    "c16_pivot" -> ((s, d) => {
      import s.implicits._
      orders(s, d).groupBy($"o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        // pivot emits NULL for an absent combo; the oracle's count(*)
        // FILTER emits 0 — coalesce so an unpopulated cell can't diverge
        .select($"o_orderstatus".as("status"),
          coalesce(col("1-URGENT"), lit(0L)).as("p1"),
          coalesce(col("2-HIGH"), lit(0L)).as("p2"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("p3"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("p4"),
          coalesce(col("5-LOW"), lit(0L)).as("p5"))
        .orderBy($"status")
    }),

    // C5 — item listing: filter + join + order-by-desc + limit
    "c5_item_listing" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
        .join(customer(s, d), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_x100"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("odate"))
        .orderBy(desc("odate"), desc("o_orderkey"))
        .limit(100)
    }),

    // C6 — distinct keys of a filtered fact, semi-joined to its dimension
    "c6_distinct_semi" -> ((s, d) => {
      import s.implicits._
      lineitem(s, d).filter($"l_quantity" > 45)
        .select($"l_partkey").distinct()
        .join(part(s, d), $"l_partkey" === $"p_partkey")
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    }),

    // C7 — status/date statistics (min/max/count aggregation)
    "c7_status_stats" -> ((s, d) => {
      import s.implicits._
      orders(s, d).groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd").as("dmin"),
          date_format(max($"o_orderdate"), "yyyy-MM-dd").as("dmax"),
          floor(sum($"o_totalprice") * 100 + 0.5).cast("long").as("total_x100"))
        .orderBy($"o_orderstatus")
    }),

    // C3 — missing-timeline set difference: expected (cust × month) minus
    // observed order months; the cube-summarize "missing periods" shape
    "c3_missing_months" -> ((s, d) => {
      import s.implicits._
      val custs = customer(s, d).filter($"c_custkey" <= 200).select($"c_custkey")
      val months = s.range(1, 13).select($"id".cast("int").as("month"))
      val actual = orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
                $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
        .select($"o_custkey", month($"o_orderdate").as("month"))
        .distinct()
      custs.crossJoin(broadcast(months))
        .join(actual,
          custs("c_custkey") === actual("o_custkey") && months("month") === actual("month"),
          "left_anti")
        .orderBy($"c_custkey", $"month")
    }),

    // C1 — upsert (insert-if-absent by key): existing ∪ (incoming ∖ existing)
    "c1_upsert" -> ((s, d) => {
      import s.implicits._
      val existing = supplier(s, d).select($"s_suppkey", $"s_name")
      val incoming = part(s, d).filter($"p_partkey" <= 50)
        .select(($"p_partkey" * 3).as("s_suppkey"),
          concat(lit("NEW Supplier#"), ($"p_partkey" * 3).cast("string")).as("s_name"))
      existing.unionByName(
        incoming.join(existing.select($"s_suppkey"), Seq("s_suppkey"), "left_anti"))
        .orderBy($"s_suppkey", $"s_name")
    }),

    // C8 — explode (generator) + group-by: word frequencies over documents
    "c8_explode_audit" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(explode(split(trim($"text"), " +")).as("word"))
        .filter($"word" =!= "")
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"word")
        .limit(20)
    }),

    // C9 — lineage walk: customer → nation → region chained (broadcast) joins
    "c9_lineage_walk" -> ((s, d) => {
      import s.implicits._
      customer(s, d)
        .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name").agg(count(lit(1)).as("customers"))
        .orderBy($"r_name", $"n_name")
    }),

    // C10 — LIKE / IN listing filters
    "c10_like_filter" -> ((s, d) => {
      import s.implicits._
      part(s, d)
        .filter($"p_name".like("%widget%") && $"p_size".isin(5, 10, 15, 20))
        .select($"p_partkey", $"p_name", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    }),

    // §2.6 — top-k by sort with unique tiebreak
    "s_topk_orders" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .orderBy(desc("o_totalprice"), $"o_orderkey")
        .select($"o_orderkey",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_x100"))
        .limit(10)
    }),

    // §2.6 — pagination (limit/offset)
    "s_pagination" -> ((s, d) => {
      import s.implicits._
      customer(s, d).select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
        .offset(100).limit(50)
    }),

    // §2.6 — set difference: active-in-Jan-1994 minus active-in-Feb-1994
    "s_set_except" -> ((s, d) => {
      import s.implicits._
      def active(lo: String, hi: String) = orders(s, d)
        .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
                $"o_orderdate" < lit(hi).cast("timestamp"))
        .select($"o_custkey")
      active("1994-01-01", "1994-02-01")
        .except(active("1994-02-01", "1994-03-01"))
        .orderBy($"o_custkey")
    }),

    // events relational slice: regex k-extraction from props + group stats
    "c8_props_extract" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .select($"event_type",
          regexp_extract($"props", "([0-9]+)", 1).cast("long").as("k"),
          $"value")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("k_sum"),
          floor(sum($"value") * 100 + 0.5).cast("long").as("value_x100"))
        .orderBy($"event_type")
    }))

  val oracles: Map[String, String] = Map(
    "s_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS odate,
         CAST(date_diff('day',
           lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS INT) AS gap_prev_days,
         lead(o_orderkey, 1) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS next_key
         FROM orders WHERE o_custkey <= 200
         ORDER BY o_custkey, odate, o_orderkey""",
    "c16_pivot" ->
      """SELECT o_orderstatus AS status,
         count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
         count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
         count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
         count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
         count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
         FROM orders GROUP BY o_orderstatus ORDER BY status""",
    "c15_rollup_stats" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS lvl,
         count(*) AS n,
         CAST(floor(sum(o_totalprice)*100 + 0.5) AS BIGINT) AS total_x100
         FROM orders
         GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "c5_item_listing" ->
      """SELECT o_orderkey, c_name,
         CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_x100,
         strftime(o_orderdate, '%Y-%m-%d') AS odate
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1996-01-01'
         ORDER BY odate DESC, o_orderkey DESC LIMIT 100""",
    "c6_distinct_semi" ->
      """SELECT p_partkey, p_name FROM part
         WHERE p_partkey IN (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 45)
         ORDER BY p_partkey""",
    "c7_status_stats" ->
      """SELECT o_orderstatus, count(*) AS n,
         strftime(min(o_orderdate), '%Y-%m-%d') AS dmin,
         strftime(max(o_orderdate), '%Y-%m-%d') AS dmax,
         CAST(floor(sum(o_totalprice)*100 + 0.5) AS BIGINT) AS total_x100
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "c3_missing_months" ->
      """SELECT c_custkey, CAST(m AS INT) AS month
         FROM customer, range(1, 13) t(m)
         WHERE c_custkey <= 200 AND NOT EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1996-01-01'
             AND CAST(strftime(o_orderdate, '%m') AS INT) = m)
         ORDER BY c_custkey, month""",
    "c1_upsert" ->
      """SELECT s_suppkey, s_name FROM supplier
         UNION ALL
         SELECT p_partkey*3 AS s_suppkey,
                'NEW Supplier#' || CAST(p_partkey*3 AS VARCHAR) AS s_name
         FROM part WHERE p_partkey <= 50
           AND NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = p_partkey*3)
         ORDER BY s_suppkey, s_name""",
    "c8_explode_audit" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS word FROM documents)
         WHERE word <> ''
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "c9_lineage_walk" ->
      """SELECT r_name, n_name, count(*) AS customers
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "c10_like_filter" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
         WHERE p_name LIKE '%widget%' AND p_size IN (5, 10, 15, 20)
         ORDER BY p_partkey""",
    "s_topk_orders" ->
      """SELECT o_orderkey, CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_x100
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "s_pagination" ->
      """SELECT c_custkey, c_name FROM customer
         ORDER BY c_custkey LIMIT 50 OFFSET 100""",
    "s_set_except" ->
      """SELECT o_custkey FROM (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1994-02-01'
           EXCEPT
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1994-02-01' AND o_orderdate < TIMESTAMP '1994-03-01')
         ORDER BY o_custkey""",
    "c8_props_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
         CAST(floor(sum(value)*100 + 0.5) AS BIGINT) AS value_x100
         FROM events GROUP BY event_type ORDER BY event_type""")
}
