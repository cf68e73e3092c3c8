package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation and data-layout operators (round 10): retention-policy
  * dedup, link-graph ranking, sketch-based heavy hitters, deterministic
  * train/val/test splits, Z-order layout indexing, and per-file
  * data-skipping stats — the curation/layout layer of a 100 TB
  * training-data pipeline, each with an independent DuckDB oracle.
  *
  * Shared discipline with [[Pipeline]]: every score/hash is engine-portable
  * (md5 hex, integer arithmetic, explicit scaling) so the oracle replays
  * results exactly; every aggregation is partial-aggregable (no global
  * window over raw rows on the scale path).
  */
object Curation {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private def words(text: Column): Column = split(trim(text), " +")

  /** 16-bit Morton (Z-order) interleave of the low 8 bits of two long
    * columns: bit j of x lands at position 2j, bit j of y at 2j+1. Pure
    * integer bit arithmetic (shift/mask/add with disjoint bits), fully
    * inside whole-stage codegen — the clustering key used to co-locate
    * multi-dimensional ranges so min/max file stats can skip on BOTH
    * dimensions (the layout step a 100 TB table needs before c17-style
    * stats become selective).
    */
  def zorder16(x: Column, y: Column): Column = {
    val xb = x % 256
    val yb = y % 256
    (0 until 8).map { j =>
      shiftleft(shiftright(xb, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(yb, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** Fixed-iteration integer PageRank over the deterministic synthetic
    * link graph dst = (v² + 37k) mod N, k = 1..3 (quadratic dst map →
    * non-uniform in-degrees → ranks actually spread; a linear map is a
    * bijection per k and every rank stays identical). Ranks are ×1e6
    * longs; damping 0.85 as `85·x div 100`, contributions as
    * `rank div 3` (out-degree is exactly 3) — order-free integer sums,
    * so a SQL oracle replays every value exactly. Each iteration is one
    * hash equi-join ranks⋈edges on src + a partial-aggregable sum per
    * dst — the canonical distributed PageRank step; iterations unroll
    * into ONE lazy plan (the v_kmeans pattern; a many-iteration
    * production run would localCheckpoint per round as
    * operators/Components does).
    */
  def pagerank(docs0: DataFrame, iters: Int): DataFrame = {
    import docs0.sparkSession.implicits._
    val docs = docs0.select($"doc_id")
    val nRow = docs.agg(count(lit(1)).as("n"))
    // every iteration joins the edge list — materialize it once instead
    // of re-deriving the count + explode per round (the hits() twin
    // already does this)
    val edges = docs.crossJoin(broadcast(nRow))
      .select($"doc_id".as("src"), explode(array(
        ($"doc_id" * $"doc_id" + 37) % $"n",
        ($"doc_id" * $"doc_id" + 74) % $"n",
        ($"doc_id" * $"doc_id" + 111) % $"n")).as("dst"))
      .localCheckpoint(false)
    var ranks = docs.select($"doc_id", lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val insum = edges.join(ranks, edges("src") === ranks("doc_id"))
        .groupBy($"dst").agg(sum(expr("r div 3")).as("m"))
      ranks = docs.join(insum, docs("doc_id") === insum("dst"), "left")
        .select(docs("doc_id"),
          (lit(150000L) + expr("(85 * coalesce(m, 0L)) div 100")).as("r"))
    }
    ranks.select($"doc_id", $"r".as("rank_x1e6"))
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) over the same directed
    * synthetic link graph as [[pagerank]], `iters` full a←h, h←a rounds.
    * Integer arithmetic throughout: scores start at 1e6 and renormalize
    * each half-step by the 1-row broadcast max (score·1e6 div max), so
    * both engines replay bit-for-bit and values never exceed 3e12. Every
    * half-step is one equi-join + partial-aggregable sum — the same
    * scale shape as the pagerank rounds; intermediate frames checkpoint
    * lazily so closed rounds never replay.
    */
  def hits(docs0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"hits needs at least one a←h round, got $iters")
    import docs0.sparkSession.implicits._
    val docs = docs0.select($"doc_id")
    val nRow = docs.agg(count(lit(1)).as("n"))
    val edges = docs.crossJoin(broadcast(nRow))
      .select($"doc_id".as("src"), explode(array(
        ($"doc_id" * $"doc_id" + 37) % $"n",
        ($"doc_id" * $"doc_id" + 74) % $"n",
        ($"doc_id" * $"doc_id" + 111) % $"n")).as("dst"))
      .localCheckpoint(false)
    var hub = docs.select($"doc_id", lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val aSum = edges.join(hub, edges("src") === hub("doc_id"))
        .groupBy($"dst").agg(sum($"h").as("a0"))
      val aMax = aSum.agg(max($"a0").as("am"))
      auth = docs.join(aSum, docs("doc_id") === aSum("dst"), "left")
        .crossJoin(broadcast(aMax))
        .select(docs("doc_id"),
          expr("coalesce(a0, cast(0 as bigint)) * 1000000 div am").as("a"))
        .localCheckpoint(false)
      val hSum = edges.join(auth, edges("dst") === auth("doc_id"))
        .groupBy($"src").agg(sum($"a").as("h0"))
      val hMax = hSum.agg(max($"h0").as("hm"))
      hub = docs.join(hSum, docs("doc_id") === hSum("src"), "left")
        .crossJoin(broadcast(hMax))
        .select(docs("doc_id"),
          expr("coalesce(h0, cast(0 as bigint)) * 1000000 div hm").as("h"))
        .localCheckpoint(false)
    }
    auth.join(hub, "doc_id")
      .select($"doc_id", $"a".as("auth_x1e6"), $"h".as("hub_x1e6"))
  }

  /** 16-bit Hilbert-curve index of the low 8 bits of two long columns —
    * the second space-filling curve (better locality than Morton: every
    * unit step on the curve is a unit step in (x, y), so bucket ranges
    * are more compact rectangles). The classic xy2d bit-level fold
    * unrolled into 8 rounds of pure integer CASE arithmetic (no XOR —
    * the quadrant map is a 4-way CASE both engines evaluate
    * identically), fully inside whole-stage codegen. Verified against
    * an independent d2xy inverse in CurationSpec (forward∘inverse = id
    * + unit-step adjacency).
    */
  def withHilbert16(df: DataFrame, x0: Column, y0: Column,
                    out: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Each round MATERIALIZES (x, y, d) as a projection before the next
    // round reads them — a naive Column fold would substitute x and y
    // into four places per round and blow the expression tree up 4^8
    // (analyzer OOM, measured); the projection chain keeps the plan
    // linear and CollapseProject leaves multi-referenced non-cheap
    // aliases alone.
    var cur = df.withColumn("_hx", x0 % 256).withColumn("_hy", y0 % 256)
      .withColumn(out, lit(0L))
    for (i <- 7 to 0 by -1) {
      val s = 1L << i
      val x = col("_hx")
      val y = col("_hy")
      val rx = when((x / s).cast("long") % 2 === 1, lit(1L)).otherwise(lit(0L))
      val ry = when((y / s).cast("long") % 2 === 1, lit(1L)).otherwise(lit(0L))
      val q = when(rx === 0 && ry === 0, lit(0L))
        .when(rx === 0 && ry === 1, lit(1L))
        .when(rx === 1 && ry === 1, lit(2L))
        .otherwise(lit(3L))
      cur = cur
        .withColumn(out, col(out) + lit(s * s) * q)
        .withColumn("_nx",
          when(ry === 0, when(rx === 1, lit(255L) - y).otherwise(y))
            .otherwise(x))
        .withColumn("_ny",
          when(ry === 0, when(rx === 1, lit(255L) - x).otherwise(x))
            .otherwise(y))
        .drop("_hx", "_hy")
        .withColumnRenamed("_nx", "_hx")
        .withColumnRenamed("_ny", "_hy")
    }
    cur.drop("_hx", "_hy")
  }

  /** Z-order layout rewrite: range-partition by the Morton key and sort
    * within partitions, so each output file covers a compact Z-range
    * (= a small rectangle in (x, y) space). `repartitionByRange` samples
    * range bounds — the same exchange a CLUSTER BY writes through — and
    * the within-partition sort is the last narrow step before a writer.
    * PlanQualitySpec pins the RangePartitioning exchange.
    */
  def zorderLayout(df: DataFrame, x: Column, y: Column,
                   partitions: Int): DataFrame =
    df.withColumn("z16", zorder16(x, y))
      .repartitionByRange(partitions, col("z16"))
      .sortWithinPartitions(col("z16"))

  /** Count-min-sketch cells over a token column: d=4 md5-hash rows ×
    * w=1024 slots, built explode→partial-agg so map-side combine
    * collapses each task's contribution to ≤4096 (i, slot) cells before
    * the exchange — at any corpus size the shuffle carries sketch cells,
    * never tokens (ScaleSpec pins the byte count ~flat at 10× corpus).
    * Returns (i, slot, slot_cnt).
    */
  def cmsCells(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks.select(explode(array((0 until 4).map(i =>
        struct(lit(i).as("i"), cmsSlot(i, $"token").as("slot"))): _*)).as("p"))
      .groupBy($"p.i".as("i"), $"p.slot".as("slot"))
      .agg(count(lit(1)).as("slot_cnt"))
  }

  private def cmsSlot(i: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"$i:"), tok).cast("binary")), 1, 5),
      16, 10).cast("long") % 1024

  val queries: Map[String, Q] = Map(

    // Retention-policy dedup: prefix near-dup groups (md5 of the first 16
    // normalized words — the cheap "same boilerplate head" clustering) keep
    // their highest-quality member, quality = word count, ties to the
    // smallest doc_id. The keeper is resolved by max(struct(n_words,
    // -doc_id)) — a partial-aggregable argmax that combines map-side, NOT
    // a row_number window (which would shuffle-sort the whole corpus per
    // group). At 100 TB this is one hash-shuffle of (fp, 16-byte struct).
    "d_prefix_keep_best" -> ((s, d) => {
      import s.implicits._
      val f = documents(s, d).filter(length(trim($"text")) > 0)
        .select($"doc_id",
          words(lower(regexp_replace($"text", " +", " "))).as("w"))
        .select($"doc_id", size($"w").cast("long").as("n_words"),
          md5(concat_ws(" ", slice($"w", 1, 16)).cast("binary")).as("fp"))
      f.groupBy($"fp")
        .agg(count(lit(1)).as("group_size"),
          max(struct($"n_words", (-$"doc_id").as("neg_id"))).as("best"))
        .select($"fp", $"group_size",
          (-$"best.neg_id").as("kept_doc"),
          $"best.n_words".as("kept_words"),
          ($"group_size" - 1).as("dropped"))
        .orderBy($"kept_doc")
    }),

    // Fixed-3-iteration integer PageRank — see [[pagerank]].
    "v_pagerank" -> ((s, d) => {
      import s.implicits._
      pagerank(documents(s, d), iters = 3).orderBy($"doc_id")
    }),

    // HITS hubs & authorities, 2 full rounds — see [[hits]]. PageRank's
    // eigenvector twin for the link-graph suite: authority mass flows
    // along in-links, hub mass along out-links, renormalized by the
    // broadcast max each half-step.
    "v_hits" -> ((s, d) => {
      import s.implicits._
      hits(documents(s, d), iters = 2).orderBy($"doc_id")
    }),

    // Heavy hitters with a count-min sketch check: the CMS (4 hash rows ×
    // 1024 slots, md5-derived) is built as explode→partial-agg — map-side
    // combine collapses each partition to ≤4096 (i, slot) groups before the
    // exchange, so at 100 TB the shuffle carries sketch cells, not tokens.
    // The top-20 exact tokens are then probed against the sketch and the
    // CMS guarantee (est ≥ exact, over-count bounded by collision mass) is
    // pinned as cms_ok = 1 — the honest accuracy gate for the sketch path.
    "x_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // fanOutScan + checkpoint: THREE consumers (total, CMS cells, exact
      // top-20) re-ran the tokenize+explode off a one-split scan —
      // spread it and materialize the token column once
      val toks = graft.operators.Scale.fanOutScan(
          documents(s, d).filter(length(trim($"text")) > 0))
        .select(explode(words($"text")).as("token"))
        .filter($"token" =!= "")
        .localCheckpoint(false)
      val total = toks.agg(count(lit(1)).as("total"))
      val cms = cmsCells(toks)
      val top20 = toks.groupBy($"token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy($"exact_cnt".desc, $"token").limit(20)
      val probes = top20.select($"token", $"exact_cnt", explode(array(
          (0 until 4).map(i =>
            struct(lit(i).as("i"), cmsSlot(i, $"token").as("slot"))): _*)).as("p"))
        .select($"token", $"exact_cnt", $"p.i".as("i"), $"p.slot".as("slot"))
      val est = probes.join(cms, Seq("i", "slot"))
        .groupBy($"token", $"exact_cnt")
        .agg(min($"slot_cnt").as("cms_est"))
      est.crossJoin(broadcast(total))
        .select($"token", $"exact_cnt", $"cms_est",
          ($"cms_est" >= $"exact_cnt" &&
            $"cms_est" <= $"exact_cnt" + expr("total div 100"))
            .cast("long").as("cms_ok"))
        .withColumn("rnk", row_number().over(
          Window.orderBy($"exact_cnt".desc, $"token")).cast("int"))
        .orderBy($"rnk")
    }),

    // Deterministic stratified train/val/test split: membership is a pure
    // function of md5("split:" + doc_id) — 5% test, 5% val, 90% train —
    // so the split is stable across runs, partitionings, and engines, and
    // any 100 TB re-run reproduces byte-identical splits with no stored
    // assignment table. A narrow projection + hash-agg; per-(source,
    // split) counts and a doc_id checksum verify exact membership.
    "x_train_split" -> ((s, d) => {
      import s.implicits._
      val h = substring(md5(concat(lit("split:"),
        $"doc_id".cast("string")).cast("binary")), 1, 4)
      documents(s, d)
        .select($"source", $"doc_id",
          when(h < "0ccd", "test").when(h < "1999", "val")
            .otherwise("train").as("split"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n"), sum($"doc_id").as("sum_doc"))
        .orderBy($"source", $"split")
    }),

    // Z-order layout index over lineitem: Morton-interleave the low 8
    // bits of (l_partkey, l_suppkey) — see [[zorder16]] — and report
    // per-Z-bucket occupancy + partkey spread. Buckets = z div 256 (256
    // buckets); all bit arithmetic is integer and codegen'd, and the
    // oracle recomputes the interleave bit-for-bit in SQL.
    "x_zorder" -> ((s, d) => {
      import s.implicits._
      // (measured r19: a fanOutScan here LOST 0.4 s — the bit interleave
      // is too cheap to pay a repartition of the scan; see x_hilbert for
      // the fold that does pay)
      lineitem(s, d)
        .select(zorder16($"l_partkey", $"l_suppkey").as("z16"), $"l_partkey")
        .groupBy(expr("z16 div 256").as("z_bucket"))
        .agg(count(lit(1)).as("n"), min($"z16").as("min_z"),
          max($"z16").as("max_z"),
          countDistinct($"l_partkey").as("n_parts"))
        .orderBy($"z_bucket")
    }),

    // Hilbert-curve layout index — see [[hilbert16]]; same bucket-stat
    // gate as x_zorder so the two curves read side by side.
    "x_hilbert" -> ((s, d) => {
      import s.implicits._
      // fanOutScan: the 8-round Hilbert fold is the most expensive
      // per-row expression in the suite and the scan is one split
      withHilbert16(graft.operators.Scale.fanOutScan(
            lineitem(s, d).select($"l_partkey", $"l_suppkey")),
          $"l_partkey", $"l_suppkey", "h16")
        .select($"h16", $"l_partkey")
        .groupBy(expr("h16 div 256").as("h_bucket"))
        .agg(count(lit(1)).as("n"), min($"h16").as("min_h"),
          max($"h16").as("max_h"),
          countDistinct($"l_partkey").as("n_parts"))
        .orderBy($"h_bucket")
    }),

    // Hilbert vs Morton vs hash, measured: per-bucket min/max span sums
    // of both clustered columns under all three layouts in one row —
    // the Hilbert curve's unit-step locality should beat hash layout on
    // BOTH dimensions (flag pinned 1 in the oracle), alongside the
    // Morton spans for direct comparison.
    "x_hilbert_benefit" -> ((s, d) => {
      import s.implicits._
      val li = withHilbert16(
        lineitem(s, d).select(
          zorder16($"l_partkey", $"l_suppkey").as("z16"),
          ($"l_orderkey" % 256).as("hb"), $"l_partkey", $"l_suppkey"),
        $"l_partkey", $"l_suppkey", "h16")
        .localCheckpoint(false)
      def spans(bucket: Column, p: String, sk: String) = li
        .groupBy(bucket.as("b"))
        .agg((max($"l_partkey") - min($"l_partkey")).as("sp"),
          (max($"l_suppkey") - min($"l_suppkey")).as("ss"))
        .agg(sum($"sp").as(p), sum($"ss").as(sk))
      spans(expr("h16 div 256"), "hil_span_part", "hil_span_supp")
        .crossJoin(broadcast(
          spans(expr("z16 div 256"), "z_span_part", "z_span_supp")))
        .crossJoin(broadcast(
          spans($"hb", "hash_span_part", "hash_span_supp")))
        .select($"hil_span_part", $"hil_span_supp", $"z_span_part",
          $"z_span_supp", $"hash_span_part", $"hash_span_supp",
          when($"hil_span_part" < $"hash_span_part" &&
            $"hil_span_supp" < $"hash_span_supp", 1L).otherwise(0L)
            .as("hilbert_ok"))
    }),

    // The measured BENEFIT of Z-order layout: bucket lineitem 256 ways
    // under (a) the Morton key and (b) a hash-like key (l_orderkey%256),
    // and sum each bucket's (max-min) span of the two clustered columns.
    // Min/max file stats prune a predicate iff its value falls outside a
    // bucket's span — smaller total span = more skippable buckets. The
    // gate emits both layouts' span sums; CurationSpec pins z < hash on
    // BOTH dimensions (the whole point of multi-dimensional clustering).
    "x_zorder_benefit" -> ((s, d) => {
      import s.implicits._
      val li = lineitem(s, d).select(
        zorder16($"l_partkey", $"l_suppkey").as("z16"),
        ($"l_orderkey" % 256).as("hb"), $"l_partkey", $"l_suppkey")
      def spans(bucket: Column, name: String) = li
        .groupBy(bucket.as("b"))
        .agg((max($"l_partkey") - min($"l_partkey")).as("sp"),
          (max($"l_suppkey") - min($"l_suppkey")).as("ss"))
        .agg(count(lit(1)).as("buckets"), sum($"sp").as("span_part_sum"),
          sum($"ss").as("span_supp_sum"))
        .select(lit(name).as("layout"), $"buckets", $"span_part_sum",
          $"span_supp_sum")
      spans(expr("z16 div 256"), "zorder")
        .unionByName(spans($"hb", "rowhash"))
        .orderBy($"layout")
    }),

    // Per-file data-skipping stats (the Delta/Iceberg add-file stats
    // collection shape): group by the physical input file and collect
    // row counts + min/max of the skip-relevant columns. At 100 TB these
    // rows ARE the pruning index — a planner consults them instead of
    // footers. Spark side genuinely derives the file from
    // input_file_name(); the synthetic table is single-file so the oracle
    // pins the stats under the literal basename.
    "c17_file_stats" -> ((s, d) => {
      import s.implicits._
      // basename via substring_index (one backwards scan) instead of a
      // per-row regex, and fanOutScan AFTER the name is bound (the
      // non-deterministic input_file_name() must evaluate in the scan
      // task; the repartition then spreads the aggregation work — no-op
      // at scale where the scan has ≥ core-count splits)
      graft.operators.Scale.fanOutScan(lineitem(s, d)
          .select(substring_index(input_file_name(), "/", -1).as("file"),
            $"l_orderkey", $"l_shipdate", $"l_quantity"))
        .groupBy($"file")
        .agg(count(lit(1)).as("n_rows"),
          min($"l_orderkey").as("min_orderkey"),
          max($"l_orderkey").as("max_orderkey"),
          date_format(min($"l_shipdate"), "yyyy-MM-dd").as("min_ship"),
          date_format(max($"l_shipdate"), "yyyy-MM-dd").as("max_ship"),
          sum($"l_quantity").cast("long").as("qty_sum"))
        .orderBy($"file")
    }),

    // TPC-H Q3 shape (shipping priority): the segment-filtered customer
    // dimension BROADCASTS into date-filtered orders, and only then does
    // the big lineitem side shuffle-join on l_orderkey — dim filters
    // never cost a corpus shuffle. Top-10 via TakeOrdered (bounded heap),
    // revenue integer-pinned.
    "q3_shipping_priority" -> ((s, d) => {
      import s.implicits._
      val cust = customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = orders(s, d)
        .filter($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
      val li = lineitem(s, d)
        .filter($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(li, li("l_orderkey") === ord("o_orderkey"))
        .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(floor(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          * 10000 + 0.5).cast("long").as("revenue_x10000"))
        .select($"l_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("odate"),
          $"o_orderpriority".as("priority"), $"revenue_x10000")
        .orderBy($"revenue_x10000".desc, $"l_orderkey").limit(10)
    }),

    // TPC-H Q18 shape (large-volume orders): the HAVING subquery — per-
    // order quantity sums above 300 — reduces to a TINY qualifying-key
    // table that BROADCASTS back into orders, then into the customer
    // dim; the big lineitem table is touched by exactly one
    // partial-aggregated scan. Top-20 via TakeOrdered.
    "q18_large_orders" -> ((s, d) => {
      import s.implicits._
      val big = lineitem(s, d).groupBy($"l_orderkey")
        .agg(sum($"l_quantity").cast("long").as("sum_qty"))
        .filter($"sum_qty" > 300)
      val ord = orders(s, d)
        .join(broadcast(big), $"o_orderkey" === $"l_orderkey")
      ord.join(broadcast(customer(s, d)
          .select($"c_custkey", $"c_name")), $"o_custkey" === $"c_custkey")
        .select($"c_name", $"c_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("odate"),
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("total_x100"),
          $"sum_qty")
        .orderBy($"total_x100".desc, $"o_orderkey").limit(20)
    }),

    // SCD2 snapshot merge (the warehouse dimension-history operator):
    // classify every key of old-vs-new customer snapshots as unchanged /
    // update / delete / insert by full-outer equi-join + row-hash
    // compare. The synthetic "new" snapshot is derived deterministically
    // (bal +100 for key%7=0, key%13=0 dropped, key%17=0 re-inserted
    // shifted by 1e6), so the oracle rebuilds both sides exactly. One
    // hash shuffle per side at any scale; change detection is md5 on the
    // tracked columns, never a column-by-column resolve.
    "c18_scd2" -> ((s, d) => {
      import s.implicits._
      val old = customer(s, d)
        .select($"c_custkey".as("k"), $"c_name", $"c_nationkey", $"c_acctbal")
      val neu = old.filter($"k" % 13 =!= 0)
        .select($"k", $"c_name", $"c_nationkey",
          when($"k" % 7 === 0, $"c_acctbal" + 100).otherwise($"c_acctbal")
            .as("c_acctbal"))
        .unionByName(old.filter($"k" % 17 === 0)
          .select(($"k" + 1000000).as("k"), $"c_name", $"c_nationkey",
            $"c_acctbal"))
      def rowHash(df: DataFrame) = md5(concat_ws("|",
        df("c_name"), df("c_nationkey").cast("string"),
        floor(df("c_acctbal") * 100 + 0.5).cast("long").cast("string"))
        .cast("binary"))
      val o = old.select($"k", rowHash(old).as("oh"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("obal"))
      val n = neu.select($"k", rowHash(neu).as("nh"),
        floor($"c_acctbal" * 100 + 0.5).cast("long").as("nbal"))
      o.join(n, Seq("k"), "full_outer")
        .select($"k".as("custkey"),
          when($"oh".isNull, "insert")
            .when($"nh".isNull, "delete")
            .when($"oh" === $"nh", "unchanged")
            .otherwise("update").as("action"),
          coalesce($"obal", lit(-1L)).as("bal_old_x100"),
          coalesce($"nbal", lit(-1L)).as("bal_new_x100"))
        .filter($"action" =!= "unchanged")
        .orderBy($"custkey")
    }),

    // Join-key skew diagnostics: per-key frequency of lineitem.l_suppkey
    // with an integer heavy-hitter flag (cnt·n_keys > 4·total) and the
    // salt factor an AQE-less planner would apply (⌈cnt·n_keys/total⌉).
    // All-rational-arithmetic-cleared comparisons — no doubles — so the
    // oracle replays the exact flags. This is the profiling pass run
    // BEFORE a 100 TB join to pick salting (operators/Scale.saltedJoin).
    "x_skew_keys" -> ((s, d) => {
      import s.implicits._
      val counts = lineitem(s, d).groupBy($"l_suppkey")
        .agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum($"cnt").as("total"),
        count(lit(1)).as("n_keys"))
      counts.crossJoin(broadcast(tot))
        .select($"l_suppkey".as("suppkey"), $"cnt",
          ($"cnt" * $"n_keys" > $"total" * 4).cast("long").as("is_heavy"),
          expr("(cnt * n_keys + total - 1) div total").as("salt_factor"))
        .orderBy($"cnt".desc, $"suppkey").limit(20)
    }),

    // Small-file compaction planner (the lakehouse OPTIMIZE step): from
    // per-file stats (one "file" per supplier here — the c17 shape),
    // assign files to target-size compaction bins by running-total
    // position, emitting one row per planned output file. The window
    // runs over the FILE-STATS table (file-count-sized, not data-sized —
    // the same serial-step discipline as x_seq_pack's shard cumsum);
    // the data itself is never shuffled by planning.
    "c19_compaction_plan" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val files = lineitem(s, d).groupBy($"l_suppkey".as("file_id"))
        .agg(count(lit(1)).as("rows_n"))
      val w = Window.orderBy($"file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before", coalesce(sum($"rows_n").over(w), lit(0L)))
        .groupBy(expr("cum_before div 4096").as("bin_id"))
        .agg(count(lit(1)).as("n_files"), sum($"rows_n").as("bin_rows"),
          min($"file_id").as("first_file"), max($"file_id").as("last_file"))
        .orderBy($"bin_id")
    }),

    // Retention / VACUUM planner (the deletion twin of c19's OPTIMIZE and
    // c27's rollback plan): from a versioned file ledger, a file is safe
    // to delete when the live manifest has superseded it (version < the
    // dir's live version) AND it has aged past the retention horizon —
    // the Delta-style VACUUM invariant that a concurrent time-travel
    // reader inside the horizon never loses a referenced file. Planning
    // runs entirely on the file-count-sized ledger (per-dir live
    // versions broadcast back); the data itself is never touched.
    "c35_vacuum_plan" -> ((s, d) => {
      import s.implicits._
      val files = lineitem(s, d)
        .groupBy($"l_suppkey".as("dir_id"), ($"l_partkey" % 5).as("version"))
        .agg(count(lit(1)).as("rows_n"))
        .withColumn("age_days", ($"dir_id" * 7 + $"version" * 13) % 120)
      val live = files.groupBy($"dir_id")
        .agg(max($"version").as("live_version"))
      files.join(broadcast(live), "dir_id")
        .select($"dir_id", $"rows_n",
          ($"version" < $"live_version" && $"age_days" > 30)
            .cast("long").as("del"))
        .groupBy(expr("dir_id div 10").as("bucket"))
        .agg(count(lit(1)).as("n_files"), sum($"del").as("n_delete"),
          sum(when($"del" === 1, $"rows_n").otherwise(0L))
            .as("reclaim_rows"))
        .orderBy($"bucket")
    }),

    // Torn-partition repair planner (the recovery twin of c19's OPTIMIZE
    // and c35's VACUUM): a writer that died mid-file leaves a partition
    // dir whose data file is missing its tail magic — the read-back
    // fails loudly on it (CubeRun's contract), and THIS query plans the
    // fix: any torn file condemns its whole dir to delete-and-retry
    // (parquet has no sub-file recovery; the unit regenerates from
    // source). The fold here is graft.cube.Repair.planFromFileStats —
    // the SAME code the real repair path runs over a cube's block dirs
    // (probing 8 footer bytes per file, CubeRunSpec-gated) — driven over
    // a modeled file ledger so DuckDB can pin its algebra. Planning is
    // file-count-sized; the data is never read.
    "c36_torn_repair_plan" -> ((s, d) => {
      import s.implicits._
      val files = lineitem(s, d)
        .groupBy($"l_suppkey".as("dir_id"), ($"l_partkey" % 7).as("file_id"))
        .agg(count(lit(1)).as("bytes"),
          max(when(($"l_orderkey" + $"l_linenumber") % 101 === 0, 1L)
            .otherwise(0L)).as("torn"))
      graft.cube.Repair.planFromFileStats(files, Seq("dir_id"))
        .orderBy($"dir_id")
    }),

    // Incremental view maintenance (the 100 TB cost saver: merge a delta
    // into a materialized aggregate instead of recomputing the world).
    // Money is integer CENTS from the first projection, so partial sums
    // merge exactly (floor-of-sum vs sum-of-floors never diverges). The
    // gate computes the incrementally-merged per-customer aggregate AND
    // the full recompute, and pins them equal row-by-row (`ivm_ok` = 1)
    // — the algebraic property that makes aggregate maintenance sound.
    "c20_incremental_view" -> ((s, d) => {
      import s.implicits._
      def cents(df: DataFrame) = df.select($"o_custkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("p100"))
      val base = cents(orders(s, d))
      // synthetic delta: every 10th order re-arrives with +50.00
      val delta = cents(orders(s, d).filter($"o_orderkey" % 10 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 50))
      val mv = base.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"), sum($"p100").as("t"))
      val dAgg = delta.groupBy($"o_custkey")
        .agg(count(lit(1)).as("dn"), sum($"p100").as("dt"))
      val merged = mv.join(dAgg, Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          (coalesce($"n", lit(0L)) + coalesce($"dn", lit(0L))).as("n_inc"),
          (coalesce($"t", lit(0L)) + coalesce($"dt", lit(0L))).as("t_inc"))
      val full = base.unionByName(delta).groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_full"), sum($"p100").as("t_full"))
      merged.join(full, Seq("o_custkey"))
        .select($"o_custkey".as("custkey"), $"n_inc", $"t_inc",
          ($"n_inc" === $"n_full" && $"t_inc" === $"t_full")
            .cast("long").as("ivm_ok"))
        .orderBy($"custkey")
    }),

    // Vocabulary coverage curve: share of all token occurrences covered
    // by the top-N vocabulary entries, at N = 5/10/20 (the synthetic
    // corpus draws from a ~31-token vocabulary) — the table that sizes
    // a tokenizer's vocab budget. The rank AND the running sum use the
    // shard prefix sum (the upgrade path r7–r10 only documented):
    // shard = −cnt, the EXACT negated leading key, so within a shard
    // every row carries the same cnt and the running coverage composes
    // as earlier-shard totals (cnt_rows·cnt each) + in-shard-rank·cnt.
    // Only the distinct-frequency-sized subtotal table ever serializes.
    "x_ngram_coverage" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = documents(s, d).filter(length(trim($"text")) > 0)
        .select(explode(words($"text")).as("token"))
        .filter($"token" =!= "")
      val vocab = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
      val tot = toks.agg(count(lit(1)).as("total"))
      val ranked = vocab.withColumn("shard", -$"cnt")
        .withColumn("ri", row_number().over(
          Window.partitionBy($"shard").orderBy($"token")).cast("long"))
      val sub = ranked.groupBy($"shard")
        .agg(max($"ri").as("cnt_rows"), min($"cnt").as("scnt"))
      val offW = Window.orderBy($"shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = sub.select($"shard",
        coalesce(sum($"cnt_rows").over(offW), lit(0L)).as("roff"),
        coalesce(sum($"cnt_rows" * $"scnt").over(offW), lit(0L)).as("coff"))
      ranked.join(broadcast(offs), Seq("shard"))
        .select(($"roff" + $"ri").cast("int").as("rnk"), $"cnt",
          ($"coff" + $"ri" * $"cnt").as("cum"))
        .filter($"rnk".isin(5, 10, 20))
        .crossJoin(broadcast(tot))
        .select($"rnk", $"cnt", $"cum",
          floor(lit(10000.0) * $"cum" / $"total" + 0.5).cast("long")
            .as("share_x10000"))
        .orderBy($"rnk")
    }),

    // M7 — tile 8-neighborhood join (the seamline/blending adjacency a
    // mosaic engine needs): tiles from the engine's own Grid tessellation
    // (the g1 grid), neighbors found by exploding the 9 (Δh, Δv) offsets
    // and EQUI-joining on the shifted index — the dilation-join trick
    // that turns a spatial adjacency into a hash join (no theta join at
    // any grid size). Interior tiles count 8, edges/corners fewer.
    "m7_tile_neighbors" -> ((s, d) => {
      import s.implicits._
      val tiles = graft.core.Grid.createTiles("G", 150000.0, 100000.0,
          0.0, 10000000.0, xl = 100000.0, xr = 1000000.0,
          yb = 8000000.0, yu = 9000000.0, srid = 100001)
        .map(t => (t.tileId, t.tileId.substring(0, 3).toInt,
          t.tileId.substring(3, 6).toInt))
        .toDF("tile_id", "ih", "iv")
      val offsets = for { dh <- -1 to 1; dv <- -1 to 1
        if !(dh == 0 && dv == 0) } yield (dh, dv)
      val probes = tiles.select($"tile_id", explode(array(offsets.map {
          case (dh, dv) => struct(($"ih" + dh).as("nh"), ($"iv" + dv).as("nv"))
        }: _*)).as("p"))
        .select($"tile_id", $"p.nh", $"p.nv")
      probes.join(tiles.select($"ih".as("nh"), $"iv".as("nv")), Seq("nh", "nv"))
        .groupBy($"tile_id").agg(count(lit(1)).as("n_neighbors"))
        .orderBy($"tile_id")
    }),

    // M12 — AOI coverage report (the catalog dashboard's "how much of
    // my area of interest is published this period"): grid tiles from
    // the engine's own tessellation, a deterministic 75% "published"
    // subset, and per latitude band the exact clipped-rectangle area
    // inside a non-tile-aligned AOI — grid tiles are disjoint, so
    // coverage is a SUM of clips, never a union problem. All areas are
    // exact integer m²; one tiny aggregate over the tile table.
    "m12_aoi_coverage" -> ((s, d) => {
      import s.implicits._
      val (ax0, ay0, ax1, ay1) = (230000L, 8130000L, 870000L, 8820000L)
      val tiles = graft.core.Grid.createTiles("G", 150000.0, 100000.0,
          0.0, 1.0e7, xl = 100000.0, xr = 1000000.0,
          yb = 8000000.0, yu = 9000000.0, srid = 100001)
        .map(t => (t.tileId, t.xmin.toLong, t.ymin.toLong,
          t.xmax.toLong, t.ymax.toLong))
        .toDF("tile_id", "xmin", "ymin", "xmax", "ymax")
      tiles
        .filter(substring(md5(concat(lit("pub:"), $"tile_id")
          .cast("binary")), 1, 1) < "c")
        .select($"tile_id",
          expr("(10000000 - ymax) div 100000").as("iv"),
          greatest(lit(0L),
            least($"xmax", lit(ax1)) - greatest($"xmin", lit(ax0)))
            .as("iw"),
          greatest(lit(0L),
            least($"ymax", lit(ay1)) - greatest($"ymin", lit(ay0)))
            .as("ih"))
        .groupBy($"iv")
        .agg(count(lit(1)).as("published"),
          sum($"iw" * $"ih").as("covered_m2"))
        .withColumn("band_h", greatest(lit(0L),
          least(lit(10000000L) - $"iv" * 100000L, lit(ay1)) -
            greatest(lit(10000000L) - $"iv" * 100000L - 100000L,
              lit(ay0))))
        .select($"iv", $"published", $"covered_m2",
          ($"band_h" * (ax1 - ax0)).as("band_aoi_m2"),
          expr(s"(covered_m2 * 10000) div " +
            s"greatest(band_h * ${ax1 - ax0}, 1)").as("coverage_x1e4"))
        .orderBy($"iv")
    }),

    // Source-drift detection: per-source KL-style divergence from the
    // corpus unigram distribution, in the established integer-quantized
    // form (per-term logprobs floored once at ×1e6, then order-free
    // integer sums of cnt·(lqₛ − lq)) so the oracle replays exactly.
    // The term join is vocab-sized; the per-feed drift score is what a
    // crawl pipeline alerts on when a source's content shifts.
    "x_source_drift" -> ((s, d) => {
      import s.implicits._
      val toks = documents(s, d).filter(length(trim($"text")) > 0)
        .select($"source", explode(words($"text")).as("t"))
        .filter($"t" =!= "")
      val tot = toks.agg(count(lit(1)).as("n_all"))
      val glob = toks.groupBy($"t").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot))
        .select($"t", floor(log($"c".cast("double") / $"n_all".cast("double"))
          * 1e6).cast("long").as("lq"))
      val per = toks.groupBy($"source", $"t").agg(count(lit(1)).as("cs"))
      val stot = per.groupBy($"source").agg(sum($"cs").as("ns"))
      per.join(stot, "source")
        .select($"source", $"t", $"cs",
          floor(log($"cs".cast("double") / $"ns".cast("double")) * 1e6)
            .cast("long").as("lqs"))
        .join(glob, "t")
        .groupBy($"source")
        .agg(sum($"cs").as("toks"),
          sum($"cs" * ($"lqs" - $"lq")).as("kl_sum"))
        // NOTE deliberately no kl_sum/toks ratio: quantization can push
        // kl_sum slightly negative, where Spark's `div` (truncate) and
        // DuckDB's `//` (floor) disagree — the raw sum replays exactly
        .orderBy($"source")
    }),

    // Curation dashboard: exact-duplicate rate per source (docs vs
    // distinct normalized fingerprints) — the per-feed health metric a
    // crawl pipeline watches; one partial-agg pass, countDistinct per
    // group.
    "x_dup_rate_by_source" -> ((s, d) => {
      import s.implicits._
      documents(s, d).filter(length(trim($"text")) > 0)
        .select($"source",
          md5(lower(trim(regexp_replace($"text", " +", " "))).cast("binary"))
            .as("fp"))
        .groupBy($"source")
        .agg(count(lit(1)).as("docs"), countDistinct($"fp").as("uniq"))
        .select($"source", $"docs", $"uniq",
          floor(lit(10000.0) * ($"docs" - $"uniq") / $"docs" + 0.5)
            .cast("long").as("dup_x10000"))
        .orderBy($"source")
    }),

    // CUBE grouping sets over the order catalog: all four marginals of
    // (status, priority) in ONE pass — the full-cross summary c15's
    // ROLLUP only half-covers; Spark expands the sets before the
    // aggregate so it is still a single shuffle.
    "c21_cube_stats" -> ((s, d) => {
      import s.implicits._
      orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("int").as("lvl"), count(lit(1)).as("n"),
          floor(sum($"o_totalprice") * 100 + 0.5).cast("long").as("total_x100"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"lvl", $"n", $"total_x100")
        .orderBy($"status", $"priority", $"lvl")
    }),

    // Fixed-width token-length histogram (10-word bins): the corpus
    // length profile behind the 20..200 filter window choice; narrow
    // projection into one hash-agg.
    "x_len_histogram" -> ((s, d) => {
      import s.implicits._
      documents(s, d).filter(length(trim($"text")) > 0)
        .select((size(words($"text")).cast("long")).as("nw"))
        .groupBy(expr("nw div 10").as("bin"))
        .agg(count(lit(1)).as("n"), min($"nw").as("min_nw"),
          max($"nw").as("max_nw"))
        .orderBy($"bin")
    }),

    // Hashed document embedding (feature hashing / random-projection by
    // md5 signs): an 8-dim integer doc vector where dim j sums
    // (16-bit slice j of md5(hv:token)) % 2001 − 1000 over the doc's
    // tokens — the deterministic text→vector bridge (the shape of any
    // bag-of-words projection; a learned projection swaps the hash for a
    // broadcast weight table, same plan). ONE md5 per token feeds all 8
    // dims (the 128-bit digest is 8 independent 16-bit slices — hashing
    // per dim would pay the digest 8×); order-free integer sums; one
    // explode + one partial-aggregated shuffle on doc_id; emits the
    // vector's L1 mass and first dims for the gate.
    "x_hash_embed" -> ((s, d) => {
      import s.implicits._
      // fanOutScan: one md5 per token over a one-split scan — spread the
      // byte-small doc rows across the cores first (no-op at scale)
      val toks = graft.operators.Scale.fanOutScan(
          documents(s, d).filter(length(trim($"text")) > 0))
        .select($"doc_id", explode(words($"text")).as("t"))
        .filter($"t" =!= "")
        .select($"doc_id",
          md5(concat(lit("hv:"), $"t").cast("binary")).as("h"))
      val dims = (0 until 8).map(j =>
        sum(conv(substring($"h", j * 4 + 1, 4), 16, 10).cast("long")
          % 2001 - 1000).as(s"e$j"))
      toks.groupBy($"doc_id").agg(dims.head, dims.tail: _*)
        .select($"doc_id", $"e0", $"e1",
          (0 until 8).map(j => abs(col(s"e$j"))).reduce(_ + _).as("l1"))
        .orderBy($"doc_id")
    }),

    // LSH band-tuning table: candidate-pair counts of the SAME 8 MinHash
    // signatures under each (bands × rows) split — (8×1, 4×2, 2×4, 1×8)
    // — with the production 64-member bucket cap applied. The s-curve
    // trade (more bands = higher recall = more candidates) read off a
    // real corpus is how a banding threshold is CHOSEN before a 100 TB
    // dedup run; pairs with more bands must be a superset, pinned by
    // the monotone candidate counts.
    "d_lsh_tuning" -> ((s, d) => {
      import s.implicits._
      val sigs = Pipeline.minhashSigsFor(documents(s, d))
        .localCheckpoint(false)
      val configs = Seq(8 -> 1, 4 -> 2, 2 -> 4, 1 -> 8)
      // ALL four (bands × rows) splits ride ONE tagged band explode —
      // every downstream stage (bucket histogram, cap, pair self-join,
      // per-config counts) keys on cfg, so the table computes in one
      // pipeline instead of four unioned ones (4× fewer passes over the
      // signature table and 1/4 the job count).
      val bandCols = configs.flatMap { case (bands, rows) =>
        (0 until bands).map { b =>
          struct(lit(bands).as("cfg"), lit(b).as("band"),
            md5(concat_ws("|",
              (0 until rows).map(r => col(s"m${b * rows + r}").cast("string")): _*)
              .cast("binary")).as("h"))
        }
      }
      val bd = sigs.select($"doc_id", explode(array(bandCols: _*)).as("bh"))
        .select($"doc_id", $"bh.cfg".as("cfg"), $"bh.band".as("band"),
          $"bh.h".as("h"))
        .localCheckpoint(false)
      val buckets = bd.groupBy($"cfg", $"band", $"h")
        .agg(count(lit(1)).as("m"))
        .localCheckpoint(false)
      // Cap BEFORE pair-gen (the production capped-bucket shape):
      // filtering members of >64 buckets first keeps the self-join
      // O(64·|bd|); filtering after would pay the mega-buckets' m²
      // pair space just to discard it — the 8×1 config's single-hash
      // buckets are exactly where that blows up. (measured r19: a
      // collect_list bucket explode — the minhashCandidatePairs shape —
      // read 0.3 s SLOWER in-suite here despite two fewer exchanges;
      // the four-config tagged arrays materialize heavier than the
      // row-form semi-join. Kept the measured winner.)
      val bdOk = bd.join(buckets.filter($"m" <= 64)
        .select($"cfg", $"band", $"h"), Seq("cfg", "band", "h"))
      val cand = bdOk.as("a").join(bdOk.as("b"),
          col("a.cfg") === col("b.cfg") && col("a.band") === col("b.band") &&
            col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.cfg").as("cfg"), col("a.doc_id").as("id1"),
          col("b.doc_id").as("id2"))
        .distinct()
        .groupBy($"cfg").agg(count(lit(1)).as("cand_pairs"))
      val used = buckets.groupBy($"cfg").agg(
        sum(when($"m" > 1 && $"m" <= 64, 1L).otherwise(0L))
          .as("buckets_used"),
        sum(when($"m" > 64, 1L).otherwise(0L)).as("buckets_capped"))
      // Both stat joins are LEFT from the config spine: on an empty
      // corpus `buckets` (and hence `used`) has no rows, and an inner
      // join would erase the four config rows instead of reporting
      // zero counts for each. The broadcast hint goes on the RIGHT
      // sides (4-row aggregates) — a left-outer join can only build
      // its right side, so hinting the spine was a silent no-op.
      configs.toDF("cfg", "rows_per_band")
        .join(broadcast(cand), Seq("cfg"), "left")
        .join(broadcast(used), Seq("cfg"), "left")
        .select($"cfg".as("bands"), $"rows_per_band",
          coalesce($"cand_pairs", lit(0L)).as("cand_pairs"),
          coalesce($"buckets_used", lit(0L)).as("buckets_used"),
          coalesce($"buckets_capped", lit(0L)).as("buckets_capped"))
        .orderBy($"bands".desc)
    }),

    // Packing-efficiency audit over the gated 512-token packer: bin
    // count, mean fill factor, and how many bins exceed budget (a doc
    // straddling a boundary lands whole in the bin where it starts —
    // concat-and-chunk semantics). One derived row; the packer itself
    // is x_seq_pack's distributed prefix-sum shape.
    "x_pack_efficiency" -> ((s, d) => {
      import s.implicits._
      Pipeline.packBins(documents(s, d), budget = 512)
        .agg(count(lit(1)).as("bins"), sum($"bin_tokens").as("total_tokens"),
          sum(when($"bin_tokens" > 512, 1L).otherwise(0L)).as("over_bins"),
          sum(when($"bin_tokens" < 256, 1L).otherwise(0L)).as("thin_bins"))
        .select($"bins", $"total_tokens",
          floor(lit(10000.0) * $"total_tokens" / ($"bins" * 512) + 0.5)
            .cast("long").as("avg_fill_x10000"),
          $"over_bins", $"thin_bins")
    }),

    // Filter-funnel observability: survivor counts of the corpus filter
    // chain (raw → nonempty → length window → train split → distinct
    // fingerprints among train), computed in ONE corpus scan (conditional
    // aggregates — the observe()-counter shape a production funnel
    // publishes) and unpivoted to a stage table.
    "x_filter_funnel" -> ((s, d) => {
      import s.implicits._
      val nw = size(words($"text"))
      val nonempty = length(trim($"text")) > 0
      val lengthOk = nonempty && nw >= 20 && nw <= 200
      val split = substring(md5(concat(lit("split:"),
        $"doc_id".cast("string")).cast("binary")), 1, 4)
      val isTrain = lengthOk && split >= "1999"
      val fp = md5(lower(trim(regexp_replace($"text", " +", " ")))
        .cast("binary"))
      documents(s, d)
        .agg(count(lit(1)).as("raw"),
          sum(when(nonempty, 1L).otherwise(0L)).as("nonempty"),
          sum(when(lengthOk, 1L).otherwise(0L)).as("length_ok"),
          sum(when(isTrain, 1L).otherwise(0L)).as("train"),
          countDistinct(when(isTrain, fp)).as("uniq"))
        .select(expr(
          """stack(5, 1, 'raw', raw, 2, 'nonempty', nonempty,
             3, 'length_ok', length_ok, 4, 'train', train,
             5, 'uniq_fp', uniq) AS (stage_id, stage, n_rows)"""))
        .select($"stage_id".cast("int").as("stage_id"), $"stage", $"n_rows")
        .orderBy($"stage_id")
    }),

    // Shuffle-quality evaluation: does the seeded md5 training order
    // actually interleave sources? Within each of the 16 shuffle buckets
    // (the writer-shard shape — windows partition by bucket, never
    // globally), count adjacent same-source pairs and compare with the
    // random-order expectation Σ nₛ(nₛ−1)/(N(N−1)); mix_ok pins observed
    // ≤ 2×expected + slack per bucket. This is the audit that catches a
    // broken shuffle key before a 100 TB training run bakes in source
    // runs (loss-spike material).
    "x_shuffle_mix_eval" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val k = documents(s, d).select($"doc_id", $"source",
        md5(concat(lit("shuf:"), $"doc_id".cast("string")).cast("binary"))
          .as("k"))
        .withColumn("bucket", substring($"k", 1, 1))
      val w = Window.partitionBy($"bucket").orderBy($"k")
      val adj = k.withColumn("prev", lag($"source", 1).over(w))
      val perBucket = adj.groupBy($"bucket")
        .agg(sum(when($"prev".isNotNull, 1L).otherwise(0L)).as("pairs"),
          sum(when($"prev" === $"source", 1L).otherwise(0L)).as("same_src"))
      val stats = k.groupBy($"source").agg(count(lit(1)).as("n"))
        .agg(sum($"n" * ($"n" - 1)).as("sq"), sum($"n").as("nn"))
      perBucket.crossJoin(broadcast(stats))
        .select($"bucket", $"pairs", $"same_src",
          when($"pairs" > 0,
            floor(lit(10000.0) * $"same_src" / $"pairs" + 0.5).cast("long"))
            .otherwise(0L).as("same_x10000"),
          floor(lit(10000.0) * $"sq" / ($"nn" * ($"nn" - 1)) + 0.5)
            .cast("long").as("expected_x10000"))
        .withColumn("mix_ok",
          ($"same_x10000" <= $"expected_x10000" * 2 + 200).cast("long"))
        .orderBy($"bucket")
    }),

    // Bigram-LM conditional surprisal (the step past x_unigram_nll): per
    // adjacent pair, -ln(c(w1 w2)/c(w1)) quantized to an integer once on
    // the bigram-vocabulary table, then an order-free per-doc sum. Scale
    // shape: token/pair explodes → two partial-aggregated hash counts
    // (vocab- and bigram-vocab-sized) → one equi-join back — the corpus
    // is scanned once per explode and never self-joined. Lower mean =
    // more locally predictable text (boilerplate); high = incoherent.
    "x_bigram_nll" -> ((s, d) => {
      import s.implicits._
      // (measured r19: fanOutScan + checkpointing the shared stages LOST
      // 0.1 s — the two explodes re-derive cheaper than they materialize)
      val docs = documents(s, d).filter(length(trim($"text")) > 0)
        .select($"doc_id", words($"text").as("w"))
        .filter(size($"w") >= 2)
      val toks = docs.select($"doc_id", explode($"w").as("t"))
      val uni = toks.groupBy($"t".as("w1")).agg(count(lit(1)).as("c1"))
      val pairs = docs.select($"doc_id",
        explode(transform(sequence(lit(1), size($"w") - 1),
          i => struct(element_at($"w", i).as("w1"),
            element_at($"w", i + 1).as("w2")))).as("p"))
        .select($"doc_id", $"p.w1", $"p.w2")
      val big = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      val lp = big.join(uni, "w1")
        .select($"w1", $"w2",
          floor(log($"c12".cast("double") / $"c1".cast("double")) * 1e6)
            .cast("long").as("lq"))
      pairs.join(lp, Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("pairs"), (-sum($"lq")).as("nll_x1e6"))
        .withColumn("mean_nll_x1e6", expr("nll_x1e6 div pairs"))
        .orderBy($"doc_id")
    }),

    // Forward-fill gap repair (§2.6 family — the timeline gap-fill the
    // reference's empty-period handling approximates at scene level,
    // here at event level): a sparse sensor reading (only every 5th
    // event carries a value) is repaired by last-non-null-so-far per
    // user. `last(ignoreNulls)` over a running frame is Spark's
    // streaming-compatible fill; one hash shuffle on user_id, state =
    // one value per key at any scale.
    "f_ffill" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val masked = when($"event_id" % 5 === 0, $"value")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, d)
        .select($"user_id", $"event_id", $"ts", masked.as("m"))
        .withColumn("f", last($"m", ignoreNulls = true).over(w))
        .select($"user_id", $"event_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("kept_ts"),
          coalesce(floor($"m" * 100 + 0.5).cast("long"), lit(-1L))
            .as("masked_x100"),
          coalesce(floor($"f" * 100 + 0.5).cast("long"), lit(-1L))
            .as("fill_x100"))
        .orderBy($"user_id", $"event_id")
    }),

    // Robust outlier detection (median absolute deviation): per-language
    // token-count median and MAD, flagging docs with |x − med| > 3·MAD.
    // Exact interpolated medians from the value histogram
    // (Analytics.contQuantiles — buffer-free, bit-identical to the
    // in-memory `percentile`; the deviations live on a 0.5 grid, so
    // every comparison is exact in binary and the oracle replays the
    // flags bit-for-bit); the 5-row median table broadcasts back over
    // the corpus — the robust-stats analog of the x_len_quantiles
    // sketch path.
    "x_mad_outliers" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d).filter(length(trim($"text")) > 0)
        .select($"lang",
          size(words($"text")).cast("double").as("tokens"))
      val med = Analytics.contQuantiles(docs, "lang", "tokens",
        Seq("med" -> 0.5))
      // two consumers (the MAD histogram and the final flag aggregation)
      // — materialize once so the tokenize+median join runs once
      val dev = docs.join(broadcast(med), "lang")
        .select($"lang", $"tokens", $"med",
          abs($"tokens" - $"med").as("dev"))
        .localCheckpoint(false)
      val mad = Analytics.contQuantiles(dev.select($"lang", $"dev"),
        "lang", "dev", Seq("mad" -> 0.5))
      dev.join(broadcast(mad), "lang")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          floor(first($"med") * 1000 + 0.5).cast("long").as("med_x1000"),
          floor(first($"mad") * 1000 + 0.5).cast("long").as("mad_x1000"),
          sum(when($"dev" > $"mad" * 3, 1L).otherwise(0L)).as("outliers"))
        .orderBy($"lang")
    }),

    // §2.8 — streaming per-key top-k, batch shape: the GROUP-BOUNDED
    // TopKAgg heap (map-side partials trim to k per user before the
    // exchange); the mapGroupsWithState streaming form holds the same
    // O(k)-per-key snapshot and is pinned equal by StreamOpsSpec. The
    // oracle is the window-rank formulation, so the gate proves
    // heap ≡ window.
    "w_stream_topk" -> ((s, d) => {
      import s.implicits._
      events(s, d).groupBy($"user_id")
        .agg(graft.operators.TopKAgg.topKByScore($"value", $"event_id", 3)
          .as("top"))
        .select($"user_id", posexplode($"top").as(Seq("i", "e")))
        .select($"user_id", $"e.id".as("event_id"),
          ($"i" + 1).cast("int").as("rk"),
          floor($"e.score" * 100 + 0.5).cast("long").as("value_x100"))
        .orderBy($"user_id", $"rk")
    }),

    // §2.8 — per-key streaming quota (rate limit): the first 5 events per
    // user pass, the rest drop. Gate runs the batch shape
    // (StreamOps.quotaFirstN — a per-key ordered fold, state one counter
    // per key); StreamOpsSpec pins the flatMapGroupsWithState streaming
    // form against it across micro-batches.
    "w_stream_quota" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
        .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
        .as[graft.streaming.StreamOps.KeyedEvent]
      graft.streaming.StreamOps.quotaFirstN(ev, n = 5).toDF()
        .select($"user_id", $"event_id", $"rk",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("kept_ts"),
          floor($"value" * 100 + 0.5).cast("long").as("value_x100"))
        .orderBy($"user_id", $"rk")
    }))

  private val zorderSqlExpr: String =
    (0 until 8).map { j =>
      s"((((l_partkey % 256) >> $j) & 1) * ${1L << (2 * j)} + " +
        s"(((l_suppkey % 256) >> $j) & 1) * ${1L << (2 * j + 1)})"
    }.mkString(" + ")

  /** The [[hilbert16]] fold as chained SQL derived tables: h0 carries
    * (p, sk, x, y, d=0) per lineitem row; each round applies the same
    * quadrant CASE + rotate/flip arithmetic; h8.d is the Hilbert index.
    */
  private val hilbertSqlCtes: String = {
    val h0 = s"""h0 AS (SELECT l_partkey AS p, l_suppkey AS sk,
        l_orderkey % 256 AS hb, $zorderSqlExpr AS z16,
        l_partkey % 256 AS x, l_suppkey % 256 AS y, CAST(0 AS BIGINT) AS d
      FROM lineitem)"""
    val rounds = (7 to 0 by -1).zipWithIndex.map { case (i, idx) =>
      val s = 1L << i
      s"""h${idx + 1} AS (SELECT p, sk, hb, z16,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - y ELSE y END)
           ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 255 - x ELSE x END)
           ELSE y END AS y,
         d + ${s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
           WHEN rx = 0 AND ry = 1 THEN 1
           WHEN rx = 1 AND ry = 1 THEN 2 ELSE 3 END) AS d
       FROM (SELECT p, sk, hb, z16, x, y, d,
           (x // $s) % 2 AS rx, (y // $s) % 2 AS ry
         FROM h${idx}))"""
    }
    (h0 +: rounds).mkString(",\n")
  }

  val oracles: Map[String, String] = Map(
    "d_prefix_keep_best" ->
      """WITH d AS (SELECT doc_id,
             string_split_regex(trim(lower(regexp_replace(text, ' +', ' ', 'g'))),
               ' +') AS w
           FROM documents WHERE len(trim(text)) > 0),
         f AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             md5(array_to_string(list_slice(w, 1, 16), ' ')) AS fp
           FROM d),
         g AS (SELECT fp, count(*) AS group_size, max(n_words) AS mw
           FROM f GROUP BY 1),
         k AS (SELECT f.fp, min(f.doc_id) AS kept_doc
           FROM f JOIN g ON f.fp = g.fp AND f.n_words = g.mw GROUP BY 1)
         SELECT g.fp, g.group_size, k.kept_doc, g.mw AS kept_words,
           g.group_size - 1 AS dropped
         FROM g JOIN k ON g.fp = k.fp ORDER BY k.kept_doc""",
    "v_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         e AS (SELECT d.doc_id AS src,
             (d.doc_id * d.doc_id + 37 * t.k) % nn.n AS dst
           FROM documents d, nn, range(1, 4) t(k)),
         r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM documents),
         s1 AS (SELECT e.dst AS doc_id, sum(r0.r // 3) AS m
           FROM e JOIN r0 ON e.src = r0.doc_id GROUP BY 1),
         r1 AS (SELECT d.doc_id, 150000 + (85 * coalesce(s1.m, 0)) // 100 AS r
           FROM documents d LEFT JOIN s1 USING (doc_id)),
         s2 AS (SELECT e.dst AS doc_id, sum(r1.r // 3) AS m
           FROM e JOIN r1 ON e.src = r1.doc_id GROUP BY 1),
         r2 AS (SELECT d.doc_id, 150000 + (85 * coalesce(s2.m, 0)) // 100 AS r
           FROM documents d LEFT JOIN s2 USING (doc_id)),
         s3 AS (SELECT e.dst AS doc_id, sum(r2.r // 3) AS m
           FROM e JOIN r2 ON e.src = r2.doc_id GROUP BY 1),
         r3 AS (SELECT d.doc_id, 150000 + (85 * coalesce(s3.m, 0)) // 100 AS r
           FROM documents d LEFT JOIN s3 USING (doc_id))
         SELECT doc_id, CAST(r AS BIGINT) AS rank_x1e6
         FROM r3 ORDER BY doc_id""",
    "v_hits" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         e AS (SELECT d.doc_id AS src,
             (d.doc_id * d.doc_id + 37 * t.k) % nn.n AS dst
           FROM documents d, nn, range(1, 4) t(k)),
         a1p AS (SELECT dst AS doc_id, CAST(sum(1000000) AS BIGINT) AS a0
           FROM e GROUP BY 1),
         a1m AS (SELECT max(a0) AS am FROM a1p),
         a1 AS (SELECT d.doc_id, coalesce(p.a0, 0) * 1000000 // m.am AS a
           FROM documents d LEFT JOIN a1p p USING (doc_id), a1m m),
         h1p AS (SELECT e.src AS doc_id, CAST(sum(a1.a) AS BIGINT) AS h0
           FROM e JOIN a1 ON e.dst = a1.doc_id GROUP BY 1),
         h1m AS (SELECT max(h0) AS hm FROM h1p),
         h1 AS (SELECT d.doc_id, coalesce(p.h0, 0) * 1000000 // m.hm AS h
           FROM documents d LEFT JOIN h1p p USING (doc_id), h1m m),
         a2p AS (SELECT e.dst AS doc_id, CAST(sum(h1.h) AS BIGINT) AS a0
           FROM e JOIN h1 ON e.src = h1.doc_id GROUP BY 1),
         a2m AS (SELECT max(a0) AS am FROM a2p),
         a2 AS (SELECT d.doc_id, coalesce(p.a0, 0) * 1000000 // m.am AS a
           FROM documents d LEFT JOIN a2p p USING (doc_id), a2m m),
         h2p AS (SELECT e.src AS doc_id, CAST(sum(a2.a) AS BIGINT) AS h0
           FROM e JOIN a2 ON e.dst = a2.doc_id GROUP BY 1),
         h2m AS (SELECT max(h0) AS hm FROM h2p),
         h2 AS (SELECT d.doc_id, coalesce(p.h0, 0) * 1000000 // m.hm AS h
           FROM documents d LEFT JOIN h2p p USING (doc_id), h2m m)
         SELECT a2.doc_id, CAST(a2.a AS BIGINT) AS auth_x1e6,
           CAST(h2.h AS BIGINT) AS hub_x1e6
         FROM a2 JOIN h2 USING (doc_id) ORDER BY a2.doc_id""",
    "x_heavy_hitters" ->
      """WITH d AS (SELECT string_split_regex(trim(text), ' +') AS w
           FROM documents WHERE len(trim(text)) > 0),
         tok AS (SELECT unnest(w) AS token FROM d),
         tok2 AS (SELECT token FROM tok WHERE token <> ''),
         tot AS (SELECT count(*) AS total FROM tok2),
         ex AS (SELECT token, count(*) AS exact_cnt FROM tok2 GROUP BY 1),
         top AS (SELECT token, exact_cnt,
             CAST(row_number() OVER (ORDER BY exact_cnt DESC, token) AS INT)
               AS rnk
           FROM ex QUALIFY rnk <= 20),
         cms AS (SELECT i,
             ('0x' || substr(md5(i || ':' || token), 1, 5))::BIGINT % 1024
               AS slot,
             count(*) AS slot_cnt
           FROM tok2, range(0, 4) t(i) GROUP BY 1, 2),
         pr AS (SELECT top.token, top.exact_cnt, top.rnk,
             min(cms.slot_cnt) AS cms_est
           FROM top, range(0, 4) t(i)
           JOIN cms ON cms.i = t.i AND cms.slot =
             ('0x' || substr(md5(t.i || ':' || top.token), 1, 5))::BIGINT % 1024
           GROUP BY 1, 2, 3)
         SELECT pr.token, pr.exact_cnt, CAST(pr.cms_est AS BIGINT) AS cms_est,
           CAST(CASE WHEN pr.cms_est >= pr.exact_cnt
             AND pr.cms_est <= pr.exact_cnt + tot.total // 100
             THEN 1 ELSE 0 END AS BIGINT) AS cms_ok,
           pr.rnk
         FROM pr, tot ORDER BY pr.rnk""",
    "x_train_split" ->
      """SELECT source,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                  < '0ccd' THEN 'test'
                WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                  < '1999' THEN 'val'
                ELSE 'train' END AS split,
           count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_doc
         FROM documents GROUP BY 1, 2 ORDER BY source, split""",
    "x_hilbert" ->
      s"""WITH $hilbertSqlCtes
         SELECT d // 256 AS h_bucket, count(*) AS n,
           min(d) AS min_h, max(d) AS max_h,
           CAST(count(DISTINCT p) AS BIGINT) AS n_parts
         FROM h8 GROUP BY 1 ORDER BY 1""",
    "x_hilbert_benefit" ->
      s"""WITH $hilbertSqlCtes,
         li AS (SELECT d AS h16, z16, hb,
             p AS l_partkey, sk AS l_suppkey FROM h8),
         hs AS (SELECT h16 // 256 AS b, max(l_partkey) - min(l_partkey) AS sp,
             max(l_suppkey) - min(l_suppkey) AS ss FROM li GROUP BY 1),
         zs AS (SELECT z16 // 256 AS b, max(l_partkey) - min(l_partkey) AS sp,
             max(l_suppkey) - min(l_suppkey) AS ss FROM li GROUP BY 1),
         hh AS (SELECT hb AS b, max(l_partkey) - min(l_partkey) AS sp,
             max(l_suppkey) - min(l_suppkey) AS ss FROM li GROUP BY 1),
         ha AS (SELECT CAST(sum(sp) AS BIGINT) AS hil_span_part,
             CAST(sum(ss) AS BIGINT) AS hil_span_supp FROM hs),
         za AS (SELECT CAST(sum(sp) AS BIGINT) AS z_span_part,
             CAST(sum(ss) AS BIGINT) AS z_span_supp FROM zs),
         hha AS (SELECT CAST(sum(sp) AS BIGINT) AS hash_span_part,
             CAST(sum(ss) AS BIGINT) AS hash_span_supp FROM hh)
         SELECT hil_span_part, hil_span_supp, z_span_part, z_span_supp,
           hash_span_part, hash_span_supp,
           CAST(CASE WHEN hil_span_part < hash_span_part
             AND hil_span_supp < hash_span_supp THEN 1 ELSE 0 END AS BIGINT)
             AS hilbert_ok
         FROM ha, za, hha""",
    "x_zorder" ->
      s"""WITH z AS (SELECT $zorderSqlExpr AS z16, l_partkey FROM lineitem)
         SELECT z16 // 256 AS z_bucket, count(*) AS n,
           min(z16) AS min_z, max(z16) AS max_z,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
         FROM z GROUP BY 1 ORDER BY 1""",
    "x_zorder_benefit" ->
      s"""WITH li AS (SELECT $zorderSqlExpr AS z16, l_orderkey % 256 AS hb,
             l_partkey, l_suppkey FROM lineitem),
         z AS (SELECT z16 // 256 AS b, max(l_partkey) - min(l_partkey) AS sp,
             max(l_suppkey) - min(l_suppkey) AS ss
           FROM li GROUP BY 1),
         h AS (SELECT hb AS b, max(l_partkey) - min(l_partkey) AS sp,
             max(l_suppkey) - min(l_suppkey) AS ss
           FROM li GROUP BY 1),
         za AS (SELECT 'zorder' AS layout, count(*) AS buckets,
             CAST(sum(sp) AS BIGINT) AS span_part_sum,
             CAST(sum(ss) AS BIGINT) AS span_supp_sum FROM z),
         ha AS (SELECT 'rowhash' AS layout, count(*) AS buckets,
             CAST(sum(sp) AS BIGINT) AS span_part_sum,
             CAST(sum(ss) AS BIGINT) AS span_supp_sum FROM h)
         SELECT * FROM za UNION ALL SELECT * FROM ha ORDER BY layout""",
    "c17_file_stats" ->
      """SELECT 'lineitem.parquet' AS file, count(*) AS n_rows,
           min(l_orderkey) AS min_orderkey, max(l_orderkey) AS max_orderkey,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship,
           CAST(sum(l_quantity) AS BIGINT) AS qty_sum
         FROM lineitem""",
    "q3_shipping_priority" ->
      """SELECT l.l_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           o.o_orderpriority AS priority,
           CAST(floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 10000
             + 0.5) AS BIGINT) AS revenue_x10000
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1995-03-15'
           AND l.l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         ORDER BY revenue_x10000 DESC, l.l_orderkey LIMIT 10""",
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           FROM lineitem GROUP BY 1 HAVING CAST(sum(l_quantity) AS BIGINT) > 300)
         SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS total_x100,
           big.sum_qty
         FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         ORDER BY total_x100 DESC, o.o_orderkey LIMIT 20""",
    "c18_scd2" ->
      """WITH old AS (SELECT c_custkey AS k, c_name, c_nationkey, c_acctbal
           FROM customer),
         neu AS (
           SELECT k, c_name, c_nationkey,
             CASE WHEN k % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END
               AS c_acctbal
           FROM old WHERE k % 13 <> 0
           UNION ALL
           SELECT k + 1000000, c_name, c_nationkey, c_acctbal
           FROM old WHERE k % 17 = 0),
         o AS (SELECT k,
             md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' ||
               CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR))
               AS oh,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS obal
           FROM old),
         n AS (SELECT k,
             md5(c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' ||
               CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR))
               AS nh,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS nbal
           FROM neu),
         j AS (SELECT coalesce(o.k, n.k) AS custkey,
             CASE WHEN o.oh IS NULL THEN 'insert'
                  WHEN n.nh IS NULL THEN 'delete'
                  WHEN o.oh = n.nh THEN 'unchanged'
                  ELSE 'update' END AS action,
             coalesce(o.obal, -1) AS bal_old_x100,
             coalesce(n.nbal, -1) AS bal_new_x100
           FROM o FULL OUTER JOIN n ON o.k = n.k)
         SELECT custkey, action, bal_old_x100, bal_new_x100
         FROM j WHERE action <> 'unchanged' ORDER BY custkey""",
    "x_skew_keys" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt
           FROM lineitem GROUP BY 1),
         t AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM c)
         SELECT c.l_suppkey AS suppkey, c.cnt,
           CAST(CASE WHEN c.cnt * t.n_keys > t.total * 4 THEN 1 ELSE 0 END
             AS BIGINT) AS is_heavy,
           CAST((c.cnt * t.n_keys + t.total - 1) // t.total AS BIGINT)
             AS salt_factor
         FROM c, t ORDER BY c.cnt DESC, c.l_suppkey LIMIT 20""",
    "c20_incremental_view" ->
      """WITH base AS (SELECT o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p100
           FROM orders),
         delta AS (SELECT o_custkey,
             CAST(floor((o_totalprice + 50) * 100 + 0.5) AS BIGINT) AS p100
           FROM orders WHERE o_orderkey % 10 = 0),
         mv AS (SELECT o_custkey, count(*) AS n, sum(p100) AS t
           FROM base GROUP BY 1),
         da AS (SELECT o_custkey, count(*) AS dn, sum(p100) AS dt
           FROM delta GROUP BY 1),
         m AS (SELECT coalesce(mv.o_custkey, da.o_custkey) AS o_custkey,
             coalesce(mv.n, 0) + coalesce(da.dn, 0) AS n_inc,
             coalesce(mv.t, 0) + coalesce(da.dt, 0) AS t_inc
           FROM mv FULL OUTER JOIN da ON mv.o_custkey = da.o_custkey),
         f AS (SELECT o_custkey, count(*) AS n_full, sum(p100) AS t_full
           FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
           GROUP BY 1)
         SELECT m.o_custkey AS custkey, CAST(m.n_inc AS BIGINT) AS n_inc,
           CAST(m.t_inc AS BIGINT) AS t_inc,
           CAST(CASE WHEN m.n_inc = f.n_full AND m.t_inc = f.t_full
             THEN 1 ELSE 0 END AS BIGINT) AS ivm_ok
         FROM m JOIN f ON m.o_custkey = f.o_custkey
         ORDER BY custkey""",
    "x_ngram_coverage" ->
      """WITH d AS (SELECT string_split_regex(trim(text), ' +') AS w
           FROM documents WHERE len(trim(text)) > 0),
         tok AS (SELECT unnest(w) AS token FROM d),
         tok2 AS (SELECT token FROM tok WHERE token <> ''),
         v AS (SELECT token, count(*) AS cnt FROM tok2 GROUP BY 1),
         tot AS (SELECT count(*) AS total FROM tok2),
         r AS (SELECT token, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rnk,
             sum(cnt) OVER (ORDER BY cnt DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM v)
         SELECT rnk, cnt, CAST(cum AS BIGINT) AS cum,
           CAST(floor(10000.0::DOUBLE * cum / total + 0.5::DOUBLE) AS BIGINT)
             AS share_x10000
         FROM r, tot WHERE rnk IN (5, 10, 20) ORDER BY rnk""",
    "m7_tile_neighbors" ->
      """WITH tiles AS (SELECT
             lpad(CAST(ih AS VARCHAR), 3, '0')
               || lpad(CAST(iv AS VARCHAR), 3, '0') AS tile_id, ih, iv
           FROM range(CAST(trunc((100000.0 - 0.0) / 150000.0) AS INT),
                  CAST(trunc((1000000.0 - 0.0) / 150000.0) AS INT) + 1) t(ih),
                range(CAST(trunc((10000000.0 - 9000000.0) / 100000.0) AS INT),
                  CAST(trunc((10000000.0 - 8000000.0) / 100000.0) AS INT) + 1)
                  u(iv)),
         probes AS (SELECT tile_id, ih + dh AS nh, iv + dv AS nv
           FROM tiles, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),
             (1,-1),(1,0),(1,1)) o(dh, dv))
         SELECT p.tile_id, count(*) AS n_neighbors
         FROM probes p JOIN tiles n ON p.nh = n.ih AND p.nv = n.iv
         GROUP BY 1 ORDER BY 1""",
    "m12_aoi_coverage" ->
      """WITH tiles AS (SELECT
             lpad(CAST(ih AS VARCHAR), 3, '0')
               || lpad(CAST(iv AS VARCHAR), 3, '0') AS tile_id,
             CAST(ih * 150000 AS BIGINT) AS xmin,
             CAST(10000000 - iv * 100000 - 100000 AS BIGINT) AS ymin,
             CAST(ih * 150000 + 150000 AS BIGINT) AS xmax,
             CAST(10000000 - iv * 100000 AS BIGINT) AS ymax, iv
           FROM range(CAST(trunc((100000.0 - 0.0) / 150000.0) AS INT),
                  CAST(trunc((1000000.0 - 0.0) / 150000.0) AS INT) + 1) t(ih),
                range(CAST(trunc((10000000.0 - 9000000.0) / 100000.0) AS INT),
                  CAST(trunc((10000000.0 - 8000000.0) / 100000.0) AS INT) + 1)
                  u(iv)),
         pub AS (SELECT * FROM tiles
           WHERE substr(md5('pub:' || tile_id), 1, 1) < 'c'),
         cl AS (SELECT iv,
             greatest(0, least(xmax, 870000) - greatest(xmin, 230000))
               AS iw,
             greatest(0, least(ymax, 8820000) - greatest(ymin, 8130000))
               AS ih2
           FROM pub),
         g AS (SELECT iv, count(*) AS published,
             CAST(sum(iw * ih2) AS BIGINT) AS covered_m2
           FROM cl GROUP BY 1),
         b AS (SELECT iv, published, covered_m2,
             greatest(0, least(10000000 - iv * 100000, 8820000) -
               greatest(10000000 - iv * 100000 - 100000, 8130000))
               AS band_h
           FROM g)
         SELECT CAST(iv AS BIGINT) AS iv, published, covered_m2,
           CAST(band_h * 640000 AS BIGINT) AS band_aoi_m2,
           CAST((covered_m2 * 10000) // greatest(band_h * 640000, 1)
             AS BIGINT) AS coverage_x1e4
         FROM b ORDER BY iv""",
    "x_source_drift" ->
      """WITH t AS (SELECT source, unnest(string_split_regex(trim(text), ' +'))
             AS t
           FROM documents WHERE len(trim(text)) > 0),
         t2 AS (SELECT source, t FROM t WHERE t <> ''),
         tot AS (SELECT count(*) AS n_all FROM t2),
         gl AS (SELECT t, CAST(floor(ln(CAST(count(*) AS DOUBLE)
               / CAST(tot.n_all AS DOUBLE)) * 1000000.0::DOUBLE) AS BIGINT)
               AS lq
           FROM t2, tot GROUP BY t, tot.n_all),
         per AS (SELECT source, t, count(*) AS cs FROM t2 GROUP BY 1, 2),
         stot AS (SELECT source, sum(cs) AS ns FROM per GROUP BY 1),
         ps AS (SELECT per.source, per.t, per.cs,
             CAST(floor(ln(CAST(per.cs AS DOUBLE) / CAST(stot.ns AS DOUBLE))
               * 1000000.0::DOUBLE) AS BIGINT) AS lqs
           FROM per JOIN stot ON per.source = stot.source)
         SELECT ps.source, CAST(sum(ps.cs) AS BIGINT) AS toks,
           CAST(sum(ps.cs * (ps.lqs - gl.lq)) AS BIGINT) AS kl_sum
         FROM ps JOIN gl ON ps.t = gl.t
         GROUP BY 1 ORDER BY 1""",
    "x_dup_rate_by_source" ->
      """WITH f AS (SELECT source,
             md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp
           FROM documents WHERE len(trim(text)) > 0),
         g AS (SELECT source, count(*) AS docs, count(DISTINCT fp) AS uniq
           FROM f GROUP BY 1)
         SELECT source, docs, CAST(uniq AS BIGINT) AS uniq,
           CAST(floor(10000.0::DOUBLE * (docs - uniq) / docs + 0.5::DOUBLE)
             AS BIGINT) AS dup_x10000
         FROM g ORDER BY source""",
    "c21_cube_stats" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
             AS INT) AS lvl,
           count(*) AS n,
           CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS total_x100
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY status, priority, lvl""",
    "x_len_histogram" ->
      """SELECT CAST(len(string_split_regex(trim(text), ' +')) // 10
             AS BIGINT) AS bin,
           count(*) AS n,
           CAST(min(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
             AS min_nw,
           CAST(max(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
             AS max_nw
         FROM documents WHERE len(trim(text)) > 0
         GROUP BY 1 ORDER BY 1""",
    "x_hash_embed" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
             FROM documents WHERE len(trim(text)) > 0),
         t AS (SELECT doc_id, unnest(w) AS t FROM d),
         t2 AS (SELECT doc_id, md5('hv:' || t) AS h FROM t WHERE t <> ''),
         e AS (SELECT doc_id, j,
             sum(('0x' || substr(h, (j * 4 + 1)::INT, 4))::BIGINT % 2001
               - 1000) AS v
           FROM t2, range(0, 8) r(j) GROUP BY 1, 2)
         SELECT doc_id,
           CAST(max(CASE WHEN j = 0 THEN v END) AS BIGINT) AS e0,
           CAST(max(CASE WHEN j = 1 THEN v END) AS BIGINT) AS e1,
           CAST(sum(abs(v)) AS BIGINT) AS l1
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    "d_lsh_tuning" ->
      s"""WITH ${Pipeline.minhashCtesSql},
         b81 AS (SELECT doc_id, j AS band, md5(m::VARCHAR) AS h FROM mh),
         s24 AS (SELECT doc_id,
             md5(max(CASE WHEN j=0 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=1 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=2 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=3 THEN m END)::VARCHAR) AS h0,
             md5(max(CASE WHEN j=4 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=5 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=6 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=7 THEN m END)::VARCHAR) AS h1
           FROM mh GROUP BY doc_id),
         b24 AS (SELECT doc_id, 0 AS band, h0 AS h FROM s24
           UNION ALL SELECT doc_id, 1, h1 FROM s24),
         s18 AS (SELECT doc_id,
             md5(max(CASE WHEN j=0 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=1 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=2 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=3 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=4 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=5 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=6 THEN m END)::VARCHAR || '|'
               || max(CASE WHEN j=7 THEN m END)::VARCHAR) AS h
           FROM mh GROUP BY doc_id),
         b18 AS (SELECT doc_id, 0 AS band, h FROM s18),
         b42 AS (SELECT doc_id, band, h FROM bands),
         k81 AS (SELECT band, h, count(*) AS m FROM b81 GROUP BY 1, 2),
         k42 AS (SELECT band, h, count(*) AS m FROM b42 GROUP BY 1, 2),
         k24 AS (SELECT band, h, count(*) AS m FROM b24 GROUP BY 1, 2),
         k18 AS (SELECT band, h, count(*) AS m FROM b18 GROUP BY 1, 2),
         p81 AS (SELECT count(*) AS cand FROM (SELECT DISTINCT a.doc_id AS x,
             b.doc_id AS y FROM b81 a JOIN b81 b ON a.band = b.band
             AND a.h = b.h AND a.doc_id < b.doc_id
             JOIN k81 k ON k.band = a.band AND k.h = a.h AND k.m <= 64)),
         p42 AS (SELECT count(*) AS cand FROM (SELECT DISTINCT a.doc_id AS x,
             b.doc_id AS y FROM b42 a JOIN b42 b ON a.band = b.band
             AND a.h = b.h AND a.doc_id < b.doc_id
             JOIN k42 k ON k.band = a.band AND k.h = a.h AND k.m <= 64)),
         p24 AS (SELECT count(*) AS cand FROM (SELECT DISTINCT a.doc_id AS x,
             b.doc_id AS y FROM b24 a JOIN b24 b ON a.band = b.band
             AND a.h = b.h AND a.doc_id < b.doc_id
             JOIN k24 k ON k.band = a.band AND k.h = a.h AND k.m <= 64)),
         p18 AS (SELECT count(*) AS cand FROM (SELECT DISTINCT a.doc_id AS x,
             b.doc_id AS y FROM b18 a JOIN b18 b ON a.band = b.band
             AND a.h = b.h AND a.doc_id < b.doc_id
             JOIN k18 k ON k.band = a.band AND k.h = a.h AND k.m <= 64)),
         u81 AS (SELECT sum(CASE WHEN m > 1 AND m <= 64 THEN 1 ELSE 0 END)
             AS used, sum(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS capped
           FROM k81),
         u42 AS (SELECT sum(CASE WHEN m > 1 AND m <= 64 THEN 1 ELSE 0 END)
             AS used, sum(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS capped
           FROM k42),
         u24 AS (SELECT sum(CASE WHEN m > 1 AND m <= 64 THEN 1 ELSE 0 END)
             AS used, sum(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS capped
           FROM k24),
         u18 AS (SELECT sum(CASE WHEN m > 1 AND m <= 64 THEN 1 ELSE 0 END)
             AS used, sum(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS capped
           FROM k18)
         SELECT 8 AS bands, 1 AS rows_per_band,
           CAST(p81.cand AS BIGINT) AS cand_pairs,
           CAST(u81.used AS BIGINT) AS buckets_used,
           CAST(u81.capped AS BIGINT) AS buckets_capped FROM p81, u81
         UNION ALL SELECT 4, 2, CAST(p42.cand AS BIGINT),
           CAST(u42.used AS BIGINT), CAST(u42.capped AS BIGINT) FROM p42, u42
         UNION ALL SELECT 2, 4, CAST(p24.cand AS BIGINT),
           CAST(u24.used AS BIGINT), CAST(u24.capped AS BIGINT) FROM p24, u24
         UNION ALL SELECT 1, 8, CAST(p18.cand AS BIGINT),
           CAST(u18.used AS BIGINT), CAST(u18.capped AS BIGINT) FROM p18, u18
         ORDER BY bands DESC""",
    "x_pack_efficiency" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS tokens
           FROM documents WHERE len(trim(text)) > 0),
         c AS (SELECT doc_id, tokens,
             coalesce(sum(tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before FROM t),
         b AS (SELECT CAST(cum_before // 512 AS BIGINT) AS bin_id,
             CAST(sum(tokens) AS BIGINT) AS bin_tokens
           FROM c GROUP BY 1)
         SELECT count(*) AS bins, CAST(sum(bin_tokens) AS BIGINT)
             AS total_tokens,
           CAST(floor(10000.0::DOUBLE * sum(bin_tokens) / (count(*) * 512)
             + 0.5::DOUBLE) AS BIGINT) AS avg_fill_x10000,
           CAST(sum(CASE WHEN bin_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT)
             AS over_bins,
           CAST(sum(CASE WHEN bin_tokens < 256 THEN 1 ELSE 0 END) AS BIGINT)
             AS thin_bins
         FROM b""",
    "x_filter_funnel" ->
      """WITH s AS (SELECT count(*) AS raw,
             sum(CASE WHEN len(trim(text)) > 0 THEN 1 ELSE 0 END)
               AS nonempty,
             sum(CASE WHEN len(trim(text)) > 0
               AND len(string_split_regex(trim(text), ' +')) BETWEEN 20
               AND 200 THEN 1 ELSE 0 END) AS length_ok,
             sum(CASE WHEN len(trim(text)) > 0
               AND len(string_split_regex(trim(text), ' +')) BETWEEN 20
               AND 200
               AND substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 >= '1999' THEN 1 ELSE 0 END) AS train,
             count(DISTINCT CASE WHEN len(trim(text)) > 0
               AND len(string_split_regex(trim(text), ' +')) BETWEEN 20
               AND 200
               AND substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 >= '1999'
               THEN md5(lower(trim(regexp_replace(text, ' +', ' ', 'g'))))
               END) AS uniq
           FROM documents)
         SELECT 1 AS stage_id, 'raw' AS stage, CAST(raw AS BIGINT) AS n_rows
           FROM s
         UNION ALL SELECT 2, 'nonempty', CAST(nonempty AS BIGINT) FROM s
         UNION ALL SELECT 3, 'length_ok', CAST(length_ok AS BIGINT) FROM s
         UNION ALL SELECT 4, 'train', CAST(train AS BIGINT) FROM s
         UNION ALL SELECT 5, 'uniq_fp', CAST(uniq AS BIGINT) FROM s
         ORDER BY 1""",
    "x_shuffle_mix_eval" ->
      """WITH k AS (SELECT doc_id, source,
             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
             substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
           FROM documents),
         adj AS (SELECT bucket, source,
             lag(source) OVER (PARTITION BY bucket ORDER BY k) AS prev
           FROM k),
         pb AS (SELECT bucket,
             sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS pairs,
             sum(CASE WHEN prev = source THEN 1 ELSE 0 END) AS same_src
           FROM adj GROUP BY 1),
         st AS (SELECT sum(n * (n - 1)) AS sq, sum(n) AS nn
           FROM (SELECT source, count(*) AS n FROM k GROUP BY 1))
         SELECT pb.bucket, CAST(pb.pairs AS BIGINT) AS pairs,
           CAST(pb.same_src AS BIGINT) AS same_src,
           CAST(CASE WHEN pb.pairs > 0 THEN floor(10000.0::DOUBLE
             * pb.same_src / pb.pairs + 0.5::DOUBLE) ELSE 0 END AS BIGINT)
             AS same_x10000,
           CAST(floor(10000.0::DOUBLE * st.sq / (st.nn * (st.nn - 1))
             + 0.5::DOUBLE) AS BIGINT) AS expected_x10000,
           CAST(CASE WHEN
             (CASE WHEN pb.pairs > 0 THEN floor(10000.0::DOUBLE
               * pb.same_src / pb.pairs + 0.5::DOUBLE) ELSE 0 END)
             <= floor(10000.0::DOUBLE * st.sq / (st.nn * (st.nn - 1))
               + 0.5::DOUBLE) * 2 + 200
             THEN 1 ELSE 0 END AS BIGINT) AS mix_ok
         FROM pb, st ORDER BY pb.bucket""",
    "x_bigram_nll" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
             FROM documents WHERE len(trim(text)) > 0),
         d2 AS (SELECT doc_id, w FROM d WHERE len(w) >= 2),
         t AS (SELECT doc_id, unnest(w) AS t FROM d2),
         uni AS (SELECT t AS w1, count(*) AS c1 FROM t GROUP BY 1),
         p AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
               i -> struct_pack(w1 := w[i], w2 := w[i + 1]))) AS pr
           FROM d2),
         pairs AS (SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2 FROM p),
         big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
         lp AS (SELECT big.w1, big.w2,
             CAST(floor(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
               * 1000000.0::DOUBLE) AS BIGINT) AS lq
           FROM big JOIN uni ON big.w1 = uni.w1)
         SELECT pairs.doc_id, count(*) AS pairs,
           CAST(-sum(lq) AS BIGINT) AS nll_x1e6,
           CAST(-sum(lq) // count(*) AS BIGINT) AS mean_nll_x1e6
         FROM pairs JOIN lp ON pairs.w1 = lp.w1 AND pairs.w2 = lp.w2
         GROUP BY 1 ORDER BY 1""",
    "f_ffill" ->
      """WITH m AS (SELECT user_id, event_id, ts,
             CASE WHEN event_id % 5 = 0 THEN value END AS m
           FROM events),
         f AS (SELECT user_id, event_id, ts, m,
             last_value(m IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
           FROM m)
         SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS kept_ts,
           CAST(coalesce(floor(m * 100 + 0.5), -1) AS BIGINT) AS masked_x100,
           CAST(coalesce(floor(fv * 100 + 0.5), -1) AS BIGINT) AS fill_x100
         FROM f ORDER BY user_id, event_id""",
    "x_mad_outliers" ->
      """WITH d AS (SELECT lang,
             CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE)
               AS tokens
           FROM documents WHERE len(trim(text)) > 0),
         med AS (SELECT lang, quantile_cont(tokens, 0.5) AS med
           FROM d GROUP BY 1),
         dev AS (SELECT d.lang, d.tokens, med.med,
             abs(d.tokens - med.med) AS dev
           FROM d JOIN med ON d.lang = med.lang),
         mad AS (SELECT lang, quantile_cont(dev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT dev.lang, count(*) AS n,
           CAST(floor(CAST(min(dev.med) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             AS med_x1000,
           CAST(floor(CAST(min(mad.mad) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             AS mad_x1000,
           CAST(sum(CASE WHEN dev.dev > CAST(mad.mad AS DOUBLE) * 3
             THEN 1 ELSE 0 END) AS BIGINT) AS outliers
         FROM dev JOIN mad ON dev.lang = mad.lang
         GROUP BY 1 ORDER BY 1""",
    "w_stream_topk" ->
      """WITH r AS (SELECT user_id, event_id, value,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY value DESC, event_id) AS INT) AS rk
           FROM events)
         SELECT user_id, event_id, rk,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_x100
         FROM r WHERE rk <= 3 ORDER BY user_id, rk""",
    "c35_vacuum_plan" ->
      """WITH f AS (SELECT l_suppkey AS dir_id, l_partkey % 5 AS version,
             count(*) AS rows_n
           FROM lineitem GROUP BY 1, 2),
         fa AS (SELECT dir_id, version, rows_n,
             (dir_id * 7 + version * 13) % 120 AS age_days FROM f),
         lv AS (SELECT dir_id, max(version) AS live_version
           FROM fa GROUP BY 1),
         dl AS (SELECT fa.dir_id, fa.rows_n,
             CASE WHEN fa.version < lv.live_version AND fa.age_days > 30
               THEN 1 ELSE 0 END AS del
           FROM fa JOIN lv USING (dir_id))
         SELECT dir_id // 10 AS bucket, count(*) AS n_files,
           CAST(sum(del) AS BIGINT) AS n_delete,
           CAST(sum(CASE WHEN del = 1 THEN rows_n ELSE 0 END) AS BIGINT)
             AS reclaim_rows
         FROM dl GROUP BY 1 ORDER BY 1""",
    "c36_torn_repair_plan" ->
      """WITH f AS (SELECT l_suppkey AS dir_id, l_partkey % 7 AS file_id,
             CAST(count(*) AS BIGINT) AS bytes,
             CAST(max(CASE WHEN (l_orderkey + l_linenumber) % 101 = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS torn
           FROM lineitem GROUP BY 1, 2)
         SELECT dir_id, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS dir_bytes,
           CAST(sum(torn) AS BIGINT) AS n_torn,
           CASE WHEN sum(torn) > 0 THEN 'delete_and_retry' ELSE 'keep' END
             AS action
         FROM f GROUP BY 1 ORDER BY 1""",
    "c19_compaction_plan" ->
      """WITH f AS (SELECT l_suppkey AS file_id, count(*) AS rows_n
           FROM lineitem GROUP BY 1),
         c AS (SELECT file_id, rows_n,
             coalesce(sum(rows_n) OVER (ORDER BY file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM f)
         SELECT CAST(cum_before // 4096 AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(rows_n) AS BIGINT) AS bin_rows,
           min(file_id) AS first_file, max(file_id) AS last_file
         FROM c GROUP BY 1 ORDER BY 1""",
    "w_stream_quota" ->
      """WITH r AS (SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS INT) AS rk
           FROM events)
         SELECT user_id, event_id, rk,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS kept_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_x100
         FROM r WHERE rk <= 5 ORDER BY user_id, rk""")
}
