package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** Unit semantics for the Analytics wave: triangle counting, CDC
  * snapshot folds, character entropy, and writer round trips.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("a", "b")

  test("triangleCorners: K4 has 4 triangles, every node in 3") {
    val k4 = edges((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val tris = Analytics.triangleCorners(k4).collect()
    assert(tris.length == 4)
    val perNode = tris.flatMap(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(perNode == Map(0L -> 3, 1L -> 3, 2L -> 3, 3L -> 3))
  }

  test("triangleCorners: each triangle reported once, at any degree skew") {
    // star + one closing edge: only (0,1,2) closes; hub 0 has degree 4
    val g = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L))
    val tris = Analytics.triangleCorners(g).collect()
    assert(tris.length == 1)
    assert(tris.head.toSeq.toSet.map((x: Any) => x.asInstanceOf[Long]) ==
      Set(0L, 1L, 2L))
  }

  test("triangleCorners: triangle-free graph yields nothing") {
    val path = edges((0L, 1L), (1L, 2L), (2L, 3L))
    assert(Analytics.triangleCorners(path).count() == 0)
  }

  test("downsample2x2: hand 4x4 block means, truncating division") {
    // rows: 0 1 2 3 / 10 11 12 13 / 20 21 22 23 / 30 31 32 33
    // quads: {0,1,10,11}->5, {2,3,12,13}->7, {20,21,30,31}->25, {22,23,32,33}->27
    val arr = (0 until 16).map(i => (i / 4) * 10L + i % 4)
    val df = Seq(Tuple1(arr)).toDF("px")
      .select(Analytics.downsample2x2($"px", 4).as("d"))
    assert(df.collect().head.getSeq[Long](0) == Seq(5L, 7L, 25L, 27L))
    // truncation: {0,0,0,1} -> 0 (not 0.25 rounded)
    val t = Seq(Tuple1(Seq(0L, 0L, 1L, 0L))).toDF("px")
      .select(Analytics.downsample2x2($"px", 2).as("d"))
    assert(t.collect().head.getSeq[Long](0) == Seq(0L))
  }

  test("focalMean3x3: corner/edge/interior divisors on a hand 3x3 grid") {
    // grid: 0 1 2 / 3 4 5 / 6 7 8
    // corner (0,0): mean(0,1,3,4) = 8/4 = 2
    // edge (0,1): mean(0,1,2,3,4,5) = 15/6 = 2
    // center: mean(0..8) = 36/9 = 4
    val out = Seq(Tuple1((0L until 9L).toSeq)).toDF("px")
      .select(Analytics.focalMean3x3($"px", 3).as("f"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L, 6L))
  }

  test("bfsHops: shortest hop wins on diamonds; unreached nodes absent") {
    // 0 -> 1 -> 3, 0 -> 2 -> 3 (diamond), 3 -> 4, isolated 9
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (9L, 9L)).toDF("src", "dst")
    val hops = Analytics.bfsHops(edges, Seq(0L), maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(hops == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsHops: hop bound truncates the frontier") {
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val hops = Analytics.bfsHops(chain, Seq(0L), maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(hops == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("cdcSnapshot: latest change wins; delete-last keys drop out") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      // key 1: upsert then newer upsert (out of order in the input)
      (1L, ts("2024-01-02 00:00:00"), 20L, "upsert", 222L),
      (1L, ts("2024-01-01 00:00:00"), 10L, "upsert", 111L),
      // key 2: upsert then delete -> gone
      (2L, ts("2024-01-01 00:00:00"), 11L, "upsert", 100L),
      (2L, ts("2024-01-03 00:00:00"), 30L, "delete", 0L),
      // key 3: same ts, higher change_id wins
      (3L, ts("2024-01-01 00:00:00"), 41L, "upsert", 1L),
      (3L, ts("2024-01-01 00:00:00"), 42L, "upsert", 2L))
      .toDF("k", "ts", "change_id", "op", "val_cents")
    val out = Analytics.cdcSnapshot(changes).orderBy($"k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getLong(2) == 20L && out(0).getLong(3) == 222L)
    assert(out(1).getLong(2) == 42L && out(1).getLong(3) == 2L)
  }

  test("charEntropy: degenerate text scores 0, uniform pair ln 2") {
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val out = Analytics.charEntropy(docs).orderBy($"doc_id").collect()
    assert(out.length == 2) // empty doc filtered
    assert(out(0).getLong(3) == 0L) // H(aaaa) = ln 4 - (4 ln 4)/4 = 0
    assert(out(1).getLong(3) == 693147L) // ln 2 * 1e6 floor
  }

  test("charEntropy: quantization matches the integer recipe by hand") {
    // "aab": n=3, counts {a:2, b:1}
    // esum = 2*floor(ln 2 *1e6) + 1*floor(ln 1 *1e6) = 2*693147 = 1386294
    // H = floor(ln 3 *1e6) - esum div 3 = 1098612 - 462098 = 636514
    val out = Analytics.charEntropy(Seq((1L, "aab")).toDF("doc_id", "text"))
      .collect()
    assert(out.head.getLong(3) == 636514L)
  }

  test("csv and jsonl round trips preserve adversarial text") {
    val nasty = Seq(
      (1L, "en", """comma, "quoted", more"""),
      (2L, "de", "unicode é中文 tail"),
      (3L, "fr", "  leading and trailing  "))
      .toDF("doc_id", "lang", "text")
    val tmpC = java.nio.file.Files.createTempDirectory("csv_rt").toString
    nasty.write.mode("overwrite").option("header", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(tmpC)
    val backC = spark.read.schema("doc_id LONG, lang STRING, text STRING")
      .option("header", "true").option("escape", "\"").csv(tmpC)
      .orderBy($"doc_id").collect()
    assert(backC.map(_.getString(2)).toSeq ==
      nasty.orderBy($"doc_id").collect().map(_.getString(2)).toSeq)

    val tmpJ = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    nasty.write.mode("overwrite").json(tmpJ)
    val backJ = spark.read.schema("doc_id LONG, lang STRING, text STRING")
      .json(tmpJ).orderBy($"doc_id").collect()
    assert(backJ.map(_.getString(2)).toSeq ==
      nasty.orderBy($"doc_id").collect().map(_.getString(2)).toSeq)
  }

  test("corr moments: exact-linear data scores ±1e6 within one ulp") {
    // y = 2x -> corr ~ +1; y = -2x + 100 -> corr ~ -1 (floor may shave
    // one microunit from the FP sqrt product)
    val xs = Seq(10L, 20L, 30L, 40L)
    def corr(y: Long => Long): Long = {
      val pts = xs.map(x => (x, y(x)))
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      math.floor((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)) * 1e6).toLong
    }
    assert(corr(x => 2 * x) >= 999999L)
    assert(corr(x => 100 - 2 * x) <= -999999L)
  }

  test("q21 semi/anti semantics: last shipper on shared orders wins") {
    val d = (s: String) => java.sql.Date.valueOf(s)
    val li = Seq(
      // order 1: suppliers 10 and 20; 20 ships last -> only 20 waits
      (1L, 10L, d("2024-01-01")), (1L, 20L, d("2024-01-05")),
      // order 2: single supplier -> EXISTS fails, nobody counted
      (2L, 10L, d("2024-01-02")),
      // order 3: 10 and 20 tie on the date -> neither strictly later,
      // both pass the anti side and both count
      (3L, 10L, d("2024-01-03")), (3L, 20L, d("2024-01-03")))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    // the reference semantics, written as the literal semi/anti joins
    val l2 = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
    val l3 = li.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"),
      $"l_shipdate".as("d3"))
    val waited = li
      .join(l2, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(l3, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3" &&
        $"d3" > $"l_shipdate", "left_anti")
      .groupBy($"l_suppkey").agg(countDistinct($"l_orderkey").as("numwait"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(waited == Map(10L -> 1L, 20L -> 2L))
    // the production decorrelated top-2 form must agree case for case
    val prod = graft.queries.Analytics.waitingSuppliers(li)
      .groupBy($"l_suppkey").agg(countDistinct($"l_orderkey").as("numwait"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(prod == waited,
      s"decorrelated q21 diverged from the semi/anti reference: $prod")
  }

  test("contQuantiles is bit-identical to the in-memory percentile " +
       "aggregate across fractions and group shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // awkward shapes: singleton group, tied values, even/odd counts,
    // nulls (both sides must skip them)
    val rows = Seq.tabulate(137)(i =>
      ("g" + (i % 5), ((i * 37) % 50).toDouble: java.lang.Double)) ++
      Seq(("solo", 42.0: java.lang.Double),
        ("g0", null: java.lang.Double), ("g3", null: java.lang.Double))
    val df = rows.toDF("g", "v")
    val ps = Seq("q10" -> 0.1, "q25" -> 0.25, "q50" -> 0.5,
      "q77" -> 0.77, "q90" -> 0.9)
    val hist = queries.Analytics.contQuantiles(df, "g", "v", ps)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1))).toMap
    val mem = df.groupBy($"g")
      .agg(percentile($"v", lit(0.1)).as("q10"),
        percentile($"v", lit(0.25)).as("q25"),
        percentile($"v", lit(0.5)).as("q50"),
        percentile($"v", lit(0.77)).as("q77"),
        percentile($"v", lit(0.9)).as("q90"))
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1))).toMap
    assert(hist.keySet == mem.keySet)
    for (g <- mem.keySet; i <- ps.indices)
      assert(java.lang.Double.doubleToLongBits(hist(g)(i)) ==
        java.lang.Double.doubleToLongBits(mem(g)(i)),
        s"group $g ${ps(i)._1}: hist=${hist(g)(i)} mem=${mem(g)(i)}")
  }

  test("q17 threshold algebra: 5*qty*cnt < sum <=> qty < 0.2*avg") {
    // part with qtys 10, 20, 30: avg=20, 0.2*avg=4 -> none qualify
    // part with qtys 1, 99: avg=50, 0.2*avg=10 -> qty=1 qualifies
    for ((qtys, expect) <- Seq(Seq(10L, 20L, 30L) -> 0, Seq(1L, 99L) -> 1)) {
      val sum = qtys.sum; val cnt = qtys.length
      assert(qtys.count(q => 5 * q * cnt < sum) == expect)
    }
  }
}
