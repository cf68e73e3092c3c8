package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** Independent-algorithm cross-checks on seeded random data: the
  * distributed operator vs a brute-force in-memory reference computed
  * with DIFFERENT logic (all-pairs dominance, naive peel loop, linear
  * session scan). The DuckDB oracles replay the same plan shape; these
  * replay only the SPEC, so a shared blind spot in the formulation
  * would surface here.
  */
class CrossCheckSpec extends SparkSpec {

  private def seeds = Seq(7L, 42L, 1234L)

  test("pareto frontier equals all-pairs dominance on random points") {
    val sparkS = spark
    import sparkS.implicits._
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.tabulate(300)(i =>
        (i.toLong, rnd.nextInt(50).toLong + 1, rnd.nextInt(30).toLong + 1))
      val df = pts.toDF("id", "price_x100", "p_size").repartition(7)
      val got = Analytics.paretoFrontier(df)
        .select($"id").as[Long].collect().toSet
      val want = pts.filter { case (_, p, sz) =>
        !pts.exists { case (_, p2, sz2) =>
          p2 >= p && sz2 <= sz && (p2 > p || sz2 < sz)
        }
      }.map(_._1).toSet
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("shardedRank equals the unpartitioned row_number on random data") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      // heavy ties in the order key AND the shard key: the composition
      // must still reproduce the exact total order (v, id)
      val rows = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(40).toLong))
      val df = rows.toDF("id", "v").repartition(7)
      val got = Analytics
        .shardedRank(df, floor($"v" / 4), Seq($"v", $"id"), "rk")
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rk",
          row_number().over(Window.orderBy($"v", $"id")).cast("long"))
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed: sharded rank diverged")
      // per-partition scoping: ranks restart per group
      val grouped = rows.map { case (id, v) => (id, v, (id % 3).toString) }
        .toDF("id", "v", "g").repartition(5)
      val gotG = Analytics.shardedRank(grouped, floor($"v" / 4),
          Seq($"v", $"id"), "rk", part = Seq("g"))
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      val wantG = grouped.withColumn("rk", row_number()
          .over(Window.partitionBy($"g").orderBy($"v", $"id")).cast("long"))
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      assert(gotG == wantG, s"seed $seed: partitioned sharded rank diverged")
    }
  }

  test("shardedRank composite struct shard splits a hot value exactly") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    // 80% of rows share one hot value: a value-bucketed shard would
    // single-task them; the composite (exact v, id-bucket) shard splits
    // the hot value while staying monotone along (v, id)
    val rows = Seq.tabulate(1000)(i =>
      (i.toLong, if (i % 5 != 0) 7L else (i % 40).toLong))
    val df = rows.toDF("id", "v").repartition(7)
    val got = Analytics.shardedRank(df,
        struct($"v", floor($"id" / 64)), Seq($"v", $"id"), "rk")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy($"v", $"id")).cast("long"))
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert(got == want, "composite-shard rank diverged from row_number")
  }

  test("shardedRank edge cases: empty input; constant-key degenerate") {
    val sparkS = spark
    import sparkS.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Analytics.shardedRank(empty, floor($"v" / 4),
      Seq($"v", $"id"), "rk").count() == 0L)
    // every row in ONE shard (constant order key): results stay exact —
    // the helper degrades to a single partitioned window, which is the
    // caller's cue that the shard function must split the key domain
    val const = Seq.tabulate(100)(i => (i.toLong, 7L)).toDF("id", "v")
      .repartition(5)
    val got = Analytics.shardedRank(const, floor($"v" / 4),
        Seq($"v", $"id"), "rk")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert((0L until 100L).forall(i => got(i) == i + 1),
      s"constant-key ranks must still be 1..n: ${got.toSeq.sorted.take(5)}")
  }

  test("ntileOf matches the window ntile for every rank, n <= 40") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.expressions.Window
    // exhaustive over all (n, i <= n) — the boundary cases (n < k,
    // n % k = 0, the remainder cutover row) are all in range
    val rows = for { n <- 1 to 40; i <- 1 to n } yield (n.toLong, i.toLong)
    val df = rows.toDF("n", "i")
    for (k <- Seq(2, 3, 4, 7, 10)) {
      val arith = df.withColumn("b", Analytics.ntileOf(k, "i", "n"))
        .select($"n", $"i", $"b".cast("long"))
        .as[(Long, Long, Long)].collect()
        .map { case (n, i, b) => (n, i) -> b }.toMap
      val ref = df.withColumn("b",
          ntile(k).over(Window.partitionBy($"n").orderBy($"i")).cast("long"))
        .select($"n", $"i", $"b").as[(Long, Long, Long)].collect()
        .map { case (n, i, b) => (n, i) -> b }.toMap
      assert(arith == ref, s"k=$k: arithmetic ntile diverged from window")
    }
  }

  test("kaplanMeier equals the direct product loop on random lifetimes") {
    val sparkS = spark
    import sparkS.implicits._
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val life = Seq.fill(400)((rnd.nextInt(12).toLong,
        if (rnd.nextBoolean()) 1L else 0L))
      val got = Analytics.kaplanMeier(life.toDF("t", "cens").repartition(5))
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // reference: the textbook sequential product over sorted times
      val byT = life.groupBy(_._1).view.mapValues { rows =>
        (rows.size.toLong, rows.count(_._2 == 0L).toLong)
      }.toMap
      val times = byT.keys.toSeq.sorted
      var atRisk = life.size.toLong
      var s = 1.0
      for (t <- times) {
        val (nT, deaths) = byT(t)
        val expected = got(t)
        assert(expected._1 == atRisk, s"seed $seed t=$t at_risk")
        assert(expected._2 == deaths, s"seed $seed t=$t deaths")
        if (deaths > 0) s *= 1.0 - deaths.toDouble / atRisk
        // the quantized pipeline loses < 2e-6 absolute vs the direct
        // product (one 1e-9 floor per step, <= 12 steps)
        assert(math.abs(expected._3 - s * 1e6) <= 2,
          s"seed $seed t=$t: S=${expected._3} vs direct ${s * 1e6}")
        atRisk -= nT
      }
    }
  }

  test("k-core equals the naive peel loop on random graphs") {
    val sparkS = spark
    import sparkS.implicits._
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val df = edges.toDF("a", "b").repartition(5)
      val got = Analytics.kcore(df, k = 3, rounds = 3)
        .select($"v", $"deg").as[(Long, Long)].collect().toMap
      // reference: literal peel — recount degrees over the surviving
      // induced subgraph each round, drop nodes under k
      var es = edges
      var degs = Map.empty[Long, Int]
      for (_ <- 1 to 3) {
        degs = es.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = degs.filter(_._2 >= 3).keySet
        es = es.filter { case (a, b) => keep(a) && keep(b) }
      }
      val want = degs.filter(_._2 >= 3)
        .map { case (v, d) => (v, d.toLong) }
      assert(got == want, s"seed $seed: $got != $want")
    }
  }

  test("operators are partitioning-invariant: 3 vs 13 partitions agree") {
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(99L)
    val pts = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(80).toLong + 1, rnd.nextInt(40).toLong + 1))
      .toDF("id", "price_x100", "p_size")
    def ids(df: org.apache.spark.sql.DataFrame) =
      Analytics.paretoFrontier(df).select($"id").as[Long].collect().toSet
    assert(ids(pts.repartition(3)) == ids(pts.repartition(13)),
      "pareto frontier must not depend on physical partitioning")

    val evs = Seq.tabulate(600)(i => (rnd.nextInt(9).toLong, i.toLong,
      rnd.nextInt(30000).toLong, "view"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    def sess(df: org.apache.spark.sql.DataFrame) =
      Analytics.sessionize(df, 900L)
        .select($"user_id", $"session_start_us", $"n_events")
        .as[(Long, Long, Long)].collect().toSet
    assert(sess(evs.repartition(3)) == sess(evs.repartition(13)),
      "sessionization must not depend on physical partitioning")

    val es = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
    def core(df: org.apache.spark.sql.DataFrame) =
      Analytics.kcore(df, 3, 3).select($"v", $"deg")
        .as[(Long, Long)].collect().toSet
    assert(core(es.repartition(3)) == core(es.repartition(13)),
      "k-core must not depend on physical partitioning")
  }

  test("sessionize equals a linear per-user scan on random event streams") {
    val sparkS = spark
    import sparkS.implicits._
    val gapUs = 1000L
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val evs = Seq.tabulate(500)(i => (rnd.nextInt(8).toLong, i.toLong,
        rnd.nextInt(20000).toLong,
        if (rnd.nextBoolean()) "purchase" else "view"))
      val df = evs.toDF("user_id", "event_id", "ts_us", "event_type")
        .repartition(6)
      val got = Analytics.sessionize(df, gapUs)
        .select($"user_id", $"session_start_us", $"n_events", $"dur_us",
          $"purchases")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // reference: sort each user's stream, split on gap, fold stats
      val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
          case (acc, r) =>
            val e = (r._1, r._2, r._3, r._4)
            acc match {
              case cur :: rest if r._3 - cur.head._3 <= gapUs =>
                (e :: cur) :: rest
              case _ => List(e) :: acc
            }
        }
        sessions.map { s =>
          val ts = s.map(_._3)
          (u, ts.min, s.size.toLong, ts.max - ts.min,
            s.count(_._4 == "purchase").toLong)
        }
      }.toSet
      assert(got == want, s"seed $seed mismatch")
    }
  }
}
