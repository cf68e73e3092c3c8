package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{GraftExtensions, GraftFunctions, LevenshteinGuard}

/** The SQL front-door: custom expressions reachable from pure SQL via
  * the registry, and the LevenshteinGuard optimizer rule through both
  * wiring paths (spark.sql.extensions at session build;
  * experimental.extraOptimizations on a live session).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("registered functions evaluate from pure SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
           graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
                     array(cast(3.0 as float), cast(4.0 as float))) AS dp,
           graft_pixel_sum(array(1, 2, 3, 250)) AS ps""").collect().head
    assert(row.getDouble(0) == 11.0)
    assert(row.getLong(1) == 256L)
    val hist = spark.sql(
      """SELECT graft_value_histogram(array(5, 5, 0, 7), 0) AS h""")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(hist == Map(5 -> 2L, 7 -> 1L), s"got $hist")
  }

  test("NormalizeNFC composes decomposed accents; codegen matches eval") {
    val sparkS = spark
    import sparkS.implicits._
    import graft.functions.TextExpressions.nfcNormalize
    val df = Seq("café", "café", "plain", null)
      .toDF("s").repartition(2)
    val out = df.select(nfcNormalize($"s").as("n"), length($"s").as("l"),
        length(nfcNormalize($"s")).as("ln"))
      .collect()
    val vals = out.map(r => Option(r.getString(0)))
    assert(vals.count(_.contains("caf\u00e9")) == 2,
      "both spellings must normalize to the precomposed form")
    assert(vals.contains(None), "null passes through")
    // the decomposed input loses one codepoint under NFC
    assert(out.filter(r => !r.isNullAt(0)).exists(r =>
      r.getInt(1) == 5 && r.getInt(2) == 4))
    // SQL registry path
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_nfc('café') = 'café'")
      .collect().head.getBoolean(0))
  }

  test("levenshtein guard: added once, results unchanged, plan guarded") {
    val sparkS = spark
    import sparkS.implicits._
    val prev = spark.experimental.extraOptimizations
    // a column-vs-column distance over a file scan: the Filter node
    // survives optimization (a literal-only local relation would fold)
    def q = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(levenshtein($"lang", $"source") <= 4)
      .select($"doc_id")
    spark.experimental.extraOptimizations = prev :+ LevenshteinGuard
    try {
      val guarded = q
      val optimized = guarded.queryExecution.optimizedPlan
      assert(optimized.toString.toLowerCase.contains("abs("),
        s"expected the length guard in:\n$optimized")
      // idempotent: a second application changes nothing
      assert(LevenshteinGuard(optimized).sameResult(optimized),
        "guard must be a fixpoint after one application")
      val withGuard = guarded.count()
      // strip the rule explicitly — another suite may have install()ed it
      spark.experimental.extraOptimizations =
        prev.filterNot(_ == LevenshteinGuard)
      val bare = q
      assert(!bare.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("abs("), "control plan must be unguarded")
      assert(withGuard == bare.count(), "guard must not change results")
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("levenshtein guard skips the 3-arg thresholded form and " +
       "negative bounds") {
    val sparkS = spark
    import sparkS.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ LevenshteinGuard
    try {
      // Spark 4's levenshtein(a, b, t) returns -1 past the threshold, so
      // lev(a,b,3) <= 4 is TRUE for arbitrarily distant pairs; a length
      // guard there would drop rows. The rule must not fire.
      val threeArg = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(expr("levenshtein(lang, substr(text, 1, 40), 3) <= 4"))
        .select($"doc_id")
      assert(!threeArg.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("abs("), "guard must not fire on the thresholded form")
      // semantic check: the thresholded form returns -1 past the
      // threshold and -1 <= 4 holds, so EVERY row passes — including
      // rows whose length gap exceeds 4, exactly the rows a mis-fired
      // length guard would drop. Assert the fixture has such rows and
      // that none were lost.
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val total = docs.count()
      val gapRows = docs
        .filter(abs(length($"lang") -
          length(substring($"text", 1, 40))) > 4).count()
      assert(gapRows > 0,
        "fixture must contain rows a mis-fired length guard would drop")
      val kept = threeArg.count()
      assert(kept == total,
        s"thresholded form kept $kept of $total rows " +
        s"($gapRows of them have length gap > 4 and must survive)")
      // a negative bound is always-false; the guard must not fire either
      val neg = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(levenshtein($"lang", $"source") <= -1)
      assert(!neg.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("abs("), "guard must not fire on a negative bound")
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("withExtensions wires functions + rule at session build") {
    // a FRESH session on the shared context built through the public
    // extensions hook — the same injection spark.sql.extensions performs
    // at cluster deploy (that static conf is read from the
    // SparkContext's own config, which a shared test context predates)
    val active = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "expected a fresh session")
      val dp = s2.sql(
        """SELECT graft_dot(array(cast(2.0 as float)),
                            array(cast(8.0 as float))) AS dp""")
        .collect().head.getDouble(0)
      assert(dp == 16.0)
      import s2.implicits._
      val plan = s2.read.parquet(s"$sfDir/documents.parquet")
        .filter(levenshtein($"lang", $"source") <= 1)
        .queryExecution.optimizedPlan
      assert(plan.toString.toLowerCase.contains("abs("),
        s"injected rule must fire in the new session:\n$plan")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      active.foreach(SparkSession.setActiveSession)
      active.foreach(SparkSession.setDefaultSession)
    }
  }
}
