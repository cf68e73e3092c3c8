package graft

import org.apache.spark.sql.functions._
import graft.queries.{Pipeline, Tables}

/** Unit semantics for the RAG chunker and the concat-and-chunk sequence
  * packer, including the distributed-prefix-sum == naive-global-window
  * equivalence that PlanQualitySpec's shard pin relies on.
  */
class PackChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunkWindows: crafted doc — offsets, overlap, and short tail") {
    // 50 words: size 32 / stride 24 → chunks at word 1 (len 32) and 25 (len 26)
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text")
    val out = Pipeline.chunkWindows(df, size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_word", "chunk_words")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L, 1L, 32L), (1L, 1L, 25L, 26L),
      (2L, 0L, 1L, 1L)))
  }

  test("chunkWindows: chunks tile the doc — first chunk at 1, steps of stride, all words covered") {
    val chunks = Pipeline.chunkWindows(Tables.documents(spark, sfDir), 32, 24)
    val bad = chunks.groupBy($"doc_id")
      .agg(min($"start_word").as("first"),
        max($"start_word" + $"chunk_words").as("cover_end"),
        count(lit(1)).as("n_chunks"),
        max($"chunk_idx").as("max_idx"))
      .join(Tables.documents(spark, sfDir)
        .filter(length(trim($"text")) > 0)
        .select($"doc_id", size(split(trim($"text"), " +")).cast("long").as("nw")),
        "doc_id")
      .filter($"first" =!= 1 || $"cover_end" =!= $"nw" + 1 ||
        $"n_chunks" =!= $"max_idx" + 1)
    assert(bad.count() == 0, "every doc must be tiled from word 1 to its end")
  }

  test("packBins: distributed prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    for (budget <- Seq(128, 512); shard <- Seq(16, 64)) {
      val dist = Pipeline.packBins(docs, budget, shard)
      val toks = docs.filter(length(trim($"text")) > 0)
        .select($"doc_id",
          size(split(trim($"text"), " +")).cast("long").as("tokens"))
      val w = Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val naive = toks
        .select($"doc_id", $"tokens",
          coalesce(sum($"tokens").over(w), lit(0L)).as("cum_before"))
        .select($"doc_id", $"tokens",
          floor($"cum_before" / budget).cast("long").as("bin_id"))
        .groupBy($"bin_id")
        .agg(count(lit(1)).as("docs"), sum($"tokens").as("bin_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      assert(dist.exceptAll(naive).count() == 0 &&
        naive.exceptAll(dist).count() == 0,
        s"packBins(budget=$budget, shard=$shard) diverged from the naive window")
    }
  }

  test("sourceMix: budget respected and sampling is a subset of each source") {
    val mix = Pipeline.sourceMix(Tables.documents(spark, sfDir)).cache()
    val bad = mix.filter($"sampled" > $"n" || $"rate_x65536" < 0 ||
      $"rate_x65536" > 65536)
    assert(bad.count() == 0, "sampled must not exceed source size")
    // Σ nᵢ·rateᵢ ≈ the doc budget (total/4): the allocation adds up
    val (total, exp) = mix.agg(sum($"n"),
      sum($"n" * $"rate_x65536" / 65536.0)).as[(Long, Double)].head()
    assert(math.abs(exp - total / 4.0) < total * 0.02,
      s"expected allocation ~${total / 4}, got $exp")
    mix.unpersist()
  }

  test("shuffledExport: partitions are contiguous, internally-sorted key slices") {
    val out = Pipeline.shuffledExport(Tables.documents(spark, sfDir), 4)
    val parts = out.select($"k")
      .withColumn("pid", spark_partition_id())
      .groupBy($"pid").agg(min($"k").as("lo"), max($"k").as("hi"),
        count(lit(1)).as("n"))
      .orderBy($"pid").collect()
    assert(parts.map(_.getLong(3)).sum == 500)
    // ranges must not overlap across ascending partition ids
    val ordered = parts.sliding(2).forall {
      case Array(a, b) => a.getString(2) <= b.getString(1)
      case _ => true
    }
    assert(ordered, s"partition key ranges overlap: ${parts.mkString(";")}")
  }

  test("packBins: bins conserve tokens and cover a contiguous id range") {
    val docs = Tables.documents(spark, sfDir)
    val bins = Pipeline.packBins(docs, 512).cache()
    val total = docs.filter(length(trim($"text")) > 0)
      .select(sum(size(split(trim($"text"), " +")).cast("long")))
      .as[Long].head()
    assert(bins.agg(sum($"bin_tokens")).as[Long].head() == total)
    // first_doc of bin k+1 follows last_doc of bin k (doc tape is ordered)
    import org.apache.spark.sql.expressions.Window
    val seq = bins.select($"bin_id", $"first_doc", $"last_doc",
      lag($"last_doc", 1).over(Window.orderBy($"bin_id")).as("prev_last"))
      .filter($"prev_last".isNotNull && $"first_doc" <= $"prev_last")
    assert(seq.count() == 0, "bin id ranges must be disjoint and ordered")
    bins.unpersist()
  }
}
