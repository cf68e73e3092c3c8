package graft.operators

import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8 — merge-asset availability probe feeding the merge audit (reference
  * `utils/processing.py:418-443` `_check_rio_file_access` +
  * `utils/image.py:107-144` `validate_merges`).
  *
  * The reference HEAD-requests every merge asset URL on a driver-side
  * thread pool and folds failures into a per-date audit dict. Spark-first:
  * the probe runs inside `mapPartitions` (one task per URL partition — at
  * 100 TB the asset list is itself a big table, so the probe must be
  * distributed, not a driver loop), and the audit is an ordinary
  * aggregation the optimizer can fuse with whatever produced the URLs.
  */
object Availability {

  /** Probe outcome. `status` is the HTTP code, 0 for filesystem probes,
    * -1 for connection-level failures.
    */
  final case class Probe(ok: Boolean, status: Int, error: Option[String])

  /** Probe one URL. `http(s)` URLs get a HEAD request with the reference's
    * error classification (403 with/without credentials, 500, connection
    * refused). The reference passes non-HTTP URIs through unchecked
    * (`_check_rio_file_access` returns early); local paths get a genuine
    * readability probe here instead — executors have the filesystem.
    */
  def probeUrl(url: String, apiKey: Option[String] = None,
               timeoutMs: Int = 10000): Probe = {
    if (url == null || url.isEmpty) return Probe(ok = true, 0, None)
    if (url.startsWith("http://") || url.startsWith("https://")) {
      try {
        val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("HEAD")
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        apiKey.foreach(k => conn.setRequestProperty("X-Api-Key", k))
        val code = conn.getResponseCode
        conn.disconnect()
        if (code < 400) Probe(ok = true, code, None)
        else {
          val authed = apiKey.isDefined || url.contains("access_token=")
          Probe(ok = false, code, Some(classify(code, authed)))
        }
      } catch {
        case _: java.io.IOException => Probe(ok = false, -1, Some(s"Connection refused $url"))
      }
    } else if (url.startsWith("file://") || url.startsWith("/")) {
      val p = if (url.startsWith("file://")) Paths.get(new URI(url)) else Paths.get(url)
      if (Files.isReadable(p)) Probe(ok = true, 0, None)
      else Probe(ok = false, 404, Some(s"File not found ${p.getFileName}"))
    } else Probe(ok = true, 0, None) // other schemes pass, like the reference
  }

  private def classify(code: Int, authed: Boolean): String = code match {
    case 403 if authed => "You don't have permission to request this resource."
    case 403           => "Missing Authentication Token."
    case _             => "Could not request this resource."
  }

  /** Append `ok`/`status`/`error` columns by probing `urlCol` per
    * partition. The probe is the only non-relational step; everything
    * upstream (pushdown, pruning) and downstream (the audit aggregation)
    * stays in Catalyst.
    *
    * HEAD probes are latency-bound, not CPU-bound, so each task keeps up
    * to `concurrency` requests in flight on a bounded per-partition pool
    * (the reference hides the same latency with a cpu_count thread pool,
    * `utils/image.py:107-117`, `config.py:83`). Rows are emitted in input
    * order — batches are submitted together and collected in order — so
    * results stay deterministic.
    */
  def probe(df: DataFrame, urlCol: String = "link",
            apiKey: Option[String] = None,
            concurrency: Int = 8): DataFrame = {
    val urlIdx = df.schema.fieldIndex(urlCol)
    val outSchema = df.schema
      .add("ok", BooleanType, nullable = false)
      .add("status", IntegerType, nullable = false)
      .add("error", StringType, nullable = true)
    df.mapPartitions { rows =>
      probeRows(rows, urlIdx, apiKey, concurrency)
    }(Encoders.row(outSchema))
  }

  /** Per-partition kernel behind [[probe]] (factored out for direct unit
    * testing of the latency batching). Probes at most `concurrency` URLs
    * concurrently; preserves input order.
    */
  private[graft] def probeRows(rows: Iterator[Row], urlIdx: Int,
                               apiKey: Option[String],
                               concurrency: Int): Iterator[Row] = {
    def out(r: Row, p: Probe): Row =
      Row.fromSeq(r.toSeq ++ Seq(p.ok, p.status, p.error.orNull))
    if (concurrency <= 1) rows.map(r => out(r, probeUrl(r.getString(urlIdx), apiKey)))
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      val it = rows.grouped(concurrency * 4).flatMap { batch =>
        batch.map { r =>
          pool.submit(new java.util.concurrent.Callable[Row] {
            override def call(): Row = out(r, probeUrl(r.getString(urlIdx), apiKey))
          })
        }.map(_.get())
      }
      // eagerly shut the pool once drained (task listener is the backstop
      // for partial consumption, e.g. under LIMIT)
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) pool.shutdown()
          h
        }
        override def next(): Row = it.next()
      }
    }
  }

  /** Per-date merge audit over probed assets (`validate_merges` output
    * shape: bands seen, error messages collected, counts). Expects
    * `date`, `band`, `ok`, `error` columns from [[probe]].
    */
  def mergeAudit(probed: DataFrame): DataFrame =
    probed.groupBy(col("date"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("ok_n"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("err_n"),
        sort_array(collect_set(col("band"))).as("bands"),
        sort_array(collect_list(when(!col("ok"), col("error")))).as("errors"))
}
