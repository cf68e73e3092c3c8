package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, ValueState}

/** Structured-Streaming surface (SURVEY §2.8).
  *
  * The reference is batch-only; its incremental features are idempotent
  * re-runs and missing-timeline catch-up. Here scene/event arrival is
  * modeled as a stream: tumbling event-time windows with watermarks
  * reproduce the continuous timeline composite; `flatMapGroupsWithState`
  * holds per-key session state (the streaming analog of the per-tile
  * blend accumulator). `Trigger.AvailableNow` gives the reference's
  * catch-up semantics (process everything present, then stop).
  */
object StreamOps {

  /** Tumbling event-time aggregation with a watermark — the streaming
    * shape of the `w_events_tumbling` batch query.
    */
  def tumblingCounts(events: DataFrame, windowLength: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy($"user_id", window($"ts", windowLength).as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("value_sum"))
      .select($"user_id", $"w.start".as("wstart"), $"n", $"value_sum")
  }

  /** Sliding event-time aggregation — same operator as
    * [[tumblingCounts]] but each event lands in `window/slide` windows
    * (Spark expands the window spec before the shuffle, so state is
    * per-(key, window) exactly as for tumbling; the watermark still
    * bounds it).
    */
  def slidingCounts(events: DataFrame, windowLength: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupBy($"user_id", window($"ts", windowLength, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("value_sum"))
      .select($"user_id", $"w.start".as("wstart"), $"n", $"value_sum")
  }

  /** Stream-stream interval join: pair each left event with the right
    * events of the same user in `[l.ts, l.ts + maxGap]`. Both sides carry
    * a watermark and the join condition bounds the event-time skew, so
    * Spark can expire join state — the unbounded-state hazard of a plain
    * stream-stream equi-join. Output columns stay alias-qualified
    * (`l.*` / `r.*`); callers select what they need. In batch the same
    * plan runs with the watermark eliminated, so one definition serves
    * the gate query and the streaming path (pinned by StreamOpsSpec).
    * `joinType = "left_outer"` additionally emits each unmatched left row
    * null-padded once the watermark passes `l.ts + maxGap` (in streaming;
    * immediately in batch); `"full_outer"` does the same for both sides
    * (unmatched right rows release once the watermark passes `r.ts`).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   maxGap: String = "30 minutes",
                   watermark: String = "2 hours",
                   joinType: String = "inner",
                   keyCol: String = "user_id",
                   tsCol: String = "ts"): DataFrame = {
    Seq(keyCol, tsCol).foreach { c =>
      require(left.columns.contains(c) && right.columns.contains(c),
        s"intervalJoin: both sides need a '$c' column " +
          s"(left: ${left.columns.mkString(",")}; " +
          s"right: ${right.columns.mkString(",")})")
    }
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(
      s"l.$keyCol = r.$keyCol AND r.$tsCol >= l.$tsCol " +
        s"AND r.$tsCol <= l.$tsCol + INTERVAL $maxGap"),
      joinType)
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(count: Long, sum: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, count: Long, sum: Double,
                              expired: Boolean)

  /** Sessionization with processing-time timeout via
    * `flatMapGroupsWithState` — emits a running snapshot per update and a
    * final row when the session times out.
    */
  def sessionize(events: Dataset[Event], timeoutMs: Long = 30 * 60 * 1000L)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), timeout) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.count, s.sum, expired = true))
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var count = prev.count
            var sum = prev.sum
            var last = prev.lastTs
            rows.foreach { e =>
              count += 1; sum += e.value; last = math.max(last, e.ts.getTime)
            }
            state.update(SessionState(count, sum, last))
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator(SessionOut(user, count, sum, expired = false))
          }
      }
  }

  final case class KeyedEvent(user_id: Long, event_type: String,
                              event_id: Long, ts: java.sql.Timestamp,
                              value: Double)

  /** Streaming first-occurrence dedup via `flatMapGroupsWithState`: the
    * first event of each (user, type) key is emitted, every later arrival
    * is dropped — the streaming analog of the exact-dedup batch operator
    * (state is one boolean per key; contrast with `dropDuplicates`, whose
    * state grows with the number of distinct *events*). Within one
    * micro-batch the earliest (ts, event_id) row wins, so a single
    * `Trigger.AvailableNow` pass reproduces the batch
    * `row_number() = 1` shape exactly (pinned by StreamingSpec and the
    * `w_stream_dedup` gate query).
    */
  def dedupFirstSeen(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, KeyedEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(rows.minBy(e => (e.ts.getTime, e.event_id)))
          }
      }
  }

  /** Stream-static enrichment: join a stream against a slowly-changing
    * dimension table. Stream-static joins are STATELESS in Structured
    * Streaming — each micro-batch joins against the current static
    * snapshot, no watermark required and no state store — and the static
    * side is broadcast (plan-pinned), so the hot path adds a map-side
    * hash probe per event, nothing more. Left join keeps events whose
    * key misses the dimension (they enrich as nulls downstream).
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")

  /** Event-time-TTL dedup, batch replay: per (user, type) key, keep an
    * event iff its ts is ≥ `ttlMs` after the last KEPT event (first event
    * always kept; ties break on event_id). This is the deterministic
    * batch analog of `dropDuplicatesWithinWatermark` — the built-in whose
    * state EXPIRES once the watermark passes a kept row (contrast
    * [[dedupFirstSeen]], whose per-key boolean lives forever): a
    * duplicate inside the TTL window is dropped, a re-occurrence after
    * it survives. The scan is a per-key ordered fold (`flatMapGroups`,
    * the sessionize shape): groups hash-partition across the cluster and
    * each folds independently — state is one timestamp per group.
    * StreamOpsSpec pins the streaming built-in's drop/expire behavior on
    * a MemoryStream; the `w_stream_dedup_ttl` gate replays this shape
    * against a recursive-CTE oracle.
    */
  def dedupEventTimeTtl(events: Dataset[KeyedEvent],
                        ttlMs: Long): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroups { (_: (Long, String), rows: Iterator[KeyedEvent]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[KeyedEvent]
        var lastKept = Long.MinValue
        sorted.foreach { e =>
          if (lastKept == Long.MinValue || e.ts.getTime >= lastKept + ttlMs) {
            out += e; lastKept = e.ts.getTime
          }
        }
        out.result().iterator
      }
  }

  final case class QuotaOut(user_id: Long, event_id: Long, rk: Int,
                            ts: java.sql.Timestamp, value: Double)

  /** Per-key quota (rate limit), batch replay: the first `n` events of
    * each user — ordered by (ts, event_id) — pass with their rank; the
    * rest drop. The per-key ordered fold is the sessionize shape (groups
    * hash-partition, each folds independently); state is ONE counter per
    * key, so at 100 TB the operator's state is O(users), not O(events).
    * The `w_stream_quota` gate replays this against a row_number oracle;
    * [[quotaFirstNStream]] is the streaming form, pinned equal across
    * micro-batches by StreamOpsSpec.
    */
  def quotaFirstN(events: Dataset[KeyedEvent], n: Int): Dataset[QuotaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (user: Long, rows: Iterator[KeyedEvent]) =>
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).take(n)
          .zipWithIndex.map { case (e, i) =>
            QuotaOut(user, e.event_id, i + 1, e.ts, e.value)
          }.iterator
      }
  }

  /** Streaming per-key quota via `flatMapGroupsWithState`: a Long counter
    * per user survives across micro-batches — once a user's quota is
    * spent, every later arrival is dropped for the stream's lifetime.
    * Within one micro-batch rows are ranked in (ts, event_id) order, so a
    * single `Trigger.AvailableNow` pass reproduces [[quotaFirstN]]
    * exactly (pinned by StreamOpsSpec, including the cross-batch case
    * where the quota is partially spent by an earlier batch).
    */
  def quotaFirstNStream(events: Dataset[KeyedEvent], n: Int)
      : Dataset[QuotaOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          if (used >= n) Iterator.empty
          else {
            val kept = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
              .take(n - used.toInt)
            state.update(used + kept.size)
            kept.zipWithIndex.map { case (e, i) =>
              QuotaOut(user, e.event_id, used.toInt + i + 1, e.ts, e.value)
            }.iterator
          }
      }
  }

  final case class TopKOut(user_id: Long, event_id: Long, rk: Int,
                           value: Double)

  /** Streaming per-key top-k via `mapGroupsWithState`: each user's state
    * is the current top-k (value desc, event_id asc) — O(k) per key, not
    * per event — re-emitted as a fresh snapshot every micro-batch the key
    * appears in (Update mode). After the last batch the snapshot equals
    * the batch bounded-heap (`TopKAgg.topKByScore`) over the same events
    * — pinned by StreamOpsSpec; the `w_stream_topk` gate runs the batch
    * heap against a window-rank oracle.
    */
  def topKStream(events: Dataset[KeyedEvent], k: Int): Dataset[TopKOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Double, Long)], TopKOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[List[(Double, Long)]]) =>
          val merged = (state.getOption.getOrElse(Nil) ++
            rows.map(e => (e.value, e.event_id)))
            .sortBy { case (v, id) => (-v, id) }.take(k)
          state.update(merged)
          merged.zipWithIndex.map { case ((v, id), i) =>
            TopKOut(user, id, i + 1, v)
          }.iterator
      }
  }

  final case class FillOut(user_id: Long, event_id: Long,
                           ts: java.sql.Timestamp, masked: Option[Double],
                           filled: Option[Double])

  /** Streaming forward-fill via `flatMapGroupsWithState`: per key, the
    * state is the LAST non-null value seen — each arriving event emits
    * its own value if present, else the carried one. Within a
    * micro-batch rows fill in (ts, event_id) order, so a single
    * AvailableNow pass reproduces the batch `last(ignoreNulls)` window
    * (the `f_ffill` gate); across batches the carried value persists —
    * pinned by StreamOpsSpec. State is ONE double per key at any scale.
    */
  def ffillStream(events: Dataset[KeyedEvent],
                  maskMod: Long = 5L): Dataset[FillOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, FillOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[Double]) =>
          var carried: Option[Double] = state.getOption
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              val m = if (e.event_id % maskMod == 0) Some(e.value) else None
              carried = m.orElse(carried)
              FillOut(user, e.event_id, e.ts, m, carried)
            }
          carried.foreach(state.update)
          out.iterator
      }
  }

  final case class CdcChange(k: Long, ts: java.sql.Timestamp,
                             change_id: Long, op: String, val_cents: Long)
  final case class CdcOut(k: Long, last_ts: java.sql.Timestamp,
                          last_change: Long, last_val_cents: Long,
                          live: Boolean)

  /** Streaming CDC fold via `mapGroupsWithState`: per key the state is
    * the latest change by (ts, change_id) — each micro-batch emits the
    * key's current snapshot row, with `live = false` when the latest
    * change is a delete (a downstream sink drops those keys). Late or
    * out-of-order changes are resolved by the same (ts, change_id)
    * argmax the batch `cdcSnapshot` aggregate uses, so the streaming
    * state converges to the batch snapshot no matter how changes split
    * across micro-batches — pinned by StreamOpsSpec. State is ONE
    * change record per key at any scale.
    */
  def cdcLatestStream(changes: Dataset[CdcChange]): Dataset[CdcOut] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.k)
      .mapGroupsWithState[(Long, Long, String, Long), CdcOut](
        GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[(Long, Long, String, Long)]) =>
          val latest = (state.getOption.iterator ++
            rows.map(c => (c.ts.getTime, c.change_id, c.op, c.val_cents)))
            .maxBy { case (t, id, _, _) => (t, id) }
          state.update(latest)
          CdcOut(key, new java.sql.Timestamp(latest._1), latest._2,
            latest._4, latest._3 == "upsert")
      }
  }

  final case class FunnelState(tv: Long, tc: Long, tp: Long)
  final case class FunnelOut(user_id: Long, stage: Int,
                             tv: Long, tc: Long, tp: Long)

  /** Streaming funnel via `mapGroupsWithState`: per user the state is
    * the three first-touch timestamps (first view, first qualifying
    * click within `clickMs` of it, first qualifying purchase within
    * `purchaseMs` of the click; Long.MaxValue = not reached). Events
    * fold in (ts, event_id) order within a batch and the carried state
    * resolves stage windows across micro-batch boundaries — pinned
    * equal to the batch x_event_funnel stage logic in StreamOpsSpec.
    * State is THREE longs per user at any scale.
    */
  def funnelStream(events: Dataset[KeyedEvent],
                   clickMs: Long = 24L * 3600 * 1000,
                   purchaseMs: Long = 3L * 24 * 3600 * 1000)
      : Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val None_ = Long.MaxValue
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelOut](
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None_, None_, None_))
          for (e <- rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id))) {
            val t = e.ts.getTime
            e.event_type match {
              case "view" if t < s.tv =>
                s = FunnelState(t, s.tc, s.tp)
              case "click" if s.tv != None_ && t > s.tv &&
                  t <= s.tv + clickMs && t < s.tc =>
                s = FunnelState(s.tv, t, s.tp)
              case "purchase" if s.tc != None_ && t > s.tc &&
                  t <= s.tc + purchaseMs && t < s.tp =>
                s = FunnelState(s.tv, s.tc, t)
              case _ => ()
            }
          }
          state.update(s)
          val stage = if (s.tp != None_) 3 else if (s.tc != None_) 2
            else if (s.tv != None_) 1 else 0
          FunnelOut(user, stage, s.tv, s.tc, s.tp)
      }
  }

  final case class BucketCount(event_type: String, hr_us: Long, cnt: Long)
  final case class AnomalyOut(event_type: String, hr_us: Long, cnt: Long,
                              trail_sum: Long, trail_n: Long, flag: Long)

  /** Streaming rate-anomaly detector over a stream of CLOSED bucket
    * counts (the output of a tumbling-window aggregation): per key the
    * state is a ring of the trailing `window` bucket counts; a bucket is
    * flagged when its count exceeds `num/den` × the trailing average
    * (integer cross-multiply — cnt·window·den > trail_sum·num requires a
    * FULL trail, so the first `window` buckets never flag). Buckets fold
    * in hr order within a batch and the ring carries across micro-batches
    * — pinned equal to the batch window-frame shape (the
    * `w_stream_anomaly` gate) in StreamOpsSpec. State is `window` longs
    * per key at any scale.
    */
  def anomalyStream(buckets: Dataset[BucketCount], window: Int = 8,
                    num: Int = 2, den: Int = 1): Dataset[AnomalyOut] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(_.event_type)
      .flatMapGroupsWithState[Vector[Long], AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[Vector[Long]]) =>
          var ring = state.getOption.getOrElse(Vector.empty[Long])
          val out = rows.toSeq.sortBy(_.hr_us).map { b =>
            val trailSum = ring.sum
            val trailN = ring.size.toLong
            val flag =
              if (trailN == window && b.cnt * window * den > trailSum * num)
                1L
              else 0L
            ring = (ring :+ b.cnt).takeRight(window)
            AnomalyOut(key, b.hr_us, b.cnt,
              if (trailN == window) trailSum else 0L, trailN, flag)
          }
          state.update(ring)
          out.iterator
      }
  }

  final case class SessEvent(user_id: Long, ts_us: Long, event_type: String,
                             event_id: Long = 0L)
  final case class SessRow(user_id: Long, session_start_us: Long,
                           n_events: Long, dur_us: Long, purchases: Long)
  private final case class SessState(start: Long, last: Long, n: Long,
                                     purchases: Long)

  /** Gap-based streaming sessionization on the Spark 4
    * `transformWithState` API (the arbitrary-stateful successor to
    * mapGroupsWithState): per user a ValueState holds the open
    * session, and an EVENT-TIME TIMER at last + gap closes it — the
    * session row emits exactly when the watermark proves no more
    * events can extend it, which mapGroupsWithState could only
    * approximate with per-batch timeout sweeps. In-batch gaps close
    * inline; the timer handles the cross-batch tail. State is one
    * 4-long record + one timer per open session, RocksDB-backed.
    * Closed sessions carry the same fields as the batch
    * [[graft.queries.Analytics.sessionize]] shape.
    */
  final class SessionTimerProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessEvent, SessRow] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessState]("session",
        org.apache.spark.sql.Encoders.product[SessState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def close(s: SessState, user: Long): SessRow =
      SessRow(user, s.start, s.n, s.last - s.start, s.purchases)

    private def retime(expiryMs: Long): Unit = {
      val it = getHandle.listTimers()
      while (it.hasNext) getHandle.deleteTimer(it.next().asInstanceOf[Long])
      getHandle.registerTimer(expiryMs)
    }

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessRow] = {
      var out: List[SessRow] = Nil
      var cur: Option[SessState] =
        if (state.exists()) Some(state.get()) else None
      for (e <- rows.toSeq.sortBy(_.ts_us)) {
        val p = if (e.event_type == "purchase") 1L else 0L
        cur match {
          case None =>
            cur = Some(SessState(e.ts_us, e.ts_us, 1L, p))
          case Some(s) if e.ts_us - s.last > gapUs =>
            out ::= close(s, user)
            cur = Some(SessState(e.ts_us, e.ts_us, 1L, p))
          case Some(s) =>
            cur = Some(SessState(s.start, math.max(s.last, e.ts_us),
              s.n + 1, s.purchases + p))
        }
      }
      cur.foreach { s =>
        state.update(s)
        retime((s.last + gapUs) / 1000L)
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessRow] = {
      if (state.exists()) {
        val s = state.get()
        if (expired.getExpiryTimeInMs() >= (s.last + gapUs) / 1000L) {
          state.clear()
          Iterator.single(close(s, user))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** [[SessionTimerProcessor]] wired over a watermarked event stream:
    * emits each CLOSED session once, in Append mode under event time.
    */
  def sessionizeTws(events: Dataset[SessEvent],
                    gapUs: Long = 8L * 3600 * 1000000): Dataset[SessRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", "0 seconds")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  final case class KeyVal(user_id: Long, event_type: String)
  final case class DistinctOut(user_id: Long, n_distinct: Long,
                               new_this_batch: Long)

  /** Streaming exact distinct-count per key on `transformWithState`
    * MAP state: the seen-set lives in RocksDB as per-element map
    * entries — membership probes and inserts touch ONLY the probed
    * element (a ValueState holding a Set would deserialize the whole
    * set per batch; the map scales to large cardinalities because the
    * store, not the JVM heap, owns it). Emits the running distinct
    * count + this batch's novelty per key per batch.
    */
  final class DistinctCountProcessor
      extends StatefulProcessor[Long, KeyVal, DistinctOut] {
    @transient private var seen: org.apache.spark.sql.streaming.MapState[String, Boolean] = _
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      seen = getHandle.getMapState[String, Boolean]("seen",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[KeyVal],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DistinctOut] = {
      var total = if (cnt.exists()) cnt.get() else 0L
      var fresh = 0L
      for (r <- rows) {
        if (!seen.containsKey(r.event_type)) {
          seen.updateValue(r.event_type, true)
          total += 1
          fresh += 1
        }
      }
      cnt.update(total)
      Iterator.single(DistinctOut(user, total, fresh))
    }
  }

  /** [[DistinctCountProcessor]] wired over a keyed stream. */
  def distinctCountStream(events: Dataset[KeyVal]): Dataset[DistinctOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new DistinctCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class PatternHit(user_id: Long, ts_us: Long)

  /** Strict-adjacency sequential pattern detection on `transformWithState`
    * LIST state (the third state primitive, after Value and Map): per
    * user a ListState ring holds the last `pattern.length - 1` event
    * types — O(pattern) state per key, owned by RocksDB — and each
    * arriving event that completes the exact trigram emits a hit. The
    * batch twin is the x_event_pattern gate (two lags over a
    * user-partitioned window); StreamOpsSpec pins the two equal across
    * batch boundaries. In-batch rows sort by (ts_us, event_id) — the
    * same tie-break the batch twin and its DuckDB oracle use — so a
    * pattern split across micro-batches still matches through the
    * carried tail and same-timestamp events order identically.
    */
  final class PatternProcessor(pattern: Seq[String])
      extends StatefulProcessor[Long, SessEvent, PatternHit] {
    @transient private var tail: org.apache.spark.sql.streaming.ListState[String] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      tail = getHandle.getListState[String]("tail",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[PatternHit] = {
      val keep = pattern.length - 1
      var recent: List[String] = {
        val it = tail.get()
        val b = List.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
      var out: List[PatternHit] = Nil
      // event_type is the LAST resort tie-break: producers that leave
      // event_id at its 0L default still get a deterministic order for
      // tied timestamps (a bare (ts_us, event_id) sort would keep
      // arbitrary post-shuffle iterator order on all-equal keys)
      for (e <- rows.toSeq.sortBy(r => (r.ts_us, r.event_id, r.event_type))) {
        if (recent.length == keep &&
            (recent :+ e.event_type) == pattern.toList)
          out ::= PatternHit(user, e.ts_us)
        recent = (recent :+ e.event_type).takeRight(keep)
      }
      tail.put(recent.toArray)
      out.reverseIterator
    }
  }

  /** [[PatternProcessor]] wired for the view→view→purchase trigram. */
  def patternStream(events: Dataset[SessEvent]): Dataset[PatternHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new PatternProcessor(Seq("view", "view", "purchase")),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** The streaming form [[dedupEventTimeTtl]] replays: built-in
    * watermark-bounded dedup — state for a kept key is dropped once the
    * watermark passes its event time plus the delay, so a late duplicate
    * is suppressed only within the watermark horizon and the state store
    * stays bounded by the horizon's key arrival rate, not corpus history.
    */
  def dedupWithinWatermark(events: DataFrame,
                           delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Incremental backfill source: newly-arrived scene files as a stream
    * (`readStream` over a directory of parquet block files), for the C4
    * missing-timeline catch-up path with `Trigger.AvailableNow`.
    */
  def blockFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.raster.Raster.blockSchema)
      .parquet(dir)
}
