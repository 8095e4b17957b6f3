package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice (SURVEY.md §2.8/§7.5 parity-plus: the
  * reference is batch-only, but the engine exposes the stream-shaped
  * `events` semantics as streaming operators).
  *
  * Both operators are written against plain Datasets so the SAME code runs
  * in batch (where the driver's DuckDB oracle can check it) and under
  * `readStream` (exercised with MemoryStream in the test suite):
  *
  *  - [[windowedCounts]]: tumbling-window count by key — the streaming twin
  *    of the A10 year-month rollup. With a watermark, late data beyond the
  *    horizon is dropped and window state is bounded: O(keys × open
  *    windows), never O(rows).
  *  - [[sessionize]]: gap-based sessions via `flatMapGroupsWithState` — the
  *    streaming twin of the windowed batch `sessionize` query. State per
  *    key is one open session (O(1)); closed sessions are emitted
  *    incrementally (append mode) and the open one on event-time timeout.
  */
object EventStreams {

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  final case class Session(user_id: Long, session_id: Long, n_events: Long,
                           start_s: Long, end_s: Long)
  // public: the state encoder's generated code needs constructor access
  final case class SessState(nextSessionId: Long, n: Long,
                             startS: Long, endS: Long)

  /** Tumbling- or sliding-window counts with watermark. `ts` must be an
    * event-time column named `ts`. Works identically on batch input
    * (watermark is a no-op there). A `slide` shorter than `windowLen`
    * makes windows overlap — each event lands in windowLen/slide windows,
    * state stays O(keys × open windows).
    * Output: (key, win_start_s, win_end_s, cnt). */
  def windowedCounts(events: DataFrame, key: String,
                     windowLen: String = "1 day",
                     watermark: String = "2 days",
                     slide: Option[String] = None): DataFrame = {
    // empty watermark = already defined upstream: a chain of stateful
    // operators (e.g. dedupStream → ... → windowed agg) must define the
    // watermark ONCE before the first stateful op — Spark rejects a
    // redefinition mid-chain
    val src =
      if (watermark.isEmpty) events else events.withWatermark("ts", watermark)
    src
      .groupBy(col(key).as("key"),
        window(col("ts"), windowLen, slide.getOrElse(windowLen)))
      .agg(count(lit(1)).as("cnt"))
      .select(col("key"),
        unix_timestamp(col("window.start")).as("win_start_s"),
        unix_timestamp(col("window.end")).as("win_end_s"),
        col("cnt"))
  }

  /** Trending top-k: the k heaviest keys per tumbling window, ranked —
    * the "what's hot right now" query every event pipeline ends up
    * needing. Composes [[windowedCounts]] with a per-window rank; ties
    * break lexicographically on key so output is deterministic.
    *
    * Streaming deployment note: a rank over a streaming aggregate is not
    * expressible in append mode (the window must be complete before rank
    * is final), so in production this runs the windowedCounts stage as the
    * stream and applies the rank per CLOSED window in `foreachBatch` —
    * identical code path to this batch twin, which is what the oracle
    * checks. Output: (win_start_s, win_end_s, key, cnt, rn). */
  def trendingTopK(events: DataFrame, key: String, k: Int,
                   windowLen: String = "1 day",
                   watermark: String = "2 days"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    graft.ops.Relational.topKPerGroup(
      windowedCounts(events, key, windowLen, watermark),
      partitionCols = Seq(col("win_start_s")),
      orderCols = Seq(col("cnt").desc, col("key")), k = k)
      .select(col("win_start_s"), col("win_end_s"), col("key"),
        col("cnt"), col("rn"))
  }

  /** Gap sessionization with one-open-session state per user.
    *
    * Streaming: events arrive in micro-batches; a session closes when a
    * later event exceeds `gapSec` (emitted then) or on event-time timeout.
    * Batch: the per-group iterator is sorted in memory first (bounded by a
    * single user's history — at cluster scale the streaming path is the
    * one that sees unbounded data, and its state is O(1) per user).
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap horizon: close it,
            // but KEEP the per-user counter (n = 0 marks "no open
            // session") — removing state would restart session_id at 1 on
            // the user's next activity and collide (user, session) keys
            // already emitted in append mode. An idle user holds a few
            // bytes of counter state until their next event; no further
            // timeout is scheduled while nothing is open.
            val st = state.get
            state.update(SessState(st.nextSessionId, 0L, Long.MinValue, Long.MinValue))
            Iterator.single(Session(userId, st.nextSessionId, st.n, st.startS, st.endS))
          } else {
            val sorted = it.toArray
              .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.getOrElse(
              SessState(0L, 0L, Long.MinValue, Long.MinValue))
            sorted.foreach { e =>
              val s = e.ts.getTime / 1000
              if (st.n == 0L) {
                st = SessState(st.nextSessionId + 1, 1L, s, s)
              } else if (s - st.endS > gapSec) {
                out += Session(userId, st.nextSessionId, st.n, st.startS, st.endS)
                st = SessState(st.nextSessionId + 1, 1L, s, s)
              } else {
                st = st.copy(n = st.n + 1, endS = math.max(st.endS, s))
              }
            }
            state.update(st)
            // clamp to the watermark: a batch of only-late events leaves
            // endS + gap behind it, and setTimeoutTimestamp THROWS for a
            // non-future timestamp — one replayed stale event must not
            // kill the query
            val horizon = (st.endS + gapSec) * 1000 + 1
            val wm = try state.getCurrentWatermarkMs()
                     catch { case _: UnsupportedOperationException => Long.MinValue }
            state.setTimeoutTimestamp(math.max(horizon, wm + 1))
            out.iterator
          }
      }
  }

  final case class ValueEvent(user_id: Long, event_id: Long, ts: Timestamp,
                              value: Double)
  final case class EwmaState(acc: Double, n: Long)
  final case class EwmaRow(user_id: Long, n_events: Long, ewma_r: Double)

  /** Streaming per-user EWMA — the running twin of
    * [[graft.ops.Profiler.ewmaPerKey]]: O(1) state per user (the
    * current accumulator and count), each micro-batch folds its new
    * events in (ts, event_id) order into the running value and emits
    * the user's updated row (update mode).
    *
    * Agreement with the batch fold is exact when events arrive in
    * order per user across batches (the spec's shape); a late
    * out-of-order arrival folds at arrival position — the standard
    * running-metric approximation. Rounding matches Catalyst's
    * `round(_, 6)` (Scala BigDecimal HALF_UP), so stream and batch
    * rows compare equal, not just close. */
  def ewmaStream(events: Dataset[ValueEvent],
                 alpha: Double = 0.25): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0,1], got $alpha")
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[ValueEvent], state: GroupState[EwmaState]) =>
          // full microsecond resolution (getTime truncates to ms; the
          // batch twin and the DuckDB oracle order by the micros ts)
          val sorted = it.toArray
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var st = state.getOption.getOrElse(EwmaState(0.0, 0L))
          sorted.foreach { e =>
            st = if (st.n == 0L) EwmaState(e.value, 1L)
                 else EwmaState(alpha * e.value + (1.0 - alpha) * st.acc,
                   st.n + 1L)
          }
          state.update(st)
          EwmaRow(uid, st.n, BigDecimal(st.acc)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
  }

  /** Streaming exact dedup for a document stream: content-hash the payload
    * and keep the first arrival, dropping later duplicates that arrive
    * within `horizon` of each other (state is bounded by the watermark —
    * the streaming twin of [[graft.ops.Dedup.exact]]). Spark's
    * `dropDuplicatesWithinWatermark` supplies the bounded-state engine;
    * this operator contributes the content-identity key and applies the
    * `ts` watermark itself, so callers need no pre-applied watermark. */
  def dedupStream(docs: DataFrame, ts: String, payload: String,
                  horizon: String = "1 hour"): DataFrame =
    docs
      .withWatermark(ts, horizon)
      .withColumn("content_hash",
        org.apache.spark.sql.functions.md5(col(payload)))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming NEAR-dedup of a document stream against a static corpus —
    * the streaming twin of [[graft.ops.Dedup.minhashIncremental]] (the
    * per-batch delta-vs-corpus shape, run continuously): each arriving
    * document's minhash band buckets probe the corpus's precomputed
    * bucket index, and candidates are verified with one exact Jaccard.
    *
    * State posture, band by band:
    *  - the bucket probe is a STREAM-STATIC equi-join on (band, bucket) —
    *    stateless by construction (each micro-batch joins its rows
    *    against the static index; nothing is buffered between batches);
    *  - a pair colliding in several bands would emit once per band, so
    *    pairs are deduped with `dropDuplicatesWithinWatermark` keyed on
    *    (in_id, corpus_id) — the ONLY stateful operator, bounded by the
    *    `horizon` watermark;
    *  - verification joins the corpus shingle sets back AFTER the pair
    *    dedup — verify-once, exactly the batch operator's discipline.
    *
    * The incoming side carries its shingle set through the probe (the
    * delta is small by definition; re-deriving it post-dedup would need a
    * stream-stream self-join, i.e. state). Callers should `persist()` the
    * static corpus frames via `staticIndex` reuse across micro-batches.
    *
    * `incoming` needs (id, ts, text); output: (in_id, corpus_id, jaccard)
    * in append mode. */
  def nearDupStream(incoming: DataFrame, corpus: DataFrame,
                    horizon: String = "1 hour",
                    n: Int = 3, k: Int = 64, rowsPerBand: Int = 4,
                    jaccardThreshold: Double = 0.7): DataFrame = {
    import graft.ops.Dedup
    val corpusBase = corpus
      .select(col("doc_id").cast("long").as("corpus_id"),
        Dedup.shingleHashes64(col("text"), n).as("sh_c"))
    val corpusBuckets = corpusBase
      .select(col("corpus_id"),
        posexplode(Dedup.minhashBandBuckets(col("sh_c"), k, rowsPerBand))
          .as(Seq("band", "bucket")))
    val inc = incoming
      .withWatermark("ts", horizon)
      .select(col("doc_id").cast("long").as("in_id"), col("ts"),
        Dedup.shingleHashes64(col("text"), n).as("sh_i"))
      .select(col("in_id"), col("ts"), col("sh_i"),
        posexplode(Dedup.minhashBandBuckets(col("sh_i"), k, rowsPerBand))
          .as(Seq("band", "bucket")))
    inc.join(corpusBuckets, Seq("band", "bucket"))
      .select(col("in_id"), col("ts"), col("corpus_id"), col("sh_i"))
      .dropDuplicatesWithinWatermark("in_id", "corpus_id")
      .join(corpusBase, "corpus_id")
      .select(col("in_id"), col("corpus_id"),
        (size(array_intersect(col("sh_i"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_c")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** Stream-stream time-interval join: pairs of events within ±`windowS`
    * seconds of each other — the streaming twin of
    * [[graft.ops.RangeJoin.within]], using the same time-binning trick.
    *
    * A raw time-range-only stream-stream join gives the state store no
    * key: every task would buffer BOTH streams' full horizon and compare
    * all-pairs per micro-batch. Binning each side to `windowS`-sized
    * buckets (left rows replicated to the 3 covering bins) restores an
    * equi-key, so state is hash-partitioned by bin and each row meets only
    * its temporal neighborhood — the same linearization the batch operator
    * gets. Watermarks on both sides bound state: rows age out once the
    * other stream's watermark passes their bin.
    *
    * Both inputs need (`event_id`, `ts`) columns. The range predicate is
    * on raw event time; the batch query truncates to whole seconds first,
    * so the two agree on integral-second data (which the oracle fixtures
    * are).
    */
  def nearJoin(left: DataFrame, right: DataFrame, windowS: Long,
               watermark: String = "1 hour"): DataFrame = {
    require(windowS > 0, s"window must be positive, got $windowS")
    val w = make_dt_interval(lit(0), lit(0), lit(0), lit(windowS.toDouble))
    val l = left.select(col("event_id").as("left_id"), col("ts").as("left_ts"))
      .withWatermark("left_ts", watermark)
      .withColumn("_dbin", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_bin",
        floor(unix_timestamp(col("left_ts")) / windowS) + col("_dbin"))
      .drop("_dbin")
    val r = right.select(col("event_id").as("right_id"), col("ts").as("right_ts"))
      .withWatermark("right_ts", watermark)
      .withColumn("_rbin", floor(unix_timestamp(col("right_ts")) / windowS))
    l.join(r,
        col("_bin") === col("_rbin") &&
          col("right_ts") >= col("left_ts") - w &&
          col("right_ts") <= col("left_ts") + w &&
          col("left_id") =!= col("right_id"))
      .select("left_id", "left_ts", "right_id", "right_ts")
  }

  /** Stream-static dimension enrichment — the standard streaming join:
    * every micro-batch of the fact stream hash-joins the (small,
    * slowly-changing) dimension snapshot, `broadcast`-hinted so the
    * stream side never shuffles and no join state accumulates. Unlike a
    * stream-stream join, the static side is re-resolvable per batch, so
    * the left-outer form needs no watermark and unmatched facts emit
    * immediately with null dimension columns. Works identically on batch
    * input — the batch twin is what the oracle hash-checks. */
  def enrichWithDim(facts: DataFrame, dim: DataFrame,
                    factKey: Column, dimKey: Column): DataFrame =
    facts.join(broadcast(dim), factKey === dimKey, "left")

  /** Batch form of [[sessionize]] that also FLUSHES the final open session
    * per user (batch input is complete, so the open session is closed by
    * definition). Matches the batch `sessionize` window query row-for-row.
    *
    * Secondary sort, not per-group buffering: events are hash-partitioned
    * by user and SORTED WITHIN PARTITIONS by (user, ts, event_id) — a
    * spillable Spark sort — then a single streaming pass detects user and
    * gap boundaries. Memory per task is O(1), so a hot user with a huge
    * history cannot blow a heap the way an `it.toArray` per group would.
    */
  def sessionizeBatch(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        new Iterator[Session] {
          private var curUser = 0L
          private var hasOpen = false
          private var sessionId = 0L
          private var n = 0L
          private var startS = 0L
          private var endS = 0L
          private var pending: Session = null
          private var exhausted = false

          private def closeOpen(): Session =
            Session(curUser, sessionId, n, startS, endS)

          private def advance(): Unit = {
            while (pending == null && !exhausted) {
              if (it.hasNext) {
                val e = it.next()
                val s = e.ts.getTime / 1000
                if (!hasOpen || e.user_id != curUser) {
                  if (hasOpen) pending = closeOpen()
                  curUser = e.user_id; hasOpen = true
                  sessionId = 1L; n = 1L; startS = s; endS = s
                } else if (s - endS > gapSec) {
                  pending = closeOpen()
                  sessionId += 1; n = 1L; startS = s; endS = s
                } else {
                  n += 1; endS = math.max(endS, s)
                }
              } else {
                exhausted = true
                if (hasOpen) { pending = closeOpen(); hasOpen = false }
              }
            }
          }

          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): Session = {
            advance()
            val r = pending; pending = null; r
          }
        }
      }
  }
}
