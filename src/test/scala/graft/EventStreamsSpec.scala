package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** The streaming operators under a real streaming execution (MemoryStream
  * micro-batches → memory sink), plus batch/stream agreement. */
class EventStreamsSpec extends SparkSpec {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000)

  test("windowedCounts under readStream: watermark + tumbling windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("event_type", "ts")
    val q = EventStreams.windowedCounts(df, key = "event_type",
      windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("wc_out")
      .outputMode("append").start()
    val day = 86400L * 19000
    mem.addData(
      ("click", ts(day + 100)), ("click", ts(day + 200)),
      ("view", ts(day + 3700)), ("click", ts(day + 3800)),
      // advance watermark far enough to close earlier windows
      ("click", ts(day + 3600 * 5)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    // first hour window: 2 clicks; second hour: 1 view + 1 click
    assert(out.contains(("click", day, 2L)))
    assert(out.contains(("view", day + 3600, 1L)))
    assert(out.contains(("click", day + 3600, 1L)))
  }

  test("trendingTopK streaming deployment: windowedCounts stream + " +
    "per-closed-window rank in foreachBatch matches the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val df = mem.toDF().toDF("event_type", "ts")
    val day = 86400L * 19100
    val ranked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Int)]
    // production shape: stream the windowed counts (append fires only for
    // CLOSED windows), rank inside foreachBatch over each emitted window
    val q = EventStreams.windowedCounts(df, key = "event_type",
      windowLen = "1 day", watermark = "1 day")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.Relational.topKPerGroup(batch,
          Seq(col("win_start_s")), Seq(col("cnt").desc, col("key")), k = 2)
          .collect().foreach(r => ranked.synchronized {
            ranked += ((r.getAs[Long]("win_start_s"), r.getAs[String]("key"),
              r.getAs[Long]("cnt"), r.getAs[Int]("rn")))
          })
        ()
      }
      .start()
    mem.addData(
      ("a", ts(day + 10)), ("a", ts(day + 20)), ("a", ts(day + 30)),
      ("b", ts(day + 40)), ("b", ts(day + 50)), ("c", ts(day + 60)))
    q.processAllAvailable()
    // next-day data advances the watermark past day 1 -> window closes
    mem.addData(("b", ts(day + 2 * 86400 + 10)))
    q.processAllAvailable()
    q.stop()
    val batchTwin = EventStreams.trendingTopK(
      spark.createDataFrame(Seq(
        ("a", ts(day + 10)), ("a", ts(day + 20)), ("a", ts(day + 30)),
        ("b", ts(day + 40)), ("b", ts(day + 50)), ("c", ts(day + 60))))
        .toDF("event_type", "ts"), "event_type", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(ranked.toSet == batchTwin,
      s"streaming ${ranked.toSet} != batch $batchTwin")
  }

  test("composed streaming DAG: dedupStream → enrichWithDim → " +
    "windowedCounts across micro-batches (chained stateful operators)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val b = 86400L * 19600
    val dim = Seq(1L -> "GOLD", 2L -> "SILVER").toDF("cust_id", "segment")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF().toDF("ts", "user_id", "payload")
    // the full intake pipeline as ONE streaming query: content dedup
    // (stateful, watermark-bounded) → dimension enrich (stateless
    // broadcast) → windowed segment counts (stateful agg)
    val piped = EventStreams.windowedCounts(
      EventStreams.enrichWithDim(
        EventStreams.dedupStream(docs, "ts", "payload", horizon = "2 hours"),
        dim, col("user_id"), col("cust_id")),
      // watermark "": already defined by dedupStream — a stateful chain
      // defines it once, before the first stateful operator
      key = "segment", windowLen = "1 hour", watermark = "")
    val q = piped.writeStream.format("memory").queryName("composed_out")
      .outputMode("append").start()
    // batch 1: an intra-batch content dup (same user+window, so the
    // surviving copy is count-invariant) plus a distinct doc
    mem.addData((ts(b + 60), 1L, "A"), (ts(b + 120), 1L, "A"),
      (ts(b + 200), 2L, "B"))
    q.processAllAvailable()
    // batch 2: a CROSS-batch content dup from another user (must be
    // dropped by dedup state — were it kept, window 2 would gain a
    // SILVER row) and a doc from a user with no dimension row
    mem.addData((ts(b + 3700), 2L, "A"), (ts(b + 3800), 99L, "C"))
    q.processAllAvailable()
    // sentinel advances the watermark past both windows to close them
    mem.addData((ts(b + 6 * 3600), 1L, "Z"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("composed_out")
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(3))).toSet
    assert(out == Set(
      (Some("GOLD"), b, 1L),          // one "A" survives dedup
      (Some("SILVER"), b, 1L),        // "B"
      (None, b + 3600, 1L)),          // "C": unmatched user, null segment
      s"composed stream produced $out")
  }

  test("sessionize under readStream: sessions close on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val base = 86400L * 19001
    val q = EventStreams.sessionize(
      mem.toDS().withWatermark("ts", "1 hour").as[Event], gapSec = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // batch 1: user 1 session of 2 events, then a gap > 1800 within the batch
    mem.addData(
      Event(1L, 1L, ts(base)), Event(1L, 2L, ts(base + 60)),
      Event(1L, 3L, ts(base + 5000)))
    q.processAllAvailable()
    // batch 2: far-future event advances the watermark past the open
    // session's gap horizon -> timeout fires and closes it
    mem.addData(Event(2L, 9L, ts(base + 86400)))
    q.processAllAvailable()
    // batch 3: user 1 returns after the timeout — the per-user counter
    // must survive the close (session_id continues at 3, not restart at 1)
    mem.addData(Event(1L, 10L, ts(base + 86400 + 100)))
    q.processAllAvailable()
    // batch 4: a LATE event (event-time far behind the watermark) for an
    // existing user must not kill the query via a stale timeout timestamp
    mem.addData(Event(1L, 11L, ts(base + 6000)))
    q.processAllAvailable()
    mem.addData(Event(2L, 12L, ts(base + 86400 * 3)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").as[Session].collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.start_s, s.end_s)).toSet
    assert(out.contains((1L, 1L, 2L, base, base + 60)))       // closed by gap
    assert(out.contains((1L, 2L, 1L, base + 5000, base + 5000))) // closed by timeout
    // counter survived the timeout close: post-timeout sessions number 3+,
    // and no (user, session_id) key is ever emitted twice
    val user1Ids = spark.table("sess_out").as[Session].collect()
      .filter(_.user_id == 1L).map(_.session_id)
    assert(user1Ids.distinct.length == user1Ids.length,
      s"duplicate session ids for user 1: ${user1Ids.toSeq}")
    assert(user1Ids.exists(_ >= 3L),
      s"expected a post-timeout session id >= 3, got ${user1Ids.toSeq}")
  }

  test("streaming exact dedup drops within-watermark duplicates across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val base = 86400L * 19005
    val q = EventStreams.dedupStream(
      mem.toDF().toDF("ts", "text"),
      ts = "ts", payload = "text", horizon = "1 hour")
      .select("text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData((ts(base), "alpha"), (ts(base + 10), "alpha"), (ts(base + 20), "beta"))
    q.processAllAvailable()
    mem.addData((ts(base + 30), "alpha"), (ts(base + 40), "gamma"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect().map(_.getString(0)).toSeq
    assert(out.sorted == Seq("alpha", "beta", "gamma")) // dups dropped across batches
  }

  test("sessionizeBatch agrees with the window-function formulation") {
    import spark.implicits._
    val base = 86400L * 19002
    val ev = Seq(
      Event(7L, 1L, ts(base)), Event(7L, 2L, ts(base + 100)),
      Event(7L, 3L, ts(base + 100 + 1801)), // new session (gap > 1800)
      Event(8L, 4L, ts(base + 50))).toDS()
    val out = EventStreams.sessionizeBatch(ev).collect()
      .map(s => (s.user_id, s.session_id, s.n_events)).toSet
    assert(out == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("windowedCounts in batch mode equals a plain group-by") {
    import spark.implicits._
    val base = 86400L * 19003
    val df = Seq(("a", ts(base + 10)), ("a", ts(base + 20)),
      ("a", ts(base + 86400 + 10))).toDF("event_type", "ts")
    val out = EventStreams.windowedCounts(df, "event_type", "1 day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == Set(("a", base, 2L), ("a", base + 86400, 1L)))
  }

  test("nearJoin under readStream: interval pairs across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp)]
    val memR = MemoryStream[(Long, Timestamp)]
    val base = 86400L * 19004
    val q = EventStreams.nearJoin(
      memL.toDF().toDF("event_id", "ts"),
      memR.toDF().toDF("event_id", "ts"),
      windowS = 300L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("nj_out")
      .outputMode("append").start()
    // batch 1: left event; right events straddling the ±300 s boundary
    memL.addData((1L, ts(base + 1000)))
    memR.addData((10L, ts(base + 700)), (11L, ts(base + 1299)),
      (12L, ts(base + 1301)))
    q.processAllAvailable()
    // batch 2: a LATE right row still within the watermark joins the
    // buffered left row — cross-batch matching through the state store
    memR.addData((13L, ts(base + 1100)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("nj_out")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (1L, 13L)))
  }

  test("nearJoin in batch mode matches the binned batch range join") {
    import spark.implicits._
    val base = 86400L * 19005
    val rows = (0 until 60).map(i =>
      (i.toLong, ts(base + (i * 137) % 3000)))
    val df = rows.toDF("event_id", "ts")
    val stream = EventStreams.nearJoin(df, df, windowS = 300L)
      .select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.ops.RangeJoin.within(
        df.select(col("event_id"), unix_timestamp(col("ts")).as("ts_s")),
        df.select(col("event_id"), unix_timestamp(col("ts")).as("ts_s")),
        col("event_id"), col("ts_s"), col("event_id"), col("ts_s"), 300L)
      .select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stream == batch && stream.nonEmpty)
  }

  test("nearDupStream agrees with the batch minhashIncremental twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 86400L * 19200
    // corpus: three docs; incoming: a near-dup of doc 1 (one word swapped
    // in a long template), an exact copy of doc 2, and an unrelated doc
    val tpl = (0 until 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      1L -> tpl,
      2L -> "completely different content about streams and state",
      3L -> "unrelated corpus document three").toDF("doc_id", "text")
    val incoming = Seq(
      (101L, ts(base), tpl.replace("w7", "x7")),
      (102L, ts(base + 10), "completely different content about streams and state"),
      (103L, ts(base + 20), "nothing in common with anything at all"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = EventStreams.nearDupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), corpus)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    mem.addData(incoming: _*)
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("neardup_out")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))).toSet
    val batch = graft.ops.Dedup.minhashIncremental(
        corpus, incoming.map(t => (t._1, t._3)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(1), r.getLong(0),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
    // the near-dup and the exact copy are found; the unrelated doc is not
    assert(stream.map(p => (p._1, p._2)) == Set((101L, 1L), (102L, 2L)))
  }

  test("ewmaStream across two in-order micro-batches agrees with the " +
    "batch ewmaPerKey fold, row for row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 86400L * 19300
    val b1 = Seq(
      EventStreams.ValueEvent(1L, 1L, ts(base), 1.0),
      EventStreams.ValueEvent(1L, 2L, ts(base + 10), 2.0),
      EventStreams.ValueEvent(2L, 3L, ts(base + 20), 7.5))
    val b2 = Seq(
      EventStreams.ValueEvent(1L, 4L, ts(base + 30), 3.0),
      EventStreams.ValueEvent(2L, 5L, ts(base + 40), 2.5))
    val mem = MemoryStream[EventStreams.ValueEvent]
    val q = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // update mode emits one row per (user, batch); the LAST update per
    // user is the running value after all events
    val stream = spark.table("ewma_out")
      .groupBy("user_id").agg(max_by(
        struct(col("n_events"), col("ewma_r")), col("n_events")).as("s"))
      .collect().map(r => (r.getLong(0),
        r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1))).toSet
    val batch = graft.ops.Profiler.ewmaPerKey(
        (b1 ++ b2).toDF(), col("user_id"),
        Seq(col("ts"), col("event_id")), col("value"), alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
    // hand check: user 1 = fold(1,2,3) = 0.25·3 + 0.75·(0.25·2+0.75·1)
    assert(batch.exists(t => t._1 == 1L && t._3 == 1.68750))
  }

  test("ewmaStream folds a LATE cross-batch arrival at arrival position " +
    "(the documented running-metric approximation)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 86400L * 19400
    val mem = MemoryStream[EventStreams.ValueEvent]
    val q = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_late_out")
      .outputMode("update").start()
    // batch 1: events at t+10 and t+20 (sorted within the batch)
    mem.addData(EventStreams.ValueEvent(1L, 1L, ts(base + 10), 1.0),
      EventStreams.ValueEvent(1L, 2L, ts(base + 20), 2.0))
    q.processAllAvailable()
    // batch 2: an event EARLIER than both — folds last, not re-sorted
    mem.addData(EventStreams.ValueEvent(1L, 3L, ts(base), 8.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("ewma_late_out")
      .filter(col("n_events") === 3).head()
    // seed 1.0 → 0.25·2 + 0.75·1 = 1.25 → 0.25·8 + 0.75·1.25 = 2.9375
    assert(last.getDouble(2) == 2.9375)
    // whereas the batch fold sorts globally: seed 8 → fold(1, 2)
    val batch = graft.ops.Profiler.ewmaPerKey(
        Seq((1L, 1L, ts(base + 10), 1.0), (1L, 2L, ts(base + 20), 2.0),
          (1L, 3L, ts(base), 8.0)).toDF("user_id", "event_id", "ts", "value"),
        col("user_id"), Seq(col("ts"), col("event_id")), col("value"),
        alpha = 0.25).head()
    // seed 8 → 0.25·1 + 0.75·8 = 6.25 → 0.25·2 + 0.75·6.25 = 5.1875
    assert(batch.getDouble(2) == 5.1875)
  }

  test("ewmaStream sorts within a micro-batch at full microsecond " +
    "resolution: same-millisecond events fold in time order, not " +
    "event_id order") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def tsMicro(s: Long, micros: Int): Timestamp = {
      val t = new Timestamp(s * 1000)
      t.setNanos(micros * 1000)
      t
    }
    val base = 86400L * 19500
    // two events 500µs apart inside the SAME millisecond, with event_id
    // order REVERSED vs time order (a ms-truncated sort falls back to
    // event_id and folds them backwards), delivered scrambled in ONE batch
    val evs = Seq(
      EventStreams.ValueEvent(1L, 5L, tsMicro(base, 750), 4.0),
      EventStreams.ValueEvent(1L, 7L, ts(base + 1), 2.0),
      EventStreams.ValueEvent(1L, 9L, tsMicro(base, 250), 1.0))
    val mem = MemoryStream[EventStreams.ValueEvent]
    val q = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_micro_out")
      .outputMode("update").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_micro_out")
      .filter(col("n_events") === 3).head().getDouble(2)
    // time order is id 9 (250µs), id 5 (750µs), id 7 (+1s):
    // seed 1.0 → 0.25·4 + 0.75·1 = 1.75 → 0.25·2 + 0.75·1.75 = 1.8125
    // (the ms-truncated sort would fold 4,1,2 → 2.9375)
    assert(got == 1.8125, s"stream folded out of microsecond order: $got")
    // and the batch twin (TimestampType is micros end to end) agrees
    val batch = graft.ops.Profiler.ewmaPerKey(
        evs.toDF(), col("user_id"), Seq(col("ts"), col("event_id")),
        col("value"), alpha = 0.25).head().getDouble(2)
    assert(batch == got, s"stream=$got batch=$batch")
  }

  test("enrichWithDim under readStream agrees with the batch twin, " +
    "unmatched facts pass through with null dims") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq(1L -> "GOLD", 2L -> "SILVER").toDF("cust_id", "segment")
    val facts = Seq((10L, 1L, "click"), (11L, 2L, "view"),
      (12L, 2L, "click"), (13L, 99L, "click"))
    val mem = MemoryStream[(Long, Long, String)]
    val q = EventStreams.enrichWithDim(
        mem.toDF().toDF("event_id", "user_id", "event_type"),
        dim, col("user_id"), col("cust_id"))
      .select("event_id", "segment")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData(facts: _*)
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("enrich_out")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val batch = EventStreams.enrichWithDim(
        facts.toDF("event_id", "user_id", "event_type"),
        dim, col("user_id"), col("cust_id"))
      .select("event_id", "segment")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(stream == batch)
    assert(stream == Set(10L -> Some("GOLD"), 11L -> Some("SILVER"),
      12L -> Some("SILVER"), 13L -> None))
  }

  test("checkpoint restart: the composed intake DAG recovers dedup + " +
    "window-agg state and matches an uninterrupted run row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val b = 86400L * 19700
    val dim = Seq(1L -> "GOLD", 2L -> "SILVER").toDF("cust_id", "segment")
    def pipeline(src: org.apache.spark.sql.DataFrame) =
      EventStreams.windowedCounts(
        EventStreams.enrichWithDim(
          EventStreams.dedupStream(src, "ts", "payload", horizon = "2 hours"),
          dim, col("user_id"), col("cust_id")),
        key = "segment", windowLen = "1 hour", watermark = "")
    // batch 3 carries a content dup of a BATCH-1 doc: only recovered
    // dedup state can drop it (lost state would add a GOLD row to window
    // 2); window 2 itself spans the restart (one event before, one
    // after), so its single closed row also proves agg-state recovery
    val batch1 = Seq((ts(b + 60), 1L, "A"), (ts(b + 200), 2L, "B"))
    val batch2 = Seq((ts(b + 3700), 2L, "A"), (ts(b + 3800), 99L, "C"))
    val batch3 = Seq((ts(b + 4000), 1L, "A"), (ts(b + 4100), 1L, "D"))
    val sentinel = Seq((ts(b + 6 * 3600), 1L, "Z"))
    // foreachBatch sink: the memory sink refuses checkpoint RECOVERY (it
    // is not fault-tolerant), and foreachBatch is the production restart
    // shape anyway — committed epochs are not re-delivered after restart
    type Out = (Option[String], Long, Long)
    def sinkInto(buf: scala.collection.mutable.Set[Out])(
        batch: org.apache.spark.sql.DataFrame, @annotation.unused id: Long): Unit = {
      batch.collect().foreach(r => buf.synchronized {
        buf += ((Option(r.getString(0)), r.getLong(1), r.getLong(3)))
      })
      ()
    }

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-stream-ckpt").toString
    val got = scala.collection.mutable.Set.empty[Out]
    val mem = MemoryStream[(Timestamp, Long, String)]
    val src = mem.toDF().toDF("ts", "user_id", "payload")
    val q1 = pipeline(src).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkInto(got) _).start()
    mem.addData(batch1: _*); q1.processAllAvailable()
    mem.addData(batch2: _*); q1.processAllAvailable()
    q1.stop() // hard stop mid-stream: window 2 still open, dedup set live

    // restart from the SAME checkpoint; only new epochs are delivered
    val q2 = pipeline(src).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt).foreachBatch(sinkInto(got) _).start()
    mem.addData(batch3: _*); q2.processAllAvailable()
    mem.addData(sentinel: _*); q2.processAllAvailable()
    q2.stop()
    val restarted = got.toSet

    // uninterrupted twin: same feed, same batch boundaries, one query
    val twin = scala.collection.mutable.Set.empty[Out]
    val mem2 = MemoryStream[(Timestamp, Long, String)]
    val q3 = pipeline(mem2.toDF().toDF("ts", "user_id", "payload"))
      .writeStream.outputMode("append").foreachBatch(sinkInto(twin) _).start()
    Seq(batch1, batch2, batch3, sentinel).foreach { bt =>
      mem2.addData(bt: _*); q3.processAllAvailable()
    }
    q3.stop()
    val uninterrupted = twin.toSet

    assert(restarted == uninterrupted,
      s"restarted=$restarted uninterrupted=$uninterrupted")
    assert(restarted == Set(
      (Some("GOLD"), b, 1L),          // W1: one "A" survives dedup
      (Some("SILVER"), b, 1L),        // W1: "B"
      (None, b + 3600, 1L),           // W2: "C" (no dim row)
      (Some("GOLD"), b + 3600, 1L)),  // W2: "D" only — the batch-3 "A"
                                      // dup died against RECOVERED state
      s"got $restarted")
  }

  test("checkpoint restart: ewmaStream recovers per-user running state " +
    "(count continues, fold seeds from the recovered accumulator)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 86400L * 19800
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ewma-ckpt").toString
    // foreachBatch: update-mode memory sink cannot recover a checkpoint
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    def sink(batch: org.apache.spark.sql.Dataset[EventStreams.EwmaRow],
             @annotation.unused id: Long): Unit = {
      batch.collect().foreach(r => rows.synchronized {
        rows += ((r.n_events, r.ewma_r))
      })
      ()
    }
    val mem = MemoryStream[EventStreams.ValueEvent]
    val q1 = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    mem.addData(EventStreams.ValueEvent(1L, 1L, ts(base), 10.0),
      EventStreams.ValueEvent(1L, 2L, ts(base + 10), 20.0))
    q1.processAllAvailable()
    q1.stop()
    val q2 = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt).foreachBatch(sink _).start()
    mem.addData(EventStreams.ValueEvent(1L, 3L, ts(base + 20), 30.0))
    q2.processAllAvailable()
    q2.stop()
    val last = rows.synchronized(rows.maxBy(_._1))
    // lost state would report n=1, ewma=30.0; recovered state continues:
    // 10 → 0.25·20+0.75·10 = 12.5 → 0.25·30+0.75·12.5 = 16.875
    assert(last == ((3L, 16.875)), s"state not recovered: $last")
  }

  test("session_window boundary semantics: an exactly-gap silence still " +
    "MERGES (split only when the gap is exceeded — same as sessionize)") {
    import spark.implicits._
    val base = 86400L * 19500
    // gaps: 10s (merge), exactly 1800s (merge — closed boundary),
    // 1801s (split)
    val df = Seq(
      (1L, ts(base)), (1L, ts(base + 10)),
      (1L, ts(base + 10 + 1800)),
      (1L, ts(base + 10 + 1800 + 1801))).toDF("user_id", "ts")
    val out = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("session_window.start")).as("s"),
        unix_timestamp(col("session_window.end")).as("e"), col("n"))
      .orderBy("s")
      .collect().map(r => (r.getLong(0) - base, r.getLong(1) - base,
        r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 1810L + 1800L, 3L),
      (3611L, 3611L + 1800L, 1L)), out.toSeq.toString)
  }
}
