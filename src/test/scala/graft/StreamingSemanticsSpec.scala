package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Per-key counter whose ValueState expires after 5 s idle — TTLConfig
  * (wall-clock passive eviction) needs a controlled-timing spec; the
  * oracle-gated queries can't exercise it deterministically. */
private class TtlCountProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, String, (String, Long)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var n: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    n = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofSeconds(5)))
  override def handleInputRows(
      key: String, rows: Iterator[String],
      timerValues: TimerValues): Iterator[(String, Long)] = {
    val c = (if (n.exists()) n.get() else 0L) + rows.size
    n.update(c)
    Iterator.single((key, c))
  }
}

/** Watermark semantics the bounded-replay oracle can't show: an event
  * arriving BEHIND the watermark is dropped from an append-mode windowed
  * aggregate, and on-time out-of-order events are kept. */
class StreamingSemanticsSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("late event beyond the watermark is dropped; out-of-order within it is kept") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val agg = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("late_drop_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: events at 10:00-10:09 plus one at 10:31 to advance the
      // watermark to 10:26 and close the 10:00 window
      source.addData((ts(0), "a"), (ts(9), "a"), (ts(31), "b"))
      q.processAllAvailable()
      // batch 2: a LATE event for the closed 10:00 window (behind the
      // 10:26 watermark -> dropped) and an out-of-order but in-time event
      // for the open 10:30 window (kept)
      source.addData((ts(5), "a"), (ts(30), "b"))
      q.processAllAvailable()
      // batch 3: advance the watermark past 10:40 to flush the 10:30 window
      source.addData((ts(50), "c"))
      q.processAllAvailable()

      val rows = spark.table("late_drop_sink")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("k"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // the 10:00/a window emitted with 2 events — the late third was dropped
      rows should contain(("10:00", "a", 2L))
      // the 10:30/b window emitted with BOTH events — out-of-order but in-time
      rows should contain(("10:30", "b", 2L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("late_drop_sink")
    }
  }

  test("append-mode window state is evicted once the watermark passes (q19 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val agg = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("evict_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: two windows (10:00, 10:10) open
      source.addData((ts(0), "a"), (ts(12), "b"))
      q.processAllAvailable()
      // batch 2: 10:50 advances the watermark to 10:45, closing both
      source.addData((ts(50), "c"))
      q.processAllAvailable()
      // batch 3: eviction for the new watermark happens in the NEXT batch
      source.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "d"))
      q.processAllAvailable()

      // 4 windows were ever created; the two closed ones must have been
      // EMITTED (visible in the append sink) and REMOVED from state —
      // complete mode would hold all 4 forever.
      val emitted = spark.table("evict_sink")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      emitted should contain(("10:00", 1L))
      emitted should contain(("10:10", 1L))
      val removed = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      removed should be >= 2L
      // only the still-open tail windows may remain (a trailing no-data
      // batch may flush 10:50 too, leaving just 11:30) — never all 4
      val finalState = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption.map(_.numRowsTotal)
      finalState.get should be <= 2L
    } finally {
      q.stop()
      spark.catalog.dropTempView("evict_sink")
    }
  }

  test("event-time timer fire emits the finalized session and evicts its state (q98 semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = MemoryStream[(Timestamp, Long)]
    val sessions = source.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .select(col("user"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(
        new analytics.Streams.SessionTimerProcessor(600000000L), // 10 min gap
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user", "start_us", "end_us", "n_events")
    val q = sessions.writeStream
      .format("memory")
      .queryName("timer_session_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: user 1 gets a 2-event session (10:00+10:03, ends 10:13),
      // user 2 a 1-event session (10:12, ends 10:22); timers registered,
      // watermark still at 0 — NOTHING may emit (timer-driven only)
      source.addData((ts(0), 1L), (ts(3), 1L), (ts(12), 2L))
      q.processAllAvailable()
      spark.table("timer_session_sink").count() shouldBe 0L
      // batch 2: 10:45 advances the watermark to 10:40, past both session
      // ends; batch 3 fires the expired timers with that watermark
      source.addData((ts(45), 3L))
      q.processAllAvailable()
      source.addData((Timestamp.valueOf("2024-01-01 11:30:00"), 3L))
      q.processAllAvailable()

      val emitted = spark.table("timer_session_sink")
        .select(col("user"), col("n_events")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      emitted should contain((1L, 2L))   // merged 2-event session
      emitted should contain((2L, 1L))
      // timer fire DELETED the finalized sessions' buffered events: only
      // user 3's still-open buffer (and its timer) may remain in state
      val finalState = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption.map(_.numRowsTotal)
      finalState.get should be <= 2L
    } finally {
      q.stop()
      spark.catalog.dropTempView("timer_session_sink")
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("ValueState TTL expires idle state (transformWithState TTLConfig)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = MemoryStream[String]
    val counts = source.toDS()
      .groupByKey(identity)
      .transformWithState(new TtlCountProcessor,
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("k", "n")
    // NOTE: TimeMode.ProcessingTime makes every batch advance the state
    // clock, so the engine ALWAYS schedules another batch —
    // AvailableNow never terminates and processAllAvailable never
    // settles (measured: an unbounded no-data-batch loop). The correct
    // shape is a periodic trigger + sink polling + explicit stop.
    val q = counts.writeStream
      .format("memory")
      .queryName("ttl_sink")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    def rowsNow(): Seq[(String, Long)] = spark.table("ttl_sink")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def pollUntil(what: String)(p: Seq[(String, Long)] => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!p(rowsNow())) {
        if (System.nanoTime() > deadline) fail(s"timed out waiting for $what: ${rowsNow()}")
        Thread.sleep(200)
      }
    }
    try {
      // two rows for key a, inside the 5 s TTL — the count reaches 2
      source.addData("a"); source.addData("a")
      pollUntil("count to reach 2")(_.contains(("a", 2L)))
      val onesBefore = rowsNow().count(_ == ("a", 1L))
      // idle past the TTL: the next row must find the state EXPIRED and
      // restart the count at 1 (a non-expired state would emit (a,3)) —
      // TTL is the passive-eviction story for abandoned keys; q98's
      // timers are the active one
      Thread.sleep(6000)
      source.addData("a")
      pollUntil("a fresh count of 1 after TTL expiry") { rows =>
        rows should not contain ("a", 3L)
        rows.count(_ == ("a", 1L)) == onesBefore + 1
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView("ttl_sink")
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("stream-stream join state retains exactly the within-watermark rows (q99 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("q99-spec-ckpt").toString
    val cSrc = MemoryStream[(Timestamp, Long)]
    val pSrc = MemoryStream[(Timestamp, Long)]
    val clicks = cSrc.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "5 minutes")
    val purchases = pSrc.toDF().toDF("p_ts", "p_user").withWatermark("p_ts", "5 minutes")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream
      .format("memory")
      .queryName("q99_spec_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def t(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      // batch 1: two matched pairs well in the past
      cSrc.addData((t("10:00"), 1L), (t("11:00"), 2L))
      pSrc.addData((t("10:10"), 1L), (t("11:05"), 2L))
      q.processAllAvailable()
      // two more batches advance the watermark; processAllAvailable also
      // runs the trailing no-data batch, so the final watermark is
      // 12:55 (min side max 13:00 − 5m) and its eviction has run
      cSrc.addData((t("12:00"), 3L)); pSrc.addData((t("12:00"), 3L))
      q.processAllAvailable()
      cSrc.addData((t("13:00"), 4L)); pSrc.addData((t("13:00"), 4L))
      q.processAllAvailable()
      q.stop()
      // retention law at watermark 12:55: clicks need c_ts ≥ 12:25
      // (join bound 30m), purchases p_ts ≥ 12:55 — every earlier row
      // (10:00/11:00/12:00 clicks, 10:10/11:05/12:00 purchases) must be
      // GONE from the store, and the 13:00 pair retained
      val left = spark.read.format("statestore").option("joinSide", "left").load(ckpt)
        .select(col("value.c_user"), date_format(col("value.c_ts"), "HH:mm"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val right = spark.read.format("statestore").option("joinSide", "right").load(ckpt)
        .select(col("value.p_user"), date_format(col("value.p_ts"), "HH:mm"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      left shouldBe Set((4L, "13:00"))
      right shouldBe Set((4L, "13:00"))
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView("q99_spec_sink")
    }
  }

  test("left-semi stream join emits a matched click ONCE, never an unmatched one, and evicts state (q108 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("q108-spec-ckpt").toString
    val cSrc = MemoryStream[(Timestamp, Long)]
    val pSrc = MemoryStream[(Timestamp, Long)]
    val clicks = cSrc.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "5 minutes")
    val purchases = pSrc.toDF().toDF("p_ts", "p_user").withWatermark("p_ts", "5 minutes")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"),
      "left_semi")
    val q = joined.writeStream
      .format("memory")
      .queryName("q108_spec_sink")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def t(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      // u1's click gets TWO in-window purchases (semi must emit it once,
      // not twice); u2's click never matches
      cSrc.addData((t("10:00"), 1L), (t("10:05"), 2L))
      pSrc.addData((t("10:10"), 1L), (t("10:20"), 1L))
      q.processAllAvailable()
      // advance the watermark far past both clicks + the 30m join bound
      cSrc.addData((t("13:00"), 3L)); pSrc.addData((t("13:00"), 4L))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("q108_spec_sink")
      // left columns only, exactly one row, the matched click
      out.columns.toSeq shouldBe Seq("c_ts", "c_user")
      out.select(date_format(col("c_ts"), "HH:mm"), col("c_user"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
        Seq(("10:00", 1L))
      // eviction: at final watermark 12:55 every click below 12:25
      // (bound 30m) must be gone from the left store — the matched AND
      // the unmatched one; only the 13:00 probe row survives
      val left = spark.read.format("statestore").option("joinSide", "left").load(ckpt)
        .select(col("value.c_user"), date_format(col("value.c_ts"), "HH:mm"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      left shouldBe Set((3L, "13:00"))
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView("q108_spec_sink")
    }
  }

  test("statestore batchId option time-travels to a historical state version") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("tt-ckpt").toString
    val source = MemoryStream[String]
    val agg = source.toDS().groupBy(col("value").as("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("tt_sink")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      source.addData("a", "a", "b"); q.processAllAvailable()
      source.addData("a"); q.processAllAvailable()
      q.stop()
      def stateAt(opts: Map[String, String]): Set[(String, Long)] = {
        var r = spark.read.format("statestore")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        // positional key.*/value.* — the state schema's field names
        // derive from the pre-alias plan, not the groupBy aliases
        r.load(ckpt)
          .select(org.apache.spark.sql.functions.expr("key.*"),
            org.apache.spark.sql.functions.expr("value.*"))
          .collect().map(x => (x.getString(0), x.getLong(1))).toSet
      }
      // latest state sees both batches; batchId 0 time-travels to the
      // counts as of the first commit — the debugging/audit story:
      // "what did this store hold when batch N committed?"
      stateAt(Map.empty) shouldBe Set(("a", 3L), ("b", 1L))
      stateAt(Map("batchId" -> "0")) shouldBe Set(("a", 2L), ("b", 1L))
    } finally {
      if (q.isActive) q.stop()
      spark.catalog.dropTempView("tt_sink")
    }
  }

  test("RocksDB changelog checkpointing survives a query restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val confs = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // changelog checkpointing: per-batch uploads are the delta log,
      // not a full snapshot — the 100 TB state-checkpoint cost model
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val ckpt = java.nio.file.Files.createTempDirectory("cl-ckpt").toString
    val source = MemoryStream[String]
    val agg = source.toDS().groupBy(col("value").as("k"))
      .agg(count(lit(1)).as("n"))
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    // foreachBatch, not the memory sink — only sinks with durable output
    // support restarting from a checkpoint
    def start() = agg.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.synchronized {
          emitted ++= df.collect().map(r => (r.getString(0), r.getLong(1)))
        }
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val q1 = start()
    try {
      source.addData("a"); q1.processAllAvailable()
      q1.stop()
      // restart from the changelog-checkpointed state: the count must
      // CONTINUE from 1, proving state was rebuilt from the uploaded
      // changelog, not recounted from scratch
      val q2 = start()
      try {
        source.addData("a"); q2.processAllAvailable()
        emitted.synchronized(emitted.toList) should contain(("a", 2L))
      } finally q2.stop()
    } finally {
      if (q1.isActive) q1.stop()
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("append-mode SESSION window state is evicted on finalization (q20 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val agg = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("session_evict_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: two events 3 min apart MERGE into one session for a
      // (ends 10:13), plus a separate session for b (ends 10:22)
      source.addData((ts(0), "a"), (ts(3), "a"), (ts(12), "b"))
      q.processAllAvailable()
      // batch 2: 10:45 advances the watermark to 10:40 — both sessions
      // end before it, so both must EMIT and EVICT
      source.addData((ts(45), "c"))
      q.processAllAvailable()
      // batch 3: eviction for the new watermark lands in the next batch
      source.addData((Timestamp.valueOf("2024-01-01 11:30:00"), "d"))
      q.processAllAvailable()

      val emitted = spark.table("session_evict_sink")
        .select(date_format(col("session_window.start"), "HH:mm").as("w"),
          col("k"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // the merge rule: 10:00 + 10:03 fused into ONE session with n=2
      emitted should contain(("10:00", "a", 2L))
      emitted should contain(("10:12", "b", 1L))
      // finalized sessions were REMOVED from the store — complete mode
      // (the pre-r9 q20) never removes anything
      val removed = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsRemoved).sum
      removed should be >= 2L
      // state rows < total sessions ever created (4): only the still-open
      // tail sessions may remain
      val finalState = q.recentProgress.reverse
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .headOption.map(_.numRowsTotal)
      finalState.get should be <= 2L
    } finally {
      q.stop()
      spark.catalog.dropTempView("session_evict_sink")
    }
  }

  test("union of two watermarked streams finalizes at the MIN per-source watermark (q103 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fast = MemoryStream[(Timestamp, String)]
    val slow = MemoryStream[(Timestamp, String)]
    def branch(m: MemoryStream[(Timestamp, String)]) =
      m.toDF().toDF("ts", "k").withWatermark("ts", "0 seconds")
    val agg = branch(fast).union(branch(slow))
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .queryName("union_wm_sink")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: one event per source in the 10:00 window
      fast.addData((ts(5), "f"))
      slow.addData((ts(2), "s"))
      q.processAllAvailable()
      // batch 2: the FAST source leaps an hour ahead. Under the default
      // multipleWatermarkPolicy=min the global watermark is
      // min(11:00, 10:02) = 10:02 — the 10:00 window (ends 10:10) must
      // NOT finalize, no matter how far one source runs ahead. A `max`
      // policy would emit here and silently drop the slow source's
      // still-entitled rows.
      fast.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "f"))
      q.processAllAvailable()
      spark.table("union_wm_sink").count() shouldBe 0L
      // batch 3: the slow source catches up; the global watermark jumps
      // to 11:00 and the 10:00 window emits with BOTH sides' rows
      slow.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "s"))
      q.processAllAvailable()
      val emitted = spark.table("union_wm_sink")
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      emitted should contain(("10:00", 2L))
    } finally {
      q.stop()
      spark.catalog.dropTempView("union_wm_sink")
    }
  }
}
